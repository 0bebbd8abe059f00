package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2), one named Spark
  * DataFrame query per operator; `oracleSql` carries the DuckDB-dialect
  * equivalent the driver hash-compares against on the same parquet.
  */
object SparkEntry {

  private val families: Seq[(Map[String, Tables.Q], Map[String, String])] = Seq(
    (ops.Relational.queries, ops.Relational.oracle),
    (ops.Aggregates.queries, ops.Aggregates.oracle),
    (ops.Joins.queries, ops.Joins.oracle),
    (ops.Reshape.queries, ops.Reshape.oracle),
    (ops.ScalarFuncs.queries, ops.ScalarFuncs.oracle),
    (ops.Windows.queries, ops.Windows.oracle),
    (ops.Analytics.queries, ops.Analytics.oracle),
    (ops.TextAnalysis.queries, ops.TextAnalysis.oracle),
    (ops.Curation.queries, ops.Curation.oracle),
    (ops.Dedup.queries, ops.Dedup.oracle),
    (ops.Similarity.queries, ops.Similarity.oracle),
    (ops.Multimodal.queries, ops.Multimodal.oracle),
    (ops.Sources.queries, ops.Sources.oracle),
    (ops.Layout.queries, ops.Layout.oracle),
    (ops.Graph.queries, ops.Graph.oracle),
    (ops.AsOf.queries, ops.AsOf.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.iterator.map(_._2).reduce(_ ++ _)
}
