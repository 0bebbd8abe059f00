package graft

import java.nio.file.Files

/** Zero-row robustness sweep: every registered query must PLAN and RUN
  * against a corpus where every table has its real schema but no rows.
  *
  * Why this matters at 100 TB: partition pruning, a tight filter, or an
  * upstream incremental run routinely hands an operator an empty frame —
  * a pipeline stage that throws on empty input (driver-side `.head` on an
  * empty stats frame, `collect()(0)`, schema inference over zero rows,
  * min/max Nones) turns a no-op day into a paged on-call. The reference
  * inherits empty-safety from Polars (every verb is total on empty
  * frames); this pins the same contract onto all 200+ registered queries
  * at once. Result rows are NOT asserted (empty in → usually empty out;
  * calibration queries may still emit their verdict row) — only that the
  * query is total: no exception, and the result can be materialized.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptySf: String = {
    val dir = Files.createTempDirectory("graft_empty_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** A corpus of exactly one row per table: the n=1 degeneracies a
    * filter-to-one-key incremental run produces — self-join truth sets
    * collapse to empty, stddev/corr windows have no pairs, transition
    * corpora have no transitions, sampled fits see one point. */
  private lazy val oneRowSf: String = {
    val dir = Files.createTempDirectory("graft_one_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(1)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(sfDir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).collect(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString)
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on $label input:\n" +
        failures.mkString("\n"))
  }

  test("every registered query is total on a zero-row corpus") {
    sweep(emptySf, "empty")
  }

  test("every registered query is total on a one-row corpus") {
    sweep(oneRowSf, "single-row")
  }

  /** A corpus with ~1/3 of every column nulled (deterministically, by
    * value hash): the reference's Polars backbone is total on nulls in
    * any column, and dirty production data delivers them — null text
    * into tokenizers, null keys into joins and groupings, null values
    * into the hand-rolled Arrow/Avro/Excel writers. */
  private lazy val nullSf: String = {
    import org.apache.spark.sql.functions.{col, hash, pmod, lit, when}
    val dir = Files.createTempDirectory("graft_null_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$sf/$t.parquet")
      val nulled = df.select(df.schema.fields.map { f =>
        when(pmod(hash(col(f.name)), lit(3)) === 0,
          lit(null).cast(f.dataType)).otherwise(col(f.name)).as(f.name)
      }.toIndexedSeq: _*)
      nulled.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query is total on a null-riddled corpus") {
    sweep(nullSf, "null-injected")
  }

  /** A corpus where ~1/3 of documents have EMPTY text (and string columns
    * elsewhere are blanked the same way): the single most common dirty
    * row in an LLM ingest — present (non-null) but contentless. Exercises
    * the size(words) = 0 paths: per-word averages, ratio features,
    * shingle windows, tokenizers. */
  private lazy val emptyStrSf: String = {
    import org.apache.spark.sql.functions.{col, hash, pmod, lit, when}
    import org.apache.spark.sql.types.StringType
    val dir = Files.createTempDirectory("graft_estr_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$sf/$t.parquet")
      val blanked = df.select(df.schema.fields.map { f =>
        if (f.dataType == StringType)
          when(pmod(hash(col(f.name)), lit(3)) === 0, lit(""))
            .otherwise(col(f.name)).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
      blanked.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query is total on an empty-string corpus") {
    sweep(emptyStrSf, "empty-string")
  }
}
