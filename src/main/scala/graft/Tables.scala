package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` like `/root/testdata/sf0.01`; every table is
  * one parquet file/dir under it. Reading through this single helper keeps the
  * scan declarative so Catalyst applies column pruning + predicate pushdown to
  * the parquet source (verify with `.explain`: ReadSchema / PushedFilters).
  */
object Tables {
  /** Query-function shape required by the driver contract (SparkEntry). */
  type Q = (SparkSession, String) => DataFrame

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf) and convert
    * to a microsecond TimestampType — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // idempotent: only touch session conf when the flag isn't already on
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000"))
        .cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
