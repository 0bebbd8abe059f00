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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some driver
    * generations (Spark's reader rejects it — [PARQUET_TYPE_ILLEGAL] — unless
    * read as raw nanos via the legacy conf) and TIMESTAMP(MICROS, NTZ) in
    * others (read natively as TimestampNTZType). Normalize both layouts to a
    * microsecond `timestamp_ntz` — the same value DuckDB sees — by keying on
    * the type the reader actually inferred. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // idempotent: only touch session conf when the flag isn't already on
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos: truncate to micros
        raw.withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case TimestampNTZType => raw
      case _ => // defensive: an LTZ read still compares as its UTC wall-clock
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
