package graft

import org.apache.spark.sql.functions._

/** Gating behavior of the small-input fan-out: every gate must fail safe
  * to "return the frame unchanged" — a wrongly-firing fan-out at scale is
  * a full-data shuffle for nothing. */
class FanOutSpec extends SparkSpec {

  private def partitionsOf(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("small narrow input fans to the session's slot count") {
    val docs = Tables.documents(spark, sf)
    assert(partitionsOf(docs) < spark.sparkContext.defaultParallelism,
      "precondition: single-row-group testdata plans fewer tasks than slots")
    val fanned = ops.FanOut(docs, col("doc_id"))
    assert(partitionsOf(fanned) == spark.sparkContext.defaultParallelism)
    // values untouched — fan-out is partitioning only
    assert(fanned.count() == docs.count())
  }

  test("conf kill-switch returns the frame unchanged") {
    spark.conf.set(ops.FanOut.ConfKey, "false")
    try {
      val docs = Tables.documents(spark, sf)
      assert(ops.FanOut(docs, col("doc_id")) eq docs)
    } finally spark.conf.unset(ops.FanOut.ConfKey)
  }

  test("byte gate skips inputs past spark.graft.fanout.maxBytes") {
    spark.conf.set(ops.FanOut.MaxBytesKey, "1")
    try {
      val docs = Tables.documents(spark, sf)
      assert(ops.FanOut(docs, col("doc_id")) eq docs,
        "an input bigger than the byte gate must pass through untouched")
    } finally spark.conf.unset(ops.FanOut.MaxBytesKey)
  }

  test("already-parallel input passes through without a repartition") {
    val wide = Tables.documents(spark, sf)
      .repartition(spark.sparkContext.defaultParallelism + 4, col("doc_id"))
    val out = ops.FanOut(wide, col("doc_id"))
    assert(partitionsOf(out) == spark.sparkContext.defaultParallelism + 4,
      "enough planned tasks -> no extra exchange")
  }
}
