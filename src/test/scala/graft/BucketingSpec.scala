package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale patterns: bucketing for shuffle-free co-located
  * joins and partitionBy for partition-pruned scans — the two levers that
  * decide whether a 100 TB join/scan shuffles or not. Asserted on plans,
  * not vibes. */
class BucketingSpec extends SparkSpec {

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("bucketed tables join without any exchange") {
    // tables get explicit paths, so no warehouse config is needed
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    // disable auto-broadcast so only co-location can avoid the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf)
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(spark, sf)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable("li_b")

      val joined = spark.table("orders_b")
        .join(spark.table("li_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(countOccurrences(plan, "Exchange") == 0,
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }

  test("q_bucket_join runs concurrently without scratch-table collisions") {
    // two simultaneous invocations (the driver and a user pipeline, say):
    // per-run uuid-namespaced table names and scratch paths mean neither
    // clobbers the other's bucketed tables mid-join, and each verdict is
    // read off the final AQE plan of the join that actually ran
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fn = ops.Layout.queries("q_bucket_join")
    val runs = Future.sequence(Seq(
      Future(fn(spark, sf).collect()), Future(fn(spark, sf).collect())))
    val Seq(a, b) = Await.result(runs, 5.minutes)
    assert(a.nonEmpty && a.sameElements(b),
      "concurrent runs must agree row-for-row")
    assert(a.forall(_.getAs[Int]("exchange_free") == 1),
      "both concurrent joins must be exchange-free")
  }

  test("q_dedup_index: bucketed band index probes with zero corpus-side exchange") {
    val r = SparkEntry.queries("q_dedup_index")(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Int]("corpus_side_exchange_free") == 1,
      "the saved index must never reshuffle when the batch probes it")
    assert(r.head.getAs[Long]("n_candidates") > 0L,
      "mutated batch docs must collide with their corpus originals")
    assert(r.head.getAs[Long]("n_index_rows") == 4L * Tables.documents(spark, sf).count(),
      "index carries 4 band rows per corpus doc")
  }

  test("partitionBy layout gives partition-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(dir.toString)
    val pruned = spark.read.parquet(dir.toString)
      .filter(col("l_returnflag") === "A")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter must prune directories:\n$scan")
    val full = spark.read.parquet(dir.toString).count()
    assert(pruned.count() < full)
  }
}
