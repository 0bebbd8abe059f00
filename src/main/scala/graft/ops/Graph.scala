package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Graph analytics over relationship tables — the joins-and-aggregates
  * formulation (each power-iteration step is one equi-join + one
  * partial+final aggregate), which is exactly how PageRank runs on a
  * 1000-executor cluster: no driver-side adjacency, no vertex collect;
  * the driver loop is control flow only. Complements the connected-
  * components propagation in [[Dedup.connectedComponents]].
  */
object Graph {

  private val SCALE = 10000000L // ranks carried as fixed-point 1e-7 units

  /** The purchase graph: one undirected edge per DISTINCT
    * (customer, supplier) pair that shares an order line, run as two
    * directed edges. Node ids are 'c<custkey>' / 's<suppkey>'. */
  private def purchaseEdges(s: SparkSession, d: String) = {
    val e0 = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    e0.select(concat(lit("c"), col("c")).as("src"),
        concat(lit("s"), col("sk")).as("dst"))
      .union(e0.select(concat(lit("s"), col("sk")).as("src"),
        concat(lit("c"), col("c")).as("dst")))
  }

  val queries: Map[String, Q] = Map(
    // PageRank, 3 power iterations, damping 0.85 — influence scoring over
    // the customer↔supplier purchase graph. All arithmetic is EXACT
    // fixed-point integer math (ranks in 1e-7 units; per-edge contribution
    // is BIGINT floor division by out-degree, damping is (85·Σ) div 100),
    // so every engine computes bit-identical ranks — no float-summation
    // order hazard. Scale shape: the degree-annotated edge list persists
    // once and each iteration is ONE equi-join (rank table onto edge
    // sources) + ONE map-side-combinable sum per destination — the
    // textbook BSP step; edges never move after the initial partition,
    // only the (node, rank) table shuffles, and the driver loop carries no
    // data. Top-50 by rank keeps the output bounded (TakeOrdered, no
    // global sort).
    "q_pagerank" -> ((s, d) => {
      val edges = purchaseEdges(s, d)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val withDeg = edges.join(deg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var ranks = deg.select(col("src").as("node"), lit(SCALE).as("pr"))
      for (_ <- 1 to 3) {
        ranks = withDeg.join(ranks, col("node") === col("src"))
          .select(col("dst"), expr("pr div deg").as("contrib"))
          .groupBy("dst")
          .agg((lit(15 * SCALE / 100) +
            expr("(85 * sum(contrib)) div 100")).as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
      ranks.orderBy(desc("pr"), asc("node")).limit(50)
    })
  )

  /** 3 unrolled power-iteration CTEs — the oracle replays the exact
    * integer recurrence. */
  private val prIters: String = (1 to 3).map { i =>
    s"r$i AS (SELECT e.dst AS node, CAST(1500000 + " +
      s"(85 * sum(r.pr // d.deg)) // 100 AS BIGINT) AS pr " +
      s"FROM edges e JOIN deg d ON e.src = d.src " +
      s"JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst)"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_pagerank" ->
      ("WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "edges AS (SELECT 'c' || c AS src, 's' || sk AS dst FROM e0 " +
        "UNION ALL SELECT 's' || sk, 'c' || c FROM e0), " +
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src), " +
        "r0 AS (SELECT src AS node, CAST(10000000 AS BIGINT) AS pr FROM deg), " +
        prIters + " " +
        "SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 50")
  )
}
