package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftDataset
import graft.Tables
import graft.Tables.Q
import graft.plans.{AsOfJoinPlan, AsOfStrategy}

/** Public API + qid for the custom sort-merge as-of join operator
  * (graft.plans.AsOfJoinPlan/Exec). The union-tag window encoding
  * (Joins.q_join_asof) is the compose-builtins baseline; this is the
  * whole-operator path with one merge pass and O(1) per-partition state. */
object AsOf {

  /** Register the planner strategy once per session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

  /** As-of join through the custom operator: for each left row, the
    * backward/forward/nearest right row with `rightKey == leftKey` (nulls
    * when none, or when the pick is farther than `toleranceMicros`).
    * Column names must be disjoint across the two frames. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      strategy: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not found in ${p.output.map(_.name).mkString(", ")}"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs), strategy, toleranceMicros)
    GraftDataset.ofRows(spark, plan)
  }

  private def purchases(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))

  private def clicks(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("click_value"))

  /** Same semantics (and same DuckDB oracles) as the q_join_asof* window
    * encodings, through the custom operator — full strategy parity. */
  val queries: Map[String, Q] = Map(
    "q_join_asof_native" -> ((s, d) =>
      join(purchases(s, d), clicks(s, d), "user_id", "c_user", "ts", "c_ts")
        .select(col("event_id"), col("user_id"), col("click_id"),
          col("click_value"))
        .orderBy("event_id")),

    "q_join_asof_fwd_native" -> ((s, d) =>
      join(purchases(s, d), clicks(s, d), "user_id", "c_user", "ts", "c_ts",
          strategy = "forward")
        .select(col("event_id"), col("user_id"), col("click_id"),
          col("click_value"))
        .orderBy("event_id")),

    "q_join_asof_nearest_native" -> ((s, d) =>
      join(purchases(s, d), clicks(s, d), "user_id", "c_user", "ts", "c_ts",
          strategy = "nearest")
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy("event_id")),

    "q_join_asof_tol_native" -> ((s, d) =>
      join(purchases(s, d), clicks(s, d), "user_id", "c_user", "ts", "c_ts",
          toleranceMicros = Some(3600000000L))
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_join_asof_native" -> Joins.oracle("q_join_asof"),
    "q_join_asof_fwd_native" -> Joins.oracle("q_join_asof_fwd"),
    "q_join_asof_nearest_native" -> Joins.oracle("q_join_asof_nearest"),
    "q_join_asof_tol_native" -> Joins.oracle("q_join_asof_tol")
  )
}
