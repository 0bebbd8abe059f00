package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to the package-private Dataset constructor so library code can
  * materialize a DataFrame from a hand-built LogicalPlan (the standard
  * extension-library pattern; Spark exposes no public equivalent). */
object GraftDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the storage blocks behind a `localCheckpoint()`'d DataFrame.
    * `Dataset.unpersist` only uncaches CacheManager entries; a checkpoint's
    * blocks belong to the materialized RDD inside its LogicalRDD leaf and
    * otherwise live until GC — which in an iterative loop means one
    * generation of blocks accumulating per round (r2 ADVICE). */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
