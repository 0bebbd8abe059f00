package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: multiplicative product (SURVEY.md §2.11 —
  * polars grouped custom aggregates map to `Aggregator[IN, BUF, OUT]`;
  * §7.3 names `product` as the one aggregate Spark SQL lacks).
  *
  * An Aggregator gets Catalyst's full partial-aggregation treatment:
  * `reduce` runs map-side per partition, `merge` combines partials after
  * the shuffle — the same scale shape as built-in sum/min/max, no
  * collect-and-fold anywhere.
  */
object ProductAgg extends Aggregator[Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(acc: Double, x: Double): Double = acc * x
  override def merge(a: Double, b: Double): Double = a * b
  override def finish(acc: Double): Double = acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register `product_agg(x)` for SQL + DataFrame use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("product_agg",
      org.apache.spark.sql.functions.udaf(this))
}
