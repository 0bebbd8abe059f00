package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch — the bounded-memory frequency summary
  * (SURVEY.md §2.11 custom-aggregate tier, alongside [[ProductAgg]]).
  *
  * A k-counter summary with the classic deterministic guarantees over a
  * stream of n items:
  *
  *   - no overcount: est(t) <= true(t) for every retained term;
  *   - bounded undercount: true(t) - est(t) <= n / (k + 1) <= n / k;
  *   - guaranteed presence: every term with true(t) > n / k is retained.
  *
  * `reduce` is the textbook decrement step; `merge` sums two summaries and
  * re-prunes to k by subtracting the (k+1)-th largest weight and dropping
  * non-positive entries — the mergeable-summaries combine (Agarwal et al.,
  * PODS'12) whose errors ADD, so the n/(k+1) bound holds no matter how
  * Spark's partial-aggregation tree groups partitions. The sketch therefore
  * rides the same map-side-combine machinery as built-in aggregates: rows
  * never shuffle, only k-entry maps do — a 100 TB token stream reduces to
  * one k-entry map per partition before the exchange.
  *
  * The retained SET (and the estimates) depend on input partitioning, so
  * queries must only surface the partition-independent guarantees: presence
  * and error-bound verdicts for terms with true count > n/k (q_heavy_hitters
  * does exactly this; the DuckDB oracle asserts the verdicts).
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], term: String): Map[String, Long] =
    m.get(term) match {
      case Some(c) => m.updated(term, c + 1)
      case None if m.size < k => m.updated(term, 1L)
      case None => // decrement-all, drop exhausted counters
        m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val c = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (c.size <= k) c
    else {
      val thresh = c.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      c.collect { case (t, v) if v > thresh => t -> (v - thresh) }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    bufferEncoder
}

object HeavyHittersAgg {
  /** Default sketch width: error bound n/256 (~0.4% of the stream). */
  val defaultK = 256

  /** Register `mg_sketch(term)` for SQL + DataFrame use (idempotent). */
  def register(spark: SparkSession, k: Int = defaultK): Unit =
    spark.udf.register("mg_sketch",
      org.apache.spark.sql.functions.udaf(new HeavyHittersAgg(k),
        Encoders.STRING))
}
