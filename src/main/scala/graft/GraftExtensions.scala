package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** The library's single Spark integration point — the idiomatic
  * `SparkSessionExtensions` wiring (set
  * `spark.sql.extensions=graft.GraftExtensions` on any cluster, no code
  * changes), plus `install` for sessions that already exist.
  *
  * Registers everything a user of the library needs:
  *   - the custom as-of join planner strategy (graft.plans.AsOfStrategy);
  *   - the codegen'd `dot_f` vector kernel (graft.functions.FloatDotProduct);
  *   - the `product_agg` typed Aggregator UDAF (graft.functions.ProductAgg);
  *   - `might_contain_l` bloom membership (graft.functions.BloomFunctions);
  *   - `graft_tokens`/`graft_token_count`/`graft_alpha_count` byte-scan
  *     tokenizers (graft.functions.TextTokenize — the regex-free hot path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  // Function registration needs a live session (temp-function registry);
  // it happens lazily on first use via the ops-layer register() calls, or
  // eagerly via install().
}

object GraftExtensions {
  /** Idempotent full setup on an existing session. */
  def install(spark: SparkSession): Unit = {
    ops.AsOf.register(spark)
    functions.FloatDotProduct.register(spark)
    functions.ProductAgg.register(spark)
    functions.BloomFunctions.register(spark)
    functions.TextTokenize.register(spark)
    functions.TextStats.register(spark)
  }
}
