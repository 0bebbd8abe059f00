package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Spread a compute-bound row-local stage across the session's cores when
  * the upstream scan plans fewer tasks than the session has slots.
  *
  * Why this exists: per-row kernels (md5-per-shingle signatures, simhash
  * folds) moved the dedup family's dominant cost out of shuffles and into
  * the scan stage itself — and a scan stage has exactly as many tasks as
  * the source has splits. The small-SF testdata ships one row group per
  * file, so without this the whole md5 pass runs on ONE core of 32. At
  * production scale the condition is false by construction — a 100 TB
  * input plans thousands of splits, `planned >= slots`, and this is a
  * no-op (adding a repartition there would be a catastrophic full-data
  * shuffle for nothing). Hash-partitioning on a caller-named key keeps the
  * exchange deterministic (round-robin would insert a per-partition sort
  * for retry safety).
  *
  * Cost note: the gate reads the planned partition count off the frame's
  * RDD lineage, which triggers file listing once per call — callers that
  * construct the same corpus repeatedly should memoize the fanned frame
  * (see Dedup.textCorpus).
  */
object FanOut {
  /** `spark.graft.fanout=false` disables the fan-out everywhere — used by
    * plan tests to assert the at-scale plan shape (many-splits inputs make
    * the gate a no-op, so conf-off and at-scale plans are identical). */
  val ConfKey = "spark.graft.fanout"

  /** Upper bound (bytes, plan-estimated) on inputs worth fanning. The
    * fan-out pays one full extra pass over the data; it only wins while
    * that pass is trivially cheap next to single-task compute. The
    * estimate for a file scan is COMPRESSED bytes and text decompresses
    * ~10×, so the default is deliberately conservative: a 60× rehearsal
    * corpus (~50 MB compressed, ~400 MB row bytes) measured 20-30% SLOWER
    * fanned — its downstream shuffles already dominate and the extra pass
    * is pure cost — while the small-SF bench inputs (≤ ~11 MB) all win. */
  val MaxBytesKey = "spark.graft.fanout.maxBytes"
  val DefaultMaxBytes: Long = 32L << 20

  def apply(df: DataFrame, key: Column): DataFrame = {
    val s = df.sparkSession
    if (!s.conf.getOption(ConfKey).forall(_.toBoolean)) df
    else {
      val maxBytes = s.conf.getOption(MaxBytesKey)
        .map(_.toLong).getOrElse(DefaultMaxBytes)
      val slots = s.sparkContext.defaultParallelism
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes > maxBytes) df
      else if (df.rdd.getNumPartitions >= slots) df
      else df.repartition(slots, key)
    }
  }
}
