package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact linear-interpolation quantiles (`percentile` / `quantile_cont`
  * semantics) computed by DISTRIBUTED SORT instead of the aggregate's
  * value-count map.
  *
  * Why: Spark's exact `percentile` aggregate buffers one map entry per
  * DISTINCT VALUE per group and merges those maps on the group's single
  * reducer. For low-cardinality value columns (l_quantity: 50 values)
  * that is ideal; for continuous doubles the map is the size of the data
  * — at 100 TB the reducer dies, and even at bench scale the single-node
  * merge of ~600k-entry maps dominates the query. The sort formulation is
  * the true scale path: a range-partitioned sort (parallel, spillable),
  * the two-pass global index ([[Reshape.withGlobalIndex]]), and a
  * broadcast join that plucks exactly the 2·|ps|·|groups| boundary rows.
  * Nothing is ever driver-side or single-task beyond the tiny
  * per-partition-count window the index already bounds.
  *
  * Parity: position = p·(n−1) over the null-filtered sorted multiset,
  * result = lo + (hi − lo)·g with g the fractional position — the same
  * interpolation `percentile` and DuckDB's `quantile_cont` compute;
  * callers round to ≥4 dp exactly as they already must for cross-engine
  * float parity, which absorbs the ≤2-ulp formula-order difference.
  */
object Quantiles {

  /** One row per group (or one row total when `groupCols` is empty) with
    * a DOUBLE column per `(name, p)` in `ps`. */
  def exactCont(df: DataFrame, value: Column, groupCols: Seq[String],
      ps: Seq[(String, Double)]): DataFrame = {
    val base =
      if (groupCols.isEmpty)
        df.select(lit(0).as("_g"), value.cast("double").as("_x"))
      else df.select(groupCols.map(col) :+ value.cast("double").as("_x"): _*)
        .withColumn("_g", struct(groupCols.map(col): _*))
    val keyed = base.filter(col("_x").isNotNull)
      .orderBy(col("_g"), col("_x"))
    // NOT persisted: the index derives from monotonically_increasing_id
    // (nondeterministic), and caching this frame breaks the one guarantee
    // that makes the two consumers below agree — both subtrees containing
    // the identical sort canonicalize to ONE reused exchange inside the
    // single eager action at the end (measured: a persist here returned
    // one group with garbage values; the unpersisted single-action form is
    // the same contract withGlobalIndex's other callers rely on).
    val indexed = Reshape.withGlobalIndex(keyed, "_gi")
      .select(col("_g"), col("_gi"), col("_x"))
    // group extents: first global index + count (the sort is (group, x),
    // so a group's rows are the contiguous index range [first, first+n))
    val extents = indexed
      .groupBy("_g").agg(min("_gi").as("_first"), count(lit(1)).as("_n"))
    // boundary-row shopping list: for each (group, p) the global indexes
    // of the interpolation's lower and upper neighbors + the fraction
    val wanted = extents.select(col("_g"), col("_first"), col("_n"),
        explode(array(ps.map { case (name, p) =>
          struct(lit(name).as("_p"), lit(p).as("_frac"))
        }: _*)).as("_q"))
      .select(col("_g"), col("_q._p").as("_p"),
        (col("_q._frac") * (col("_n") - 1)).as("_pos"),
        col("_first"), col("_n"))
      .select(col("_g"), col("_p"),
        (col("_pos") - floor(col("_pos"))).as("_gfrac"),
        (col("_first") + floor(col("_pos")).cast("long")).as("_lo_gi"),
        (col("_first") + least(floor(col("_pos")).cast("long") + 1,
          col("_n") - 1)).as("_hi_gi"))
    val probes = wanted.select(col("_g"), col("_p"), col("_gfrac"),
        explode(array(
          struct(col("_lo_gi").as("_gi"), lit("lo").as("_role")),
          struct(col("_hi_gi").as("_gi"), lit("hi").as("_role")))).as("_b"))
      .select(col("_g"), col("_p"), col("_gfrac"),
        col("_b._gi").as("_gi"), col("_b._role").as("_role"))
    // one parallel pass over the sorted data picks out the boundary rows
    val picked = indexed.select("_gi", "_x")
      .join(broadcast(probes), Seq("_gi"))
      .groupBy("_g", "_p", "_gfrac")
      .agg(max(when(col("_role") === "lo", col("_x"))).as("_xlo"),
        max(when(col("_role") === "hi", col("_x"))).as("_xhi"))
      .select(col("_g"), col("_p"),
        (col("_xlo") + (col("_xhi") - col("_xlo")) * col("_gfrac")).as("_v"))
    // pivot the p-names back into columns; localCheckpoint frees the
    // sorted-index persist before returning the (tiny) result
    val agged = picked.groupBy("_g")
      .agg(max(when(col("_p") === ps.head._1, col("_v"))).as(ps.head._1),
        ps.tail.map { case (name, _) =>
          max(when(col("_p") === name, col("_v"))).as(name) }: _*)
    val result =
      if (groupCols.isEmpty) {
        // stay total on empty / all-null input: `percentile` over no
        // non-null values is a single NULL row, not zero rows
        val anchor = df.sparkSession.range(1).select(lit(0).as("_k"))
        anchor.join(agged.drop("_g").withColumn("_k", lit(0)), Seq("_k"), "left")
          .drop("_k")
      } else agged.select(groupCols.map(c => col(s"_g.$c").as(c)) ++
        ps.map { case (name, _) => col(name) }: _*)
    // grouped case: groups whose values are ALL null are absent here
    // (they never enter the sort) — callers that must keep them left-join
    // this result onto their complete group frame.
    // Eager localCheckpoint = the single action the consistency argument
    // above needs, and it keeps the (tiny) result from re-running the
    // sort when consumed inside a larger query.
    result.localCheckpoint(true)
  }
}
