package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Window / rolling / temporal grouping — SURVEY.md §2.7.
  *
  * Polars `expr.over / rank / shift / diff / pct_change / cum* / rolling_* /
  * groupby_rolling / groupby_dynamic / upsample` surface. Polars windows are
  * physical-order ops; every Spark counterpart declares its sort key
  * explicitly (ts, event_id) — SURVEY §7.4.1.
  *
  * Scale notes: all per-user windows share ONE shuffle on user_id; Spark
  * plans consecutive window functions over the same (partition, order) spec
  * in a single Window exec. groupby_dynamic maps to the built-in `window()`
  * expression = a map-side bucket computation + ordinary hash aggregate (no
  * per-window state). q_roc needs a global cumulative ordering — inherently
  * a single-partition window at curve granularity; at 100 TB you'd bin
  * scores first (the binned variant is what q_histogram demonstrates).
  */
object Windows {

  private def byUser = Window.partitionBy("user_id")
    .orderBy(col("ts").asc, col("event_id").asc)

  /** The canonical per-user RUNNING frame — one definition so a future
    * tiebreak change moves every consumer together (q_sessionize carried
    * its own verbatim copy of the spec; review finding). */
  private def byUserRun =
    byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  val queries: Map[String, Q] = Map(
    // expr.over(keys): deviation from the group mean, broadcast to rows.
    "q_window_over" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          // round the partition mean first: both engines agree at 6
          // decimals, and subtracting an exact 6-decimal constant from a
          // 2-decimal value keeps round(..,6) away from half-boundaries.
          round(col("value") - round(avg(col("value"))
            .over(Window.partitionBy("user_id")), 6), 6).as("dev"))
        .orderBy("event_id")),

    // rank/dense_rank over natural ties + row_number with a total tiebreak.
    "q_rank" -> ((s, d) => {
      val ties = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"))
      val total = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      val peers = Window.partitionBy("c_nationkey", "c_acctbal")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          rank().over(ties).as("rnk"),
          dense_rank().over(ties).as("drnk"),
          row_number().over(total).as("rn"),
          // polars rank(method='average'): min-rank + half the tie span
          (rank().over(ties) + (count(lit(1)).over(peers) - 1) / 2.0)
            .as("avg_rnk"))
        .orderBy("c_custkey")
    }),

    // shift(±1) → lag/lead; shift_and_fill → lag with a default.
    "q_lag_lead" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          lag("value", 1).over(byUser).as("prev_value"),
          lead("value", 1).over(byUser).as("next_value"),
          lag(col("value"), 1, 0.0).over(byUser).as("prev_filled"))
        .orderBy("event_id")),

    // diff / pct_change.
    "q_diff" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          round(col("value") - lag("value", 1).over(byUser), 4).as("d1"),
          // nullif guards a zero previous value: ANSI Spark would raise
          // DIVIDE_BY_ZERO while the oracle would produce inf — both
          // engines agree on NULL instead. floor-scaling instead of round:
          // both engines floor the identical scaled double, so the result
          // is bit-equal even when the quotient sits on a rounding
          // half-boundary (observed at sf0.1).
          (floor((col("value") / nullif(lag("value", 1).over(byUser), lit(0.0)) - 1)
            * 1000000) / 1000000).as("pct"))
        .orderBy("event_id")),

    // cumsum / cummax / cumcount.
    "q_cumsum" -> ((s, d) => {
      val run = byUserRun
      Tables.events(s, d)
        .select(col("event_id"),
          round(sum("value").over(run), 4).as("cum_sum"),
          max("value").over(run).as("cum_max"),
          min("value").over(run).as("cum_min"),
          count(lit(1)).over(run).as("cum_n"))
        .orderBy("event_id")
    }),

    // cumprod (polars .cumprod()): no product aggregate in Spark SQL —
    // exp(Σ ln) over the running frame, the standard rewrite (SURVEY
    // §2.7). Factors 1+discount stay near 1 so the product is stable.
    "q_cumprod" -> ((s, d) => {
      val byOrder = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice", "l_discount")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        // ONE range exchange on l_orderkey serves the window AND the final
        // global sort: RangePartitioning(l_orderkey) clusters equal keys
        // into one partition (satisfies the window's ClusteredDistribution)
        // and is an ordering prefix of the output sort, so the orderBy
        // below becomes a partition-local sort — no second exchange, and
        // the range sampler reads the bare scan instead of re-executing
        // the window subtree (the old plan's hash exchange + range
        // exchange computed the window twice: once for boundary sampling,
        // once for real).
        .repartitionByRange(col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_discount"),
          round(exp(sum(log(lit(1) + col("l_discount"))).over(byOrder)), 6)
            .as("cumprod_growth"))
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    }),

    // qcut (polars pl.qcut) — SMALL-FRAME EXACT-PARITY VARIANT ONLY.
    // Rank-exact ntile bucketing needs a global order, i.e. a
    // single-partition window that serializes the whole frame through one
    // task: deliberately retained for polars-identical semantics on frames
    // that fit one task, NEVER the scale path. The primary API at scale is
    // q_qcut_cutpoints below (broadcast cut points, no window anywhere);
    // use this one only when exact rank ties matter and the frame is small.
    "q_qcut" -> ((s, d) => {
      val byPrice = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      // machine-checked small-frame contract: refuse oversized inputs
      SmallFrame.require(Tables.orders(s, d), "q_qcut", "q_qcut_cutpoints")
        .select(col("o_orderkey"), ntile(4).over(byPrice).as("quartile"))
        .orderBy("o_orderkey")
    }),

    // qcut, PRIMARY (scale) path: exact per-group quantile cut points (a tiny
    // aggregate — one row per group) broadcast back onto the fact table,
    // bucket assigned by comparison. No global window anywhere: the only
    // shuffle is the cut-point aggregation, and the assignment pass is
    // map-side. Cut points are rounded to 4dp first so both engines
    // compare against the identical constants.
    "q_qcut_cutpoints" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // distributed-sort exact quantiles, NOT the percentile() aggregate:
      // o_totalprice is continuous, so the aggregate's per-group
      // value-count map is |orders|-sized and merges on one reducer — the
      // death mode Quantiles.scala documents, on the query advertised as
      // the PRIMARY scale path (review finding). exactCont interpolates
      // identically, so the oracle is unchanged.
      val cuts = Quantiles.exactCont(o, col("o_totalprice"),
          Seq("o_orderstatus"),
          Seq(("c1", 0.25), ("c2", 0.5), ("c3", 0.75)))
        .select(col("o_orderstatus"), round(col("c1"), 4).as("c1"),
          round(col("c2"), 4).as("c2"), round(col("c3"), 4).as("c3"))
      // LEFT join: exactCont omits a group whose values are ALL NULL (it
      // never enters the sort — documented at its return), and an inner
      // join would then silently drop every order in that group; the
      // oracle's grouped percentile() keeps a NULL-cuts row for it. With
      // the left join those orders see NULL cuts, every `<=` comparison
      // is NULL, and they fall through to bucket 4 — exactly the
      // otherwise-branch the oracle takes (r10 ADVICE finding).
      o.join(broadcast(cuts), Seq("o_orderstatus"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_totalprice") <= col("c1"), 1)
            .when(col("o_totalprice") <= col("c2"), 2)
            .when(col("o_totalprice") <= col("c3"), 3)
            .otherwise(4).as("quartile"))
        .orderBy("o_orderkey")
    }),

    // Sessionization: gap-based session ids per user (30-min inactivity
    // boundary) — the canonical events-pipeline window op. One shuffle by
    // user serves both the lag and the running session counter; the
    // per-session rollup is an ordinary partial+final aggregate.
    "q_sessionize" -> ((s, d) => {
      val run = byUserRun
      val us = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
      val prev = lag(col("ts"), 1).over(byUser)
      val isStart = when(prev.isNull ||
        us(col("ts")) - us(prev) > 1800000000L, 1L).otherwise(0L)
      Tables.events(s, d)
        // ONE range exchange on user_id serves the windows, the
        // per-session aggregate (ClusteredDistribution({user_id,
        // session_id}) — ordering exprs are a subset), and the final
        // (user_id, session_id) sort, which becomes partition-local
        // (q_cumprod rationale: the old hash exchange + final range
        // exchange also re-executed the window subtree for the range
        // sampler).
        .repartitionByRange(col("user_id"))
        .withColumn("is_start", isStart)
        .withColumn("session_id", sum("is_start").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("session_value"),
          min("ts").as("t0"), max("ts").as("t1"))
        .orderBy("user_id", "session_id")
    }),

    // SCD2 snapshotting — event stream → validity intervals: each
    // (user_id, event_type) observation is current from its ts until the
    // user's NEXT observation of the same type; the open interval
    // (valid_to IS NULL) is the current row. One window over the stream's
    // natural partitioning key — a single shuffle by user, per-partition
    // sort, no self-join (the naive encoding is an inequality self-join
    // that explodes quadratically per hot user). This is the batch form
    // of a warehouse dimension-history build; event_id breaks ts ties so
    // interval chaining is deterministic under duplicate timestamps.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      Tables.events(s, d)
        // ONE range exchange serving window + final sort (q_cumprod
        // rationale); the output sort's leading keys are exactly the
        // window partition keys.
        .repartitionByRange(col("user_id"), col("event_type"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          round(col("value"), 2).as("value"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "event_type", "valid_from", "event_id")
    }),

    // groupby.head(n): first rows per group by declared order. Catalyst
    // plans the rank-filter as WindowGroupLimit: a per-partition top-n
    // heap BEFORE the shuffle, so only n rows per group move (asserted in
    // PlanSpec).
    "q_group_head" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice", "l_discount", "l_quantity")
      Tables.lineitem(s, d)
        // ONE range exchange on l_orderkey serving the window and the
        // final (l_orderkey, rn) sort (q_cumprod rationale). The
        // WindowGroupLimit heap moves above the exchange, but total rows
        // shuffled are unchanged: the old shape's partial heap halved the
        // hash exchange and then the rn<=2 output paid a SECOND full range
        // exchange (plus the range sampler re-executing the window+filter
        // subtree) — same bytes over two barriers instead of one.
        .repartitionByRange(col("l_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("l_orderkey", "rn", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "rn")
    }),

    // rolling_mean/median/std over a trailing 4-row frame
    // (shortcuts.py:295-352; frame = rowsBetween(-(n-1), 0)).
    "q_rolling_mean" -> ((s, d) => {
      val w4 = byUser.rowsBetween(-3, 0)
      Tables.events(s, d)
        .select(col("event_id"),
          round(avg("value").over(w4), 4).as("roll_mean"),
          round(sum("value").over(w4), 4).as("roll_sum"),
          min("value").over(w4).as("roll_min"),
          max("value").over(w4).as("roll_max"))
        .orderBy("event_id")
    }),

    "q_rolling_median" -> ((s, d) => {
      val w4 = byUser.rowsBetween(-3, 0)
      Tables.events(s, d)
        .select(col("event_id"),
          round(expr("percentile(value, 0.5)")
            .over(w4), 4).as("roll_med"))
        .orderBy("event_id")
    }),

    "q_rolling_std" -> ((s, d) => {
      val w4 = byUser.rowsBetween(-3, 0)
      Tables.events(s, d)
        .select(col("event_id"),
          round(stddev_samp(col("value")).over(w4), 6).as("roll_std"))
        .orderBy("event_id")
    }),

    // Rolling lag-1 autocorrelation over a trailing 10-row frame — the
    // time-series drift/regime-change signal (is the series trending or
    // mean-reverting right now?). Built from primitive windowed SUMS, not
    // the engines' corr() kernels: Spark accumulates a sliding frame
    // front-to-back while DuckDB uses segment trees, so their corr()
    // outputs differ in FP association — but `value` carries exactly 2
    // decimals, making every sum-of-products a terminating 4-decimal
    // rational that round(..,6) recovers identically in both engines;
    // the closed-form corr is then computed from bit-equal inputs. One
    // shuffle on user_id serves the lag AND all six frame sums (same
    // partition/order spec).
    "q_rolling_corr" -> ((s, d) => {
      val f = byUser.rowsBetween(-9, 0)
      val base = Tables.events(s, d)
        .withColumn("y", lag(col("value"), 1).over(byUser))
      val xm = when(col("y").isNotNull, col("value"))
      def s6(c: org.apache.spark.sql.Column) = round(sum(c).over(f), 6)
      val n = count(col("y")).over(f)
      val sx = s6(xm); val sy = s6(col("y"))
      val sxx = s6(xm * xm); val syy = s6(col("y") * col("y"))
      val sxy = s6(xm * col("y"))
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      base.select(col("event_id"), n.as("n_pairs"),
          // + 0 squashes IEEE negative zero: round() of a tiny negative
          // correlation yields -0.0 in one engine and 0.0 in the other
          // (observed at sf0.1 row 13538); -0.0 + 0 == +0.0 in both
          when(n >= 3 && den > 0,
            round((n * sxy - sx * sy) / sqrt(den), 4) + lit(0d))
            .as("auto_corr"))
        .orderBy("event_id")
    }),

    // ewm_mean (polars exponentially-weighted mean, adjust=true) over a
    // BOUNDED 10-row trailing history — the scale-friendly form: the exact
    // recursive EWMA is inherently sequential per key (unbounded state),
    // while truncating at 10 lags (weight 0.5^9 < 0.2% — numerically the
    // same signal) makes it one windowed expression that rides the same
    // user_id shuffle as the rest of the rolling family. The frame's rows
    // are collected in order and folded with dyadic weights 0.5^i — an
    // EXACT exponent shift per term, so both engines sum identical
    // doubles in identical order; the weight normalizer 2 - 0.5^(L-1) is
    // the closed-form geometric sum (exact dyadic).
    "q_rolling_ewm" -> ((s, d) => {
      val f = byUser.rowsBetween(-9, 0)
      Tables.events(s, d)
        .select(col("event_id"), collect_list("value").over(f).as("l"))
        .select(col("event_id"), size(col("l")).as("n_hist"),
          // guarded: collect_list drops nulls, so an all-null history is
          // EMPTY — and sequence(1, 0) is the DESCENDING [1, 0], whose
          // element_at(l, 1) on an empty list is an error, not a no-op
          when(size(col("l")) > 0, round(expr(
            "aggregate(sequence(1, size(l)), 0D, " +
              "(a, i) -> a + element_at(l, i) * power(0.5D, size(l) - i))")
            / (lit(2.0) - pow(lit(0.5), size(col("l")) - 1)), 4)).as("ewm"))
        .orderBy("event_id")
    }),

    // groupby_rolling(index_column=ts, period=10m): time-based trailing
    // window via rangeBetween on epoch micros.
    "q_rolling_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-600000000L, 0)
      Tables.events(s, d)
        .select(col("event_id"),
          round(sum("value").over(w), 4).as("sum_10m"),
          count(lit(1)).over(w).as("n_10m"))
        .orderBy("event_id")
    }),

    // groupby_dynamic(every=1h, period=1h): tumbling window.
    "q_window_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("w.start").cast("timestamp_ntz").as("ws"),
          col("event_type"), col("n"), col("total"))
        .orderBy("ws", "event_type")),

    // groupby_dynamic(every=10m, period=30m): sliding window (each event in
    // 3 overlapping windows).
    "q_window_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("w.start").cast("timestamp_ntz").as("ws"), col("n"),
          col("total"))
        .orderBy("ws")),

    // upsample: regularize each user's events onto a daily grid
    // (sequence + explode + left join), zero-filled.
    "q_upsample" -> ((s, d) => {
      val e = Tables.events(s, d)
      val grid = e.groupBy("user_id")
        .agg(date_trunc("day", min(col("ts"))).cast("timestamp_ntz").as("d0"),
          date_trunc("day", max(col("ts"))).cast("timestamp_ntz").as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val daily = e
        .groupBy(col("user_id"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy("user_id", "day")
    }),

    // interpolate (polars .interpolate()): linear fill of nulled-out values
    // between the nearest non-null neighbors, edges clamped — composed
    // from forward/backward ignoreNulls windows (SURVEY §4.2: no custom
    // Expression needed).
    "q_interpolate" -> ((s, d) => {
      val masked = when(col("event_type") === "view", lit(null))
        .otherwise(col("value"))
      val back = byUserRun
      val fwd = byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), masked.as("v"),
          row_number().over(byUser).as("rn"))
        .select(col("event_id"), col("v"), col("rn"),
          last(col("v"), ignoreNulls = true).over(back).as("pv"),
          last(when(col("v").isNotNull, col("rn")), ignoreNulls = true)
            .over(back).as("pr"),
          first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
          first(when(col("v").isNotNull, col("rn")), ignoreNulls = true)
            .over(fwd).as("nr"))
        .select(col("event_id"),
          round(when(col("v").isNotNull, col("v"))
            .otherwise(when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                (col("rn") - col("pr")).cast("double") /
                (col("nr") - col("pr")).cast("double"))
              .otherwise(coalesce(col("pv"), col("nv")))), 6).as("interp"))
        .orderBy("event_id")
    }),

    // fill_null(strategy='forward'): per-user forward fill of a nulled-out
    // measure (views dropped), SURVEY §2.9 null handling.
    "q_ffill" -> ((s, d) => {
      val masked = when(col("event_type") === "view", lit(null))
        .otherwise(col("value"))
      val run = byUserRun
      val fwd = byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("event_id"),
          last(masked, ignoreNulls = true).over(run).as("filled"),
          first(masked, ignoreNulls = true).over(fwd).as("bfilled"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_over" ->
      ("SELECT event_id, round(value - round(avg(value) OVER (PARTITION BY user_id), 6), 6) AS dev " +
        "FROM events ORDER BY event_id"),
    "q_rank" ->
      ("SELECT c_custkey, c_nationkey, " +
        "CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS rnk, " +
        "CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS drnk, " +
        "CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn, " +
        "rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) + " +
        "(count(*) OVER (PARTITION BY c_nationkey, c_acctbal) - 1) / 2.0 AS avg_rnk " +
        "FROM customer ORDER BY c_custkey"),
    "q_lag_lead" ->
      ("SELECT event_id, " +
        "lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value, " +
        "lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value, " +
        "lag(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_filled " +
        "FROM events ORDER BY event_id"),
    "q_diff" ->
      ("SELECT event_id, " +
        "round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS d1, " +
        "floor((value / nullif(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) - 1) * 1000000) / 1000000 AS pct " +
        "FROM events ORDER BY event_id"),
    "q_cumsum" ->
      ("SELECT event_id, " +
        "round(sum(value) OVER w, 4) AS cum_sum, " +
        "max(value) OVER w AS cum_max, " +
        "min(value) OVER w AS cum_min, " +
        "count(*) OVER w AS cum_n " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_cumprod" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, " +
        "round(exp(sum(ln(1 + l_discount)) OVER (PARTITION BY l_orderkey " +
        "ORDER BY l_linenumber, l_extendedprice, l_discount " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS cumprod_growth " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount"),
    "q_qcut" ->
      ("SELECT o_orderkey, " +
        "CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile " +
        "FROM orders ORDER BY o_orderkey"),
    "q_qcut_cutpoints" ->
      ("WITH c AS (SELECT o_orderstatus, " +
        "round(quantile_cont(o_totalprice, 0.25), 4) AS c1, " +
        "round(quantile_cont(o_totalprice, 0.5), 4) AS c2, " +
        "round(quantile_cont(o_totalprice, 0.75), 4) AS c3 " +
        "FROM orders GROUP BY o_orderstatus) " +
        "SELECT o.o_orderkey, o.o_orderstatus, " +
        "CASE WHEN o_totalprice <= c1 THEN 1 WHEN o_totalprice <= c2 THEN 2 " +
        "WHEN o_totalprice <= c3 THEN 3 ELSE 4 END AS quartile " +
        "FROM orders o JOIN c USING (o_orderstatus) ORDER BY o_orderkey"),
    "q_sessionize" ->
      ("WITH o AS (SELECT user_id, ts, event_id, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR " +
        "epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_start " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM o) " +
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
        "count(*) AS n_events, round(sum(value), 2) AS session_value, " +
        "CAST(min(ts) AS TIMESTAMP) AS t0, CAST(max(ts) AS TIMESTAMP) AS t1 " +
        "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    "q_scd2" ->
      ("SELECT user_id, event_type, event_id, " +
        "CAST(ts AS TIMESTAMP) AS valid_from, " +
        "CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to, " +
        "round(value, 2) AS value, " +
        "lead(ts) OVER w IS NULL AS is_current " +
        "FROM events WINDOW w AS (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) " +
        "ORDER BY user_id, event_type, valid_from, event_id"),
    "q_group_head" ->
      ("WITH r AS (SELECT l_orderkey, l_linenumber, l_extendedprice, " +
        "CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice, l_discount, l_quantity) AS INTEGER) AS rn " +
        "FROM lineitem) " +
        "SELECT l_orderkey, rn, l_linenumber, l_extendedprice FROM r " +
        "WHERE rn <= 2 ORDER BY l_orderkey, rn"),
    "q_rolling_mean" ->
      ("SELECT event_id, round(avg(value) OVER w, 4) AS roll_mean, " +
        "round(sum(value) OVER w, 4) AS roll_sum, " +
        "min(value) OVER w AS roll_min, max(value) OVER w AS roll_max " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_rolling_median" ->
      ("SELECT event_id, round(quantile_cont(value, 0.5) OVER w, 4) AS roll_med " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_rolling_std" ->
      ("SELECT event_id, round(stddev_samp(value) OVER w, 6) AS roll_std " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_rolling_corr" ->
      ("WITH b AS (SELECT event_id, user_id, ts, value AS x, " +
        "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y FROM events), " +
        "m AS (SELECT event_id, count(y) OVER f AS n, " +
        "round(sum(CASE WHEN y IS NOT NULL THEN x END) OVER f, 6) AS sx, " +
        "round(sum(y) OVER f, 6) AS sy, " +
        "round(sum(CASE WHEN y IS NOT NULL THEN x * x END) OVER f, 6) AS sxx, " +
        "round(sum(y * y) OVER f, 6) AS syy, " +
        "round(sum(CASE WHEN y IS NOT NULL THEN x * y END) OVER f, 6) AS sxy " +
        "FROM b WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_id, n AS n_pairs, " +
        "CASE WHEN n >= 3 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 " +
        "THEN round((n * sxy - sx * sy) / " +
        "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) + 0 END AS auto_corr " +
        "FROM m ORDER BY event_id"),
    "q_rolling_ewm" ->
      // list_filter strips NULL history values: Spark's collect_list
      // DROPS nulls while DuckDB's list() KEEPS them, so on a corpus with
      // null values the weights and len(l) would diverge (review finding;
      // the frame still counts null ROWS identically in both engines)
      ("WITH h AS (SELECT event_id, list_filter(list(value) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), " +
        "x -> x IS NOT NULL) AS l " +
        "FROM events) " +
        "SELECT event_id, CAST(len(l) AS INTEGER) AS n_hist, " +
        "round(list_sum(list_transform(generate_series(1, len(l)), " +
        "i -> l[i] * 0.5 ** (len(l) - i))) / (2 - 0.5 ** (len(l) - 1)), 4) AS ewm " +
        "FROM h ORDER BY event_id"),
    "q_rolling_time" ->
      ("SELECT event_id, round(sum(value) OVER w, 4) AS sum_10m, " +
        "count(*) OVER w AS n_10m " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_window_tumbling" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS total " +
        "FROM events GROUP BY 1, 2 ORDER BY ws, event_type"),
    "q_window_sliding" ->
      ("SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000 - j * 600000000) AS ws, " +
        "count(*) AS n, round(sum(value), 2) AS total " +
        "FROM events, (SELECT unnest([0, 1, 2]) AS j) " +
        "WHERE TRUE GROUP BY 1 ORDER BY ws"),
    "q_upsample" ->
      ("WITH bounds AS (SELECT user_id, " +
        "CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0, " +
        "CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1 " +
        "FROM events GROUP BY user_id), " +
        "grid AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds), " +
        "daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "count(*) AS n, round(sum(value), 2) AS total FROM events GROUP BY 1, 2) " +
        "SELECT g.user_id, g.day, coalesce(d.n, 0) AS n, coalesce(d.total, 0.0) AS total " +
        "FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day " +
        "ORDER BY g.user_id, g.day"),
    "q_interpolate" ->
      ("WITH base AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events), " +
        "x AS (SELECT event_id, v, rn, " +
        "last_value(v IGNORE NULLS) OVER b AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER b AS pr, " +
        "first_value(v IGNORE NULLS) OVER f AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER f AS nr " +
        "FROM base WINDOW " +
        "b AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "f AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT event_id, round(CASE WHEN v IS NOT NULL THEN v " +
        "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN " +
        "pv + (nv - pv) * CAST(rn - pr AS DOUBLE) / CAST(nr - pr AS DOUBLE) " +
        "ELSE coalesce(pv, nv) END, 6) AS interp " +
        "FROM x ORDER BY event_id"),
    "q_ffill" ->
      ("SELECT event_id, last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled, " +
        "first_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfilled " +
        "FROM events ORDER BY event_id")
  )
}
