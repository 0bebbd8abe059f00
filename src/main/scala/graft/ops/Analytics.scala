package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Shortcut-layer analytics — SURVEY.md §2.2: the data side of the canned
  * recipes `PolarsAI` exposes as public methods
  * (/root/reference/helpers/shortcuts.py): histogram, boxplot stats,
  * confusion matrix, ROC curve, clean_data, impute_missing_values,
  * generate_features. Charts themselves are out of JVM scope; each chart
  * shortcut's aggregation is what lands here (SURVEY §2.2 mapping).
  */
object Analytics {

  /** PUBLIC API — declarative expectation suite on any frame: each check
    * is (name, violation-predicate Column); the whole suite fuses into
    * ONE conditional-sum aggregate over one scan, regardless of check
    * count, then unpivots via stack. Returns (check_name, n_violations,
    * pass) sorted by name. Predicates should be explicitly null-aware
    * (a NULL predicate row counts as no violation — cast semantics). */
  def validateExpectations(df: org.apache.spark.sql.DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)]): org.apache.spark.sql.DataFrame =
    expectationCounts(df, checks)
      .withColumn("pass", (col("n_violations") === 0).cast("int"))
      .orderBy("check_name")

  /** The fused (check_name, n_violations) core — shared by the public
    * API and q_validate (which unions non-row-local checks in before
    * adding the pass flag). */
  private[ops] def expectationCounts(df: org.apache.spark.sql.DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)]): org.apache.spark.sql.DataFrame = {
    require(checks.nonEmpty, "validateExpectations needs at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, cond), i) =>
      coalesce(sum(cond.cast("long")), lit(0L)).as(s"v$i")
    }
    // escape backslashes BEFORE quotes: Spark SQL string literals treat
    // backslash as an escape (a trailing one would swallow the closing
    // quote; '\t' would silently become a tab in the check name)
    val stackArgs = checks.zipWithIndex
      .map { case ((n, _), i) =>
        s"'${n.replace("\\", "\\\\").replace("'", "\\'")}', v$i"
      }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${checks.size}, $stackArgs) " +
        "AS (check_name, n_violations)"))
  }

  val queries: Map[String, Q] = Map(
    // Expectation-suite validation report — the data-quality gate an
    // ingest pipeline runs before anything downstream reads the table.
    // Scale shape: ALL row-local checks ride ONE scan (conditional sums
    // fused into a single map-side-combined aggregate, unpivoted with
    // stack), uniqueness is one groupBy-count aggregate, referential
    // integrity one anti-join count — 100 TB costs three passes total,
    // not one per check. The testdata's real (l_orderkey, l_linenumber)
    // duplicates make pk_unique FAIL by design: the report proves
    // detection, not just green checkmarks. NULL foreign keys count as
    // fk violations on both engines (a null key can't reference a row).
    "q_validate" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val rowChecks = expectationCounts(li, Seq(
        "discount_range" -> (col("l_discount").isNotNull &&
          (col("l_discount") < 0 || col("l_discount") > 0.1)),
        "price_positive" -> (col("l_extendedprice").isNotNull &&
          col("l_extendedprice") <= 0),
        "quantity_range" -> (col("l_quantity").isNotNull &&
          (col("l_quantity") < 1 || col("l_quantity") > 50)),
        "shipdate_not_null" -> col("l_shipdate").isNull))
      val pkDup = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))
        .select(lit("pk_unique").as("check_name"), col("n_violations"))
      val orphans = li.select("l_orderkey")
        .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_orders").as("check_name"), col("n_violations"))
      rowChecks.unionByName(pkDup).unionByName(orphans)
        .withColumn("pass", (col("n_violations") === 0).cast("int"))
        .orderBy("check_name")
    }),

    // plot_histogram: fixed-width binning + counts.
    "q_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy((floor(col("l_extendedprice") / 5000) * 5000)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // boxplot: five-number summary per group. Exact quartiles via the
    // distributed-sort path (Quantiles.exactCont) — over a continuous
    // double, the `percentile` aggregate's value-count map is the size of
    // the group and merges on one reducer; the sort path is parallel and
    // bounded at any scale. Left join keeps all-null groups total, as the
    // aggregate form did.
    "q_boxplot_stats" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val qs = Quantiles.exactCont(li, col("l_extendedprice"),
        Seq("l_returnflag"),
        Seq(("q1", 0.25), ("med", 0.5), ("q3", 0.75)))
      val mm = li.groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
      // null-SAFE join key: a NULL l_returnflag group (null-injected
      // corpora) has real quartiles in both engines — an EqualTo join
      // would silently null them out on the Spark side only
      mm.join(broadcast(qs),
          mm("l_returnflag") <=> qs("l_returnflag"), "left")
        .select(mm("l_returnflag"), col("lo"),
          round(col("q1"), 4).as("q1"),
          round(col("med"), 4).as("med"),
          round(col("q3"), 4).as("q3"), col("hi"))
        .orderBy("l_returnflag")
    }),

    // plot_confusion_matrix: counts by (truth, pred) pair.
    "q_confusion" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("truth"),
          col("o_orderpriority").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("truth", "pred")),

    // plot_roc_curve — SMALL-FRAME EXACT-PARITY VARIANT ONLY. The
    // per-threshold sweep needs a global cumulative window, i.e. a
    // single-partition stage over every scored row: deliberately retained
    // for point-exact parity with the reference's sklearn curve on frames
    // that fit one task, NEVER the scale path. The primary API at scale is
    // q_roc_binned below (bounded bin table, distributed aggregation);
    // totals join in via a 1-row broadcast, not a second global window.
    // SmallFrame.require makes the contract machine-checked: an oversized
    // input is refused with a pointer at the twin, never silently stalled.
    "q_roc" -> ((s, d) => {
      val e = SmallFrame.require(Tables.events(s, d), "q_roc", "q_roc_binned")
      val isP = when(col("event_type") === "purchase", 1).otherwise(0)
      val w = Window.orderBy(desc("value"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = e.agg(
        sum(isP).as("tot_p"),
        sum(lit(1) - isP).as("tot_n"))
      e.select(col("event_id"),
          sum(isP).over(w).as("tp"),
          sum(lit(1) - isP).over(w).as("fp"))
        .crossJoin(broadcast(totals))
        // single-class corpora have an empty positive (or negative) axis;
        // 0/0 is an ANSI error — the rate is undefined, report NULL
        .select(col("event_id"),
          when(col("tot_p") > 0,
            round(col("tp").cast("double") / col("tot_p"), 6)).as("tpr"),
          when(col("tot_n") > 0,
            round(col("fp").cast("double") / col("tot_n"), 6)).as("fpr"))
        .orderBy("event_id")
    }),

    // plot_roc_curve, PRIMARY (scale) path: scores binned to fixed-width buckets
    // (width 0.05 ⇒ ≤1e4 bins over the score range regardless of row
    // count), per-bin positive/negative counts aggregated distributed
    // (partial+final), then ONE cumulative window over the bounded bin
    // table. The single-partition stage sees bin-cardinality rows, never
    // corpus-cardinality — the curve at bin granularity, fully parallel
    // where it matters.
    "q_roc_binned" -> ((s, d) => {
      val e = Tables.events(s, d)
      val isP = when(col("event_type") === "purchase", 1L).otherwise(0L)
      val bins = e.groupBy(floor(col("value") * 20).cast("long").as("bin"))
        .agg(sum(isP).as("p"), sum(lit(1L) - isP).as("n"))
      val w = Window.orderBy(desc("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = bins.agg(sum("p").as("tot_p"), sum("n").as("tot_n"))
      bins.select(col("bin"),
          sum("p").over(w).as("tp"), sum("n").over(w).as("fp"))
        .crossJoin(broadcast(totals))
        // same single-class guard as q_roc
        .select(col("bin"),
          when(col("tot_p") > 0,
            round(col("tp").cast("double") / col("tot_p"), 6)).as("tpr"),
          when(col("tot_n") > 0,
            round(col("fp").cast("double") / col("tot_n"), 6)).as("fpr"))
        .orderBy("bin")
    }),

    // clean_data: normalize text, drop empties, dedup keeping first id.
    "q_clean_data" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), trim(lower(col("text"))).as("norm"))
        .filter(length(col("norm")) > 0)
        .groupBy("norm")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")),

    // impute_missing_values: mean-fill, with the mean rounded first so both
    // engines impute the identical constant; the 1-row mean is broadcast
    // (scale-safe: no empty-partition global window).
    "q_impute" -> ((s, d) => {
      val withNull = Tables.lineitem(s, d)
        .withColumn("disc_n",
          when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")))
      val m = withNull.agg(round(avg("disc_n"), 6).as("mean_disc"))
      withNull.crossJoin(broadcast(m))
        .groupBy("l_returnflag")
        .agg(count(when(col("disc_n").isNull, lit(1))).as("n_imputed"),
          round(sum(coalesce(col("disc_n"), col("mean_disc"))), 2).as("sum_after"),
          round(avg(coalesce(col("disc_n"), col("mean_disc"))), 6).as("avg_after"))
        .orderBy("l_returnflag")
    }),

    // generate_features: derived model-ready columns.
    "q_features" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          // when-guard BOTH engines: Spark's log() quietly NULLs a
          // non-positive price but DuckDB's ln() RAISES, which would turn
          // one dirty row into a whole-oracle abort
          round(when(col("o_totalprice") > 0, log(col("o_totalprice"))), 6)
            .as("ln_price"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .as("epoch_days"),
          (col("o_orderpriority") === "1-URGENT").cast("int").as("urgent"))
        .orderBy("o_orderkey")),

    // Quality-classifier distillation — the fasttext-style pattern every
    // big curation stack runs: hand rules label a corpus slice, a cheap
    // linear model is fit on scan-speed features, and the MODEL (which
    // generalizes and emits calibrated scores) becomes the production
    // filter. Features are the q_quality_gopher signals (all row-local);
    // the label is the gopher keep verdict itself; the train/test split is
    // the md5(doc_id) reproducible hash split (Curation precedent — the
    // oracle re-derives the exact split counts). spark.ml
    // LogisticRegression fits via distributed L-BFGS (treeAggregate
    // gradient passes — no driver-side data); scoring is a row-local
    // vector dot. Fit quality lands as self-verdicts the oracle asserts:
    // held-out AUC and accuracy over conservative floors (the rule label
    // is a 4-way conjunction, deliberately NOT linearly separable — the
    // floors pin "learned real signal", not perfection).
    "q_quality_classifier" -> ((s, d) => {
      // machine-checked small-frame contract on the corpus input: the
      // exact Mann-Whitney rank window below is single-partition
      SmallFrame.require(Tables.documents(s, d),
        "q_quality_classifier", "q_quality_classifier_binned")
      val (labeled, scoredRaw) = qualityScored(s, d)
      // Held-out AUC as the exact Mann-Whitney rank statistic with
      // average ranks for ties; the rank window runs over the full
      // held-out margin column — single-partition, small-frame compat
      // path. The 100-TB twin is q_quality_classifier_binned below.
      val rw = Window.orderBy("margin")
      val tw = Window.partitionBy("margin")
      val scored = scoredRaw
        .withColumn("avg_rank",
          rank().over(rw) + (count(lit(1)).over(tw) - 1) / 2.0)
      val accAgg = scored.agg(count(lit(1)).as("n_test"),
        sum(col("label")).as("np"),
        sum(when(col("label") === 1.0, col("avg_rank"))).as("rpos"),
        sum(((col("margin") > 0).cast("double") === col("label"))
          .cast("long")).as("n_correct"))
      val out = labeled.agg(count(lit(1)).as("n_docs"),
          sum(col("is_train").cast("long")).as("n_train"))
        .crossJoin(accAgg)
        .select(col("n_docs"), col("n_train"), col("n_test"),
          // single-class held-out sets make the Mann-Whitney denominator
          // zero (an ANSI error) — AUC is undefined there, report NULL
          when(col("np") > 0 && col("np") < col("n_test"),
            (col("rpos") - col("np") * (col("np") + 1) / 2.0) /
              (col("np") * (col("n_test") - col("np"))) >= 0.75)
            .cast("int").as("auc_floor"),
          when(col("n_test") > 0,
            col("n_correct").cast("double") / col("n_test") >= 0.75)
            .cast("int").as("acc_floor"))
        .localCheckpoint(true)
      labeled.unpersist(blocking = false)
      out
    }),

    // The scale twin of q_quality_classifier (same fit, same verdicts):
    // held-out AUC from FIXED-WIDTH margin bins + ONE cumulative window
    // over the bounded bin table — the q_roc_binned shape — instead of a
    // global rank window over every held-out row. Tie-averaged ranks at
    // bin granularity ARE the Mann-Whitney statistic on margins quantized
    // to the bin grid; LR margins span many bins so the 0.75 floors land
    // identically. Bins align at zero (bin >= 0 ⟺ margin >= 0), so
    // accuracy also falls out of the bin aggregate with no per-row pass.
    "q_quality_classifier_binned" -> ((s, d) => {
      val (labeled, scoredRaw) = qualityScored(s, d)
      val agg = binnedAucAgg(scoredRaw)
      val out = labeled.agg(count(lit(1)).as("n_docs"),
          sum(col("is_train").cast("long")).as("n_train"))
        .crossJoin(agg)
        .select(col("n_docs"), col("n_train"), col("n_test"),
          // single-class held-out sets make the Mann-Whitney denominator
          // zero (an ANSI error) — AUC is undefined there, report NULL
          when(col("np") > 0 && col("np") < col("n_test"),
            (col("rpos") - col("np") * (col("np") + 1) / 2.0) /
              (col("np") * (col("n_test") - col("np"))) >= 0.75)
            .cast("int").as("auc_floor"),
          when(col("n_test") > 0,
            col("n_correct").cast("double") / col("n_test") >= 0.75)
            .cast("int").as("acc_floor"))
        .localCheckpoint(true)
      labeled.unpersist(blocking = false)
      out
    }),

    // Sequential ANY-ANCHOR conversion funnel (view → click within 6 h →
    // purchase within 6 h, in event order per user) — the event-analytics
    // staple whose naive encoding is a triple self-join on inequalities
    // (quadratic per hot user). Anchoring each stage on the LAST
    // qualifying prior event (not the first — first-anchor funnels
    // undercount any user whose first view goes stale) makes each stage a
    // running max over the same ordered lookback frame: last_view feeds
    // the click qualifier, qualified clicks feed the purchase qualifier,
    // and Spark plans both Window nodes over ONE user_id shuffle. The
    // (ts, event_id) order makes same-timestamp handling
    // engine-deterministic; the per-user funnel depth is then a single
    // max aggregate.
    "q_funnel" -> ((s, d) => {
      val e = funnelQualified(s, d)
      e.groupBy("user_id")
        .agg(max(
          when(col("event_type") === "purchase"
            && col("ts") <= col("last_click") + funnelH6, 3)
            .when(col("good_click").isNotNull, 2)
            .when(col("event_type") === "view", 1)
            .otherwise(0)).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    }),

    // Funnel stage LATENCY — how long conversions take, not just whether
    // they happen: the view→click and click→purchase transition-time
    // distributions under q_funnel's exact qualification windows. Scale
    // shape: the same ONE user_id shuffle as q_funnel feeds both lookback
    // windows; latencies are exact integer seconds computed row-locally;
    // the output is a 2-row percentile summary (exact percentiles on the
    // integer latencies — interpolation on identical integers is
    // engine-identical under the 4 dp round).
    "q_funnel_time" -> ((s, d) => {
      val e = funnelQualified(s, d)
      val clickLat = e.filter(col("good_click").isNotNull)
        .select(lit("view_to_click").as("stage"),
          expr("(unix_micros(CAST(good_click AS TIMESTAMP)) - " +
            "unix_micros(CAST(last_view AS TIMESTAMP))) div 1000000")
            .as("lat"))
      val purchLat = e.filter(col("event_type") === "purchase"
          && col("ts") <= col("last_click") + funnelH6)
        .select(lit("click_to_purchase").as("stage"),
          expr("(unix_micros(CAST(ts AS TIMESTAMP)) - " +
            "unix_micros(CAST(last_click AS TIMESTAMP))) div 1000000")
            .as("lat"))
      clickLat.unionByName(purchLat)
        .groupBy("stage")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(lat, 0.5)"), 4).as("p50_secs"),
          round(expr("percentile(lat, 0.9)"), 4).as("p90_secs"),
          max("lat").as("max_secs"))
        .orderBy("stage")
    }),

    // Cohort retention — the other event-analytics staple beside the
    // funnel: users grouped by signup week, counted once per
    // subsequent-activity week offset. Scale shape: the cohort table is
    // one aggregate over the signup slice; activity collapses to DISTINCT
    // (user, week) map-side BEFORE the join, so a user's thousandth event
    // in a week costs nothing; one equi-join on user_id; offsets are
    // exact integer day arithmetic on week-truncated Mondays (identical
    // in both engines — no timezone math under the enforced UTC session).
    "q_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
        .select(col("user_id"), date_trunc("week", col("t0")).as("cohort"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      activity.join(cohort, "user_id")
        .filter(col("wk") >= col("cohort"))
        .select(col("cohort").cast("date").as("cohort_week"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int")
            .as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Cohort lifetime value — q_retention's revenue twin: per signup-week
    // cohort, CUMULATIVE purchase revenue per member through each week
    // offset (the LTV curve payback decisions read). Scale shape: events
    // collapse to (user, week) revenue map-side in integer CENTS (exact),
    // one equi-join onto the bounded cohort table, a (cohort, offset)
    // aggregate, and the cumulative window runs over the BOUNDED
    // cohort×offset grid; the per-member normalization is one final
    // division of exact integers.
    "q_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
        .select(col("user_id"), date_trunc("week", col("t0")).as("cohort"))
      val cohortSize = cohort.groupBy("cohort")
        .agg(count(lit(1)).as("n_members"))
      val weekly = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val grid = weekly.join(cohort, "user_id")
        .filter(col("wk") >= col("cohort"))
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int")
            .as("week_offset"))
        // decimal(38,0): the cumulative window below totals a whole
        // cohort's lifetime revenue in CENTS — a 64-bit running sum wraps
        // at ~9.2e16 dollars, a bound that is plausible-not-proven at
        // 100 TB; DuckDB's sum(BIGINT) is already 128-bit (HUGEINT), so
        // this also aligns the engines' intermediate width
        .agg(sum(col("cents").cast("decimal(38,0)")).as("cents"))
      val cum = Window.partitionBy("cohort").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("cum_cents", sum("cents").over(cum))
        .join(broadcast(cohortSize), "cohort")
        .select(col("cohort").cast("date").as("cohort_week"),
          col("week_offset"), col("n_members"),
          (col("cum_cents").cast("double") / (col("n_members") * 100))
            .as("ltv_per_member"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Distribution drift between two corpus snapshots — the
    // training-data-observability gate that catches a silently shifting
    // ingest mix before it reaches a training run. Two deterministic
    // md5-hash snapshots of `documents` stand in for reference/current;
    // the doc-length (n_chars) distribution is binned at fixed width 400
    // and compared per source via PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref)
    // with +0.5 Laplace smoothing so empty bins stay finite. Scale shape:
    // ONE conditional-count aggregate per (source, bin) — the raw corpus
    // is touched exactly once, map-side combined; the window runs over the
    // bounded bin table, never corpus rows. PSI < 0.1 is the standard
    // "stable" reading; planted drift would trip `stable` to 0.
    "q_drift" -> ((s, d) => {
      val wSrc = Window.partitionBy("source")
      val bins = Tables.documents(s, d)
        .withColumn("is_ref",
          expr("substring(md5(CAST(doc_id AS STRING)), 1, 1) < '8'"))
        .groupBy(col("source"), floor(col("n_chars") / 400).as("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("cur_n"))
      bins
        .withColumn("ref_t", sum("ref_n").over(wSrc))
        .withColumn("cur_t", sum("cur_n").over(wSrc))
        .withColumn("n_bins", count(lit(1)).over(wSrc))
        .withColumn("p_ref",
          (col("ref_n") + 0.5) / (col("ref_t") + col("n_bins") * 0.5))
        .withColumn("p_cur",
          (col("cur_n") + 0.5) / (col("cur_t") + col("n_bins") * 0.5))
        .groupBy("source")
        .agg(max("n_bins").cast("long").as("n_bins"),
          round(sum((col("p_cur") - col("p_ref"))
            * log(col("p_cur") / col("p_ref"))), 4).as("psi"))
        .withColumn("stable", (col("psi") < 0.1).cast("int"))
        .orderBy("source")
    }),

    // Smoothed target encoding — the category→number featurization that
    // replaces one-hot for high-cardinality categoricals: each market
    // segment is encoded as its average order value shrunk toward the
    // global mean with strength m=10 (encoded = (n·mean + m·g)/(n + m)),
    // so rare categories don't memorize their few labels. Scale shape:
    // ONE map-side-combined aggregate per category plus a 1-row global
    // prior joined in by broadcast — the encoding table is dimension-
    // sized and itself broadcasts onto any scoring pass downstream.
    "q_target_encode" -> ((s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_totalprice"))
      val prior = joined.agg(avg("o_totalprice").as("g"))
      joined.groupBy("segment")
        .agg(count(lit(1)).as("n"), avg("o_totalprice").as("mean"))
        .join(broadcast(prior))
        .select(col("segment"), col("n"), round(col("mean"), 4).as("raw_mean"),
          round((col("n") * col("mean") + lit(10) * col("g"))
            / (col("n") + lit(10)), 4).as("encoded"),
          round(col("g"), 4).as("global_mean"))
        .orderBy("segment")
    }),

    // Per-group standardization (z-score) with self-verifying output: the
    // post-transform per-group stats must read mean 0 / stddev 1, and the
    // min/max z expose outlier reach. Scale shape: two passes over the
    // column — a per-group moment aggregate whose tiny result broadcasts
    // back onto the rows (never a window over the corpus), then one
    // map-side-combined verification aggregate; at 100 TB both passes run
    // at scan speed.
    "q_standardize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("x"))
      val stats = li.groupBy("grp")
        .agg(avg("x").as("mu"), stddev_samp(col("x")).as("sigma"))
      li.join(broadcast(stats), "grp")
        // nullif-guard: a constant group has sigma = 0.0, and ANSI double
        // 0/0 is NaN on Spark but NULL in DuckDB (the known divergence
        // class) — a NULL sigma (n=1 group) already NULL-propagates
        // identically in both
        .withColumn("z",
          (col("x") - col("mu")) / expr("nullif(sigma, 0.0D)"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          (round(avg("z"), 4) + lit(0.0)).as("mean_z"),
          round(stddev_samp(col("z")), 4).as("std_z"),
          round(min("z"), 4).as("min_z"),
          round(max("z"), 4).as("max_z"))
        .orderBy("grp")
    }),

    // Kaplan-Meier survival — the churn curve done right: users enter at
    // their first-event day, exit at their last, and anyone still active
    // on the corpus' final day is CENSORED (not a churn event) — the
    // distinction naive retention math gets wrong. Scale shape: one
    // map-side-combined per-user aggregate; the duration histogram is
    // bounded by the number of days observed, so the at-risk/cumulative-
    // product windows run over bounded rows regardless of corpus size; totals
    // and the observation-end week join as 1-row broadcasts. The product
    // rides exp∘Σln (the q_cumprod pattern) with an explicit zero-factor
    // flag so S(t) hits exact 0 when the last at-risk user churns.
    "q_survival_km" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.groupBy("user_id").agg(
        min("ts").cast("date").as("b"),
        max("ts").cast("date").as("e"))
      val maxW = ev.agg(max("ts").cast("date").as("mw"))
      val durs = users.crossJoin(broadcast(maxW))
        .select(datediff(col("e"), col("b")).as("t"),
          (col("e") === col("mw")).cast("long").as("censored"))
      val byT = durs.groupBy("t").agg(
        count(lit(1)).as("n_leave"),
        sum(lit(1L) - col("censored")).as("d"))
      val tot = durs.agg(count(lit(1)).as("n_total"))
      val prev = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - coalesce(sum(col("n_leave")).over(prev), lit(0L)))
        .withColumn("factor",
          (col("n_risk") - col("d")).cast("double") / col("n_risk"))
        .withColumn("hit_zero",
          max((col("factor") === 0.0).cast("int")).over(cum))
        .withColumn("surv", when(col("hit_zero") === 1, 0.0).otherwise(
          round(exp(sum(when(col("factor") > 0.0, log(col("factor"))))
            .over(cum)), 6)))
        .select(col("t"), col("n_risk"), col("d").as("n_events"),
          (col("n_leave") - col("d")).as("n_censored"), col("surv"))
        .orderBy("t")
    }),

    // Chi-square independence test + Cramér's V over the
    // segment × priority contingency table — the categorical counterpart
    // of q_ab_test. Scale shape: ONE map-side-combined aggregate builds
    // the bounded contingency table; margins and the statistic are
    // windows/aggregates over that tiny table (corpus rows are touched
    // exactly once); expected counts are single IEEE divisions of exact
    // integers.
    "q_chi2" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"))
      val wSeg = Window.partitionBy("seg")
      val wPrio = Window.partitionBy("prio")
      val wAll = Window.partitionBy()
      cells
        .withColumn("r_tot", sum("n").over(wSeg))
        .withColumn("c_tot", sum("n").over(wPrio))
        .withColumn("n_tot", sum("n").over(wAll))
        .withColumn("n_seg", size(collect_set("seg").over(wAll)))
        .withColumn("n_prio", size(collect_set("prio").over(wAll)))
        .withColumn("e",
          (col("r_tot") * col("c_tot")).cast("double") / col("n_tot"))
        .groupBy("n_seg", "n_prio")
        .agg(max("n_tot").as("n"), count(lit(1)).as("n_cells"),
          sum(pow(col("n") - col("e"), 2) / col("e")).as("chi2raw"))
        .select(col("n"), col("n_cells"),
          ((col("n_seg") - 1) * (col("n_prio") - 1)).cast("long").as("dof"),
          round(col("chi2raw"), 4).as("chi2"),
          // nullif: a 1×K (or K×1) contingency table zeroes the dof
          // factor — NULL in both engines, not Spark-NaN-vs-DuckDB-NULL
          round(sqrt(col("chi2raw") / expr(
            "nullif(CAST(n * least(n_seg - 1, n_prio - 1) AS DOUBLE), 0.0D)")),
            4).as("cramers_v"))
    }),

    // Winsorization — outlier capping at the global [p01, p99] band, the
    // standard robust-feature step before scaling. Scale shape: the two
    // percentile cut points are a 1-row broadcast (rounded 6 dp so the
    // clip boundary is engine-identical); clipping is row-local; the
    // per-group report is one map-side-combined aggregate.
    "q_winsorize" -> ((s, d) => {
      // exact-percentile partials build per-task value-count maps — fan the
      // scan so they don't all fold on the scan's (often single) task
      val li = FanOut(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("x"))
      // global p01/p99 via the distributed-sort quantile path (see
      // q_boxplot_stats) — the aggregate form merged a ~|data|-entry
      // value-count map on a single reducer
      val cuts = Quantiles.exactCont(li, col("x"), Seq.empty,
          Seq(("lo", 0.01), ("hi", 0.99)))
        .select(round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
      li.crossJoin(broadcast(cuts))
        .withColumn("xc", greatest(least(col("x"), col("hi")), col("lo")))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum((col("x") < col("lo")).cast("long")).as("n_clip_low"),
          sum((col("x") > col("hi")).cast("long")).as("n_clip_high"),
          round(avg("x"), 4).as("mean_before"),
          round(avg("xc"), 4).as("mean_after"))
        .orderBy("grp")
    }),

    // Skyline (Pareto frontier) — suppliers not dominated on
    // (revenue, customer reach), the multi-criteria "best options" query.
    // The naive formulation is an O(n²) dominance self-join; the scale
    // form is the classic sort-free trick: group metrics by revenue,
    // run ONE running-max window over the BOUNDED distinct-revenue table
    // (revenue descending), and a row survives iff it tops its own
    // revenue group and strictly beats every higher-revenue group's best
    // reach. Metrics are exact integers (revenue in cents, distinct-first
    // customer counts), so the frontier is engine-identical.
    "q_skyline" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      // EXACT integer revenue: price and discount are 2 dp, so *100 lands
      // a hair from an integer and round() is unambiguous in every
      // engine; the revenue row term is then pure integer multiplication
      // (units of 1e-4 dollars) — no half-cent rounding ever happens
      // per-row term fits a long (~1e9) but a 100 TB supplier's SUM may
      // not: accumulate in DECIMAL(38,0) (oracle: DuckDB's HUGEINT sum) so
      // the total is exact at any scale; revenue is the one final /1e4
      val rev = li.groupBy(col("l_suppkey").as("sk"))
        .agg(sum((round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("decimal(38,0)"))
          .as("rev_units"))
      val reach = li.select(col("l_suppkey").as("sk"), col("o_custkey"))
        .distinct()
        .groupBy("sk").agg(count(lit(1)).as("n_custs"))
      val m = rev.join(reach, "sk")
      val byRev = m.groupBy("rev_units").agg(max("n_custs").as("best_nc"))
      val prev = Window.orderBy(desc("rev_units"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = byRev
        .withColumn("prev_best", max("best_nc").over(prev))
      m.join(frontier, Seq("rev_units"))
        .filter(col("n_custs") === col("best_nc")
          && (col("prev_best").isNull || col("n_custs") > col("prev_best")))
        .select(col("sk"), (col("rev_units") / 10000.0).as("revenue"),
          col("n_custs"))
        .orderBy(desc("revenue"), asc("sk"))
    }),

    // Autocorrelation function of the daily event-value series at lags
    // 1..10 — the periodicity probe run before any seasonal model. Scale
    // shape: the corpus collapses to a BOUNDED daily series (one
    // map-side-combined aggregate, values rounded 2 dp so the series is
    // engine-exact); lagged pairs form on the bounded table via an
    // integer offset self-join (≤ 10·|days| rows); the series mean joins
    // as a 1-row broadcast.
    "q_acf" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(round(sum("value"), 2).as("v"))
      val idx = daily
        .withColumn("t", datediff(col("day"),
          lit("2024-01-01").cast("date")))
      val m = daily.agg(round(avg("v"), 6).as("mu"))
      val lagged = idx.select(col("t"), col("v"))
        .crossJoin(broadcast(m))
        .withColumn("k", explode(expr("sequence(1, 10)")))
        .select(col("k"), (col("t") - col("k")).as("t0"),
          col("v").as("vt"), col("mu"))
        .join(idx.select(col("t").as("t0"), col("v").as("v0")), Seq("t0"))
      val denom = idx.crossJoin(broadcast(m))
        .agg(sum(pow(col("v") - col("mu"), 2)).as("den"))
      lagged.groupBy(col("k").cast("long").as("k"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("vt") - col("mu")) * (col("v0") - col("mu"))).as("num"))
        .crossJoin(broadcast(denom))
        .select(col("k"), col("n_pairs"),
          // nullif: a constant series has den exactly 0.0 — Spark's ANSI
          // 0/0 would be NaN where DuckDB's is NULL
          round(col("num") / expr("nullif(den, 0.0D)"), 4).as("acf"))
        .orderBy("k")
    }),

    // Forecast backtest — a trailing-7-day moving-average forecaster
    // walked forward over the daily series, scored by MAE/MAPE: the
    // baseline every fancier model must beat, and the pattern (bounded
    // per-step history, one pass, no model state) a production backtest
    // harness uses. Scale shape: after the daily collapse everything runs
    // on the bounded day table; the forecast window sums exactly 7
    // rounded values in frame order, so both engines walk identical
    // numbers. MAPE's denominator is nullif-guarded: a day whose rounded
    // sum is exactly 0 contributes NULL in BOTH engines (and is skipped by
    // avg) instead of Spark-NULL-vs-DuckDB-inf divergence.
    "q_backtest_sma" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(round(sum("value"), 2).as("v"))
      val w7 = Window.orderBy("day").rowsBetween(-7, -1)
      daily
        .withColumn("hist", count(lit(1)).over(w7))
        .withColumn("f", round(avg("v").over(w7), 4))
        .filter(col("hist") === 7)
        .agg(count(lit(1)).as("n_evals"),
          round(avg(abs(col("v") - col("f"))), 4).as("mae"),
          round(avg(abs(col("v") - col("f")) / nullif(col("v"), lit(0.0))),
            4).as("mape"))
    }),

    // Change-point detection — the single largest level shift in the
    // daily series, found by scanning every cut point's |mean-before −
    // mean-after| (the two-sample CUSUM heuristic). Scale shape: after
    // the bounded daily collapse, cumulative sums/counts are windows over
    // |days| rows; the argmax is a deterministic (gap desc, day asc)
    // TakeOrdered head. Daily values are rounded 2 dp first so both
    // engines walk identical series.
    "q_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(round(sum("value"), 2).as("v"))
      val cum = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = daily.agg(count(lit(1)).as("n_tot"), sum("v").as("s_tot"))
      daily
        .withColumn("n_le", count(lit(1)).over(cum))
        .withColumn("s_le", sum("v").over(cum))
        .crossJoin(broadcast(tot))
        .filter(col("n_le") < col("n_tot")) // a cut needs both sides
        .select(col("day").as("cut_day"), col("n_le").as("n_before"),
          (col("n_tot") - col("n_le")).as("n_after"),
          round(abs(col("s_le") / col("n_le")
            - (col("s_tot") - col("s_le"))
              / (col("n_tot") - col("n_le"))), 4).as("gap"))
        .orderBy(desc("gap"), asc("cut_day"))
        .limit(1)
    }),

    // Binned Gini coefficient — spend-concentration per market segment
    // (the "do 20% of customers drive 80% of revenue" number) from a
    // trapezoidal Lorenz curve over FIXED-WIDTH spend bins. Scale shape:
    // per-customer spend is one map-side-combined aggregate carried as
    // exact integer cents; the Lorenz accumulation runs over the bounded
    // (segment, bin) table — never a global sort/rank of customers — and
    // every term is exact-integer arithmetic until the single final
    // division, so the 4 dp result is engine-identical.
    "q_gini" -> ((s, d) => {
      val spend = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
        .agg(round(sum("o_totalprice") * 100).cast("long").as("cents"))
      val bins = spend
        .groupBy(col("segment"), floor(col("cents") / 10000000L).as("bin"))
        // s_i in decimal(38,0) from the start: the segment-total window
        // sums below (cum_s, ss) are whole-segment revenue in cents —
        // ~1e18 at 100 TB, one order from a silent 64-bit wrap
        .agg(count(lit(1)).as("n_i"),
          sum(col("cents").cast("decimal(38,0)")).as("s_i"))
      val cum = Window.partitionBy("segment").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seg = Window.partitionBy("segment")
      // Lorenz term in DECIMAL(38,0) (oracle: HUGEINT): at 100 TB cum_s is
      // total-segment cents (~1e18) and n_i millions, so the old LONG
      // product exceeds 2^63 and Spark would wrap silently. 128-bit exact
      // integers on both sides, one cast to double at the end; the
      // denominator is a per-factor double product (each factor < 2^63,
      // double rounding identical in both engines).
      bins
        .withColumn("cum_s", sum("s_i").over(cum))
        .withColumn("nn", sum("n_i").over(seg))
        .withColumn("ss", sum("s_i").over(seg))
        .withColumn("term", col("n_i").cast("decimal(38,0)")
          * (lit(2) * col("cum_s").cast("decimal(38,0)") - col("s_i")))
        .groupBy("segment")
        .agg(max("nn").as("n_users"),
          round(max("ss") / lit(100.0), 2).as("total_spend"),
          round(lit(1.0) - sum("term").cast("double")
            / (max("nn").cast("double") * max("ss").cast("double")), 4)
            .as("gini"))
        .orderBy("segment")
    }),

    // RFM segmentation — the classic customer-value cube: each user
    // scored 1–4 on Recency / Frequency / Monetary against quartile cut
    // points, reported as the (r, f, m) cell histogram. Scale shape: one
    // map-side-combined per-user aggregate; "now" and the 9 quartile cut
    // points are 1-ROW broadcasts (the q_qcut_cutpoints pattern — never a
    // global ntile window over the user base); bucket assignment is then
    // row-local, and the cell histogram is bounded at 4³ rows. Monetary
    // sums and cut points are rounded (2 dp / 6 dp) before any
    // comparison so bucket edges are engine-identical.
    "q_rfm" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.groupBy("user_id").agg(
        max("ts").as("last_ts"),
        count(lit(1)).as("freq"),
        // integer CENTS: all downstream sums/avgs are exact integer math
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0)) * 100).cast("long").as("monetary"))
      val nowDf = ev.agg(max("ts").as("now"))
      val base = users.crossJoin(broadcast(nowDf))
        .select(col("user_id"),
          datediff(col("now").cast("date"), col("last_ts").cast("date"))
            .as("rec"),
          col("freq"), col("monetary"))
      // rec (days) and freq (event counts) have BOUNDED distinct values,
      // so the percentile() aggregate's value-count map stays small; but
      // monetary is effectively unique per user — its map is
      // |users|-cardinality merged on one reducer, the exact death mode
      // q_boxplot_stats documents (review finding). Monetary cut points
      // go through the distributed-sort exact path instead; percentile()
      // and exactCont compute the same linear-interpolated value, so the
      // oracle is unchanged.
      val rfCuts = base.agg(
        round(expr("percentile(rec, 0.25)"), 6).as("r1"),
        round(expr("percentile(rec, 0.5)"), 6).as("r2"),
        round(expr("percentile(rec, 0.75)"), 6).as("r3"),
        round(expr("percentile(freq, 0.25)"), 6).as("f1"),
        round(expr("percentile(freq, 0.5)"), 6).as("f2"),
        round(expr("percentile(freq, 0.75)"), 6).as("f3"))
      val mCuts = Quantiles.exactCont(base, col("monetary"), Seq.empty,
          Seq(("m1", 0.25), ("m2", 0.5), ("m3", 0.75)))
        .select(round(col("m1"), 6).as("m1"), round(col("m2"), 6).as("m2"),
          round(col("m3"), 6).as("m3"))
      val cuts = rfCuts.crossJoin(mCuts)
      def bucket(c: org.apache.spark.sql.Column, q: String) =
        lit(1) + (c > col(s"${q}1")).cast("int") +
          (c > col(s"${q}2")).cast("int") + (c > col(s"${q}3")).cast("int")
      base.crossJoin(broadcast(cuts))
        .select(bucket(col("rec"), "r").as("r_bucket"),
          bucket(col("freq"), "f").as("f_bucket"),
          bucket(col("monetary"), "m").as("m_bucket"), col("monetary"))
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(count(lit(1)).as("n_users"),
          // decimal(38,0) sum: a bucket's total cents is corpus-revenue
          // scale (same wrap class as q_cohort_ltv's cumulative cents)
          round(sum(col("monetary").cast("decimal(38,0)")).cast("double")
            / (count(lit(1)) * 100), 2).as("avg_monetary"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    }),

    // Market-basket association rules — support / confidence / lift over
    // supplier co-occurrence in order baskets, the a-priori first pass.
    // Scale shape: baskets collapse to DISTINCT (order, supplier) FIRST;
    // pairs then form through the shared-ORDER equi-join, bounded by
    // basket size squared per order (never corpus²); per-item supports
    // and the 1-row basket total broadcast onto the bounded pair table.
    // Confidence and lift are single IEEE divisions of exact integers —
    // bit-identical in any engine.
    "q_basket_lift" -> ((s, d) => {
      val bi = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = bi.agg(countDistinct("o").as("n_orders"))
      // persisted: supp feeds TWO broadcast joins whose BroadcastExchange
      // subtrees differ by projection (no exchange reuse) — the aggregate
      // over the basket table previously ran twice (measured 13.4 s +
      // 9.9 s task time at sf0.1; guide §2.4 duplicated subtrees).
      // Dimension-sized; released with `bi` below.
      val supp = bi.groupBy("sk").agg(count(lit(1)).as("supp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // raw pairs shuffled once by s1 (Graph.itemSims rationale: partial
      // counts reduce ~nothing inside o-partitions, so the exchange
      // carries narrower rows and the aggregate runs once)
      val pairs = bi.select(col("o"), col("sk").as("s1"))
        .join(bi.select(col("o"), col("sk").as("s2")), Seq("o"))
        .filter(col("s1") < col("s2"))
        .repartition(s.sparkContext.defaultParallelism, col("s1"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("supp_ab"))
      val out = pairs
        .join(broadcast(supp.select(col("sk").as("s1"), col("supp").as("supp_a"))), Seq("s1"))
        .join(broadcast(supp.select(col("sk").as("s2"), col("supp").as("supp_b"))), Seq("s2"))
        .crossJoin(broadcast(tot))
        .select(col("s1"), col("s2"), col("supp_ab"), col("supp_a"), col("supp_b"),
          round(col("supp_ab").cast("double") / col("supp_a"), 6).as("confidence"),
          // both lift products in decimal(38,0): n_orders·supp_ab and
          // supp_a·supp_b are each ~(corpus orders)² in the worst case —
          // ~1e24 at 100 TB, far past 2^63, a REAL wrap (unlike the
          // bounded sums above). The decimal→double cast afterwards is
          // value-identical to the long path below 2^53
          round((col("n_orders").cast("decimal(38,0)") * col("supp_ab"))
              .cast("double")
            / (col("supp_a").cast("decimal(38,0)") * col("supp_b"))
              .cast("double"), 6).as("lift"))
        .orderBy(desc("lift"), desc("supp_ab"), asc("s1"), asc("s2"))
        .limit(20)
        // eager top-20 materialization so the basket cache can release
        // NOW: the lazy return previously pinned the persist for the rest
        // of the session (no unpersist point; review finding) — same
        // pattern as q_recommend_probe
        .localCheckpoint(true)
      supp.unpersist(blocking = false)
      bi.unpersist(blocking = false)
      out
    }),

    // Seasonality profile — per-event-type hour-of-day activity shape,
    // with each hour's share and its ratio to the uniform baseline
    // (ratio > 1 = peak hour): the daily-rhythm read that schedules batch
    // windows and staffs on-call. Scale shape: ONE map-side-combined
    // (type, hour) aggregate over the corpus; shares and ratios are
    // single divisions of exact integers over the bounded 24×|types|
    // grid, so the profile is engine-identical with no rounding needed.
    "q_seasonality" -> ((s, d) => {
      val byHour = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val wType = Window.partitionBy("event_type")
      byHour
        .withColumn("tot", sum("n").over(wType))
        .select(col("event_type"), col("hr"), col("n"),
          (col("n").cast("double") / col("tot")).as("share"),
          (col("n") * 24).cast("double")./(col("tot")).as("vs_uniform"))
        .orderBy("event_type", "hr")
    }),

    // Per-user behavioral Markov chain — the event-type transition matrix
    // (prev → next counts and row-normalized probabilities), the model
    // behind next-action prediction and session simulators. Scale shape:
    // ONE user_id shuffle feeds the lag window; transitions then collapse
    // through a map-side-combined (prev, next) aggregate whose key space
    // is |event_types|² — bounded — so the probability normalization
    // window runs over the tiny transition table, never event rows.
    "q_markov" -> ((s, d) => {
      val seq = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(seq))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n"))
      trans
        .withColumn("p", round(col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy("prev_type")), 6))
        .orderBy("prev_type", "next_type")
    }),

    // Markov next-action EVALUATION — fit the transition matrix on a
    // hash-split train user population, predict each test transition as
    // the train argmax for its prev state (ties lexicographic), and score
    // accuracy: the minimal honest eval loop for q_markov's model. Scale
    // shape: both matrices are bounded |event_types|² tables; the argmax
    // is a window over the tiny train matrix; the test stream joins the
    // broadcast predictor and accuracy is one exact-integer aggregate.
    "q_markov_eval" -> ((s, d) => {
      val seq = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(seq))
        .filter(col("prev_type").isNotNull)
        .withColumn("is_train",
          expr("substring(md5(CAST(user_id AS STRING)), 1, 1) < 'b'"))
      val trainCounts = trans.filter(col("is_train"))
        .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      val am = Window.partitionBy("prev_type")
        .orderBy(desc("n"), asc("next_type"))
      val pred = trainCounts.withColumn("rk", row_number().over(am))
        .filter(col("rk") === 1)
        .select(col("prev_type"), col("next_type").as("pred_type"))
      // coalesce: zero matching test transitions must read 0 (like the
      // oracle's count FILTER), not the NULL a sum over no true rows
      // yields; nullif guards accuracy when the test split is empty.
      trans.filter(!col("is_train"))
        .join(broadcast(pred), Seq("prev_type"), "left")
        .agg(count(lit(1)).as("n_test"),
          coalesce(sum((col("next_type") === col("pred_type")).cast("long")),
            lit(0L)).as("n_correct"))
        .crossJoin(broadcast(
          trainCounts.agg(sum("n").as("n_train"))))
        .select(col("n_train"), col("n_test"), col("n_correct"),
          (col("n_correct").cast("double") / nullif(col("n_test"), lit(0L)))
            .as("accuracy"))
    }),

    // Two-proportion A/B significance test — deterministic md5 hash of
    // user_id splits the user base 50/50; "conversion" is a purchase share
    // above 20% of the user's events, tested in EXACT integer form
    // (5·n_purch > n_events) so the flag is engine-identical. Scale shape:
    // events collapse to one row per user via a map-side-combined count
    // aggregate, the variant flag is row-local hash arithmetic, and the
    // verdict is ONE 1-row conditional aggregate — the pooled
    // two-proportion z-score and the |z| > 1.96 call are plain IEEE
    // arithmetic on exact integer counts, identical in any engine.
    "q_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum((col("event_type") === "purchase").cast("long")) * 5
          > count(lit(1))).cast("int").as("conv"))
        .withColumn("variant",
          when(expr("substring(md5(CAST(user_id AS STRING)), 1, 1) < '8'"),
            "A").otherwise("B"))
      val a = when(col("variant") === "A", 1L).otherwise(0L)
      val b = lit(1L) - a
      users.agg(
        sum(a).as("n_a"), sum(a * col("conv")).as("conv_a"),
        sum(b).as("n_b"), sum(b * col("conv")).as("conv_b"))
        // degenerate-arm guards: a corpus slice can leave one variant
        // empty (or every user converting / none converting), where the
        // rate and the pooled z are undefined — NULL, not an ANSI error
        .withColumn("rate_a", when(col("n_a") > 0,
          round(col("conv_a").cast("double") / col("n_a"), 6)))
        .withColumn("rate_b", when(col("n_b") > 0,
          round(col("conv_b").cast("double") / col("n_b"), 6)))
        .withColumn("p_pool", when(col("n_a") + col("n_b") > 0,
          (col("conv_a") + col("conv_b")).cast("double")
            / (col("n_a") + col("n_b"))))
        .withColumn("z", when(
          col("n_a") > 0 && col("n_b") > 0 &&
            col("p_pool") > 0 && col("p_pool") < 1,
          round(
            (col("conv_a").cast("double") / col("n_a")
              - col("conv_b").cast("double") / col("n_b"))
              / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
                * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          col("rate_a"), col("rate_b"), col("z"),
          // z NULL (degenerate arm / unanimous pool) means NOT
          // significant, matching the oracle's CASE falling to ELSE 0 —
          // a bare cast would emit NULL here and 0 there
          coalesce((abs(col("z")) > 1.96).cast("int"), lit(0))
            .as("significant"))
    }),

    // Robust anomaly detection over the event stream — median/MAD
    // outlier flagging per event_type (3×1.4826·MAD ≈ 3σ under
    // normality, but unlike mean/stddev the threshold itself isn't
    // dragged by the outliers it's hunting). Scale shape: two exact
    // percentile aggregates on the bounded event_type key (memory scales
    // with per-group DISTINCT values — the q_quantile_approx sketch is
    // the drop-in when that's too wide), stats rejoin the stream via
    // broadcast (tiny per-type table), and the final count is one
    // map-side-combinable aggregate — the full corpus is scanned twice,
    // shuffled never (only per-type counts move).
    "q_anomaly" -> ((s, d) => {
      val ev = Tables.events(s, d).select("event_type", "value")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
          max("med").as("med"))
      ev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(max("med"), 4).as("med"),
          round(max("mad"), 4).as("mad"),
          sum((abs(col("value") - col("med"))
            > lit(3 * 1.4826) * col("mad")).cast("long")).as("n_outliers"))
        .withColumn("outlier_rate",
          round(col("n_outliers").cast("double") / col("n"), 6))
        .orderBy("event_type")
    })
  )

  private def funnelH6 = expr("INTERVAL 6 HOURS")

  /** The funnel qualification windows, shared by q_funnel and
    * q_funnel_time — the two previously carried verbatim copies of this
    * 11-line prelude, and the latency query's "q_funnel's exact
    * qualification windows" promise was enforced only by keeping them
    * manually in sync (review finding). One user_id shuffle feeds both
    * lookback windows; the (ts, event_id) order makes same-timestamp
    * handling engine-deterministic. */
  private def funnelQualified(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val look = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(look))
      .withColumn("good_click",
        when(col("event_type") === "click"
          && col("ts") <= col("last_view") + funnelH6, col("ts")))
      .withColumn("last_click", max(col("good_click")).over(look))
  }

  /** Shared by the two quality-classifier variants: rule-label the corpus
    * (gopher signals, all row-local), fit the LR distillation on the md5
    * train split, and score the held-out rows with a NATIVE margin
    * expression built from the fitted weights (4 doubles + intercept
    * pulled to the driver): production scoring is a codegen'd dot product
    * at scan speed — model.transform's UDF closure is both slower and
    * (Spark 4.1) drags the training summary's session reference into the
    * task closure. Returns (labeled [persisted — caller unpersists],
    * held-out rows with margin). */
  private def qualityScored(s: SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.TextTokenize.register(s)
    val words = "filter(split(text, ' '), x -> length(x) > 0)"
    val stops = "('the', 'a', 'of', 'and', 'to')"
    val labeled = Tables.documents(s, d).select(col("doc_id"),
        // coalesce EVERY feature, not just the ratio ones: a NULL text
        // makes size(split(NULL)) NULL, so an unguarded f_words/f_stop
        // gave those rows margin = NULL with label = 0.0 — the exact
        // variant's (margin > 0) === label comparison then dropped them
        // from n_correct while the binned twin counted the same rows as
        // correct negatives, breaking the same-fit-same-verdicts twin
        // contract (review finding). With all four features coalesced, a
        // null/zero-word doc has well-defined worst-quality features
        // (0.0) rather than an ANSI divide-by-zero or a NULL margin —
        // the fit and the margin stay defined on dirty corpora, and real
        // corpora are unchanged (denominators > 0)
        expr(s"coalesce(CAST(size($words) AS DOUBLE), 0.0)").as("f_words"),
        expr(s"coalesce(round(aggregate($words, CAST(0 AS BIGINT), (a, x) -> a + length(x)) " +
          s"/ CAST(nullif(size($words), 0) AS DOUBLE), 4), 0.0)").as("f_wlen"),
        expr(s"coalesce(CAST(size(filter($words, w -> w IN $stops)) AS DOUBLE), 0.0)")
          .as("f_stop"),
        expr("coalesce(round(CAST(graft_alpha_count(text) AS DOUBLE) / nullif(length(text), 0), 4), 0.0)")
          .as("f_alpha"))
      .withColumn("label",
        (col("f_words").between(30, 10000) && col("f_wlen").between(3.5, 10.0) &&
          col("f_stop") >= 3 && col("f_alpha") >= 0.75).cast("double"))
      .withColumn("is_train",
        expr("substring(md5(CAST(doc_id AS STRING)), 1, 1) < 'c'"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = labeled.filter(col("is_train"))
      // null text yields null features/label, which the LR fit refuses
      // (NOT_NULL_ASSERT on the label) — unlabelable rows can't train
      .na.drop(Seq("f_words", "f_wlen", "f_stop", "f_alpha", "label"))
      .withColumn("features",
        array_to_vector(array(col("f_words"), col("f_wlen"),
          col("f_stop"), col("f_alpha"))))
    // LR cannot fit on zero training rows (empty corpus after pruning) —
    // a zero model scores margin 0 everywhere and the verdict aggregates
    // degrade to NULL floors over an empty held-out set, keeping the
    // query total
    val (b0, w) =
      if (train.isEmpty) (0.0, Array(0.0, 0.0, 0.0, 0.0))
      else {
        val model = new LogisticRegression().setMaxIter(100)
          .setFeaturesCol("features").setLabelCol("label").fit(train)
        (model.intercept, model.coefficients.toArray)
      }
    val margin = lit(b0) + lit(w(0)) * col("f_words") +
      lit(w(1)) * col("f_wlen") + lit(w(2)) * col("f_stop") +
      lit(w(3)) * col("f_alpha")
    (labeled, labeled.filter(!col("is_train")).withColumn("margin", margin))
  }

  /** Binned Mann-Whitney core over (margin, label) rows: width-0.25 bins
    * aligned at zero, per-bin partial+final aggregate, then ONE cumulative
    * window whose input is the bounded bin table (never corpus-cardinality
    * rows). Items in a bin occupy ranks (cum-n_b+1 .. cum) so their
    * tie-averaged rank is cum - (n_b-1)/2. Emits the 1-row
    * (n_test, np, rpos, n_correct) frame both verdict floors derive from.
    * private[graft] so PlanSpec pins the bounded-window shape. */
  private[graft] def binnedAucAgg(
      scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bins = scored
      .groupBy(floor(col("margin") * 4).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("label")).as("p_b"))
    val wb = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum", sum(col("n_b")).over(wb))
      .withColumn("avg_rank", col("cum") - (col("n_b") - 1) / 2.0)
      .agg(sum(col("n_b")).as("n_test"),
        sum(col("p_b")).as("np"),
        sum(col("p_b") * col("avg_rank")).as("rpos"),
        sum(when(col("bin") >= 0, col("p_b"))
          .otherwise(col("n_b") - col("p_b"))).as("n_correct"))
  }

  val oracle: Map[String, String] = Map(
    "q_validate" ->
      ("WITH rc AS (SELECT " +
        "CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT) AS qv, " +
        "CAST(count(*) FILTER (WHERE l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.1)) AS BIGINT) AS dv, " +
        "CAST(count(*) FILTER (WHERE l_extendedprice IS NOT NULL AND l_extendedprice <= 0) AS BIGINT) AS pv, " +
        "CAST(count(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT) AS sv " +
        "FROM lineitem), " +
        "m AS (SELECT 'discount_range' AS check_name, dv AS n_violations FROM rc " +
        "UNION ALL SELECT 'price_positive', pv FROM rc " +
        "UNION ALL SELECT 'quantity_range', qv FROM rc " +
        "UNION ALL SELECT 'shipdate_not_null', sv FROM rc " +
        "UNION ALL SELECT 'pk_unique', CAST(coalesce((SELECT sum(cnt - 1) FROM " +
        "(SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_linenumber)), 0) AS BIGINT) " +
        "UNION ALL SELECT 'fk_orders', (SELECT count(*) FROM lineitem l " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))) " +
        "SELECT check_name, n_violations, " +
        "CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass " +
        "FROM m ORDER BY check_name"),
    "q_quality_classifier" ->
      ("SELECT count(*) AS n_docs, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c') AS n_train, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'c') AS n_test, " +
        "1 AS auc_floor, 1 AS acc_floor FROM documents"),
    // same contract as the exact-rank variant: the oracle re-derives the
    // split counts and asserts the fit-quality self-verdicts hold
    "q_quality_classifier_binned" ->
      ("SELECT count(*) AS n_docs, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c') AS n_train, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'c') AS n_test, " +
        "1 AS auc_floor, 1 AS acc_floor FROM documents"),
    "q_histogram" ->
      ("SELECT CAST(floor(l_extendedprice / 5000) * 5000 AS BIGINT) AS bucket, " +
        "count(*) AS n FROM lineitem GROUP BY 1 ORDER BY bucket"),
    "q_boxplot_stats" ->
      ("SELECT l_returnflag, min(l_extendedprice) AS lo, " +
        "round(quantile_cont(l_extendedprice, 0.25), 4) AS q1, " +
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS med, " +
        "round(quantile_cont(l_extendedprice, 0.75), 4) AS q3, " +
        "max(l_extendedprice) AS hi " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_confusion" ->
      ("SELECT o_orderstatus AS truth, o_orderpriority AS pred, count(*) AS n " +
        "FROM orders GROUP BY 1, 2 ORDER BY truth, pred"),
    "q_roc" ->
      ("WITH t AS (SELECT CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS tot_p, " +
        "CAST(count(*) FILTER (event_type <> 'purchase') AS BIGINT) AS tot_n FROM events), " +
        "r AS (SELECT event_id, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w AS tp, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) OVER w AS fp " +
        "FROM events WINDOW w AS (ORDER BY value DESC, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT event_id, round(CAST(tp AS DOUBLE) / nullif(tot_p, 0), 6) AS tpr, " +
        "round(CAST(fp AS DOUBLE) / nullif(tot_n, 0), 6) AS fpr " +
        "FROM r, t ORDER BY event_id"),
    "q_roc_binned" ->
      ("WITH b AS (SELECT CAST(floor(value * 20) AS BIGINT) AS bin, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS n " +
        "FROM events GROUP BY 1), " +
        "t AS (SELECT sum(p) AS tot_p, sum(n) AS tot_n FROM b), " +
        "r AS (SELECT bin, sum(p) OVER w AS tp, sum(n) OVER w AS fp FROM b " +
        "WINDOW w AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT bin, round(CAST(tp AS DOUBLE) / nullif(tot_p, 0), 6) AS tpr, " +
        "round(CAST(fp AS DOUBLE) / nullif(tot_n, 0), 6) AS fpr " +
        "FROM r, t ORDER BY bin"),
    "q_clean_data" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM " +
        "(SELECT doc_id, trim(lower(text)) AS norm FROM documents) " +
        "WHERE length(norm) > 0 GROUP BY norm ORDER BY keep_id"),
    "q_impute" ->
      ("WITH li AS (SELECT l_returnflag, nullif(l_discount, 0.0) AS disc_n FROM lineitem), " +
        "m AS (SELECT round(avg(disc_n), 6) AS mean_disc FROM li) " +
        "SELECT l_returnflag, count(CASE WHEN disc_n IS NULL THEN 1 END) AS n_imputed, " +
        "round(sum(coalesce(disc_n, mean_disc)), 2) AS sum_after, " +
        "round(avg(coalesce(disc_n, mean_disc)), 6) AS avg_after " +
        "FROM li, m GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_features" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "CAST(month(o_orderdate) AS INTEGER) AS mo, " +
        "round(CASE WHEN o_totalprice > 0 THEN ln(o_totalprice) END, 6) AS ln_price, " +
        "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_days, " +
        "CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS urgent " +
        "FROM orders ORDER BY o_orderkey"),
    "q_funnel" ->
      ("WITH o AS (SELECT user_id, event_id, event_type, ts, " +
        "max(CASE WHEN event_type = 'view' THEN ts END) OVER w AS last_view " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "o2 AS (SELECT *, CASE WHEN event_type = 'click' " +
        "AND ts <= last_view + INTERVAL 6 HOUR THEN ts END AS good_click FROM o), " +
        "o3 AS (SELECT *, max(good_click) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "AS last_click FROM o2), " +
        "u AS (SELECT user_id, max(CASE WHEN event_type = 'purchase' " +
        "AND ts <= last_click + INTERVAL 6 HOUR THEN 3 " +
        "WHEN good_click IS NOT NULL THEN 2 " +
        "WHEN event_type = 'view' THEN 1 ELSE 0 END) AS stage " +
        "FROM o3 GROUP BY user_id) " +
        "SELECT stage, count(*) AS n_users FROM u GROUP BY stage ORDER BY stage"),
    "q_funnel_time" ->
      ("WITH o AS (SELECT user_id, event_id, event_type, ts, " +
        "max(CASE WHEN event_type = 'view' THEN ts END) OVER w AS last_view " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "o2 AS (SELECT *, CASE WHEN event_type = 'click' " +
        "AND ts <= last_view + INTERVAL 6 HOUR THEN ts END AS good_click FROM o), " +
        "o3 AS (SELECT *, max(good_click) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "AS last_click FROM o2), " +
        "lats AS (SELECT 'view_to_click' AS stage, " +
        "(epoch_us(good_click) - epoch_us(last_view)) // 1000000 AS lat " +
        "FROM o2 WHERE good_click IS NOT NULL " +
        "UNION ALL SELECT 'click_to_purchase', " +
        "(epoch_us(ts) - epoch_us(last_click)) // 1000000 " +
        "FROM o3 WHERE event_type = 'purchase' AND ts <= last_click + INTERVAL 6 HOUR) " +
        "SELECT stage, count(*) AS n, " +
        "round(quantile_cont(lat, 0.5), 4) AS p50_secs, " +
        "round(quantile_cont(lat, 0.9), 4) AS p90_secs, " +
        "CAST(max(lat) AS BIGINT) AS max_secs " +
        "FROM lats GROUP BY stage ORDER BY stage"),
    "q_retention" ->
      ("WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        "activity AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events) " +
        "SELECT CAST(a.cohort AS DATE) AS cohort_week, " +
        "CAST(date_diff('day', a.cohort, a.wk) // 7 AS INTEGER) AS week_offset, " +
        "count(*) AS n_users " +
        "FROM (SELECT c.cohort, x.wk FROM activity x JOIN cohort c USING (user_id) " +
        "WHERE x.wk >= c.cohort) a " +
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"),
    "q_cohort_ltv" ->
      ("WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        "cs AS (SELECT cohort, count(*) AS n_members FROM cohort GROUP BY cohort), " +
        "weekly AS (SELECT user_id, date_trunc('week', ts) AS wk, " +
        "sum(CAST(round(value * 100) AS BIGINT)) AS cents " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "grid AS (SELECT c.cohort, " +
        "CAST(date_diff('day', c.cohort, w.wk) // 7 AS INTEGER) AS week_offset, " +
        "sum(cents) AS cents FROM weekly w JOIN cohort c USING (user_id) " +
        "WHERE w.wk >= c.cohort GROUP BY 1, 2), " +
        "cum AS (SELECT cohort, week_offset, " +
        "sum(cents) OVER (PARTITION BY cohort ORDER BY week_offset " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents " +
        "FROM grid) " +
        "SELECT CAST(cum.cohort AS DATE) AS cohort_week, week_offset, " +
        "CAST(n_members AS BIGINT) AS n_members, " +
        "cum_cents / (n_members * 100.0) AS ltv_per_member " +
        "FROM cum JOIN cs ON cum.cohort = cs.cohort " +
        "ORDER BY cohort_week, week_offset"),
    "q_drift" ->
      ("WITH bins AS (SELECT source, CAST(floor(n_chars / 400.0) AS BIGINT) AS bin, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8') AS ref_n, " +
        "count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8') AS cur_n " +
        "FROM documents GROUP BY 1, 2), " +
        "t AS (SELECT source, ref_n, cur_n, " +
        "sum(ref_n) OVER (PARTITION BY source) AS ref_t, " +
        "sum(cur_n) OVER (PARTITION BY source) AS cur_t, " +
        "count(*) OVER (PARTITION BY source) AS n_bins FROM bins), " +
        "p AS (SELECT source, n_bins, " +
        "(ref_n + 0.5) / (ref_t + 0.5 * n_bins) AS p_ref, " +
        "(cur_n + 0.5) / (cur_t + 0.5 * n_bins) AS p_cur FROM t), " +
        "agg AS (SELECT source, CAST(max(n_bins) AS BIGINT) AS n_bins, " +
        "round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 4) AS psi " +
        "FROM p GROUP BY source) " +
        "SELECT source, n_bins, psi, " +
        "CASE WHEN psi < 0.1 THEN 1 ELSE 0 END AS stable " +
        "FROM agg ORDER BY source"),
    "q_target_encode" ->
      ("WITH j AS (SELECT c_mktsegment AS segment, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "prior AS (SELECT avg(o_totalprice) AS g FROM j), " +
        "enc AS (SELECT segment, count(*) AS n, avg(o_totalprice) AS mean FROM j GROUP BY 1) " +
        "SELECT segment, n, round(mean, 4) AS raw_mean, " +
        "round((n * mean + 10 * g) / (n + 10), 4) AS encoded, " +
        "round(g, 4) AS global_mean FROM enc, prior ORDER BY segment"),
    "q_standardize" ->
      ("WITH li AS (SELECT l_returnflag AS grp, l_extendedprice AS x FROM lineitem), " +
        "st AS (SELECT grp, avg(x) AS mu, nullif(stddev_samp(x), 0.0) AS sigma FROM li GROUP BY 1) " +
        "SELECT li.grp, count(*) AS n, " +
        "round(avg((x - mu) / sigma), 4) + 0.0 AS mean_z, " +
        "round(stddev_samp((x - mu) / sigma), 4) AS std_z, " +
        "round(min((x - mu) / sigma), 4) AS min_z, " +
        "round(max((x - mu) / sigma), 4) AS max_z " +
        "FROM li JOIN st ON li.grp = st.grp GROUP BY li.grp ORDER BY li.grp"),
    "q_survival_km" ->
      ("WITH u AS (SELECT user_id, CAST(min(ts) AS DATE) AS b, " +
        "CAST(max(ts) AS DATE) AS e FROM events GROUP BY user_id), " +
        "mw AS (SELECT CAST(max(ts) AS DATE) AS mw FROM events), " +
        "durs AS (SELECT CAST(date_diff('day', b, e) AS INTEGER) AS t, " +
        "CASE WHEN e = mw THEN 1 ELSE 0 END AS censored FROM u, mw), " +
        "byt AS (SELECT t, count(*) AS n_leave, " +
        "CAST(sum(1 - censored) AS BIGINT) AS d FROM durs GROUP BY t), " +
        "tot AS (SELECT count(*) AS n_total FROM durs), " +
        "r AS (SELECT t, n_leave, d, " +
        "n_total - coalesce(sum(n_leave) OVER " +
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk " +
        "FROM byt, tot), " +
        "f AS (SELECT *, (n_risk - d) * 1.0 / n_risk AS factor FROM r), " +
        "s AS (SELECT *, max(CASE WHEN factor = 0.0 THEN 1 ELSE 0 END) OVER w AS hit_zero, " +
        "sum(CASE WHEN factor > 0.0 THEN ln(factor) END) OVER w AS slog FROM f " +
        "WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events, " +
        "CAST(n_leave - d AS BIGINT) AS n_censored, " +
        "CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(exp(slog), 6) END AS surv " +
        "FROM s ORDER BY t"),
    "q_chi2" ->
      ("WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio, " +
        "count(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2), " +
        "m AS (SELECT *, sum(n) OVER (PARTITION BY seg) AS r_tot, " +
        "sum(n) OVER (PARTITION BY prio) AS c_tot, " +
        "sum(n) OVER () AS n_tot, " +
        "count(DISTINCT seg) OVER () AS n_seg, " +
        "count(DISTINCT prio) OVER () AS n_prio FROM cells), " +
        "agg AS (SELECT CAST(max(n_seg) AS INTEGER) AS n_seg, " +
        "CAST(max(n_prio) AS INTEGER) AS n_prio, " +
        "CAST(max(n_tot) AS BIGINT) AS n, count(*) AS n_cells, " +
        "sum(pow(n - (r_tot * c_tot) * 1.0 / n_tot, 2) " +
        "/ ((r_tot * c_tot) * 1.0 / n_tot)) AS chi2raw FROM m) " +
        "SELECT n, n_cells, " +
        "CAST((n_seg - 1) * (n_prio - 1) AS BIGINT) AS dof, " +
        "round(chi2raw, 4) AS chi2, " +
        "round(sqrt(chi2raw / nullif(n * least(n_seg - 1, n_prio - 1), 0)), 4) AS cramers_v " +
        "FROM agg"),
    "q_winsorize" ->
      ("WITH li AS (SELECT l_returnflag AS grp, l_extendedprice AS x FROM lineitem), " +
        "cuts AS (SELECT round(quantile_cont(x, 0.01), 6) AS lo, " +
        "round(quantile_cont(x, 0.99), 6) AS hi FROM li) " +
        "SELECT grp, count(*) AS n, " +
        "count(*) FILTER (x < lo) AS n_clip_low, " +
        "count(*) FILTER (x > hi) AS n_clip_high, " +
        "round(avg(x), 4) AS mean_before, " +
        "round(avg(greatest(least(x, hi), lo)), 4) AS mean_after " +
        "FROM li, cuts GROUP BY grp ORDER BY grp"),
    "q_skyline" ->
      ("WITH li AS (SELECT l_suppkey AS sk, o_custkey, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) " +
        "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rc " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
        "rev AS (SELECT sk, sum(rc) AS rev_units " + // HUGEINT: exact at any scale
        "FROM li GROUP BY sk), " +
        "reach AS (SELECT sk, count(*) AS n_custs FROM " +
        "(SELECT DISTINCT sk, o_custkey FROM li) GROUP BY sk), " +
        "m AS (SELECT rev.sk, rev_units, n_custs FROM rev JOIN reach ON rev.sk = reach.sk), " +
        "g AS (SELECT rev_units, max(n_custs) AS best_nc FROM m GROUP BY 1), " +
        "f AS (SELECT *, max(best_nc) OVER (ORDER BY rev_units DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best FROM g) " +
        "SELECT m.sk, m.rev_units / 10000.0 AS revenue, CAST(m.n_custs AS BIGINT) AS n_custs " +
        "FROM m JOIN f ON m.rev_units = f.rev_units " +
        "WHERE m.n_custs = f.best_nc AND (prev_best IS NULL OR m.n_custs > prev_best) " +
        "ORDER BY revenue DESC, sk"),
    "q_acf" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS v " +
        "FROM events GROUP BY 1), " +
        "idx AS (SELECT date_diff('day', DATE '2024-01-01', day) AS t, v FROM daily), " +
        "m AS (SELECT round(avg(v), 6) AS mu FROM daily), " +
        "den AS (SELECT sum(pow(v - mu, 2)) AS den FROM idx, m), " +
        "lagged AS (SELECT k.k, a.v AS vt, b.v AS v0 FROM idx a " +
        "CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS k) k " +
        "JOIN idx b ON b.t = a.t - k.k) " +
        "SELECT k, count(*) AS n_pairs, " +
        "round(sum((vt - mu) * (v0 - mu)) / nullif(den, 0.0), 4) AS acf " +
        "FROM lagged, m, den GROUP BY k, den ORDER BY k"),
    "q_backtest_sma" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS v " +
        "FROM events GROUP BY 1), " +
        "f AS (SELECT day, v, count(*) OVER w AS hist, " +
        "round(avg(v) OVER w, 4) AS f FROM daily " +
        "WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) " +
        "SELECT count(*) AS n_evals, " +
        "round(avg(abs(v - f)), 4) AS mae, " +
        "round(avg(abs(v - f) / nullif(v, 0)), 4) AS mape " +
        "FROM f WHERE hist = 7"),
    "q_changepoint" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS v " +
        "FROM events GROUP BY 1), " +
        "tot AS (SELECT count(*) AS n_tot, sum(v) AS s_tot FROM daily), " +
        "c AS (SELECT day, " +
        "count(*) OVER w AS n_le, sum(v) OVER w AS s_le FROM daily " +
        "WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT day AS cut_day, n_le AS n_before, n_tot - n_le AS n_after, " +
        "round(abs(s_le / n_le - (s_tot - s_le) / (n_tot - n_le)), 4) AS gap " +
        "FROM c, tot WHERE n_le < n_tot " +
        "ORDER BY gap DESC, cut_day LIMIT 1"),
    "q_gini" ->
      ("WITH spend AS (SELECT c_mktsegment AS segment, o_custkey, " +
        "CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "bins AS (SELECT segment, CAST(floor(cents / 10000000.0) AS BIGINT) AS bin, " +
        "count(*) AS n_i, sum(cents) AS s_i FROM spend GROUP BY 1, 2), " +
        "l AS (SELECT segment, n_i, s_i, " +
        "sum(s_i) OVER (PARTITION BY segment ORDER BY bin " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s, " +
        "sum(n_i) OVER (PARTITION BY segment) AS nn, " +
        "sum(s_i) OVER (PARTITION BY segment) AS ss FROM bins) " +
        "SELECT segment, CAST(max(nn) AS BIGINT) AS n_users, " +
        "round(max(ss) / 100.0, 2) AS total_spend, " +
        "round(1.0 - CAST(sum(CAST(n_i AS HUGEINT) * (2 * CAST(cum_s AS HUGEINT) - s_i)) AS DOUBLE) " +
        "/ (CAST(max(nn) AS DOUBLE) * CAST(max(ss) AS DOUBLE)), 4) AS gini " +
        "FROM l GROUP BY segment ORDER BY segment"),
    "q_rfm" ->
      ("WITH u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS freq, " +
        "CAST(round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) * 100) AS BIGINT) AS monetary " +
        "FROM events GROUP BY user_id), " +
        "nw AS (SELECT max(ts) AS now FROM events), " +
        "b AS (SELECT user_id, " +
        "date_diff('day', CAST(last_ts AS DATE), CAST(now AS DATE)) AS rec, " +
        "freq, monetary FROM u, nw), " +
        "cuts AS (SELECT " +
        "round(quantile_cont(rec, 0.25), 6) AS r1, round(quantile_cont(rec, 0.5), 6) AS r2, " +
        "round(quantile_cont(rec, 0.75), 6) AS r3, " +
        "round(quantile_cont(freq, 0.25), 6) AS f1, round(quantile_cont(freq, 0.5), 6) AS f2, " +
        "round(quantile_cont(freq, 0.75), 6) AS f3, " +
        "round(quantile_cont(monetary, 0.25), 6) AS m1, round(quantile_cont(monetary, 0.5), 6) AS m2, " +
        "round(quantile_cont(monetary, 0.75), 6) AS m3 FROM b), " +
        "scored AS (SELECT " +
        "1 + CAST(rec > r1 AS INTEGER) + CAST(rec > r2 AS INTEGER) + CAST(rec > r3 AS INTEGER) AS r_bucket, " +
        "1 + CAST(freq > f1 AS INTEGER) + CAST(freq > f2 AS INTEGER) + CAST(freq > f3 AS INTEGER) AS f_bucket, " +
        "1 + CAST(monetary > m1 AS INTEGER) + CAST(monetary > m2 AS INTEGER) + CAST(monetary > m3 AS INTEGER) AS m_bucket, " +
        "monetary FROM b, cuts) " +
        "SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_users, " +
        "round(sum(monetary) / (count(*) * 100.0), 2) AS avg_monetary FROM scored " +
        "GROUP BY 1, 2, 3 ORDER BY r_bucket, f_bucket, m_bucket"),
    "q_basket_lift" ->
      ("WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem), " +
        "tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM bi), " +
        "supp AS (SELECT sk, count(*) AS supp FROM bi GROUP BY sk), " +
        "pairs AS (SELECT a.sk AS s1, b.sk AS s2, count(*) AS supp_ab " +
        "FROM bi a JOIN bi b ON a.o = b.o AND a.sk < b.sk GROUP BY 1, 2) " +
        "SELECT s1, s2, supp_ab, " +
        "CAST(sa.supp AS BIGINT) AS supp_a, CAST(sb.supp AS BIGINT) AS supp_b, " +
        "round(supp_ab * 1.0 / sa.supp, 6) AS confidence, " +
        "round((n_orders * supp_ab) * 1.0 / (sa.supp * sb.supp), 6) AS lift " +
        "FROM pairs JOIN supp sa ON pairs.s1 = sa.sk " +
        "JOIN supp sb ON pairs.s2 = sb.sk, tot " +
        "ORDER BY lift DESC, supp_ab DESC, s1, s2 LIMIT 20"),
    "q_markov_eval" ->
      ("WITH t AS (SELECT user_id, event_type AS next_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
        "FROM events), " +
        "tr AS (SELECT *, substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < 'b' AS is_train " +
        "FROM t WHERE prev_type IS NOT NULL), " +
        "tc AS (SELECT prev_type, next_type, count(*) AS n FROM tr " +
        "WHERE is_train GROUP BY 1, 2), " +
        "pred AS (SELECT prev_type, next_type AS pred_type FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY prev_type " +
        "ORDER BY n DESC, next_type) AS rk FROM tc) WHERE rk = 1), " +
        "ev AS (SELECT count(*) AS n_test, " +
        "count(*) FILTER (tr.next_type = pred.pred_type) AS n_correct " +
        "FROM tr LEFT JOIN pred ON tr.prev_type = pred.prev_type " +
        "WHERE NOT is_train) " +
        "SELECT (SELECT CAST(sum(n) AS BIGINT) FROM tc) AS n_train, " +
        "n_test, n_correct, n_correct * 1.0 / nullif(n_test, 0) AS accuracy FROM ev"),
    "q_seasonality" ->
      ("WITH h AS (SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "t AS (SELECT *, sum(n) OVER (PARTITION BY event_type) AS tot FROM h) " +
        "SELECT event_type, hr, n, n * 1.0 / tot AS share, " +
        "(n * 24) * 1.0 / tot AS vs_uniform " +
        "FROM t ORDER BY event_type, hr"),
    "q_markov" ->
      ("WITH t AS (SELECT user_id, event_type AS next_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
        "FROM events), " +
        "c AS (SELECT prev_type, next_type, count(*) AS n FROM t " +
        "WHERE prev_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, next_type, n, " +
        "round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p " +
        "FROM c ORDER BY prev_type, next_type"),
    "q_ab_test" ->
      ("WITH g AS (SELECT user_id, " +
        "CASE WHEN 5 * count(*) FILTER (event_type = 'purchase') > count(*) " +
        "THEN 1 ELSE 0 END AS conv FROM events GROUP BY user_id), " +
        "u AS (SELECT conv, " +
        "CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' " +
        "THEN 'A' ELSE 'B' END AS variant FROM g), " +
        "agg AS (SELECT " +
        "CAST(count(*) FILTER (variant = 'A') AS BIGINT) AS n_a, " +
        "CAST(sum(conv) FILTER (variant = 'A') AS BIGINT) AS conv_a, " +
        "CAST(count(*) FILTER (variant = 'B') AS BIGINT) AS n_b, " +
        "CAST(sum(conv) FILTER (variant = 'B') AS BIGINT) AS conv_b FROM u), " +
        "s AS (SELECT *, (conv_a + conv_b) * 1.0 / nullif(n_a + n_b, 0) AS p_pool FROM agg) " +
        "SELECT n_a, conv_a, n_b, conv_b, " +
        "round(conv_a * 1.0 / nullif(n_a, 0), 6) AS rate_a, " +
        "round(conv_b * 1.0 / nullif(n_b, 0), 6) AS rate_b, " +
        "round((conv_a * 1.0 / nullif(n_a, 0) - conv_b * 1.0 / nullif(n_b, 0)) " +
        "/ nullif(sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z, " +
        "CASE WHEN abs(round((conv_a * 1.0 / nullif(n_a, 0) - conv_b * 1.0 / nullif(n_b, 0)) " +
        "/ nullif(sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)), 0), 4)) > 1.96 " +
        "THEN 1 ELSE 0 END AS significant FROM s"),
    "q_anomaly" ->
      ("WITH med AS (SELECT event_type, median(value) AS med " +
        "FROM events GROUP BY 1), " +
        "mad AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad, " +
        "max(m.med) AS med FROM events e JOIN med m USING (event_type) GROUP BY 1) " +
        "SELECT e.event_type, count(*) AS n, round(max(m.med), 4) AS med, " +
        "round(max(m.mad), 4) AS mad, " +
        "count(*) FILTER (WHERE abs(e.value - m.med) > 3 * 1.4826 * m.mad) AS n_outliers, " +
        "round((count(*) FILTER (WHERE abs(e.value - m.med) > 3 * 1.4826 * m.mad)) " +
        "* 1.0 / count(*), 6) AS outlier_rate " +
        "FROM events e JOIN mad m USING (event_type) " +
        "GROUP BY 1 ORDER BY 1")
  )
}
