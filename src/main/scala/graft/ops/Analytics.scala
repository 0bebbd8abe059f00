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

  val queries: Map[String, Q] = Map(
    // plot_histogram: fixed-width binning + counts.
    "q_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy((floor(col("l_extendedprice") / 5000) * 5000)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // boxplot: five-number summary per group (exact percentiles).
    "q_boxplot_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("lo"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("q1"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("med"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("q3"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy("l_returnflag")),

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
    "q_roc" -> ((s, d) => {
      val e = Tables.events(s, d)
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
        .select(col("event_id"),
          round(col("tp").cast("double") / col("tot_p"), 6).as("tpr"),
          round(col("fp").cast("double") / col("tot_n"), 6).as("fpr"))
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
        .select(col("bin"),
          round(col("tp").cast("double") / col("tot_p"), 6).as("tpr"),
          round(col("fp").cast("double") / col("tot_n"), 6).as("fpr"))
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
          round(log(col("o_totalprice")), 6).as("ln_price"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .as("epoch_days"),
          (col("o_orderpriority") === "1-URGENT").cast("int").as("urgent"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
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
        "SELECT event_id, round(CAST(tp AS DOUBLE) / tot_p, 6) AS tpr, " +
        "round(CAST(fp AS DOUBLE) / tot_n, 6) AS fpr " +
        "FROM r, t ORDER BY event_id"),
    "q_roc_binned" ->
      ("WITH b AS (SELECT CAST(floor(value * 20) AS BIGINT) AS bin, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS n " +
        "FROM events GROUP BY 1), " +
        "t AS (SELECT sum(p) AS tot_p, sum(n) AS tot_n FROM b), " +
        "r AS (SELECT bin, sum(p) OVER w AS tp, sum(n) OVER w AS fp FROM b " +
        "WINDOW w AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT bin, round(CAST(tp AS DOUBLE) / tot_p, 6) AS tpr, " +
        "round(CAST(fp AS DOUBLE) / tot_n, 6) AS fpr " +
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
        "round(ln(o_totalprice), 6) AS ln_price, " +
        "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_days, " +
        "CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS urgent " +
        "FROM orders ORDER BY o_orderkey")
  )
}
