package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Join strategies — SURVEY.md §2.5.
  *
  * Polars `df.join(how = inner|left|outer|semi|anti|cross)` plus `join_asof`;
  * golden inner-join+argmax semantics pinned by
  * /root/reference/examples/with_multiple_dataframes.py:7-27.
  *
  * Scale notes: dimension sides (customer, part, nation, region, supplier)
  * are orders of magnitude smaller than fact tables, so they are explicitly
  * `broadcast()` — no shuffle of the fact side at any SF. The as-of join is
  * the union-tag + running-last pattern: ONE shuffle of events by user_id,
  * no range explosion, no driver collect — it scales linearly with rows and
  * is skew-bounded by per-user event counts (AQE handles stragglers).
  */
object Joins {

  val queries: Map[String, Q] = Map(
    // Inner equi-join fact→dim, dim broadcast.
    "q_join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    // Left outer join keeping customers with no orders; count(col) skips the
    // null-extended rows in both engines.
    "q_join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total"))
        .orderBy("c_custkey")),

    // Full outer join over distinct key sets with presence flags.
    "q_join_full" -> ((s, d) => {
      val cn = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey")).distinct()
        .withColumn("has_cust", lit(true))
      val sn = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey")).distinct()
        .withColumn("has_supp", lit(true))
      cn.join(sn, Seq("nationkey"), "full")
        .select(col("nationkey"),
          coalesce(col("has_cust"), lit(false)).as("has_cust"),
          coalesce(col("has_supp"), lit(false)).as("has_supp"))
        .orderBy("nationkey")
    }),

    // Left semi (EXISTS) / left anti (NOT EXISTS).
    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // Cartesian product of two tiny dims.
    "q_join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")),

    // Pure theta (non-equi) join — BNLJ on a tiny broadcast side.
    "q_join_range" -> ((s, d) => {
      val a = Tables.nation(s, d).select(col("n_nationkey").as("k"))
      val b = Tables.nation(s, d).select(col("n_nationkey").as("j"))
      a.join(broadcast(b), col("j") < col("k"), "left")
        .groupBy("k").agg(count(col("j")).as("n_smaller"))
        .orderBy("k")
    }),

    // Equi-join with a range residual (band join): the equi key keeps it a
    // hash/broadcast join; the band condition is a post-join filter, so no
    // cross-product blowup at scale.
    "q_join_band" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity").between(col("p_size") - 5, col("p_size") + 5))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")),

    // Salted shuffle join — the JOIN-side skew lever (q_group_agg_salted
    // covers aggregation): when one probe key dominates, a plain shuffle
    // join lands the whole hot key in ONE reduce task. Salting splits it:
    // the probe side gets a deterministic per-row salt in [0, R), the
    // build side is replicated R times (explode over sequence), and the
    // join key becomes (key, salt) — the hot key spreads over R tasks.
    // The joined multiset is EXACTLY the unsalted join (every probe row
    // meets every matching build row at exactly one salt), so the oracle
    // is the plain join. The merge hint pins a shuffle join: broadcast IS
    // the skew fix when the build side fits, salting is for when it
    // doesn't at 100 TB — AQE's skewedJoin does this adaptively, salting
    // is the explicit form for when stats mislead or AQE is off.
    "q_join_skew_salted" -> ((s, d) => {
      val r = 8
      val probe = Tables.lineitem(s, d)
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(r.toLong)))
      val build = Tables.orders(s, d)
        .withColumn("salt", explode(sequence(lit(0L), lit((r - 1).toLong))))
      probe.join(build.hint("merge"),
          col("l_orderkey") === col("o_orderkey") &&
            probe("salt") === build("salt"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          expr("round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)")
            .as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // As-of join (backward, per-user): every purchase picks the most recent
    // click at-or-before its timestamp. Union-tag + running
    // last(_, ignoreNulls) — the scalable Spark encoding of polars
    // join_asof(strategy='backward', by='user_id') (SURVEY §2.5, §7.4.2).
    // Clicks sort before purchases at equal ts (is_p tiebreak) to match
    // ASOF's inclusive `>=` bound.
    "q_join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_p"),
          col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("double").as("click_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("is_p"),
          lit(null).cast("long").as("event_id"),
          col("event_id").as("click_id"),
          col("value").as("click_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("is_p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_value", last(col("click_value"), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id"), col("user_id"),
          col("asof_click").as("click_id"), col("asof_value").as("click_value"))
        .orderBy("event_id")
    }),

    // join_asof(strategy='forward'): first click at-or-after each purchase.
    // Same union-tag pattern run in reverse time order.
    "q_join_asof_fwd" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_p"), col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("double").as("click_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("is_p"),
          lit(null).cast("long").as("event_id"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("is_p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_value", last(col("click_value"), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id"), col("user_id"),
          col("asof_click").as("click_id"), col("asof_value").as("click_value"))
        .orderBy("event_id")
    }),

    // join_asof(strategy='nearest'): closer of the backward and forward
    // matches, backward winning exact-distance ties. Both directions come
    // from the same union-tagged frame — two window specs, one shuffle.
    "q_join_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_p"), col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("timestamp_ntz").as("click_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("is_p"),
          lit(null).cast("long").as("event_id"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      val wB = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("is_p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("is_p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val us = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
      purchases.unionByName(clicks)
        .withColumn("b_id", last(col("click_id"), ignoreNulls = true).over(wB))
        .withColumn("b_ts", last(col("click_ts"), ignoreNulls = true).over(wB))
        .withColumn("f_id", last(col("click_id"), ignoreNulls = true).over(wF))
        .withColumn("f_ts", last(col("click_ts"), ignoreNulls = true).over(wF))
        .filter(col("is_p") === 1)
        .select(col("event_id"), col("user_id"),
          when(col("b_id").isNull, col("f_id"))
            .when(col("f_id").isNull, col("b_id"))
            .when(us(col("ts")) - us(col("b_ts")) <= us(col("f_ts")) - us(col("ts")),
              col("b_id"))
            .otherwise(col("f_id")).as("click_id"))
        .orderBy("event_id")
    }),

    // join_asof with tolerance: like q_join_asof but matches farther than
    // 1 hour back are dropped (polars join_asof(tolerance=...)). The asof
    // pick itself is unchanged — a too-old latest click yields null rather
    // than falling back to an even older one.
    "q_join_asof_tol" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_p"), col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("timestamp_ntz").as("click_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("is_p"),
          lit(null).cast("long").as("event_id"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("is_p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .withColumn("in_tol",
          unix_micros(col("asof_ts").cast("timestamp")) >=
            unix_micros(col("ts").cast("timestamp")) - 3600000000L)
        .select(col("event_id"), col("user_id"),
          when(col("in_tol"), col("asof_click")).as("click_id"))
        .orderBy("event_id")
    }),

    // Interval OVERLAP join — which user pairs were active at the same
    // time (co-presence over 30-min-gap sessions). The naive encoding is
    // a θ-join on two inequalities (a CartesianProduct at any scale);
    // the scale form is the standard interval-decomposition: each session
    // explodes into the HOUR buckets it touches (bounded by its own
    // duration), candidate pairs form only inside co-occupied buckets via
    // a plain equi-join, multi-bucket duplicates collapse distinct-first,
    // and the exact overlap predicate + micros arithmetic run on the
    // surviving candidates only. All integers — engine-identical. Skew
    // lever: a "whole fleet online" hour concentrates pairs in one
    // bucket; sub-bucket salting or a bucket cap (Dedup.oversizedBuckets
    // pattern) bounds it.
    "q_join_overlap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val usc = (c: org.apache.spark.sql.Column) =>
        unix_micros(c.cast("timestamp"))
      val prev = lag(col("ts"), 1).over(w)
      val isStart = when(prev.isNull ||
        usc(col("ts")) - usc(prev) > 1800000000L, 1L).otherwise(0L)
      val sessions = Tables.events(s, d)
        .withColumn("is_start", isStart)
        .withColumn("sid", sum("is_start").over(run))
        .groupBy(col("user_id").as("u"), col("sid"))
        .agg(usc(min("ts")).as("st"), usc(max("ts")).as("en"))
      val buck = sessions
        .select(col("u"), col("sid"), col("st"), col("en"),
          explode(expr("sequence(st div 3600000000, en div 3600000000)"))
            .as("bk"))
      val pairs = buck
        .select(col("bk"), col("u").as("ua"), col("sid").as("sa"),
          col("st").as("sta"), col("en").as("ena"))
        .join(buck.select(col("bk"), col("u").as("ub"), col("sid").as("sb"),
          col("st").as("stb"), col("en").as("enb")), Seq("bk"))
        .filter(col("ua") < col("ub")
          && col("sta") <= col("enb") && col("stb") <= col("ena"))
        .select("ua", "sa", "sta", "ena", "ub", "sb", "stb", "enb")
        .distinct()
      pairs
        .select(col("ua"), col("ub"),
          (least(col("ena"), col("enb"))
            - greatest(col("sta"), col("stb"))).as("ov_us"))
        .groupBy("ua", "ub")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(ov_us) div 1000000").as("overlap_secs"))
        .orderBy(desc("overlap_secs"), desc("n_pairs"), asc("ua"), asc("ub"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    // the oracle IS the naive θ-join — small data makes it feasible, and
    // hash parity proves the bucket decomposition loses no pair
    "q_join_overlap" ->
      ("WITH o AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR " +
        "epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_start " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(is_start) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o), " +
        "sess AS (SELECT user_id AS u, sid, epoch_us(min(ts)) AS st, " +
        "epoch_us(max(ts)) AS en FROM s GROUP BY 1, 2), " +
        "p AS (SELECT a.u AS ua, b.u AS ub, " +
        "least(a.en, b.en) - greatest(a.st, b.st) AS ov " +
        "FROM sess a JOIN sess b ON a.u < b.u AND a.st <= b.en AND b.st <= a.en) " +
        "SELECT ua, ub, count(*) AS n_pairs, " +
        "CAST(sum(ov) // 1000000 AS BIGINT) AS overlap_secs " +
        "FROM p GROUP BY 1, 2 " +
        "ORDER BY overlap_secs DESC, n_pairs DESC, ua, ub LIMIT 20"),
    "q_join_inner" ->
      ("SELECT o_orderkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q_join_left" ->
      ("SELECT c_custkey, c_name, count(o_orderkey) AS n_orders, " +
        "round(sum(coalesce(o_totalprice, 0)), 2) AS total " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "q_join_full" ->
      ("SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, " +
        "c.nationkey IS NOT NULL AS has_cust, " +
        "s.nationkey IS NOT NULL AS has_supp " +
        "FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer) c " +
        "FULL JOIN (SELECT DISTINCT s_nationkey AS nationkey FROM supplier) s " +
        "ON c.nationkey = s.nationkey ORDER BY nationkey"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "q_join_cross" ->
      ("SELECT r_name, n_name FROM region CROSS JOIN nation " +
        "ORDER BY r_name, n_name"),
    "q_join_range" ->
      ("SELECT a.n_nationkey AS k, count(b.n_nationkey) AS n_smaller " +
        "FROM nation a LEFT JOIN nation b ON b.n_nationkey < a.n_nationkey " +
        "GROUP BY a.n_nationkey ORDER BY k"),
    "q_join_band" ->
      ("SELECT p_brand, count(*) AS n FROM lineitem JOIN part " +
        "ON l_partkey = p_partkey AND l_quantity BETWEEN p_size - 5 AND p_size + 5 " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_join_skew_salted" ->
      ("SELECT o_orderstatus, count(*) AS n_lines, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_join_asof" ->
      ("SELECT p.event_id, p.user_id, c.event_id AS click_id, " +
        "c.value AS click_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id"),
    "q_join_asof_fwd" ->
      ("SELECT p.event_id, p.user_id, c.event_id AS click_id, " +
        "c.value AS click_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND p.ts <= c.ts ORDER BY p.event_id"),
    "q_join_asof_nearest" ->
      ("WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT * FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, " +
        "CASE WHEN b.event_id IS NULL THEN f.event_id " +
        "WHEN f.event_id IS NULL THEN b.event_id " +
        "WHEN epoch_us(p.ts) - epoch_us(b.ts) <= epoch_us(f.ts) - epoch_us(p.ts) " +
        "THEN b.event_id ELSE f.event_id END AS click_id " +
        "FROM p " +
        "ASOF LEFT JOIN c b ON p.user_id = b.user_id AND p.ts >= b.ts " +
        "ASOF LEFT JOIN c f ON p.user_id = f.user_id AND p.ts <= f.ts " +
        "ORDER BY p.event_id"),
    "q_join_asof_tol" ->
      ("SELECT p.event_id, p.user_id, " +
        "CASE WHEN epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000 THEN c.event_id END AS click_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id")
  )
}
