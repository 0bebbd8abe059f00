package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Sort / top-k / set ops / melt / pivot / explode / dummies — SURVEY.md §2.8.
  *
  * Polars sort/top_k/concat/melt/pivot/explode/to_dummies surface.
  * Scale notes: q_topk compiles to TakeOrderedAndProject (per-partition heap,
  * no global sort shuffle); unions are metadata-only (no shuffle); pivot uses
  * an explicit value list so Spark skips the extra distinct-values job.
  */
object Reshape {

  /** Global 1-based BIGINT row index over a total order, without leaving
    * Tungsten (r1/r2 used rdd.zipWithIndex — correct 2-pass shape, but the
    * RDD detour deserializes every row): the orderBy range-partitions the
    * frame; monotonically_increasing_id() then encodes
    * (partitionId << 33 | partition-local row number) in sorted order; the
    * per-partition row counts are a tiny aggregate (one row per partition)
    * turned into running offsets by a window over that partition-count-sized
    * frame and broadcast back; the global index is offset + local + 1.
    * Still two passes, but both subtrees share the identical sort exchange
    * (ReusedExchange), every stage stays in whole-stage codegen, and the
    * index is LongType — no 2^31 wrap at the >2B-row scale this exists for. */
  private[graft] def withGlobalIndex(df: DataFrame, name: String): DataFrame = {
    // Machine-checked precondition (r7 ADVICE): the (partition, local-row)
    // encoding below is only a TOTAL order if the input was globally
    // sorted (orderBy → range partitioning). A caller passing an unsorted
    // frame would get arbitrary partition-order indexes silently — refuse
    // instead. The check walks ordering-preserving wrappers to find the
    // global Sort in the analyzed plan; no job runs.
    require(hasGlobalSort(df.queryExecution.analyzed),
      "withGlobalIndex requires a globally sorted input (call .orderBy " +
        "first): the index encodes (range partition, local row) order")
    val localMask = (1L << 33) - 1
    val mid = df.withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33))
    val offsets = mid.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum("_cnt").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_off")
    mid.join(broadcast(offsets), "_pid")
      .withColumn(name,
        col("_off") + col("_mid").bitwiseAND(lit(localMask)) + lit(1L))
      .drop("_pid", "_mid", "_off")
  }

  /** True iff the plan's data order is pinned by a global Sort, looking
    * through the wrappers that preserve row order (projections, aliases,
    * limits). */
  private def hasGlobalSort(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case s: Sort => s.global
      case p: Project => hasGlobalSort(p.child)
      case a: SubqueryAlias => hasGlobalSort(a.child)
      case l: GlobalLimit => hasGlobalSort(l.child)
      case l: LocalLimit => hasGlobalSort(l.child)
      case _ => false
    }
  }

  val queries: Map[String, Q] = Map(
    // Multi-key sort with mixed direction (polars sort(by, descending)).
    "q_sort_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate",
          "l_quantity")
        .orderBy(desc("l_returnflag"), asc("l_shipdate"), asc("l_orderkey"),
          asc("l_linenumber"), asc("l_quantity"))),

    // top_k(k, by) → orderBy().limit() → TakeOrderedAndProject.
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)),

    // Deterministic epoch shuffle — reproducible training-data ordering:
    // shuffle_key = md5(epoch || doc_id) is a uniform, seed-switchable
    // total order (new epoch string → statistically independent new
    // order over the SAME corpus, no RNG state to coordinate across
    // executors). The head of the order is TakeOrderedAndProject — a
    // per-partition top-k heap, no global sort materialization; a full
    // epoch write at scale is the same key fed to repartitionByRange +
    // sortWithinPartitions. OpsSpec asserts epoch1/epoch2 orders differ
    // while the underlying sets match.
    "q_shuffle_det" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(lit("epoch1|"), col("doc_id").cast("string")))
            .as("shuffle_key"),
          col("source"))
        .orderBy("shuffle_key")
        .limit(200)),

    // Vertical concat (pl.concat how=vertical / vstack).
    "q_union" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_name").as("name"), lit("customer").as("src"))
        .unionByName(Tables.supplier(s, d)
          .select(col("s_name").as("name"), lit("supplier").as("src")))
        .orderBy("name", "src")),

    // Diagonal concat (pl.concat how=diagonal): schema-merging union.
    "q_union_diag" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("key"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"), col("s_nationkey").as("nationkey"))
      c.unionByName(sup, allowMissingColumns = true).orderBy("key", "name")
    }),

    // Horizontal concat (pl.concat how=horizontal / hstack). Positional
    // alignment is meaningless on unordered Spark frames (SURVEY §2.8), so
    // both sides carry an explicit order and are zipped by position via
    // the Tungsten-native 2-pass global index (withGlobalIndex below).
    "q_hstack" -> ((s, d) => {
      val left = withGlobalIndex(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name")).orderBy("c_custkey"), "pos")
        .select("pos", "c_custkey", "c_name")
      val right = withGlobalIndex(Tables.customer(s, d)
          .select(col("c_acctbal"), col("c_custkey"))
          .orderBy(desc("c_acctbal"), asc("c_custkey")), "pos")
        .select(col("pos"), col("c_acctbal").as("bal_ranked"))
      left.join(right, "pos").orderBy("pos")
    }),

    // with_row_count (polars df.with_row_count): same distributed 2-pass
    // count-offset global index — no global window, no RDD detour.
    "q_row_count" -> ((s, d) =>
      withGlobalIndex(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name")).orderBy("c_custkey"), "row_nr")
        .select("row_nr", "c_custkey", "c_name")
        .orderBy("row_nr")),

    // transpose (polars df.transpose): rows⇄columns of a SMALL aggregated
    // frame — melt (stack) + pivot with pinned output columns. Transpose is
    // only meaningful when the row axis fits a schema, so the input is an
    // aggregate by construction.
    "q_transpose" -> ((s, d) => {
      val agg = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
      agg.select(col("l_returnflag"),
          expr("stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (metric, v)"))
        .groupBy("metric").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(first("v"))
        .orderBy("metric")
    }),

    // Set intersection / difference (distinct semantics, like SQL).
    "q_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "q_except" -> ((s, d) =>
      Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // melt: wide→long (polars melt(id_vars, value_vars)).
    "q_melt" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "attr", "val")
        .orderBy("p_partkey", "attr")),

    // pivot: long→wide with an explicit value list (no discovery job).
    "q_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("yr")),

    // explode: unnest a list column built by split.
    "q_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word")),

    // to_dummies: one-hot of a categorical column.
    "q_dummies" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderstatus") === "F").cast("int").as("status_F"),
          (col("o_orderstatus") === "O").cast("int").as("status_O"),
          (col("o_orderstatus") === "P").cast("int").as("status_P"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      ("SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_quantity " +
        "FROM lineitem ORDER BY l_returnflag DESC, l_shipdate, l_orderkey, l_linenumber, l_quantity"),
    "q_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "q_shuffle_det" ->
      ("SELECT doc_id, md5('epoch1|' || CAST(doc_id AS VARCHAR)) AS shuffle_key, " +
        "source FROM documents ORDER BY shuffle_key LIMIT 200"),
    "q_union" ->
      ("SELECT c_name AS name, 'customer' AS src FROM customer " +
        "UNION ALL SELECT s_name, 'supplier' FROM supplier " +
        "ORDER BY name, src"),
    "q_union_diag" ->
      ("SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal, " +
        "CAST(NULL AS INTEGER) AS nationkey FROM customer " +
        "UNION ALL SELECT s_suppkey, s_name, s_acctbal, s_nationkey FROM supplier " +
        "ORDER BY key, name"),
    "q_hstack" ->
      ("WITH l AS (SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS pos, " +
        "c_custkey, c_name FROM customer), " +
        "r AS (SELECT CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS pos, " +
        "c_acctbal AS bal_ranked FROM customer) " +
        "SELECT l.pos, l.c_custkey, l.c_name, r.bal_ranked " +
        "FROM l JOIN r ON l.pos = r.pos ORDER BY l.pos"),
    "q_row_count" ->
      ("SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS row_nr, " +
        "c_custkey, c_name FROM customer ORDER BY row_nr"),
    "q_transpose" ->
      ("WITH a AS (SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem GROUP BY 1), " +
        "m AS (SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS v FROM a " +
        "UNION ALL SELECT l_returnflag, 'sum_price' AS metric, sum_price AS v FROM a) " +
        "SELECT metric, max(CASE WHEN l_returnflag = 'A' THEN v END) AS A, " +
        "max(CASE WHEN l_returnflag = 'N' THEN v END) AS N, " +
        "max(CASE WHEN l_returnflag = 'R' THEN v END) AS R " +
        "FROM m GROUP BY metric ORDER BY metric"),
    "q_intersect" ->
      ("SELECT c_nationkey AS nationkey FROM customer " +
        "INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"),
    "q_except" ->
      ("SELECT n_nationkey AS nationkey FROM nation " +
        "EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"),
    "q_melt" ->
      ("SELECT p_partkey, attr, val FROM " +
        "(SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retailprice FROM part) " +
        "UNPIVOT (val FOR attr IN (size, retailprice)) " +
        "ORDER BY p_partkey, attr"),
    "q_pivot" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS \"F\", " +
        "count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS \"O\", " +
        "count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS \"P\" " +
        "FROM orders GROUP BY 1 ORDER BY yr"),
    "q_explode" ->
      ("SELECT word, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE length(word) > 0 GROUP BY word ORDER BY word"),
    "q_dummies" ->
      ("SELECT o_orderkey, CAST(o_orderstatus = 'F' AS INTEGER) AS status_F, " +
        "CAST(o_orderstatus = 'O' AS INTEGER) AS status_O, " +
        "CAST(o_orderstatus = 'P' AS INTEGER) AS status_P " +
        "FROM orders ORDER BY o_orderkey")
  )
}
