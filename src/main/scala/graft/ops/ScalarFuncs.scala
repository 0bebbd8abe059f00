package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Scalar expression namespaces — SURVEY.md §2.9: string / temporal / math /
  * list / struct / json families of polars 0.18 (`.str.*`, `.dt.*`, `.arr.*`,
  * `.struct.*`, json extraction), granted to generated code by the reference.
  *
  * All expressions are Spark built-ins (whole-stage codegen'd, no UDFs).
  * Determinism: transcendental results round to 6 decimals (libm may differ
  * by 1 ulp between JVM and the oracle's C++), int-typed outputs are cast so
  * Spark's INT matches DuckDB's BIGINT-leaning functions.
  */
object ScalarFuncs {

  val queries: Map[String, Q] = Map(
    // .str.* family: case, length, substring, contains/starts/ends, regex
    // extract/replace, pad, trim, concat, split+index.
    "q_str_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).as("len"),
          substring(col("p_name"), 1, 8).as("sub"),
          col("p_name").contains("red").as("has_red"),
          col("p_type").startsWith("S").as("sw"),
          col("p_type").endsWith("D").as("ew"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          lpad(col("p_brand"), 12, "#").as("pad"),
          trim(col("p_name")).as("trimmed"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
          element_at(split(col("p_name"), " "), 1).as("tok1"),
          expr("array_join(regexp_extract_all(p_name, '[a-z]+', 0), ',')")
            .as("all_words"),
          expr("size(regexp_extract_all(p_name, '[a-z]+', 0))")
            .as("n_matches"))
        .orderBy("p_partkey")),

    // .dt.* family: parts, truncate, format, diff, interval arithmetic.
    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("wk"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("mon_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS"))
            .cast("timestamp_ntz").as("plus30"))
        .orderBy("o_orderkey")),

    // .dt time-of-day + timezone family (polars .dt.hour/minute/second/
    // strftime('%H:%M')/convert_time_zone) over sub-day events.ts.
    // Zone conversions are genuine region-zone (DST-aware) ops both ways:
    // from_utc_timestamp interprets the naive ts as UTC and localizes;
    // to_utc_timestamp interprets it as zone-local and normalizes to UTC.
    "q_time_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          hour(col("ts")).as("hr"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          date_format(col("ts"), "HH:mm").as("hm"),
          unix_micros(col("ts").cast("timestamp")).as("epoch_us"),
          (unix_micros(col("ts").cast("timestamp")) % 1000000L).as("us_in_sec"),
          date_format(from_utc_timestamp(col("ts"), "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("ny_local"),
          date_format(to_utc_timestamp(col("ts"), "Asia/Kolkata"),
            "yyyy-MM-dd HH:mm:ss").as("from_kolkata_utc"))
        .orderBy("event_id")),

    // math family: abs/sqrt/pow/ln/log10/exp/floor/ceil/sign/mod/least/
    // greatest (clip)/sin/cos. Sort key is total over the generating columns
    // (lineitem has duplicate (orderkey, linenumber) rows).
    "q_math_funcs" -> ((s, d) =>
      // 9 round()s per row go through BigDecimal — fan the scan so the
      // projection (evaluated twice: range sample + sort map side) does
      // not fold on a single scan task
      FanOut(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") * -1), 2).as("abs_price"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(log10(col("l_extendedprice")), 6).as("log10_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          signum(col("l_discount")).as("sgn"),
          pmod(col("l_linenumber"), lit(3)).as("m3"),
          least(col("l_quantity"), lit(25.0)).as("cap25"),
          greatest(col("l_quantity"), lit(5.0)).as("floor5"),
          round(sin(col("l_discount")), 6).as("sin_d"),
          round(cos(col("l_discount")), 6).as("cos_d"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_price"),
          col("disc_sq"), col("cap25"), col("floor5"))),

    // .arr/.list family on string arrays: size, index (incl. negative),
    // contains, distinct, sort+min, slice+join, reverse.
    "q_list_funcs" -> ((s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(words).as("n_words"),
          element_at(words, 1).as("w1"),
          element_at(words, -1).as("w_last"),
          array_contains(words, "data").as("has_data"),
          size(array_distinct(words)).as("n_uniq"),
          element_at(array_sort(words), 1).as("min_word"),
          array_join(slice(words, 1, 3), " ").as("first3"),
          array_join(reverse(words), " ").as("reversed"))
        .orderBy("doc_id")
    }),

    // numeric arrays (embeddings): length, min/max, sum & L2 norm via the
    // `aggregate` higher-order fold (float upcast to double element-wise so
    // the fold order and precision match the oracle exactly).
    "q_array_numeric" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(expr("CAST(array_min(embedding) AS DOUBLE)"), 6).as("vmin"),
          round(expr("CAST(array_max(embedding) AS DOUBLE)"), 6).as("vmax"),
          round(expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 6)
            .as("vsum"),
          round(expr("sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"), 6)
            .as("vnorm"),
          expr("CAST(array_position(embedding, array_min(embedding)) AS INT)")
            .as("argmin"),
          expr("CAST(array_position(embedding, array_max(embedding)) AS INT)")
            .as("argmax"))
        .orderBy("vec_id")),

    // .struct.* family: pack columns into a struct, extract fields back.
    "q_struct_funcs" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          struct(col("c_name").as("n"), col("c_acctbal").as("b")).as("st"))
        .select(col("c_custkey"),
          col("st.n").as("name"),
          (col("st.b") > 0).as("positive"))
        .orderBy("c_custkey")),

    // NaN vs null (polars is_nan / fill_nan vs is_null — distinct concepts
    // in both models, SURVEY §1.3/§7.4.4). NaN and null are injected
    // deterministically, then counted and repaired separately.
    "q_nan_handling" -> ((s, d) => {
      val v = when(col("l_quantity") > 45, expr("CAST('NaN' AS DOUBLE)"))
        .when(col("l_quantity") < 5, lit(null))
        .otherwise(col("l_discount"))
      Tables.lineitem(s, d)
        .withColumn("v", v)
        .groupBy("l_returnflag")
        .agg(count(when(expr("isnan(v)"), lit(1))).as("n_nan"),
          count(when(col("v").isNull, lit(1))).as("n_null"),
          count(when(!col("v").isNull && !expr("isnan(v)"), lit(1))).as("n_clean"),
          round(sum(nanvl(col("v"), lit(0.0))), 2).as("sum_nan_repaired"))
        .orderBy("l_returnflag")
    }),

    // json extraction over events.props (polars .str.json_extract; the
    // stdlib `json` module is whitelisted in the reference,
    // helpers/constants.py:78).
    "q_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
          get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, " +
        "CAST(length(p_name) AS INTEGER) AS len, substr(p_name, 1, 8) AS sub, " +
        "contains(p_name, 'red') AS has_red, starts_with(p_type, 'S') AS sw, " +
        "ends_with(p_type, 'D') AS ew, " +
        "regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel, " +
        "lpad(p_brand, 12, '#') AS pad, trim(p_name) AS trimmed, " +
        "concat_ws('|', p_brand, p_type) AS cat, " +
        "string_split(p_name, ' ')[1] AS tok1, " +
        "array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), ',') AS all_words, " +
        "CAST(len(regexp_extract_all(p_name, '[a-z]+', 0)) AS INTEGER) AS n_matches " +
        "FROM part ORDER BY p_partkey"),
    "q_date_funcs" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "CAST(quarter(o_orderdate) AS INTEGER) AS qtr, " +
        "CAST(month(o_orderdate) AS INTEGER) AS mo, " +
        "CAST(day(o_orderdate) AS INTEGER) AS dom, " +
        "CAST(dayofyear(o_orderdate) AS INTEGER) AS doy, " +
        "CAST(weekofyear(o_orderdate) AS INTEGER) AS wk, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start, " +
        "strftime(o_orderdate, '%Y-%m') AS ym, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, " +
        "o_orderdate + INTERVAL 30 DAY AS plus30 " +
        "FROM orders ORDER BY o_orderkey"),
    "q_time_funcs" ->
      ("SELECT event_id, CAST(hour(ts) AS INTEGER) AS hr, " +
        "CAST(minute(ts) AS INTEGER) AS mi, " +
        "CAST(second(ts) AS INTEGER) AS sec, " +
        "strftime(ts, '%H:%M') AS hm, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS epoch_us, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 1000000 AS us_in_sec, " +
        "strftime(timezone('America/New_York', timezone('UTC', CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S') AS ny_local, " +
        "strftime(timezone('UTC', timezone('Asia/Kolkata', CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S') AS from_kolkata_utc " +
        "FROM events ORDER BY event_id"),
    "q_math_funcs" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "round(abs(l_extendedprice * -1), 2) AS abs_price, " +
        "round(sqrt(l_extendedprice), 6) AS sqrt_price, " +
        "round(pow(l_discount, 2), 6) AS disc_sq, " +
        "round(ln(l_extendedprice), 6) AS ln_price, " +
        "round(log10(l_extendedprice), 6) AS log10_price, " +
        "round(exp(l_discount), 6) AS exp_disc, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS fl, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS ce, " +
        "CAST(sign(l_discount) AS DOUBLE) AS sgn, " +
        "CAST(l_linenumber % 3 AS INTEGER) AS m3, " +
        "least(l_quantity, 25.0) AS cap25, " +
        "greatest(l_quantity, 5.0) AS floor5, " +
        "round(sin(l_discount), 6) AS sin_d, " +
        "round(cos(l_discount), 6) AS cos_d " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_price, disc_sq, cap25, floor5"),
    "q_list_funcs" ->
      ("SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words, " +
        "string_split(text, ' ')[1] AS w1, " +
        "string_split(text, ' ')[-1] AS w_last, " +
        "list_contains(string_split(text, ' '), 'data') AS has_data, " +
        "CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq, " +
        "list_sort(string_split(text, ' '))[1] AS min_word, " +
        "array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3, " +
        "array_to_string(list_reverse(string_split(text, ' ')), ' ') AS reversed " +
        "FROM documents ORDER BY doc_id"),
    "q_array_numeric" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
        "round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin, " +
        "round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax, " +
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vsum, " +
        "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS vnorm, " +
        "CAST(list_position(embedding, list_min(embedding)) AS INTEGER) AS argmin, " +
        "CAST(list_position(embedding, list_max(embedding)) AS INTEGER) AS argmax " +
        "FROM embeddings ORDER BY vec_id"),
    "q_struct_funcs" ->
      ("SELECT c_custkey, struct_pack(n := c_name, b := c_acctbal).n AS name, " +
        "struct_pack(n := c_name, b := c_acctbal).b > 0 AS positive " +
        "FROM customer ORDER BY c_custkey"),
    "q_nan_handling" ->
      ("WITH x AS (SELECT l_returnflag, CASE WHEN l_quantity > 45 THEN CAST('NaN' AS DOUBLE) " +
        "WHEN l_quantity < 5 THEN NULL ELSE l_discount END AS v FROM lineitem) " +
        "SELECT l_returnflag, count(CASE WHEN isnan(v) THEN 1 END) AS n_nan, " +
        "count(CASE WHEN v IS NULL THEN 1 END) AS n_null, " +
        "count(CASE WHEN v IS NOT NULL AND NOT isnan(v) THEN 1 END) AS n_clean, " +
        "round(sum(CASE WHEN isnan(v) THEN 0.0 ELSE v END), 2) AS sum_nan_repaired " +
        "FROM x GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_json_funcs" ->
      ("SELECT event_id, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
        "json_extract_string(props, '$.k') IS NOT NULL AS has_k, " +
        "json_extract_string(props, '$.missing') AS missing " +
        "FROM events ORDER BY event_id")
  )
}
