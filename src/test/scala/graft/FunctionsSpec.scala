package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatDotProduct, HeavyHittersAgg}

/** Native Catalyst expression: correctness vs the HOF formulation, codegen
  * and interpreted paths, SQL registration. */
class FunctionsSpec extends SparkSpec {

  test("dot_f equals the HOF fold bit-for-bit on real embeddings") {
    FloatDotProduct.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(
        expr("dot_f(embedding, embedding)").as("native"),
        expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("hof"))
      .filter(col("native") =!= col("hof")) // bit-inequality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("dot_f handles nulls and length mismatch") {
    FloatDotProduct.register(spark)
    val row = spark.sql(
      "SELECT dot_f(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a, " +
        "dot_f(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS b")
      .head()
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == 8.0) // min-length semantics
  }

  test("might_contain_l: no false negatives, bounded false positives") {
    import graft.functions.BloomFunctions
    BloomFunctions.register(spark)
    val members = spark.range(0, 1000)
      .select(concat(lit("doc-"), col("id")).as("k"))
    val bloom = members.select(xxhash64(col("k")).as("h"))
      .stat.bloomFilter("h", 1000L, 0.01)
    val bloomLit = lit(BloomFunctions.serialize(bloom))
    // every inserted key must probe true
    val missed = members
      .filter(!call_function("might_contain_l", bloomLit, xxhash64(col("k"))))
      .count()
    assert(missed == 0, "bloom filters must never be false-negative")
    // non-members pass at roughly the configured fpp, not en masse
    val fps = spark.range(1000, 11000)
      .select(concat(lit("doc-"), col("id")).as("k"))
      .filter(call_function("might_contain_l", bloomLit, xxhash64(col("k"))))
      .count()
    assert(fps <= 500, s"false-positive rate out of bounds: $fps / 10000")
  }

  test("graft_tokens/token_count/alpha_count equal the regex formulations") {
    import spark.implicits._
    graft.functions.TextTokenize.register(spark)
    // real corpus text + adversarial edges: leading/trailing/consecutive
    // delimiters, all-delimiter, empty, multibyte UTF-8 (must act as a
    // delimiter, exactly like the per-char regex), digits, underscores
    val edges = Seq("", "   ", "a", " a b  c ", "_x_9_", "héllo wörld",
      "a1b2-c3", "über café 42", "\ttab\nnewline", "ünïcödé",
      "mixed ascii ünd ütf8 tokens 99").toDF("text")
    val corpus = Tables.documents(spark, sf).select("text").unionByName(edges)
    val diff = corpus.select(
        expr("graft_tokens(text)").as("fast"),
        expr("filter(split(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0)").as("rx"),
        expr("graft_token_count(text)").as("fastn"),
        expr("graft_alpha_count(text)").as("fasta"),
        expr("length(regexp_replace(text, '[^a-zA-Z]', ''))").as("rxa"))
      .filter(col("fast") =!= col("rx") || col("fastn") =!= size(col("rx")) ||
        col("fasta") =!= col("rxa"))
      .count()
    assert(diff == 0, "byte-scan kernels must match the regex semantics exactly")
    // null in, null out — same as the regex chain
    val nulls = spark.sql("SELECT graft_tokens(CAST(NULL AS STRING)) AS t, " +
      "graft_token_count(CAST(NULL AS STRING)) AS c, " +
      "graft_alpha_count(CAST(NULL AS STRING)) AS a").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("graft_tokens survives both codegen and interpreted evaluation") {
    graft.functions.TextTokenize.register(spark)
    val df = Tables.documents(spark, sf).limit(20)
      .select(expr("graft_tokens(text)").as("t"),
        expr("graft_token_count(text)").as("c"),
        expr("graft_alpha_count(text)").as("a"))
    val withCodegen = df.collect().map(_.toSeq)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(_.toSeq)
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("graft_trigram_stats / graft_top_bigram_count equal the relational forms") {
    import spark.implicits._
    graft.functions.TextStats.register(spark)
    val edges = Seq("", "a", "ab", "abc", "aaaa", "x y", "w w w w",
      "héé héé", "one two one two one", "  spaced  out  ").toDF("text")
    val corpus = Tables.documents(spark, sf).select("text").unionByName(edges)
    // trigram stats vs the explode → groupBy formulation
    val base = corpus.withColumn("doc", monotonically_increasing_id())
    val relTri = base
      .select(col("doc"),
        explode(expr("transform(sequence(1, greatest(length(text) - 2, 1)), " +
          "i -> substring(text, i, 3))")).as("gram"))
      .groupBy("doc", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc")
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_uniq_grams"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
    val triDiff = base.join(relTri, "doc")
      .withColumn("st", expr("graft_trigram_stats(text)"))
      .filter(col("st.n_grams") =!= col("n_grams") ||
        col("st.n_uniq_grams") =!= col("n_uniq_grams") ||
        // clc is a float fold in different orders — compare at the 4dp
        // consumers actually use
        round(col("st.clc"), 4) =!= round(col("clc"), 4))
      .count()
    assert(triDiff == 0, "trigram kernel must match the relational form")
    // top bigram vs the explode → count → max formulation
    val w = base.select(col("doc"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
    val relTop = w.select(col("doc"),
        explode(expr("transform(sequence(1, greatest(size(w) - 1, 1)), " +
          "i -> concat_ws(' ', try_element_at(w, i), try_element_at(w, i + 1)))"))
          .as("gram"))
      .groupBy("doc", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc").agg(max("c").as("top_bigram"))
    val topDiff = w.join(relTop, "doc")
      .filter(expr("graft_top_bigram_count(w)") =!= col("top_bigram"))
      .count()
    assert(topDiff == 0, "top-bigram kernel must match the relational form")
  }

  test("mg sketch: guarantees hold under every partitioning of a skewed stream") {
    // adversarially small k so the decrement/merge-prune paths actually
    // fire, on a stream whose tail (90 singletons) swamps the head
    import spark.implicits._
    val stream = (Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 90).map(i => s"cold$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val k = 8
    spark.udf.register("mg_test",
      org.apache.spark.sql.functions.udaf(new HeavyHittersAgg(k),
        org.apache.spark.sql.Encoders.STRING))
    for (parts <- Seq(1, 3, 16)) {
      val m = stream.toDF("t").repartition(parts)
        .agg(expr("mg_test(t)")).head.getMap[String, Long](0)
      // no overcount anywhere
      assert(m.forall { case (t, est) => est <= exact(t) })
      // guaranteed presence + n/k undercount bound for true heavy hitters
      for ((t, c) <- exact if c > n.toDouble / k) {
        assert(m.contains(t), s"$t (count $c > n/k) missing at parts=$parts")
        assert(c - m(t) <= n.toDouble / k)
      }
      assert(m.size <= k)
    }
  }

  test("graft_simhash16 equals the relational 16-fold form on edge-case texts") {
    graft.functions.TextStats.register(spark)
    // edge cases: empty, single word, heavy repetition (the ±count vs ±1
    // collapse), multibyte UTF-8 (md5 must hash utf-8 bytes), long mixed
    // text, and a corpus sample
    val texts = Seq("", "word", "a a a a a b", "naïve café 中文 emoji 🦀 ok",
      "the quick brown fox jumps over the lazy dog the end") ++
      Tables.documents(spark, sf).limit(20)
        .collect().map(_.getAs[String]("text")).toSeq
    import spark.implicits._
    val df = texts.toDF("text")
      .selectExpr("filter(split(text, ' '), x -> length(x) > 0) AS w")
      .selectExpr("transform(w, x -> md5(x)) AS hs", "w")
    val relational = df.selectExpr(
      "concat(" + (0 until 16).map(j =>
        s"IF(aggregate(hs, 0, (acc, h) -> acc + IF(substr(h, ${j + 1}, 1) <= '7', 1, -1)) > 0, '1', '0')")
        .mkString(", ") + ") AS sim").collect().map(_.getString(0))
    val kernel = df.selectExpr("graft_simhash16(w) AS sim")
      .collect().map(_.getString(0))
    assert(relational.sameElements(kernel))
    // and the kernel must agree with itself under interpreted evaluation
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.selectExpr("graft_simhash16(w) AS sim")
        .collect().map(_.getString(0))
      assert(kernel.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("graft_simhash width family: prefix property, 16-bit equivalence, " +
      "salted upper half, codegen/interpreted agreement") {
    graft.functions.TextStats.register(spark)
    val texts = Seq("", "word", "a a a a a b", "naïve café 中文 emoji 🦀 ok",
      "the quick brown fox jumps over the lazy dog the end") ++
      Tables.documents(spark, sf).limit(20)
        .collect().map(_.getAs[String]("text")).toSeq
    import spark.implicits._
    val df = texts.toDF("text")
      .selectExpr("filter(split(text, ' '), x -> length(x) > 0) AS w")
    // graft_simhash(w, 16) IS graft_simhash16 (back-compat contract)
    val s16 = df.selectExpr("graft_simhash16(w) AS a", "graft_simhash(w, 16) AS b")
      .collect()
    assert(s16.forall(r => r.getString(0) == r.getString(1)))
    // a narrower signature is a PREFIX of a wider one (each bit is
    // computed independently of the width) — the property the auto-width
    // oracle leans on when it truncates the 64-bit table
    val pre = df.selectExpr("graft_simhash(w, 20) AS a",
      "graft_simhash(w, 32) AS b", "graft_simhash(w, 64) AS c").collect()
    assert(pre.forall(r => r.getString(2).startsWith(r.getString(1)) &&
      r.getString(1).startsWith(r.getString(0))))
    assert(pre.forall(r => r.getString(0).length == 20 &&
      r.getString(1).length == 32 && r.getString(2).length == 64))
    // bits 33-64 come from the SALTED digest md5('x1:' || word) — the
    // relational spec of the upper half, integer-exact
    val upper = df
      .selectExpr("transform(w, x -> md5(concat('x1:', x))) AS hs2", "w")
      .selectExpr(
        "concat(" + (0 until 32).map(j =>
          s"IF(aggregate(hs2, 0, (acc, h) -> acc + IF(substr(h, ${j + 1}, 1) <= '7', 1, -1)) > 0, '1', '0')")
          .mkString(", ") + ") AS up",
        "substring(graft_simhash(w, 64), 33, 32) AS kup").collect()
    assert(upper.forall(r => r.getString(0) == r.getString(1)))
    // interpreted evaluation agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.selectExpr("graft_simhash(w, 64) AS c").collect()
        .map(_.getString(0))
      assert(interp.sameElements(pre.map(_.getString(2))))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // the corpus-derived width rule, pinned at its anchor points
    import graft.ops.Dedup
    assert(Dedup.autoBitsSimhash(0) == 16 && Dedup.autoBitsSimhash(256) == 16)
    assert(Dedup.autoBitsSimhash(257) == 18 && Dedup.autoBitsSimhash(550) == 20)
    assert(Dedup.autoBitsSimhash(4096) == 24 && Dedup.autoBitsSimhash(66000) == 34)
    assert(Dedup.autoBitsSimhash(1L << 40) == 64 &&
      Dedup.autoBitsSimhash(Long.MaxValue) == 64)
  }

  test("simhashNearDupPairs: pigeonhole banding finds exactly the " +
      "Hamming<=3 pairs a brute-force scan finds") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(120)
    val mutated = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))
    val corpus = docs.unionByName(mutated)
    val got = graft.ops.Dedup.simhashNearDupPairs(corpus, "doc_id", "text")
      .select("a", "b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same 64-bit signatures
    graft.functions.TextStats.register(spark)
    val sigs = corpus.select(col("doc_id"),
      expr("graft_simhash(filter(split(text, ' '), x -> length(x) > 0), 64)")
        .as("sig"))
    val brute = sigs.select(col("doc_id").as("a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("b"), col("sig").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("h", expr("aggregate(sequence(1, 64), 0, (acc, i) -> " +
        "acc + IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
      .filter(col("h") <= 3)
      .select("a", "b", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"banding must be exhaustive at H<=3: missing=${brute -- got}, " +
        s"extra=${got -- brute}")
    assert(got.nonEmpty, "mutated copies must produce at least one pair")
  }

  test("simhashNearDupPairs non-default widths: 32-bit/H<=1 banding is " +
      "exhaustive; indivisible band split refuses up front") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(80)
    val got = graft.ops.Dedup
      .simhashNearDupPairs(corpus, "doc_id", "text", bits = 32, maxHamming = 1)
      .select("a", "b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    graft.functions.TextStats.register(spark)
    val sigs = corpus.select(col("doc_id"),
      expr("graft_simhash(filter(split(text, ' '), x -> length(x) > 0), 32)")
        .as("sig"))
    val brute = sigs.select(col("doc_id").as("a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("b"), col("sig").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("h", expr("aggregate(sequence(1, 32), 0, (acc, i) -> " +
        "acc + IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
      .filter(col("h") <= 1)
      .select("a", "b", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"2-band H<=1 must be exhaustive: missing=${brute -- got}, " +
        s"extra=${got -- brute}")
    // bits that don't divide into maxHamming+1 bands refuse at build time
    val e = intercept[IllegalArgumentException] {
      graft.ops.Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
        bits = 50, maxHamming = 3)
    }
    assert(e.getMessage.contains("bands"))
  }

  test("graft_minhash8 equals the relational min-of-md5-slice form on edge-case texts") {
    graft.functions.TextStats.register(spark)
    // edge cases: empty (one empty shingle), 1- and 2-word tails (concat_ws
    // null-skip windows), heavy shingle repetition (min over multiset vs
    // set), multibyte UTF-8, and a corpus sample
    val texts = Seq("", "word", "two words", "a a a a a b",
      "naïve café 中文 emoji 🦀 ok",
      "the quick brown fox jumps over the lazy dog the end") ++
      Tables.documents(spark, sf).limit(20)
        .collect().map(_.getAs[String]("text")).toSeq
    import spark.implicits._
    val df = texts.toDF("text")
      .selectExpr("split(text, ' ') AS w")
    val relational = df
      .selectExpr("explode(transform(sequence(1, greatest(size(w) - 2, 1)), " +
        "i -> concat_ws(' ', try_element_at(w, i), try_element_at(w, i + 1), " +
        "try_element_at(w, i + 2)))) AS shingle", "w")
      .groupBy("w")
      .agg(expr("concat_ws('|', " + (0 to 7).map(k =>
        s"min(substring(md5(shingle), ${4 * k + 1}, 4))").mkString(", ") + ") AS sig"))
    val kernel = df
      .selectExpr("w", "graft_minhash8(w) AS s")
      .selectExpr("w", "concat_ws('|', " +
        (0 to 7).map(k => s"s.s$k").mkString(", ") + ") AS sig")
    val joined = relational.as("r")
      .join(kernel.as("k"), col("r.w") === col("k.w"))
      .select(col("r.sig").as("rs"), col("k.sig").as("ks")).collect()
    assert(joined.length == texts.distinct.length)
    joined.foreach(r => assert(r.getString(0) == r.getString(1)))
    // and the kernel must agree with itself under interpreted evaluation
    val codegen = df.selectExpr("graft_minhash8(w).s0 AS s0")
      .collect().map(_.getString(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.selectExpr("graft_minhash8(w).s0 AS s0")
        .collect().map(_.getString(0))
      assert(interpreted.sameElements(codegen))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dot_f survives both codegen and interpreted evaluation") {
    FloatDotProduct.register(spark)
    val df = Tables.embeddings(spark, sf).limit(10)
      .select(expr("dot_f(embedding, embedding)").as("d"))
    val withCodegen = df.collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(_.getDouble(0))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
