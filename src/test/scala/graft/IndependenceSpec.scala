package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oracle-derivation independence spot-checks (r8 verdict task 8).
  *
  * A handful of qids generate BOTH the Spark expression and the DuckDB
  * oracle from one shared Scala helper (Similarity.probesExpr/planeLit,
  * TextAnalysis.score) — cross-engine hash parity cannot catch a
  * common-mode bug in such a generator, because both sides inherit it.
  * For the highest-risk shared-derivation qids this suite pins a SECOND,
  * hand-written formulation that shares no code with the shipped one
  * (explode+aggregate instead of row-local kernels/HOFs, brute-force pair
  * scans instead of multi-probe equi-joins, independently re-implemented
  * hyperplane constants) and asserts exact result equality at sf0.001.
  * The twins are deliberately the naive O(n²) shapes — tiny corpus, and
  * naivety is the point: no shared machinery.
  */
class IndependenceSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(r => r.toSeq.toList: Seq[Any]).toSet

  private def shipped(qid: String): DataFrame =
    SparkEntry.queries(qid)(spark, sf)

  /** The documented textCorpus contract (documents ∪ first-word-mutated
    * copies of doc_id % 10 == 0 at +100000), re-stated by hand. */
  private def corpus: DataFrame = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.unionByName(docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+", "zzz").as("text")))
  }

  /** Independent re-implementation of the hyperplane constant: sign of
    * the first byte of md5("p:d") — from the documented spec, not from
    * Similarity.plane. */
  private def planeSign(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if ((h(0) & 0xff) < 0x80) 1.0 else -1.0
  }
  private def planeArr(p: Int): String =
    (0 until 64).map(d => if (planeSign(p, d) > 0) "1.0D" else "-1.0D")
      .mkString("array(", ", ", ")")
  private def handDotPlane(p: Int): String =
    s"aggregate(zip_with(embedding, ${planeArr(p)}, " +
      s"(x, h) -> CAST(x AS DOUBLE) * h), 0D, (acc, v) -> acc + v)"
  private def handSig8: String =
    (0 until 8).map(p =>
      s"CASE WHEN ${handDotPlane(p)} > 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")

  private val handDot =
    "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v)"

  test("q_dedup_simhash_pairs == explode-aggregate signatures + brute-force " +
      "Hamming scan (no kernel, no probesExpr)") {
    val want = rows(shipped("q_dedup_simhash_pairs"))
    // signatures via a SHUFFLE aggregate (the kernel's polar opposite):
    // one md5 per word OCCURRENCE, ±1 summed per bit
    val exploded = corpus.select(col("doc_id"),
      explode_outer(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("w"))
    val bitSums = (0 until 16).map(j =>
      sum(when(expr(s"substring(md5(w), ${j + 1}, 1)") <= "7", 1)
        .otherwise(-1)).as(s"b$j"))
    val sigs = exploded.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), concat((0 until 16).map(j =>
        when(col(s"b$j") > 0, lit("1")).otherwise(lit("0"))): _*).as("sig"))
    // pairs via a full cross scan; hamming via character zip (not the
    // shipped substring fold)
    val twin = sigs.select(col("doc_id").as("a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("b"), col("sig").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(split(sa, ''), split(sb, ''), " +
          "(x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= 1)
      .select("a", "b", "hamming")
    assert(rows(twin) == want, "independent simhash twin diverges")
    assert(want.nonEmpty, "vacuous: the pair set must be non-empty")
  }

  test("q_dedup_simhash64_pairs == explode-aggregate 64-bit signatures + " +
      "brute-force O(n^2) Hamming<=3 scan (no kernel, no banding)") {
    val want = rows(shipped("q_dedup_simhash64_pairs"))
    // independent signature re-implementation from the documented spec:
    // bit j of the 64-bit signature is the sign of the ±1-per-word-
    // occurrence sum where the vote is hex nibble j of md5(word) for
    // j < 32 and nibble j-32 of the salted md5('x1:' || word) for
    // j >= 32, a '0'-'7' nibble voting +1. Computed here as 64 SHUFFLE
    // aggregates over exploded word occurrences — the kernel's polar
    // opposite (one md5 per occurrence per digest, no multiset fold).
    val exploded = corpus
      .filter(col("text").isNotNull) // the qid's documented null gate
      .select(col("doc_id"),
        explode_outer(expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .as("w"))
    def nib(j: Int): String =
      if (j < 32) s"substring(md5(w), ${j + 1}, 1)"
      else s"substring(md5(concat('x1:', w)), ${j - 32 + 1}, 1)"
    val bitSums = (0 until 64).map(j =>
      sum(when(expr(nib(j)) <= "7", 1).otherwise(-1)).as(s"b$j"))
    val sigs = exploded.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), concat((0 until 64).map(j =>
        when(col(s"b$j") > 0, lit("1")).otherwise(lit("0"))): _*).as("sig"))
    // pairs via a full cross scan; Hamming via character zip (not the
    // shipped popcount-of-xor over packed longs)
    val twin = sigs.select(col("doc_id").as("a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("b"), col("sig").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(split(sa, ''), split(sb, ''), " +
          "(x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
    assert(rows(twin) == want, "independent simhash64 twin diverges")
    assert(want.nonEmpty, "vacuous: the 64-bit pair set must be non-empty")
  }

  test("autoBitsSimhash == hand-computed literal table + independent " +
      "bit-length derivation") {
    // literals computed BY HAND from the documented rule
    // bits = clamp(16, 64, 2 * bitlen(n - 1)), n floored at 2:
    val literals = Seq(
      0L -> 16, 1L -> 16, 2L -> 16, 16L -> 16, 255L -> 16, 256L -> 16,
      257L -> 18, 512L -> 18, 513L -> 20, 1024L -> 20, 1025L -> 22,
      1000000L -> 40, (1L << 31) -> 62, (1L << 32) -> 64,
      ((1L << 32) + 1) -> 64, (1L << 40) -> 64, Long.MaxValue -> 64)
    for ((n, wantBits) <- literals)
      assert(ops.Dedup.autoBitsSimhash(n) == wantBits,
        s"autoBits($n) != hand literal $wantBits")
    // dense sweep with an INDEPENDENT bit-length (binary string length,
    // not numberOfLeadingZeros)
    for (n <- 2L to 5000L) {
      val twin = math.min(64, math.max(16, 2 * BigInt(n - 1).toString(2).length))
      assert(ops.Dedup.autoBitsSimhash(n) == twin, s"autoBits($n) != $twin")
    }
  }

  test("q_dedup_simhash_auto bits_used == independent rule over the " +
      "hand-stated corpus count") {
    val got = shipped("q_dedup_simhash_auto").collect().head
    val n = corpus.count()
    val wantBits =
      math.min(64, math.max(16, 2 * BigInt(math.max(n, 2L) - 1).toString(2).length))
    assert(got.getAs[Long]("n_corpus") == n, "corpus count diverges")
    assert(got.getAs[Int]("bits_used") == wantBits,
      s"bits_used=${got.getAs[Int]("bits_used")} != independent rule $wantBits")
  }

  test("q_quality_score == explode-count twin (no graft kernels, no shared " +
      "score() helper)") {
    val want = rows(shipped("q_quality_score"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val stats = docs.select(col("doc_id"),
        explode_outer(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("w"))
      .groupBy("doc_id")
      .agg(count(col("w")).cast("int").as("nw"),
        coalesce(sum(when(col("w")
          .isin("the", "a", "of", "and", "to"), 1).otherwise(0)), lit(0))
          .cast("int").as("stopn"))
    val twin = docs.join(stats, "doc_id").select(col("doc_id"),
        length(col("text")).as("n_chars"),
        col("nw").as("n_words"),
        expr("round(CAST(length(text) AS DOUBLE) / nullif(nw, 0), 4)")
          .as("avg_word_len"),
        expr("round(CAST(stopn AS DOUBLE) / nullif(nw, 0), 4)")
          .as("stopword_ratio"),
        expr("round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE)" +
          " / nullif(length(text), 0), 4)").as("alpha_ratio"))
    assert(rows(twin) == want, "independent quality-score twin diverges")
  }

  test("q_lang_id == explode-score + struct-sort argmax twin") {
    val want = rows(shipped("q_lang_id"))
    val markers = Seq(
      ("de", Seq("der", "die", "das", "und", "ist")),
      ("en", Seq("the", "a", "data", "and", "fast")),
      ("es", Seq("el", "la", "de", "los", "que")),
      ("fr", Seq("le", "la", "les", "des", "et")))
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val scoreAggs = markers.map { case (l, ws) =>
      coalesce(sum(when(col("w").isin(ws: _*), 1).otherwise(0)), lit(0))
        .cast("int").as(s"s_$l")
    }
    val scoredRaw = docs.select(col("doc_id"),
        explode_outer(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("w"))
      .groupBy("doc_id").agg(scoreAggs.head, scoreAggs.tail: _*)
    // argmax via a DIFFERENT mechanism than the shipped >= chain: sort
    // (-score, tie-order) structs ascending and take the head — identical
    // semantics (max score, ties to de<en<es<fr) by construction
    val twin = docs.select("doc_id", "lang").join(scoredRaw, "doc_id")
      .withColumn("pred", expr(
        "sort_array(array(" +
          "struct(-s_de AS neg, 0 AS ord, 'de' AS l), " +
          "struct(-s_en AS neg, 1 AS ord, 'en' AS l), " +
          "struct(-s_es AS neg, 2 AS ord, 'es' AS l), " +
          "struct(-s_fr AS neg, 3 AS ord, 'fr' AS l)))[0].l"))
      .select(col("doc_id"), col("s_de"), col("s_en"), col("s_es"),
        col("s_fr"), col("pred"), (col("pred") === col("lang")).as("correct"))
    assert(rows(twin) == want, "independent lang-id twin diverges")
  }

  test("q_dedup_embedding == brute-force twin with independently " +
      "re-implemented hyperplanes") {
    val want = rows(shipped("q_dedup_embedding"))
    // the documented planted corpus, re-stated by hand with the test-side
    // plane constants (same ascending HOF fold — the arithmetic IS the
    // contract; what's independent is every generator that emits it)
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val scaled = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))").as("embedding"))
    val perturbed = e.filter(col("vec_id") % 10 === 5)
      .withColumn("d0", expr(handDotPlane(0)))
      .select((col("vec_id") + 200000).as("vec_id"),
        expr(s"zip_with(embedding, ${planeArr(0)}, " +
          "(x, h) -> CAST(CAST(x AS DOUBLE) - d0 * 1.05 / 64 * h AS FLOAT))")
          .as("embedding"))
    val all = e.unionByName(scaled).unionByName(perturbed)
      .filter(col("embedding").isNotNull)
      .withColumn("sig", expr(handSig8))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(embedding, embedding, " +
          "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (acc, v) -> acc + v))"))
    val twin = all.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("sig").as("siga"), col("nrm").as("na"))
      .crossJoin(all.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("sig").as("sigb"), col("nrm").as("nb")))
      .filter(col("a") < col("b"))
      .withColumn("ham", expr(
        "aggregate(zip_with(split(siga, ''), split(sigb, ''), " +
          "(x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)"))
      .filter(col("ham") <= 1)
      .withColumn("cos", round(expr(handDot) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.99) // the qid's threshold
      .select("a", "b", "cos")
    assert(rows(twin) == want, "independent embedding-dedup twin diverges")
    assert(want.nonEmpty, "vacuous: planted families must pair")
  }

  test("q_ann_lsh == brute-force Hamming<=1 twin (no probesExpr)") {
    val want = rows(shipped("q_ann_lsh"))
    val n = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("embedding").isNotNull)
      .withColumn("sig", expr(handSig8))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(embedding, embedding, " +
          "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (acc, v) -> acc + v))"))
    val q = n.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q"), col("embedding").as("ea"),
        col("sig").as("siga"), col("nrm").as("na"))
    val c = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("sig").as("sigb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(desc("cos"), asc("b"))
    val twin = q.crossJoin(c).filter(col("q") =!= col("b"))
      .withColumn("ham", expr(
        "aggregate(zip_with(split(siga, ''), split(sigb, ''), " +
          "(x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)"))
      .filter(col("ham") <= 1)
      .withColumn("cos", round(expr(handDot) / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q"), col("rank"), col("b").as("neighbor"), col("cos"))
    assert(rows(twin) == want, "independent ANN-LSH twin diverges")
    assert(want.nonEmpty)
  }
}
