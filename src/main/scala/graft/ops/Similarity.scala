package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.Q

/** Approximate-nearest-neighbor search over the embedding column
  * (builder-prompt mandate): brute-force cosine top-k as the correctness
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design: brute-force is a broadcast of the (small) query set against
  * the corpus — a map-side nested-loop with per-query top-k, no corpus
  * shuffle. LSH assigns each vector an 8-bit signature from fixed random
  * hyperplanes (derived from md5 so Spark, the oracle, and tests agree),
  * then joins only within buckets: candidate count drops from O(n·q) to
  * O(n·q/2^bits) and the join is a plain equi-join on the bucket key, which
  * is exactly the shape that scales on a cluster (shuffle by signature).
  */
object Similarity {

  val Dim = 64
  val Planes = 8

  /** Fitted-centroid memo for q_ann_ivf_kmeans, keyed by (session, sfDir):
    * the spark.ml KMeans fit is deterministic here (fixed seed, same
    * corpus), so refitting on every call in a long-lived session is pure
    * waste. The memo holds the 16 centers as plain driver-side arrays (a
    * few KB) — deliberately NOT executor storage, so blanket cache sweeps
    * (unpersist-all) cannot corrupt it and rebuilding the 16-row frame per
    * call is a LocalTableScan. */
  private val centroidCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Long, Array[Float])]]

  /** Drop memoized KMeans centroids (bench/test isolation hook, mirroring
    * Dedup.clearCaches). */
  def clearCaches(): Unit = centroidCache.clear()

  /** Session-scoped eviction (values are driver-side centroid arrays —
    * only the map entry pinning a stopped session needs dropping). Also
    * drains the session's persist ledger. */
  def clearCaches(session: SparkSession): Unit = {
    centroidCache.keys.filter(_._1 eq session).foreach(centroidCache.remove)
    clearPersists(session)
  }

  /** Per-session ledger of MEMORY_AND_DISK persists pinned by returned
    * lazy plans ([[embeddingNearDup]]'s signature stage) — without it
    * every public call pinned another cache entry until a session-wide
    * catalog sweep, the same per-call leak pattern the Curation bloom
    * ledger closed (review finding). Drained by [[clearPersists]] /
    * [[clearCaches]](session); unpersist is idempotent, so a blanket
    * `spark.catalog.clearCache()` having already dropped the blocks is
    * fine — the drain then just releases the driver-side references. */
  private val persistLedger = scala.collection.concurrent.TrieMap
    .empty[SparkSession, List[DataFrame]]

  private def trackPersist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistLedger.updateWith(p.sparkSession) {
      cur => Some(p :: cur.getOrElse(Nil)) }
    p
  }

  /** Unpersist and drop every ledgered persist for `session`. Separate
    * from [[clearCaches]]() on purpose: Bench's clearResidue must release
    * per-call persists WITHOUT evicting the memoized KMeans centroids
    * (q_ann_ivf_kmeans's deterministic fit-once steady state). */
  def clearPersists(session: SparkSession): Unit =
    persistLedger.remove(session).getOrElse(Nil)
      .foreach(_.unpersist(blocking = false))

  /** Fill the (session, dir) KMeans codebook memo from a cold start,
    * mirroring q_ann_ivf_kmeans's fit context (normed corpus persisted for
    * the fit's iterations, released after). Bench times this as its own
    * `ann_codebook_fit` line so the memoized-fit steady state the ANN/
    * SemDeDup rows measure is explicitly metered rather than silently
    * shaved (r12 verdict task 3). Returns the centroid count. */
  def prewarmCodebook(s: SparkSession, d: String): Int = {
    val n = normed(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fittedCentroids(s, d, n).size
    finally n.unpersist(blocking = false)
  }

  /** Deterministic ±1 hyperplane components: sign of the first hex digit of
    * md5("p:d"). Reproducible anywhere md5 exists. */
  private[ops] def plane(p: Int): IndexedSeq[Double] = (0 until Dim).map { dd =>
    val h = MessageDigest.getInstance("MD5")
      .digest(s"$p:$dd".getBytes(StandardCharsets.UTF_8))
    if ((h(0) & 0xff) < 0x80) 1.0 else -1.0
  }

  private[ops] def planeLit(p: Int, dialect: String): String = {
    val xs = plane(p).map(v => if (v > 0) "1.0" else "-1.0")
    if (dialect == "spark") xs.mkString("array(", ", ", ")")
    else xs.mkString("[", ", ", "]")
  }

  /** dot(embedding, plane p) as a double fold, both dialects. */
  private[ops] def dotPlane(p: Int, dialect: String): String = dialect match {
    case "spark" =>
      s"aggregate(zip_with(embedding, ${planeLit(p, "spark")}, " +
        s"(x, h) -> CAST(x AS DOUBLE) * h), 0D, (acc, v) -> acc + v)"
    case _ =>
      s"list_sum(list_transform(list_zip(embedding, ${planeLit(p, "duck")}), " +
        s"p -> CAST(p[1] AS DOUBLE) * p[2]))"
  }

  /** bit p of the LSH signature, both dialects. */
  private def bitExpr(p: Int, dialect: String): String =
    s"CASE WHEN ${dotPlane(p, dialect)} > 0 THEN '1' ELSE '0' END"

  private[ops] def sigExpr(dialect: String): String = sigExprN(dialect, Planes)

  /** Width-generic hyperplane signature: `bits` planes. Signature width is
    * THE corpus-size knob for LSH self-joins — bucket occupancy scales as
    * n / 2^bits, and in-bucket pair verification as occupancy², so a
    * corpus m× bigger needs ~log2(m) more bits to keep per-bucket work
    * constant (measured live: the 60× rehearsal's fixed-8-bit
    * embed_dedup ratio hit 34× before width scaling recovered it). */
  private[graft] def sigExprN(dialect: String, bits: Int): String =
    if (dialect == "spark")
      (0 until bits).map(bitExpr(_, "spark")).mkString("concat(", ", ", ")")
    else (0 until bits).map(bitExpr(_, "duck")).mkString(" || ")

  /** Multi-probe candidate signatures: the signature itself plus its
    * `bits` one-bit flips — every signature at Hamming distance ≤ 1.
    * Exploding one side of the candidate join over these bits+1 probes
    * recovers near-dups whose perturbation flipped a single bit, which the
    * exact equi-join is blind to, at (bits+1)× candidate cost — still a
    * signature equi-join, never a pair scan. Width-generic: 8-bit
    * hyperplane LSH signatures and 16-bit simhashes share it. */
  private[graft] def probesExpr(sigCol: String, dialect: String,
      bits: Int = Planes): String = {
    val sub = if (dialect == "spark") "substring" else "substr"
    val flips = (0 until bits).map { i =>
      s"concat($sub($sigCol, 1, $i), " +
        s"CASE WHEN $sub($sigCol, ${i + 1}, 1) = '1' THEN '0' ELSE '1' END, " +
        s"$sub($sigCol, ${i + 2}, $bits))"
    }
    if (dialect == "spark") (sigCol +: flips).mkString("array(", ", ", ")")
    else (sigCol +: flips).mkString("[", ", ", "]")
  }

  /** codegen'd native kernel (graft.functions.FloatDotProduct) — same
    * ascending-fold arithmetic as the HOF/oracle formulations. */
  private val sparkDot = "dot_f(eq, eb)"
  private val duckDot =
    "list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  private def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.FloatDotProduct.register(s)
    // null embeddings carry no geometry — excluded here so every consumer
    // agrees; a ZERO norm becomes a NULL norm via nullif, because under
    // Spark 4's default ANSI mode cos = dot/(na·nb) with a 0 denominator
    // THROWS DIVIDE_BY_ZERO (verified live) while DuckDB's `/` yields
    // NULL — the nullif makes both engines exclude zero vectors
    // identically instead of one crashing (review finding)
    Tables.embeddings(s, d)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        expr("nullif(sqrt(dot_f(embedding, embedding)), 0.0D)").as("nrm"))
  }

  private val duckNormed =
    "n AS (SELECT vec_id, embedding, " +
      "nullif(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0.0) AS nrm " +
      "FROM embeddings WHERE embedding IS NOT NULL)"

  /** The first 16 corpus vectors as deterministic coarse centroids (a real
    * index would k-means them — the bucketing mechanics are identical and
    * this keeps a SQL oracle). */
  private def ivfCents(n: DataFrame): DataFrame =
    n.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ec"),
        col("nrm").as("nc"))

  /** Nearest centroid by cosine, ties to the lowest centroid id — an
    * argmin as a map-side-combined min(struct) aggregate (-csim sorts
    * descending, cid breaks ties ascending): no sort, no window, one
    * narrow shuffle keyed by vector id. */
  private[ops] def ivfAssign(df: DataFrame, cents: DataFrame,
      idCol: String): DataFrame =
    df.crossJoin(broadcast(cents))
      // nullif: a zero centroid norm must not ANSI-crash the division;
      // + 0.0 canonicalizes a rounded -0.0 (Spark's struct compare
      // distinguishes the two zeros, DuckDB's ORDER BY does not — same
      // fix q_embed_centroids already carries)
      .withColumn("csim",
        round(expr("dot_f(embedding, ec)")
          / expr("nullif(nrm * nc, 0.0D)"), 6) + lit(0.0))
      // NULL csim (null/zero-norm vector or centroid) must not win the
      // argmin: min(struct) sorts a NULL field FIRST (verified live), the
      // opposite of the oracle's csim DESC nulls-last — one null centroid
      // would otherwise capture the whole corpus into a single cell
      .filter(col("csim").isNotNull)
      .groupBy(idCol)
      .agg(min(struct((-col("csim")).as("neg"), col("cid"),
        col("embedding"), col("nrm"))).as("m"))
      .select(col(idCol), col("m.embedding").as("embedding"),
        col("m.nrm").as("nrm"), col("m.cid").as("cid"))

  /** Learned coarse centroids, shared by q_ann_ivf_kmeans and q_semdedup.
    * The fit dominates its first caller (~3 s at sf0.1) and is
    * deterministic (fixed seed, same corpus), so long-lived sessions
    * memoize the k driver-side center arrays per (session, sfDir) — every
    * later caller pays only a LocalTableScan to rebuild the 16-row frame.
    * `nrm` is expected on `n` (the [[normed]] shape). SemDeDup-style
    * consumers fitting on the RAW table while assigning a derived corpus
    * is the published practice (fit on a sample, assign everything). */
  private[ops] def fittedCentroids(s: SparkSession, d: String,
      n: DataFrame): Seq[(Long, Array[Float])] =
    centroidCache.getOrElseUpdate((s, d), fitCentroidsOn(n, 16))

  /** The k-means fit core: `n` in the [[normed]] (embedding, nrm) shape.
    * Spherical fit (vectors pre-divided by their norm) with a fixed seed.
    * private[graft]: the streaming SemDeDup path fits offline through
    * this and ships the centers into its tasks. */
  private[graft] def fitCentroidsOn(n: DataFrame, k: Int): Seq[(Long, Array[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    val feats = n
      // null embeddings carry no geometry (array_to_vector NPEs) — they
      // can be neither centroids nor assigned; a NULL norm (zero vector,
      // see normed's nullif) has no direction to fit either and its
      // x/nrm features would be NULL — drop both from the fit
      .filter(col("embedding").isNotNull && col("nrm").isNotNull)
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(
          expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) / nrm AS FLOAT))")))
    // KMeans cannot fit on zero rows, and k above the point count
    // breaks the k-means|| init — cap k at the corpus size (a count
    // over the persisted normed frame, paid once per memo fill; k
    // stays 16 on any graded corpus). An empty corpus has no cells
    // (and the query correctly returns no neighbors). The probe limit is
    // max(k, 2), NOT k: limit(1).count() == 1 on ANY non-empty corpus,
    // which would misroute k=1 into the 1-point branch below.
    val nPts = feats.limit(math.max(k, 2)).count()
    if (nPts == 0) Seq.empty
    else if (nPts == 1 || k <= 1) {
      // spark.ml KMeans refuses k < 2. A 1-point corpus is its own
      // (single) centroid; and when the CALLER asks for k=1, every
      // vector lands in the one cell whatever its center is, so any
      // single corpus vector serves — never collect the whole fit set.
      feats.select("features").limit(1).collect().toSeq.zipWithIndex.map {
        case (r, i) => (i.toLong,
          r.getAs[org.apache.spark.ml.linalg.Vector](0)
            .toArray.map(_.toFloat))
      }
    }
    else {
      val model = new KMeans().setK(math.min(nPts, k.toLong).toInt)
        .setSeed(42L).setFeaturesCol("features").fit(feats)
      model.clusterCenters.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray.map(_.toFloat)) }
    }
  }

  /** [[fittedCentroids]] as the (cid, ec, nc) frame ivfAssign consumes. */
  private[ops] def fittedCentroidFrame(s: SparkSession, d: String,
      n: DataFrame): DataFrame = {
    import s.implicits._
    fittedCentroids(s, d, n).toDF("cid", "ec")
      .withColumn("nc", expr("sqrt(dot_f(ec, ec))"))
      .filter(col("nc") > 0)
  }

  /** Auto-width rule: bits = max(8, floor(log2(n / 2))), capped at 24 —
    * expected bucket occupancy n/2^bits stays in [2, 4) at any corpus
    * size, so the quadratic in-bucket verification stays constant per
    * bucket. The anchors: 8 bits reproduces the historical default at the
    * sf0.001 corpus (n≈550 → occupancy ≈2.1), and at the 60× rehearsal
    * (n≈300k → 17 bits) the width-scaled path holds a near-linear ratio
    * where fixed-8-bit hit 21-34×. Capped because probe fan-out is
    * (bits+1)× the candidate rows; past 24 bits the string signatures
    * should become int64s. */
  private[graft] def autoBits(n: Long): Int = {
    val b = math.floor(
      math.log(math.max(n, 2L).toDouble / 2.0) / math.log(2.0)).toInt
    math.min(24, math.max(8, b))
  }

  /** PUBLIC API — embedding-cosine near-duplicate pairs via multi-probe
    * hyperplane LSH with a CONFIGURABLE signature width. `bits` is the
    * corpus-size knob: bucket occupancy ~ n/2^bits and in-bucket exact
    * verification ~ occupancy², so grow bits by ~log2(m) when the corpus
    * grows m× to keep per-bucket work constant (the 60× rehearsal measured
    * the fixed-width alternative: a 34× time ratio). `bits <= 0` (the
    * default) derives the width from a corpus count via [[autoBits]] — one
    * count(*) over the input, which parquet serves near-metadata-speed —
    * so callers who never think about width still get the scaled plan.
    * Candidates come from a (bits+1)-probe Hamming≤1 signature equi-join —
    * never a pair scan — and exact cosine (codegen'd dot_f) is verified on
    * candidates only. Returns (a, b, cos) with a < b, distinct across
    * probes. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 0, minCos: Double = 0.9): DataFrame =
    embeddingCandidates(df, idCol, vecCol, bits)
      .withColumn("cos", expr("dot_f(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos")).distinct()

  /** The candidate-pair stage of [[embeddingNearDup]] BEFORE cosine
    * verification — the deterministic work measure of the LSH design
    * (candidate count ∝ n · occupancy; wall time of the same stage swings
    * 2-4× with JVM context, DESIGN.md "Round 12"). Exposed for the scale
    * rehearsal's work-level scaling probe. */
  private[graft] def embeddingCandidates(df: DataFrame, idCol: String,
      vecCol: String, bits: Int = 0): DataFrame = {
    val width = if (bits > 0) bits else autoBits(df.count())
    val s = df.sparkSession
    graft.functions.FloatDotProduct.register(s)
    // persisted (via the session ledger): BOTH self-join sides (and their
    // per-element signature folds — the dominant per-row cost) would
    // otherwise recompute the whole scan+norm+signature pipeline from
    // lineage (review finding). The cache lives as long as the returned
    // lazy plan; Spark evicts LRU, and the ledger drain (clearPersists /
    // Bench clearResidue) or spark.catalog.clearCache releases it
    // explicitly — without the ledger every call leaked one entry.
    // nullif: a zero-norm vector must yield a NULL cosine (excluded by
    // the >= filter) in BOTH engines, not an ANSI DIVIDE_BY_ZERO crash.
    val n = trackPersist(df.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding"))
      .filter(col("embedding").isNotNull)
      .withColumn("nrm",
        expr("nullif(sqrt(dot_f(embedding, embedding)), 0.0D)"))
      .withColumn("sig", expr(sigExprN("spark", width))))
    val a = n.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"),
      explode(expr(probesExpr("sig", "spark", width))).as("sig"))
    val b = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("sig"))
    a.join(b, Seq("sig")).filter(col("a") < col("b"))
  }

  /** PUBLIC API — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the corpus, prune within-cluster cosine
    * near-duplicates under a keep-min-id policy, return the KEPT rows of
    * `df` (rows with a null vector carry no geometry and are always
    * kept). `idCol` must be a unique numeric key.
    *
    * `k` is the corpus-size knob. `k <= 0` (the default) derives
    * k = max(16, ceil(sqrt(n/2))) from one count(*): total work =
    * assignment (n·k dots) + within-cluster verification (n·(n/k) dots)
    * is minimized at k ≈ √n, which is the method's TRUE complexity —
    * Θ(n^1.5) total. That is the honest cost of exact within-cluster
    * pairwise cosine; when a corpus needs strictly linear dedup, use
    * [[embeddingNearDup]] (constant-occupancy LSH) instead — the
    * rehearsal publishes both so the choice is measured, not guessed.
    * The fit itself runs on a deterministic hash-sample of ≤ 128·k
    * vectors (the published fit-on-a-sample practice), so fit cost never
    * scales with the full corpus. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 0, tau: Double = 0.95): DataFrame = {
    val s = df.sparkSession
    graft.functions.FloatDotProduct.register(s)
    import s.implicits._
    val n = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__vid"),
        col(vecCol).as("embedding"))
      .withColumn("nrm", expr("sqrt(dot_f(embedding, embedding))"))
    val total = n.count()
    val kk = if (k > 0) k
      else math.max(16, math.ceil(math.sqrt(total / 2.0)).toInt)
    // deterministic fit sample: hash-mod on the id keeps the sample
    // stable across partitionings/layouts (never rand()); stride 1 = fit
    // on everything when the corpus is already ≤ 128·k
    val stride = math.max(1L, total / (128L * kk))
    val fitSet =
      if (stride == 1L) n
      else n.filter(pmod(xxhash64(col("__vid")), lit(stride)) === 0L)
    val centers = fitCentroidsOn(fitSet, kk)
    val cents = centers.toDF("cid", "ec")
      .withColumn("nc", expr("sqrt(dot_f(ec, ec))"))
      .filter(col("nc") > 0)
    val assigned = ivfAssign(n, cents, "__vid")
    val dropped = withinClusterDropIds(assigned, "__vid", tau)
      .select(col("__vid").as("__drop"))
    df.join(dropped, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /** The within-cluster keep-min prune core, shared by [[semDedup]] and
    * q_semdedup: ids dropped because a smaller-id ≥ tau cosine vector
    * shares their cluster. `assigned` is the [[ivfAssign]] output shape
    * (idCol, embedding, nrm, cid); returns the distinct dropped ids as
    * one column named `idCol`. */
  private[ops] def withinClusterDropIds(assigned: DataFrame, idCol: String,
      tau: Double): DataFrame = {
    def side(tag: String) = assigned.select(col("cid"),
      col(idCol).as(tag), col("embedding").as(s"e$tag"),
      col("nrm").as(s"n$tag"))
    side("a").join(side("b"), Seq("cid"))
      .filter(col("a") < col("b"))
      .filter(expr("dot_f(ea, eb)") / (col("na") * col("nb")) >= tau)
      .select(col("b").as(idCol)).distinct()
  }

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 for each query vector (vec_id < 20): the
    // exact baseline every ANN variant is judged against.
    "q_ann_bruteforce" -> ((s, d) => {
      val n = normed(s, d)
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q"), col("embedding").as("eq"), col("nrm").as("nq"))
      val c = n.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      broadcast(q).join(c, col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q"), col("rank"), col("b").as("neighbor"), col("cos"))
        .orderBy("q", "rank")
    }),

    // int8 embedding quantization — the compression step a large embedding
    // pipeline runs before indexing: per-vector max-abs scale, symmetric
    // round-to-int8 codes, and the mean absolute reconstruction error as
    // the quality metric. Entirely row-local (codegen'd HOFs, zero
    // shuffles): at 100 TB this runs at scan speed. The code vector is
    // emitted serialized (array_join) — the harness canonicalizes rows by
    // sorting every output column, which only works on scalars.
    // Per-label embedding centroids — the building block for IVF coarse
    // quantizers, per-class prototypes, and semantic-cluster summaries.
    // Scale shape: posexplode to (label, dim, x) rows, then ONE partial+
    // final aggregate on the (label, dim) compound key — never a
    // collect_list of vectors, never a driver-side loop; the shuffle
    // carries 8·64 running (sum, count) pairs per task, not the vectors.
    // Emits (label, dim, n_vecs, centroid) rows — scalar columns, no
    // nested output (driver-harness contract). The 4dp round absorbs
    // summation-order ulps in the double sum, same precedent as avg_nll.
    "q_embed_centroids" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n_vecs"),
          // + 0.0 canonicalizes IEEE negative zero: a tiny negative mean
          // that rounds to zero keeps its sign bit in one engine and not
          // the other (seen live at sf0.1: spark 0.0 vs duckdb -0.0)
          (round(avg(col("x").cast("double")), 4) + lit(0.0)).as("centroid"))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("n_vecs"), col("centroid"))
        .orderBy("label", "dim")),

    "q_embed_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("scale",
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
        .withColumn("q",
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT))"))
        .withColumn("mae", round(expr(
          "aggregate(zip_with(embedding, q, (x, c) -> abs(CAST(x AS DOUBLE) - c * scale / 127)), " +
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / size(embedding)"), 6))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale"),
          array_join(col("q"), ",").as("q"),
          col("mae"))
        .orderBy("vec_id")),

    // IVF-bucketed ANN (the centroid-partitioned alternative to LSH): the
    // first 16 corpus vectors serve as deterministic coarse centroids
    // (a real index would k-means them — the bucketing mechanics are
    // identical and this keeps a SQL oracle). Every vector is assigned to
    // its nearest centroid via a 16-row broadcast + argmin, then search
    // touches only the query's cell: an equi-join on cell id that shuffles
    // by cell — candidates cut ~K×, same shape as the LSH path.
    "q_ann_ivf" -> ((s, d) => {
      val n = normed(s, d)
      val corpus = ivfAssign(n, ivfCents(n), "vec_id")
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("cid"))
      val queries = ivfAssign(n.filter(col("vec_id") < 30), ivfCents(n), "vec_id")
        .select(col("vec_id").as("q"), col("embedding").as("eq"),
          col("nrm").as("nq"), col("cid"))
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      queries.join(corpus, Seq("cid")).filter(col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q"), col("rank"), col("b").as("neighbor"), col("cos"))
        .orderBy("q", "rank")
    }),

    // IVF with nprobe=2 — the standard recall knob: a query whose true
    // neighbor lies just across a cell boundary finds it by searching its
    // TWO nearest cells. Corpus vectors stay single-cell (index size
    // unchanged); only the query side fans out ×2, via a row_number ≤ 2
    // window over the 16 broadcast centroids (partitioned by query id —
    // high cardinality, 16 rows per partition at any scale). Each (q, b)
    // pair still matches at most once because b lives in exactly one cell.
    "q_ann_ivf_probe2" -> ((s, d) => {
      val n = normed(s, d)
      val corpus = ivfAssign(n, ivfCents(n), "vec_id")
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("cid"))
      val qw = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
      val queries = n.filter(col("vec_id") < 30)
        .crossJoin(broadcast(ivfCents(n)))
        .withColumn("csim",
          round(expr("dot_f(embedding, ec)") / (col("nrm") * col("nc")), 6))
        // a zero-norm query has NULL csim against every centroid — it has
        // no cell affinity at all, so drop it like ivfAssign drops corpus
        // vectors (and like the oracle's asgn filter), instead of fanning
        // it into 2 arbitrary cells that emit NULL-cos neighbor rows
        .filter(col("csim").isNotNull)
        .withColumn("rk", row_number().over(qw))
        .filter(col("rk") <= 2)
        .select(col("vec_id").as("q"), col("embedding").as("eq"),
          col("nrm").as("nq"), col("cid"))
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      queries.join(corpus, Seq("cid")).filter(col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q"), col("rank"), col("b").as("neighbor"), col("cos"))
        .orderBy("q", "rank")
    }),

    // IVF with LEARNED coarse centroids — the real-index shape: the first-16
    // "centroids" of q_ann_ivf keep a SQL oracle but are arbitrary corpus
    // vectors; a production IVF k-means its centroids so cells follow the
    // data's density. Same spark.ml KMeans machinery as q_segment (k=16,
    // fixed seed, fit on L2-normalized vectors = spherical k-means so the
    // Euclidean fit agrees with the cosine cell assignment), centers
    // pulled to a 16-row broadcast frame, the identical argmin-assign +
    // in-cell search as the fixed variant, and the q_ann_ivf_probe2 recall
    // knob (query side probes its 2 nearest cells; index size unchanged).
    //
    // Measured honestly (and reproduced independently in numpy): on THIS
    // corpus learned centroids LOSE to the fixed data-point centroids —
    // recall@3 28/90 vs 56/90 at sf0.01, 24/90 vs 61/90 at sf0.1
    // (single-probe) — because the embeddings are isotropic unit vectors
    // (within-label mean cosine ≈ 0): there is no density for k-means to
    // learn, Lloyd iterations only equalize the cells, and an UNEVEN
    // data-point cover yields larger assignment margins, so true-neighbor
    // pairs agree on a cell more often. Iterating Lloyd's from the fixed
    // centroids themselves (56 hits) CONVERGES DOWN to ~52. On clustered
    // corpora the learned cells win; the machinery is identical either
    // way. The oracle therefore asserts fit-sanity self-verdicts computed
    // against in-query brute-force ground truth — assignment is total, the
    // fit produced >= 12 live cells, probe2 recall clears an absolute
    // floor with ~1.7x margin, and probing 2 cells never loses recall
    // vs 1 — rather than a kmeans-beats-fixed claim this data falsifies.
    "q_ann_ivf_kmeans" -> ((s, d) => {
      val n = normed(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kcents = fittedCentroidFrame(s, d, n)
      val qFilter = col("vec_id") < 30
      val corpus = ivfAssign(n, kcents, "vec_id")
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("cid"))
      // query side fans out to its `p` nearest cells (the nprobe knob)
      def cellTop3(probes: Int): DataFrame = {
        val qw = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
        val qs = n.filter(qFilter).crossJoin(broadcast(kcents))
          .withColumn("csim",
            round(expr("dot_f(embedding, ec)") / (col("nrm") * col("nc")), 6))
          // same zero-norm-query drop as q_ann_ivf_probe2 (no cell affinity)
          .filter(col("csim").isNotNull)
          .withColumn("rk", row_number().over(qw))
          .filter(col("rk") <= probes)
          .select(col("vec_id").as("q"), col("embedding").as("eq"),
            col("nrm").as("nq"), col("cid"))
        val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
        qs.join(corpus, Seq("cid")).filter(col("q") =!= col("b"))
          .withColumn("cos",
            round(expr(sparkDot) / (col("nq") * col("nb")), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("q", "b")
      }
      // exact top-3 ground truth: broadcast the 30 queries, no corpus shuffle
      val qset = n.filter(qFilter)
        .select(col("vec_id").as("q"), col("embedding").as("eq"),
          col("nrm").as("nq"))
      val cset = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      val tw = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      val truth = broadcast(qset).join(cset, col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(tw))
        .filter(col("rank") <= 3)
        .select("q", "b")
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val hits1 = truth.join(cellTop3(1), Seq("q", "b"))
        .agg(count(lit(1)).as("h1"))
      val hits2 = truth.join(cellTop3(2), Seq("q", "b"))
        .agg(count(lit(1)).as("h2"))
      val cells = corpus.agg(countDistinct(col("cid")).as("live_cells"),
        count(lit(1)).as("n_assigned"))
      val total = n.agg(count(lit(1)).as("n_corpus"))
      val out = nTruth.crossJoin(hits1).crossJoin(hits2)
        .crossJoin(cells).crossJoin(total)
        .select(col("n_truth"),
          (col("live_cells") >= 12 && col("n_assigned") === col("n_corpus"))
            .cast("int").as("fit_sane"),
          // guarded: 0/0 is an ANSI error on an empty corpus; recall over
          // an empty truth set is vacuously passing
          (when(col("n_truth") > 0, col("h2").cast("double") / col("n_truth"))
            .otherwise(1d) >= 0.25)
            .cast("int").as("probe2_recall_floor"),
          (col("h2") >= col("h1")).cast("int").as("probe2_never_loses"))
        .localCheckpoint(true)
      n.unpersist(blocking = false)
      out
    }),

    // The width-scaled embedding near-dup API under oracle parity: the
    // same multi-probe chain as q_dedup_embedding but at 12 signature
    // bits — the corpus-size knob the 60× rehearsal validated — so the
    // width-generic signature path is cross-engine verified, not just
    // self-tested. Cosine rounded 6dp for cross-engine float stability.
    "q_dedup_embedding_wide" -> ((s, d) =>
      embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
        bits = 12, minCos = 0.9)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy("a", "b")),

    // The auto-width rule under cross-engine parity: Spark derives the
    // default signature width exactly as embeddingNearDup's bits<=0 path
    // does (autoBits over a corpus count); the oracle recomputes the same
    // max(8, min(24, floor(log2(n/2)))) in SQL — so the width the default
    // path would pick is verified against an independent engine at
    // whatever corpus size the driver ships. (Pair-finding on the default
    // path is pinned by ApiSpec bits=0 and the embed_dedup_auto rehearsal
    // workload; pairs themselves aren't emitted here because a
    // width-dependent result would break whenever the corpus count — and
    // therefore the chosen width — legitimately changes.)
    "q_dedup_embedding_auto" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val width = autoBits(e.count())
      e.agg(count(lit(1)).as("n_corpus"))
        .select(col("n_corpus"), lit(width).cast("int").as("bits_used"))
    }),

    // Unified ANN recall report — the index-selection table: every
    // approximate variant (exact-cell IVF, nprobe=2 IVF, multi-probe LSH)
    // scored against the SAME brute-force top-3 truth over the SAME
    // 30-query set, in one result. This is the artifact an index rollout
    // reads before picking a variant + recall knob; each variant keeps its
    // production scale shape (signature/cell equi-joins, no pair scans).
    "q_ann_recall" -> ((s, d) => {
      val n = normed(s, d)
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      def top3(qs: DataFrame, cs: DataFrame, joinOn: Seq[String]): DataFrame = {
        val joined = if (joinOn.isEmpty) broadcast(qs).join(cs, col("q") =!= col("b"))
          else qs.join(cs, joinOn).filter(col("q") =!= col("b"))
        joined
          .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3).select("q", "b")
      }
      val qset = n.filter(col("vec_id") < 30)
        .select(col("vec_id").as("q"), col("embedding").as("eq"), col("nrm").as("nq"))
      val cset = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      val truth = top3(qset, cset, Seq.empty)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val corpusCells = ivfAssign(n, ivfCents(n), "vec_id")
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("cid"))
      val ivf1 = top3(
        ivfAssign(n.filter(col("vec_id") < 30), ivfCents(n), "vec_id")
          .select(col("vec_id").as("q"), col("embedding").as("eq"),
            col("nrm").as("nq"), col("cid")),
        corpusCells, Seq("cid"))
      val qw = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
      val ivf2 = top3(
        n.filter(col("vec_id") < 30).crossJoin(broadcast(ivfCents(n)))
          .withColumn("csim",
            round(expr("dot_f(embedding, ec)") / (col("nrm") * col("nc")), 6))
          // same zero-norm-query drop as q_ann_ivf_probe2 (no cell affinity)
          .filter(col("csim").isNotNull)
          .withColumn("rk", row_number().over(qw)).filter(col("rk") <= 2)
          .select(col("vec_id").as("q"), col("embedding").as("eq"),
            col("nrm").as("nq"), col("cid")),
        corpusCells, Seq("cid"))
      val nSig = n.withColumn("sig", expr(sigExpr("spark")))
      val lsh = top3(
        nSig.filter(col("vec_id") < 30)
          .select(col("vec_id").as("q"), col("embedding").as("eq"),
            col("nrm").as("nq"),
            explode(expr(probesExpr("sig", "spark"))).as("sig")),
        nSig.select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("sig")),
        Seq("sig"))
      // cosine-metric PQ: quantize NORMALIZED subvectors (unit vectors make
      // ADC-L2 order == cosine order, so the comparison against the cosine
      // truth is apples-to-apples); same first-16 codebook + ADC mechanics
      // as q_ann_pq
      val nsub = n.select(col("vec_id"), explode(expr(
          "transform(sequence(0, 7), m -> struct(CAST(m AS INT) AS m, " +
            "transform(slice(embedding, CAST(m * 8 + 1 AS INT), 8), " +
            "x -> CAST(x AS DOUBLE) / nrm) AS sv))")).as("e"))
        .select(col("vec_id"), col("e.m").as("m"), col("e.sv").as("sv"))
      val pqCb = nsub.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("m"), col("sv").as("cv"))
      val pqL2 = "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), " +
        "0D, (a, v) -> a + v)"
      val pqCodes = nsub.join(broadcast(pqCb), Seq("m"))
        .withColumn("l2", round(expr(pqL2), 6))
        // a NULL l2 (null-embedding codeword) must not win the argmin —
        // min(struct) sorts NULL first, the oracle's ORDER BY l2 last
        .filter(col("l2").isNotNull)
        .groupBy("vec_id", "m")
        .agg(min(struct(col("l2"), col("cid"))).as("mn"))
        .select(col("vec_id").as("b"), col("m"), col("mn.cid").as("code"))
      val pqLut = nsub.filter(col("vec_id") < 30)
        .join(broadcast(pqCb), Seq("m"))
        .select(col("vec_id").as("q"), col("m").as("qm"), col("cid"),
          expr(pqL2).as("contr"))
      val pw = Window.partitionBy("q").orderBy(asc("d"), asc("b"))
      val pq = pqCodes.join(broadcast(pqLut),
          col("m") === col("qm") && col("code") === col("cid"))
        .filter(col("q") =!= col("b"))
        .groupBy("q", "b")
        .agg(round(sum(col("contr")), 6).as("d"))
        .withColumn("rank", row_number().over(pw))
        .filter(col("rank") <= 3)
        .select("q", "b")
      def recallRow(name: String, pred: DataFrame): DataFrame =
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(truth.join(pred, Seq("q", "b"))
            .agg(count(lit(1)).as("n_hits")))
          .select(lit(name).as("variant"), col("n_truth"), col("n_hits"),
            // guarded: 0/0 is an ANSI error, and recall over an empty
            // truth set is undefined anyway — report NULL
            when(col("n_truth") > 0,
              round(col("n_hits").cast("double") / col("n_truth"), 4))
              .as("recall"))
      val out = recallRow("ivf1", ivf1)
        .unionByName(recallRow("ivf2", ivf2))
        .unionByName(recallRow("lsh", lsh))
        .unionByName(recallRow("pq", pq))
        .orderBy("variant")
        .localCheckpoint(true)
      truth.unpersist(blocking = false)
      out
    }),

    // PCA dimensionality reduction over the embedding column — the
    // compaction step big-embedding pipelines run before indexing (project
    // 64-dim vectors onto the top-8 principal directions; pairs with
    // q_embed_quantize the way OPQ pairs rotation with PQ). spark.ml PCA
    // fits from ONE distributed covariance pass (treeAggregate — no vector
    // collect); only the 64×8 loadings matrix reaches the driver. The fit
    // is verified by construction, not by a cross-engine float compare:
    // loadings orthonormality (driver-side, tiny matrix), explained
    // variance non-increasing and bounded, and two distributed invariants
    // over every projected vector — projection energy never exceeds the
    // vector's (orthonormal projections are contractions) and 8-component
    // capture never falls below 4-component capture. The oracle asserts
    // the verdicts + the cross-engine-checkable counts.
    "q_embed_pca" -> ((s, d) => {
      import org.apache.spark.ml.feature.PCA
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val feats = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        // null embeddings carry no geometry (and array_to_vector NPEs on
        // them) — drop before the fit, like every distance path does
        .filter(col("embedding").isNotNull)
        .withColumn("features",
          array_to_vector(expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the covariance pass needs >= 2 rows (RowMatrix.computeCovariance
      // refuses n <= 1) — below that every invariant is vacuously true;
      // emit the verdict row directly (one limit-2 job; negligible next
      // to the fit it guards)
      val nRows = feats.limit(2).count()
      if (nRows < 2) {
        feats.unpersist(blocking = false)
        s.range(1).select(lit(nRows).as("n_vecs"), lit(8).as("k"),
          lit(1).as("orth_ok"), lit(1).as("var_monotone"),
          lit(1).as("var_bounded"), lit(1).as("proj_bounded"),
          lit(1).as("capture_monotone"))
      } else {
      val model = new PCA().setK(8).setInputCol("features").setOutputCol("pc")
        .fit(feats)
      val pcm = model.pc
      val basis = (0 until pcm.numCols)
        .map(j => (0 until pcm.numRows).map(i => pcm(i, j)))
      val orthDev = (for { a <- basis.indices; b <- a until basis.length } yield {
        val dot = basis(a).lazyZip(basis(b)).map(_ * _).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0))
      }).max
      val ev = model.explainedVariance.toArray
      val varMono = ev.zip(ev.tail).forall { case (x, y) => x >= y - 1e-12 }
      val varBounded = ev.forall(v => v >= -1e-12 && v <= 1.0 + 1e-12) &&
        ev.sum <= 1.0 + 1e-9
      val out = model.transform(feats)
        .withColumn("c", vector_to_array(col("pc")))
        .withColumn("x2", expr(
          "aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))
        .withColumn("c8", expr("aggregate(c, 0D, (a, v) -> a + v * v)"))
        .withColumn("c4", expr("aggregate(slice(c, 1, 4), 0D, (a, v) -> a + v * v)"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("c8") > col("x2") + 1e-6, 1).otherwise(0)).as("proj_viol"),
          sum(when(col("c8") < col("c4") - 1e-9, 1).otherwise(0)).as("cap_viol"))
        .select(col("n_vecs"), lit(8).as("k"),
          lit(if (orthDev < 1e-6) 1 else 0).as("orth_ok"),
          lit(if (varMono) 1 else 0).as("var_monotone"),
          lit(if (varBounded) 1 else 0).as("var_bounded"),
          (col("proj_viol") === 0).cast("int").as("proj_bounded"),
          (col("cap_viol") === 0).cast("int").as("capture_monotone"))
        .localCheckpoint(true)
      feats.unpersist(blocking = false)
      out
      }
    }),

    // Product-quantization ANN (Jégou et al., "Product Quantization for
    // Nearest Neighbor Search", TPAMI 2011) — the memory-compression index:
    // each 64-dim vector is cut into M=8 subvectors of 8 dims, each
    // subvector is assigned the nearest of 16 per-subspace codewords, and
    // the vector is stored as 8 small codes (8 bytes, vs 256 for raw
    // floats — the difference between an in-RAM and an on-disk index at
    // 100 TB). Search is asymmetric distance computation (ADC): the query
    // keeps its EXACT subvectors, builds a 8×16 lookup table of
    // subvector→codeword distances, and every corpus vector's approximate
    // distance is just the sum of its 8 codes' LUT entries. Codewords here
    // are the first-16 corpus vectors' subvectors (a real index would
    // k-means each subspace — the assignment/ADC mechanics are identical
    // and this keeps a SQL oracle; q_ann_ivf_kmeans shows the learned-fit
    // path). Scale shape: codebook + LUT are tiny broadcasts; code
    // assignment is one broadcast join + argmin aggregate keyed by
    // (vector, subspace); ADC is a broadcast-LUT probe + per-(query,
    // vector) partial+final sum — no window over the corpus, no pair scan
    // beyond the code table itself (which is the PQ contract: a linear
    // scan over 8-byte codes; production stacks it under IVF cells).
    "q_ann_pq" -> ((s, d) => {
      val sub = Tables.embeddings(s, d)
        .select(col("vec_id"), explode(expr(
          "transform(sequence(0, 7), m -> struct(CAST(m AS INT) AS m, " +
            "slice(embedding, CAST(m * 8 + 1 AS INT), 8) AS sv))")).as("e"))
        .select(col("vec_id"), col("e.m").as("m"), col("e.sv").as("sv"))
      val cb = sub.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("m"), col("sv").as("cv"))
      val l2 = "aggregate(zip_with(sv, cv, (x, y) -> " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
        "0D, (a, v) -> a + v)"
      val codes = sub.join(broadcast(cb), Seq("m"))
        .withColumn("l2", round(expr(l2), 6))
        // NULL l2 must not win the argmin (struct-min is nulls-first,
        // the oracle's ORDER BY l2 is nulls-last)
        .filter(col("l2").isNotNull)
        .groupBy("vec_id", "m")
        .agg(min(struct(col("l2"), col("cid"))).as("mn"))
        .select(col("vec_id").as("b"), col("m"), col("mn.cid").as("code"))
      val lut = sub.filter(col("vec_id") < 20)
        .join(broadcast(cb), Seq("m"))
        .select(col("vec_id").as("q"), col("m").as("qm"), col("cid"),
          expr(l2).as("contr"))
      val w = Window.partitionBy("q").orderBy(asc("adc_dist"), asc("b"))
      codes.join(broadcast(lut),
          col("m") === col("qm") && col("code") === col("cid"))
        .filter(col("q") =!= col("b"))
        .groupBy("q", "b")
        .agg(round(sum(col("contr")), 6).as("adc_dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q"), col("rank"), col("b").as("neighbor"), col("adc_dist"))
        .orderBy("q", "rank")
    }),

    // kNN majority-vote label prediction — the classifier-propagation
    // primitive a curation pipeline uses to spread a small set of
    // human/LLM quality labels across the whole corpus (label the 0.1%,
    // kNN-vote the rest). Same broadcast top-k shape as q_ann_bruteforce
    // (query side broadcasts, corpus never shuffles; at scale the
    // LSH/IVF candidate join replaces the nested loop), then a two-level
    // argmax: per-(query, neighbor-label) vote counts, then min(struct)
    // keeps the most-voted label with ties to the lowest label id — no
    // sort, no second window.
    "q_knn_label" -> ((s, d) => {
      graft.functions.FloatDotProduct.register(s)
      val n = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
        col("label"), expr("sqrt(dot_f(embedding, embedding))").as("nrm"))
      val q = n.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q"), col("embedding").as("eq"),
          col("nrm").as("nq"), col("label").as("true_label"))
      val c = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("label").as("nl"))
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      broadcast(q).join(c, col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .groupBy("q", "true_label", "nl").agg(count(lit(1)).as("votes"))
        .groupBy("q", "true_label")
        // the null-flag field makes the vote tie-break NULLS-LAST: a
        // NULL neighbor label must only win with strictly MORE votes,
        // matching the oracle's ORDER BY votes DESC, nl (nulls last) —
        // bare min(struct) would prefer NULL on ties (nulls-first)
        .agg(min(struct((-col("votes")).as("nv"),
          col("nl").isNull.cast("int").as("nl_null"), col("nl"))).as("m"))
        .select(col("q"), col("m.nl").as("pred_label"),
          (-col("m.nv")).as("votes"), col("true_label"),
          (col("m.nl") === col("true_label")).as("correct"))
        .orderBy("q")
    }),

    // LSH-bucketed ANN with multi-probe recall: candidates are corpus
    // vectors whose signature is within Hamming distance 1 of the query's
    // — the query side explodes over its 9 probe signatures (exact + 8
    // one-bit flips), then equi-joins on the probe. 9× candidates, still
    // a signature equi-join; recovers true neighbors that land one
    // hyperplane away, which exact-bucket LSH misses. Approximate by
    // construction — the oracle runs the identical probing, so results
    // still hash-match.
    "q_ann_lsh" -> ((s, d) => {
      val n = normed(s, d).withColumn("sig", expr(sigExpr("spark")))
      val q = n.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q"), col("embedding").as("eq"),
          col("nrm").as("nq"),
          explode(expr(probesExpr("sig", "spark"))).as("sig"))
      val c = n.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("sig"))
      val w = Window.partitionBy("q").orderBy(desc("cos"), asc("b"))
      q.join(c, Seq("sig")).filter(col("q") =!= col("b"))
        .withColumn("cos", round(expr(sparkDot) / (col("nq") * col("nb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q"), col("rank"), col("b").as("neighbor"), col("cos"))
        .orderBy("q", "rank")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ann_bruteforce" ->
      (s"WITH $duckNormed, scored AS (" +
        "SELECT q.vec_id AS q, c.vec_id AS neighbor, " +
        s"round($duckDot / (q.nrm * c.nrm), 6) AS cos " +
        "FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id), " +
        "ranked AS (SELECT q, neighbor, cos, " +
        "CAST(row_number() OVER (PARTITION BY q ORDER BY cos DESC, neighbor) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT q, rank, neighbor, cos FROM ranked WHERE rank <= 5 ORDER BY q, rank"),
    "q_embed_centroids" ->
      ("SELECT label, CAST(i AS INTEGER) AS dim, count(*) AS n_vecs, " +
        "round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS centroid " +
        "FROM (SELECT label, embedding, " +
        "unnest(generate_series(1, len(embedding))) AS i FROM embeddings) " +
        "GROUP BY label, i ORDER BY label, dim"),
    "q_embed_quantize" ->
      ("WITH s AS (SELECT vec_id, embedding, " +
        "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale FROM embeddings), " +
        "qz AS (SELECT vec_id, embedding, scale, " +
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INTEGER)) AS q FROM s) " +
        "SELECT vec_id, round(scale, 6) AS scale, array_to_string(q, ',') AS q, " +
        "round(list_sum(list_transform(list_zip(embedding, q), p -> abs(CAST(p[1] AS DOUBLE) - p[2] * scale / 127))) / len(embedding), 6) AS mae " +
        "FROM qz ORDER BY vec_id"),
    "q_ann_ivf" ->
      // csim IS NOT NULL mirrors ivfAssign's guard: a zero-norm vector
      // (NULL nrm) or zero-norm centroid yields a NULL cosine, and Spark
      // drops those rows before the argmin — without the filter the
      // oracle still dealt such a vector a cell via row_number over an
      // all-NULL ordering and emitted NULL-cos neighbor rows (r10 ADVICE)
      (s"WITH $duckNormed, " +
        "cents AS (SELECT vec_id AS cid, embedding AS ec, nrm AS nc FROM n WHERE vec_id < 16), " +
        "asgn AS (SELECT vec_id, embedding, nrm, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rk FROM " +
        "(SELECT v.vec_id, v.embedding, v.nrm, c.cid, " +
        "round(list_sum(list_transform(list_zip(v.embedding, c.ec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (v.nrm * c.nc), 6) AS csim " +
        "FROM n v, cents c) WHERE csim IS NOT NULL), " +
        "cell AS (SELECT vec_id, embedding, nrm, cid FROM asgn WHERE rk = 1), " +
        "scored AS (SELECT q.vec_id AS q, c2.vec_id AS neighbor, " +
        "round(list_sum(list_transform(list_zip(q.embedding, c2.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c2.nrm), 6) AS cos " +
        "FROM cell q JOIN cell c2 ON q.cid = c2.cid AND q.vec_id < 30 AND q.vec_id <> c2.vec_id), " +
        "ranked AS (SELECT q, neighbor, cos, " +
        "CAST(row_number() OVER (PARTITION BY q ORDER BY cos DESC, neighbor) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT q, rank, neighbor, cos FROM ranked WHERE rank <= 3 ORDER BY q, rank"),
    "q_ann_ivf_probe2" ->
      // csim IS NOT NULL: same zero-norm guard as q_ann_ivf's asgn — it
      // also covers the QUERY side (qcell), whose Spark twin filters
      // csim.isNotNull before its probe-2 window for the same reason
      (s"WITH $duckNormed, " +
        "cents AS (SELECT vec_id AS cid, embedding AS ec, nrm AS nc FROM n WHERE vec_id < 16), " +
        "asgn AS (SELECT vec_id, embedding, nrm, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rk FROM " +
        "(SELECT v.vec_id, v.embedding, v.nrm, c.cid, " +
        "round(list_sum(list_transform(list_zip(v.embedding, c.ec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (v.nrm * c.nc), 6) AS csim " +
        "FROM n v, cents c) WHERE csim IS NOT NULL), " +
        "cell AS (SELECT vec_id, embedding, nrm, cid FROM asgn WHERE rk = 1), " +
        "qcell AS (SELECT vec_id, embedding, nrm, cid FROM asgn WHERE rk <= 2 AND vec_id < 30), " +
        "scored AS (SELECT q.vec_id AS q, c2.vec_id AS neighbor, " +
        "round(list_sum(list_transform(list_zip(q.embedding, c2.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c2.nrm), 6) AS cos " +
        "FROM qcell q JOIN cell c2 ON q.cid = c2.cid AND q.vec_id <> c2.vec_id), " +
        "ranked AS (SELECT q, neighbor, cos, " +
        "CAST(row_number() OVER (PARTITION BY q ORDER BY cos DESC, neighbor) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT q, rank, neighbor, cos FROM ranked WHERE rank <= 3 ORDER BY q, rank"),
    "q_ann_ivf_kmeans" ->
      ("SELECT CAST(90 AS BIGINT) AS n_truth, 1 AS fit_sane, " +
        "1 AS probe2_recall_floor, 1 AS probe2_never_loses"),
    "q_ann_lsh" ->
      (s"WITH $duckNormed, sigs AS (SELECT vec_id, embedding, nrm, " +
        s"${sigExpr("duck")} AS sig FROM n), " +
        "probed AS (SELECT vec_id, embedding, nrm, " +
        s"unnest(${probesExpr("sig", "duck")}) AS psig FROM sigs), " +
        "scored AS (SELECT q.vec_id AS q, c.vec_id AS neighbor, " +
        s"round($duckDot / (q.nrm * c.nrm), 6) AS cos " +
        "FROM probed q JOIN sigs c ON q.psig = c.sig AND q.vec_id < 50 AND q.vec_id <> c.vec_id), " +
        "ranked AS (SELECT q, neighbor, cos, " +
        "CAST(row_number() OVER (PARTITION BY q ORDER BY cos DESC, neighbor) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT q, rank, neighbor, cos FROM ranked WHERE rank <= 3 ORDER BY q, rank"),
    "q_dedup_embedding_wide" ->
      // reuses duckNormed instead of re-declaring the norm CTE under
      // another alias — the zero-norm/null-embedding guards must not
      // have to be maintained in two spellings (review finding)
      (s"WITH $duckNormed, " +
        s"sigs AS (SELECT vec_id, embedding, nrm, ${sigExprN("duck", 12)} AS sig FROM n), " +
        "probed AS (SELECT vec_id, embedding, nrm, " +
        s"unnest(${probesExpr("sig", "duck", 12)}) AS psig FROM sigs), " +
        "raw AS (SELECT q.vec_id AS a, c.vec_id AS b, " +
        "list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm) AS cos " +
        "FROM probed q JOIN sigs c ON q.psig = c.sig AND q.vec_id < c.vec_id), " +
        "pair AS (SELECT DISTINCT a, b, cos FROM raw WHERE cos >= 0.9) " +
        "SELECT a, b, round(cos, 6) AS cos FROM pair ORDER BY a, b"),
    // the independent re-derivation of autoBits: max(8, min(24,
    // floor(log2(n/2)))) over whatever corpus count the driver ships
    "q_dedup_embedding_auto" ->
      // GREATEST(count, 2): DuckDB's log2(0) raises instead of returning
      // NULL/-inf, so a zero-row corpus would crash the oracle while the
      // Scala autoBits guards with max(n, 2) (review finding)
      ("SELECT count(*) AS n_corpus, " +
        "CAST(GREATEST(8, LEAST(24, CAST(floor(log2(GREATEST(count(*), 2) / 2.0)) AS INTEGER))) AS INTEGER) AS bits_used " +
        "FROM embeddings"),
    "q_ann_recall" -> {
      def dotOf(a: String, b: String) =
        s"list_sum(list_transform(list_zip($a.embedding, $b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      s"WITH $duckNormed, " +
        // brute-force top-3 truth over queries < 30
        "bsc AS (SELECT q.vec_id AS q, c.vec_id AS b, " +
        s"round(${dotOf("q", "c")} / (q.nrm * c.nrm), 6) AS cos " +
        "FROM n q JOIN n c ON q.vec_id < 30 AND q.vec_id <> c.vec_id), " +
        "btr AS (SELECT q, b FROM (SELECT q, b, " +
        "row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank FROM bsc) WHERE rank <= 3), " +
        // IVF cells (first-16 centroids, argmin assignment)
        "cents AS (SELECT vec_id AS cid, embedding, nrm AS nc FROM n WHERE vec_id < 16), " +
        // csim IS NOT NULL: the zero-norm guard mirrored from ivfAssign
        // (same reasoning as the q_ann_ivf / q_ann_ivf_probe2 oracles)
        "asgn AS (SELECT vec_id, embedding, nrm, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rk FROM " +
        "(SELECT v.vec_id, v.embedding, v.nrm, c.cid, " +
        s"round(${dotOf("v", "c")} / (v.nrm * c.nc), 6) AS csim " +
        "FROM n v, cents c) WHERE csim IS NOT NULL), " +
        "cell AS (SELECT vec_id, embedding, nrm, cid FROM asgn WHERE rk = 1), " +
        "qcell AS (SELECT vec_id, embedding, nrm, cid FROM asgn WHERE rk <= 2 AND vec_id < 30), " +
        "sc1 AS (SELECT q.vec_id AS q, c2.vec_id AS b, " +
        s"round(${dotOf("q", "c2")} / (q.nrm * c2.nrm), 6) AS cos " +
        "FROM cell q JOIN cell c2 ON q.cid = c2.cid AND q.vec_id < 30 AND q.vec_id <> c2.vec_id), " +
        "v1 AS (SELECT q, b FROM (SELECT q, b, " +
        "row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank FROM sc1) WHERE rank <= 3), " +
        "sc2 AS (SELECT q.vec_id AS q, c2.vec_id AS b, " +
        s"round(${dotOf("q", "c2")} / (q.nrm * c2.nrm), 6) AS cos " +
        "FROM qcell q JOIN cell c2 ON q.cid = c2.cid AND q.vec_id <> c2.vec_id), " +
        "v2 AS (SELECT q, b FROM (SELECT q, b, " +
        "row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank FROM sc2) WHERE rank <= 3), " +
        // multi-probe LSH
        s"sigs AS (SELECT vec_id, embedding, nrm, ${sigExpr("duck")} AS sig FROM n), " +
        "probed AS (SELECT vec_id, embedding, nrm, " +
        s"unnest(${probesExpr("sig", "duck")}) AS psig FROM sigs WHERE vec_id < 30), " +
        "sc3 AS (SELECT q.vec_id AS q, c.vec_id AS b, " +
        s"round(${dotOf("q", "c")} / (q.nrm * c.nrm), 6) AS cos " +
        "FROM probed q JOIN sigs c ON q.psig = c.sig AND q.vec_id <> c.vec_id), " +
        "v3 AS (SELECT q, b FROM (SELECT q, b, " +
        "row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank FROM sc3) WHERE rank <= 3), " +
        // cosine-metric PQ over normalized subvectors (ADC, first-16 codebook)
        "nsub AS (SELECT vec_id, CAST(m AS INTEGER) AS m, " +
        "list_transform(embedding[CAST(m * 8 + 1 AS INTEGER):CAST(m * 8 + 8 AS INTEGER)], " +
        "x -> CAST(x AS DOUBLE) / nrm) AS sv " +
        "FROM (SELECT vec_id, embedding, nrm, unnest(generate_series(0, 7)) AS m FROM n)), " +
        "pcb AS (SELECT vec_id AS cid, m, sv AS cv FROM nsub WHERE vec_id < 16), " +
        "pasgn AS (SELECT s.vec_id, s.m, c.cid, " +
        "round(list_sum(list_transform(list_zip(s.sv, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS l2 " +
        "FROM nsub s JOIN pcb c ON s.m = c.m), " +
        "pcodes AS (SELECT vec_id AS b, m, cid AS code FROM " +
        "(SELECT vec_id, m, cid, row_number() OVER (PARTITION BY vec_id, m ORDER BY l2, cid) AS rk FROM pasgn) " +
        "WHERE rk = 1), " +
        "plut AS (SELECT s.vec_id AS q, s.m, c.cid, " +
        "list_sum(list_transform(list_zip(s.sv, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS contr " +
        "FROM nsub s JOIN pcb c ON s.m = c.m WHERE s.vec_id < 30), " +
        "padc AS (SELECT l.q AS q, c.b AS b, round(sum(l.contr), 6) AS d " +
        "FROM pcodes c JOIN plut l ON c.m = l.m AND c.code = l.cid WHERE l.q <> c.b " +
        "GROUP BY l.q, c.b), " +
        "v4 AS (SELECT q, b FROM (SELECT q, b, " +
        "row_number() OVER (PARTITION BY q ORDER BY d, b) AS rank FROM padc) WHERE rank <= 3), " +
        "nt AS (SELECT count(*) AS n_truth FROM btr) " +
        "SELECT 'ivf1' AS variant, nt.n_truth, " +
        "(SELECT count(*) FROM btr t JOIN v1 USING (q, b)) AS n_hits, " +
        "round(CAST((SELECT count(*) FROM btr t JOIN v1 USING (q, b)) AS DOUBLE) / nullif(nt.n_truth, 0), 4) AS recall FROM nt " +
        "UNION ALL SELECT 'ivf2', nt.n_truth, " +
        "(SELECT count(*) FROM btr t JOIN v2 USING (q, b)), " +
        "round(CAST((SELECT count(*) FROM btr t JOIN v2 USING (q, b)) AS DOUBLE) / nullif(nt.n_truth, 0), 4) FROM nt " +
        "UNION ALL SELECT 'lsh', nt.n_truth, " +
        "(SELECT count(*) FROM btr t JOIN v3 USING (q, b)), " +
        "round(CAST((SELECT count(*) FROM btr t JOIN v3 USING (q, b)) AS DOUBLE) / nullif(nt.n_truth, 0), 4) FROM nt " +
        "UNION ALL SELECT 'pq', nt.n_truth, " +
        "(SELECT count(*) FROM btr t JOIN v4 USING (q, b)), " +
        "round(CAST((SELECT count(*) FROM btr t JOIN v4 USING (q, b)) AS DOUBLE) / nullif(nt.n_truth, 0), 4) FROM nt " +
        "ORDER BY variant"
    },
    "q_embed_pca" ->
      // count the null-filtered rows the fit actually sees — the Spark
      // side's n_vecs is post-filter, so counting raw rows would break
      // parity on any corpus with null embeddings (review finding)
      ("SELECT (SELECT count(*) FROM embeddings WHERE embedding IS NOT NULL) AS n_vecs, 8 AS k, " +
        "1 AS orth_ok, 1 AS var_monotone, 1 AS var_bounded, " +
        "1 AS proj_bounded, 1 AS capture_monotone"),
    "q_ann_pq" -> {
      val l2 = (a: String, b: String) =>
        s"list_sum(list_transform(list_zip($a, $b), p -> " +
          "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
      "WITH sub AS (SELECT vec_id, CAST(m AS INTEGER) AS m, " +
        "embedding[CAST(m * 8 + 1 AS INTEGER):CAST(m * 8 + 8 AS INTEGER)] AS sv " +
        "FROM (SELECT vec_id, embedding, unnest(generate_series(0, 7)) AS m FROM embeddings)), " +
        "cb AS (SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 16), " +
        s"asgn AS (SELECT s.vec_id, s.m, c.cid, round(${l2("s.sv", "c.cv")}, 6) AS l2 " +
        "FROM sub s JOIN cb c ON s.m = c.m), " +
        "codes AS (SELECT vec_id AS b, m, cid AS code FROM " +
        "(SELECT vec_id, m, cid, row_number() OVER (PARTITION BY vec_id, m ORDER BY l2, cid) AS rk FROM asgn) " +
        "WHERE rk = 1), " +
        s"lut AS (SELECT s.vec_id AS q, s.m, c.cid, ${l2("s.sv", "c.cv")} AS contr " +
        "FROM sub s JOIN cb c ON s.m = c.m WHERE s.vec_id < 20), " +
        "adc AS (SELECT l.q AS q, c.b AS b, round(sum(l.contr), 6) AS adc_dist " +
        "FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid WHERE l.q <> c.b " +
        "GROUP BY l.q, c.b), " +
        "ranked AS (SELECT q, b, adc_dist, " +
        "CAST(row_number() OVER (PARTITION BY q ORDER BY adc_dist, b) AS INTEGER) AS rank FROM adc) " +
        "SELECT q, rank, b AS neighbor, adc_dist FROM ranked WHERE rank <= 3 ORDER BY q, rank"
    },
    "q_knn_label" ->
      ("WITH nl AS (SELECT vec_id, embedding, label, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings), " +
        "scored AS (SELECT q.vec_id AS q, q.label AS true_label, " +
        "c.label AS nl_label, c.vec_id AS b, " +
        s"round($duckDot / (q.nrm * c.nrm), 6) AS cos " +
        "FROM nl q JOIN nl c ON q.vec_id < 20 AND q.vec_id <> c.vec_id), " +
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank FROM scored), " +
        "vc AS (SELECT q, true_label, nl_label, count(*) AS votes FROM ranked WHERE rank <= 5 GROUP BY q, true_label, nl_label), " +
        "win AS (SELECT q, true_label, nl_label AS pred_label, votes, " +
        "row_number() OVER (PARTITION BY q ORDER BY votes DESC, nl_label) AS r FROM vc) " +
        "SELECT q, pred_label, CAST(votes AS BIGINT) AS votes, true_label, " +
        "pred_label = true_label AS correct FROM win WHERE r = 1 ORDER BY q")
  )
}
