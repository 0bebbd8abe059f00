package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the dedup-at-ingest face of
  * [[graft.ops.Dedup]]: new documents are checked against everything seen
  * so far as they arrive, instead of re-running a corpus×corpus batch job
  * per ingestion cycle.
  *
  * Same sketch as the batch path (8×16-bit MinHash signature over 3-word
  * shingles, 4 bands × 2 rows), but computed ROW-LOCALLY with HOF folds:
  * `min` over a doc's shingle hashes needs no distinct and no groupBy, so
  * the signature is a stateless projection — legal in a streaming plan's
  * append mode and identical to the batch aggregate's result (min is
  * idempotent over duplicate shingles).
  *
  * Candidate detection is a [[flatMapGroupsWithState]] keyed by
  * (band, bkey): group state holds the bucket's members seen so far
  * (doc_id + signature), capped at the batch path's 512 hot-bucket
  * limit — a mass-duplicated boilerplate bucket stops accumulating state
  * and stops emitting once it reaches the cap. NOTE the cap semantics
  * are the ONLINE approximation of the batch cap, not an exact match:
  * batch candidatePairs drops an over-cap bucket's pairs ENTIRELY
  * (bucket size is known up front), while an online admitter has already
  * emitted the pairs among the first 512 members by the time the cap
  * engages — it cannot retroactively unemit. Batch-parity claims
  * (StreamingSpec) therefore hold on corpora whose buckets stay under
  * the cap; past it, streaming reports a superset of the batch pairs.
  * Each arriving doc emits one candidate pair per earlier member whose
  * signature agreement clears `minEst`.
  *
  * At scale: state is sharded by (band, bkey) across executors, each
  * group's state is ≤ cap members × 16 bytes of signature, and the
  * checkpoint carries it across restarts — the standard Structured
  * Streaming state story, no custom machinery.
  */
object StreamingDedup {

  /** A detected near-dup candidate: `a` < `b` by doc id, `est` = fraction
    * of agreeing signature positions (the unbiased MinHash Jaccard
    * estimator), `band` = which band's bucket surfaced it (the same pair
    * can surface in several bands; distinct on (a, b) downstream). */
  case class CandidatePair(a: Long, b: Long, est: Double, band: Int)

  // field names mirror withBandKeys' column names for the as[] mapping.
  // private[graft], not private: Catalyst's generated (de)serializers are
  // separate classes and need bytecode-public constructors.
  private[graft] case class BandedDoc(band: Int, bkey: String, doc_id: Long,
    sig: Seq[String])

  private[graft] case class BucketState(members: List[(Long, Seq[String])])

  /** Backtick-quote a caller-supplied column name before splicing it into
    * `expr(...)` SQL: a name with a space/hyphen must not fail to parse,
    * and a dotted name must resolve as the literal column — not silently
    * as struct-field access (the two regressions raw splicing invites).
    */
  private def quoteId(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Row-local MinHash signature + band keys. Emits one row per (doc ×
    * band): (band, bkey, doc_id, sig[8]). Works identically on batch and
    * streaming frames — the batch run IS the ground truth for the
    * streaming one (see StreamingSpec). */
  def withBandKeys(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val shingled = docs
      // mirror the batch path's null gates (Dedup.signaturesOf filters
      // null text): a null-text doc would otherwise get the md5("")
      // sentinel signature — every such doc pairwise-"matches" at
      // est=1.0, a divergence from the declared batch ground truth and
      // an artificial hot bucket. Dirty ids are expected at ingest:
      // try_cast + the null filter keep a poison row from failing the
      // microbatch (ANSI cast error / null primitive at deserialization)
      // and wedging the checkpoint on replay.
      .filter(col(textCol).isNotNull)
      .select(expr(s"try_cast(${quoteId(idCol)} AS BIGINT)").as("doc_id"),
        split(col(textCol), " ").as("w"))
      .filter(col("doc_id").isNotNull)
      .withColumn("hs",
        expr("transform(sequence(1, greatest(size(w) - 2, 1)), " +
          "i -> md5(concat_ws(' ', try_element_at(w, i), " +
          "try_element_at(w, i + 1), try_element_at(w, i + 2))))"))
    val sig = array((0 to 7).map(k =>
      expr(s"array_min(transform(hs, h -> substring(h, ${4 * k + 1}, 4)))")): _*)
    shingled
      .withColumn("sig", sig)
      .select(col("doc_id"), col("sig"), explode(array((0 to 3).map(b =>
        struct(lit(b).as("band"),
          md5(concat(expr(s"sig[${2 * b}]"), expr(s"sig[${2 * b + 1}]")))
            .as("bkey"))): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id"), col("sig"))
  }

  /** Stateful candidate detection over a banded stream (the output of
    * [[withBandKeys]] on a streaming frame). Within a microbatch the
    * group's rows are processed in doc_id order and compared against both
    * carried state and earlier in-batch members, so the emitted pair set
    * is independent of how the stream is chopped into batches.
    *
    * AT-CAP SEMANTICS (diverge from batch BY DESIGN): batch
    * `candidatePairs` drops an over-cap bucket ENTIRELY (`bsz BETWEEN 2
    * AND cap` — it can see the final occupancy before pairing), while
    * this path admits and pairs the FIRST `maxBucket` arrivals (a stream
    * cannot retract pairs already emitted when the bucket later
    * saturates). So on hot buckets the streamed pair set is a strict
    * superset of the batch output; batch == streaming parity holds
    * exactly for buckets whose total occupancy stays ≤ `maxBucket` (the
    * StreamingSpec parity tests stay under it).
    *
    * `capFired`: optional accumulator bumped once per arrival that a
    * full bucket refused to admit — the superset-past-cap semantics above
    * are only safe to rely on when an operator can SEE the cap engaging
    * (a silently saturated boilerplate bucket reads exactly like a quiet
    * one otherwise). Visible on the driver as a named accumulator in the
    * Spark UI / `acc.value` between batches. */
  def nearDupPairs(banded: DataFrame, minEst: Double = 0.5,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CandidatePair] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.as[BandedDoc]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          val prev = state.getOption.map(_.members).getOrElse(Nil)
          var members = prev
          val out = List.newBuilder[CandidatePair]
          // doc_id order makes in-batch pair emission deterministic
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            if (members.exists(_._1 == r.doc_id)) {
              // re-delivery of a known member: neither a pair source nor
              // a cap event
            } else if (members.size < maxBucket) {
              for ((oldId, oldSig) <- members; if oldId != r.doc_id) {
                val agree = (0 to 7).count(k => oldSig(k) == r.sig(k))
                val est = agree / 8.0
                if (est >= minEst)
                  out += CandidatePair(math.min(oldId, r.doc_id),
                    math.max(oldId, r.doc_id), est, key._1)
              }
              members = (r.doc_id, r.sig) :: members
            } else capFired.foreach(_.add(1L))
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** Convenience composition: documents stream in, distinct near-dup
    * candidate pairs stream out. `pairs.distinct` is left to the caller
    * (cross-band duplicates of the same (a, b) need a downstream
    * aggregation, whose output mode is the caller's choice). */
  def detect(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minEst: Double = 0.5): Dataset[CandidatePair] =
    nearDupPairs(withBandKeys(docs, idCol, textCol), minEst)

  // ---------------------------------------------------------------------
  // SimHash dedup-at-ingest — the streaming face of
  // ops.Dedup.simhashNearDupPairs (Manku/Jain/Das Sarma WWW'07: 64-bit
  // signature, Hamming ≤ 3 via 4-band pigeonhole). The signature is a
  // row-local codegen'd kernel call, so it is a stateless projection —
  // append-mode-legal — and the banding explode mirrors the batch path
  // exactly, so the batch self-join IS the streaming ground truth.
  // ---------------------------------------------------------------------

  /** A banded simhash candidate verified within the radius: `a` < `b` by
    * doc id, `hamming` = exact 64-bit Hamming distance, `band` = which
    * pigeonhole band's bucket surfaced it. Unlike the flip-probe paths
    * (where each qualifying pair matches in exactly one group), a pair
    * within H ≤ 3 can agree on SEVERAL bands — distinct on (a, b)
    * belongs downstream, same stance as [[CandidatePair]]. */
  case class SimhashPair(a: Long, b: Long, hamming: Int, band: Int)

  private[graft] case class SimBandedDoc(band: Int, bkey: String,
    doc_id: Long, sig: String)

  private[graft] case class SimBucketState(members: List[(Long, String)])

  /** Row-local 64-bit simhash + 4-band pigeonhole keys: one row per
    * (doc × band) — (band, bkey, doc_id, sig). Identical on batch and
    * streaming frames. Same null/poison gates as [[withBandKeys]]. */
  def withSimhashBandKeys(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextStats.register(docs.sparkSession)
    docs
      .filter(col(textCol).isNotNull)
      .select(expr(s"try_cast(${quoteId(idCol)} AS BIGINT)").as("doc_id"),
        coalesce(
          expr(s"graft_simhash(filter(split(${quoteId(textCol)}, ' '), " +
            "x -> length(x) > 0), 64)"),
          lit("0" * 64)).as("sig"))
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("sig"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("sig"), b * 16 + 1, 16).as("bkey"))): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id"), col("sig"))
  }

  private def hamming64(a: String, b: String): Int = {
    var h = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a.charAt(i) != b.charAt(i)) h += 1; i += 1 }
    h + math.abs(a.length - b.length)
  }

  /** Stateful in-bucket Hamming verification over a simhash-banded stream
    * (the output of [[withSimhashBandKeys]] on a streaming frame). Group =
    * one (band, bkey) bucket; state = its members (doc_id, sig), capped
    * like every other bucket state; `capFired` surfaces saturation, and
    * the at-cap semantics are the same admit-first-N superset-of-batch
    * divergence documented on [[nearDupPairs]] (batch parity holds only
    * for buckets whose occupancy stays ≤ `maxBucket`). Within a
    * microbatch rows process in ascending doc_id, so the emitted pair
    * set is batch-chop-independent. */
  def simhashPairs(banded: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[SimhashPair] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.as[SimBandedDoc]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[SimBandedDoc],
         state: GroupState[SimBucketState]) =>
          val prev = state.getOption.map(_.members).getOrElse(Nil)
          var members = prev
          val out = List.newBuilder[SimhashPair]
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            if (members.exists(_._1 == r.doc_id)) {
              // re-delivery: not a pair source, not a cap event
            } else if (members.size < maxBucket) {
              for ((oldId, oldSig) <- members; if oldId != r.doc_id) {
                val h = hamming64(oldSig, r.sig)
                if (h <= maxHamming)
                  out += SimhashPair(math.min(oldId, r.doc_id),
                    math.max(oldId, r.doc_id), h, key._1)
              }
              members = (r.doc_id, r.sig) :: members
            } else capFired.foreach(_.add(1L))
          }
          state.update(SimBucketState(members))
          out.result().iterator
      }
  }

  /** Convenience composition: documents stream in, radius-verified simhash
    * near-dup candidates stream out (distinct on (a, b) is the caller's
    * downstream aggregation — see [[SimhashPair]]). */
  def detectSimhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): Dataset[SimhashPair] =
    simhashPairs(withSimhashBandKeys(docs, idCol, textCol), maxHamming)

  // ---------------------------------------------------------------------
  // Embedding-space dedup-at-ingest — the streaming face of
  // ops.Similarity.embeddingNearDup: hyperplane LSH signature + Hamming≤1
  // multi-probe, exact cosine verified within buckets only.
  // ---------------------------------------------------------------------

  /** A cosine-verified embedding near-dup: `a` < `b` by vec id. */
  case class EmbPair(a: Long, b: Long, cos: Double)

  private[graft] case class ProbedVec(gkey: String, own: Boolean,
    vec_id: Long, embedding: Seq[Float], nrm: Double)

  private[graft] case class EmbBucketState(
    members: List[(Long, Seq[Float], Double)])

  /** Same ascending double fold as the codegen'd dot_f kernel, so the
    * streaming cosine is bit-identical to the batch path's. */
  private def dotSeq(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Row-local signature + multi-probe fan-out: one row per (vector ×
    * probe), `gkey` = the probed signature, `own` marks the identity probe
    * (the row that ADDS the vector to its exact-signature bucket; the
    * other bits+1-1 rows only LOOK). Stateless projection + explode —
    * append-mode-legal, identical on batch and streaming frames. */
  def withProbeKeys(vecs: DataFrame, idCol: String, vecCol: String,
      bits: Int): DataFrame = {
    graft.functions.FloatDotProduct.register(vecs.sparkSession)
    // null-gate BOTH fields (the batch twin embeddingNearDup silently
    // skips such rows): a null embedding yields nrm = null but a
    // non-null '000…' signature, so the row would reach the typed
    // deserializer and kill the microbatch on the primitive-Double nrm —
    // a poison row the checkpoint replays forever. Same for null or
    // non-numeric ids under ANSI cast.
    vecs.filter(col(vecCol).isNotNull)
      .select(expr(s"try_cast(${quoteId(idCol)} AS BIGINT)").as("vec_id"),
        col(vecCol).as("embedding"))
      .filter(col("vec_id").isNotNull)
      .withColumn("nrm", expr("sqrt(dot_f(embedding, embedding))"))
      .filter(col("nrm").isNotNull)
      .withColumn("sig", expr(graft.ops.Similarity.sigExprN("spark", bits)))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("sig"),
        explode(expr(graft.ops.Similarity.probesExpr("sig", "spark", bits)))
          .as("gkey"))
      .select(col("gkey"), (col("gkey") === col("sig")).as("own"),
        col("vec_id"), col("embedding"), col("nrm"))
  }

  /** Stateful in-bucket verification. Group = one exact-signature bucket;
    * state = its members (id, embedding, norm), capped like the text
    * path. Emission is exactly-once by construction: an arriving row
    * pairs with every PREVIOUS-batch member (their probe rows ran in
    * earlier batches and can never see this vector), and with earlier
    * in-batch members only through ascending vec_id processing — the
    * reverse-direction probe row sees an empty `fresh` and stays silent.
    * A pair (a, b) with Hamming(sig_a, sig_b) ≤ 1 matches in EXACTLY one
    * group (the exact signature of the stored side), so no cross-group
    * duplicates either. */
  def embeddingPairs(probed: Dataset[ProbedVec], minCos: Double = 0.9,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[EmbPair] = {
    val spark = probed.sparkSession
    import spark.implicits._
    probed.groupByKey(_.gkey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[ProbedVec],
         state: GroupState[EmbBucketState]) =>
          val old = state.getOption.map(_.members).getOrElse(Nil)
          var fresh = List.empty[(Long, Seq[Float], Double)]
          val out = List.newBuilder[EmbPair]
          for (r <- rows.toSeq.sortBy(_.vec_id)) {
            for ((mid, memb, mnrm) <- old ++ fresh; if mid != r.vec_id) {
              val cos = dotSeq(r.embedding, memb) / (r.nrm * mnrm)
              if (cos >= minCos)
                out += EmbPair(math.min(mid, r.vec_id),
                  math.max(mid, r.vec_id), cos)
            }
            // cap accounting mirrors the text path: only the identity
            // probe (the row that would STORE the vector) can fire it —
            // look-only probes never admit, so a full bucket isn't an
            // event for them
            if (r.own && !old.exists(_._1 == r.vec_id) &&
                !fresh.exists(_._1 == r.vec_id)) {
              if (old.size + fresh.size < maxBucket)
                fresh = fresh :+ ((r.vec_id, r.embedding, r.nrm))
              else capFired.foreach(_.add(1L))
            }
          }
          if (fresh.nonEmpty) state.update(EmbBucketState(old ++ fresh))
          out.result().iterator
      }
  }

  /** Convenience composition: embedding vectors stream in, cosine-verified
    * near-dup pairs stream out (distinct by construction — see
    * [[embeddingPairs]]). Width is the same corpus-size knob as the batch
    * path; pass ops.Similarity.autoBits(expectedCorpus) when sizing for
    * an ingest pipeline. */
  def detectEmbedding(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", bits: Int = graft.ops.Similarity.Planes,
      minCos: Double = 0.9): Dataset[EmbPair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    embeddingPairs(
      withProbeKeys(vecs, idCol, vecCol, bits).as[ProbedVec], minCos)
  }

  // ---------------------------------------------------------------------
  // Streaming SemDeDup — the online face of ops.Similarity.semDedup:
  // cluster against LEARNED centroids fit offline (on a historic corpus
  // or sample — the batch fit-on-a-sample practice, taken to its ingest
  // conclusion), keep-first-arrival within each cluster.
  // ---------------------------------------------------------------------

  /** Per-arrival admission verdict: `kept` = admitted to the corpus;
    * dropped rows carry the minimum-id kept member that witnessed them
    * (`witness`, with its cosine); kept rows carry witness = -1. Vectors
    * with no geometry (null / zero-norm) land in cluster -1 and are
    * always kept, mirroring the batch API. */
  case class SemVerdict(vec_id: Long, cid: Long, kept: Boolean,
    witness: Long, cos: Double)

  private[graft] case class SemVec(cid: Long, vec_id: Long,
    embedding: Seq[Float], nrm: Double)

  private[graft] case class SemClusterState(
    members: List[(Long, Seq[Float], Double)])

  /** Row-local nearest-centroid assignment — k·d flops inside one typed
    * map, so it is a stateless projection (append-mode-legal; the batch
    * path's broadcast-argmin AGGREGATE is not). Mirrors
    * [[graft.ops.Similarity.ivfAssign]] exactly: cosine rounded to 6 dp
    * (HALF_UP, like Spark's round), ties to the lowest centroid id —
    * identical vectors land in identical clusters on both paths. */
  def assignClusters(vecs: DataFrame, centers: Seq[(Long, Array[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding"): Dataset[SemVec] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = centers.map { case (cid, v) =>
        (cid, v.toSeq, math.sqrt(dotSeq(v.toSeq, v.toSeq)))
      }.filter(_._3 > 0).sortBy(_._1)
    // try_cast + null-id filter: a dirty id must not fail the microbatch
    // (ANSI cast error / null primitive Long) — an unidentifiable row
    // can't receive a verdict under any policy
    vecs.select(expr(s"try_cast(${quoteId(idCol)} AS BIGINT)").as("_1"),
        col(vecCol).cast("array<float>").as("_2"))
      .filter(col("_1").isNotNull)
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        val nrm = if (emb == null) 0.0 else math.sqrt(dotSeq(emb, emb))
        // non-finite norms (a NaN float in the vector, an overflowing
        // dot) carry no geometry either — route to the always-keep cell
        // rather than letting BigDecimal(NaN) throw and wedge the query
        // on a poison row the checkpoint would replay forever
        if (nrm == 0 || !java.lang.Double.isFinite(nrm) || cents.isEmpty)
          SemVec(-1L, id, emb, nrm)
        else {
          var bestCid = -1L; var bestCsim = Double.NegativeInfinity
          for ((cid, c, nc) <- cents) {
            val raw = dotSeq(emb, c) / (nrm * nc)
            if (java.lang.Double.isFinite(raw)) {
              val csim = BigDecimal(raw)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (csim > bestCsim) { bestCsim = csim; bestCid = cid }
            }
          }
          if (bestCid == -1L) SemVec(-1L, id, emb, nrm)
          else SemVec(bestCid, id, emb, nrm)
        }
      }
  }

  /** Stateful keep-first-arrival admission. Group = one centroid cell;
    * state = the cell's KEPT members (id, embedding, norm), capped at
    * `maxKept` (a cell at cap admits further arrivals without storing
    * them — ingestion never blocks, the cap only bounds state and
    * comparisons, same stance as the text path's hot-bucket cap). Every
    * vector belongs to exactly one group, so each arrival gets exactly
    * one verdict. Within a batch, rows process in ascending vec_id — on
    * an id-ordered stream with no near-dup chains this reproduces the
    * batch keep-min result exactly (chains differ by design: batch
    * keep-min drops a doc witnessed by an already-dropped doc, an online
    * admitter cannot). */
  def semVerdicts(assigned: Dataset[SemVec], tau: Double = 0.95,
      maxKept: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[SemVerdict] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.groupByKey(_.cid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cid: Long, rows: Iterator[SemVec],
         state: GroupState[SemClusterState]) =>
          if (cid == -1L)
            rows.map(r => SemVerdict(r.vec_id, -1L, kept = true, -1L, 0.0))
              .toList.iterator
          else {
            val old = state.getOption.map(_.members).getOrElse(Nil)
            var fresh = List.empty[(Long, Seq[Float], Double)]
            val out = List.newBuilder[SemVerdict]
            for (r <- rows.toSeq.sortBy(_.vec_id)) {
              // min-id qualifying witness for a deterministic verdict;
              // mid != vec_id: a re-delivered id already in state must
              // not be "witnessed by itself" (cos 1.0) and flip from
              // kept to dropped — same self-guard as the pair paths
              val hit = (old ++ fresh).iterator
                .filter(_._1 != r.vec_id)
                .map { case (mid, memb, mnrm) =>
                  (mid, dotSeq(r.embedding, memb) / (r.nrm * mnrm))
                }
                .filter(_._2 >= tau)
                .foldLeft(Option.empty[(Long, Double)]) {
                  case (best, cand) =>
                    if (best.forall(_._1 > cand._1)) Some(cand) else best
                }
              hit match {
                case Some((wid, cos)) =>
                  out += SemVerdict(r.vec_id, cid, kept = false, wid,
                    BigDecimal(cos).setScale(6,
                      BigDecimal.RoundingMode.HALF_UP).toDouble)
                case None =>
                  // re-delivery of an already-kept id re-affirms kept
                  // without storing a duplicate state entry
                  if (!old.exists(_._1 == r.vec_id) &&
                      !fresh.exists(_._1 == r.vec_id)) {
                    if (old.size + fresh.size < maxKept)
                      fresh = fresh :+ ((r.vec_id, r.embedding, r.nrm))
                    // kept-but-not-stored: the cell is saturated, so this
                    // admission is invisible to future near-dup checks —
                    // exactly the event an operator needs to see
                    else capFired.foreach(_.add(1L))
                  }
                  out += SemVerdict(r.vec_id, cid, kept = true, -1L, 0.0)
              }
            }
            if (fresh.nonEmpty) state.update(SemClusterState(old ++ fresh))
            out.result().iterator
          }
      }
  }

  /** Convenience composition: vectors stream in, admission verdicts
    * stream out. `centers` comes from an offline fit
    * ([[graft.ops.Similarity.fitCentroidsOn]] on a historic corpus) —
    * learned once, broadcast into the tasks as a few KB of closure. */
  def semDedupStream(vecs: DataFrame, centers: Seq[(Long, Array[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding",
      tau: Double = 0.95): Dataset[SemVerdict] =
    semVerdicts(assignClusters(vecs, centers, idCol, vecCol), tau)

  // ---------------------------------------------------------------------
  // Generation compaction (r11 verdict task 3) — bounded state for
  // LONG-LIVED ingest.
  //
  // The r10 rehearsal measured the scale-killer-in-waiting of the pure
  // stateful designs: MinHash state grows linearly with everything ever
  // ingested (~500 MB at 60× and climbing), and the embedding path's
  // per-arrival rate declines monotonically as buckets fill. The fix is
  // the standard LSM move: run ingest in GENERATIONS. Within a
  // generation the stateful paths above detect pairs exactly as before;
  // at a generation boundary the operator COMPACTS the generation's rows
  // into a bucketed static index table (the q_simhash_index /
  // q_dedup_index machinery) and restarts the stream with a FRESH
  // checkpoint (empty state). The next generation then detects
  //   - new-vs-new (same generation): the stateful path, state bounded
  //     by ONE generation's corpus;
  //   - new-vs-history: a stream-static equi-join against the bucketed
  //     index — the index side never shuffles (bucketed on the join
  //     key), only the microbatch moves, and lookup cost is independent
  //     of how many generations history holds.
  // The two pair sources are DISJOINT by construction (a doc is either
  // in this generation's state or in the compacted index, never both —
  // the fresh-checkpoint restart is the caller's contract), so the union
  // double-counts nothing and cross-boundary parity with the batch path
  // holds exactly (StreamingSpec pins it).
  // ---------------------------------------------------------------------

  /** WHEN to compact — the production trigger for the generation
    * machinery below (r11 verdict task 3: the boundary was previously
    * the caller's fixed-schedule job). A pure predicate over the state
    * metrics Structured Streaming already publishes on every microbatch
    * (`StreamingQueryProgress.stateOperators`): fire when total state
    * rows or bytes cross a threshold, but never before
    * `minBatchesPerGeneration` batches (a floor so a threshold
    * misconfigured below one batch's state can't thrash
    * compact-per-batch).
    *
    * RESTART RECIPE (the caller's loop; ScaleRehearsal's
    * runCompactingWorkload is the reference implementation and
    * StreamingSpec pins parity):
    *   1. run the generation's stream (stateful path for generation 0,
    *      [[simhashPairsWithIndex]] / [[nearDupPairsWithIndex]] /
    *      [[embeddingPairsWithIndex]] after) and AFTER EACH microbatch
    *      ask `policy.shouldCompact(query.lastProgress, batchesThisGen)`;
    *   2. when it fires: STOP the stream (between batches — `q.stop()`
    *      after `processAllAvailable`, or from a
    *      StreamingQueryListener.onQueryProgress signal);
    *   3. compact the generation's corpus into the bucketed history
    *      index ([[compactSimhashIndex]] & friends — idempotent cap
    *      against existing contents);
    *   4. resume with a FRESH checkpoint (empty state) and the
    *      *WithIndex pipeline joining the reloaded index table.
    * The fresh checkpoint is what makes the state/index sides disjoint
    * (a doc is in this generation's state XOR the compacted index), so
    * parity with the batch path survives every boundary. */
  final case class CompactionPolicy(
      maxStateRows: Long = Long.MaxValue,
      maxStateBytes: Long = Long.MaxValue,
      minBatchesPerGeneration: Int = 1) {
    require(maxStateRows > 0 && maxStateBytes > 0 &&
      minBatchesPerGeneration >= 1, "thresholds must be positive")

    /** The pure core (spec-pinned): fire iff past the batch floor AND
      * either metric crossed its threshold. */
    def shouldCompact(stateRows: Long, stateBytes: Long,
        batchesThisGeneration: Int): Boolean =
      batchesThisGeneration >= minBatchesPerGeneration &&
        (stateRows >= maxStateRows || stateBytes >= maxStateBytes)

    /** Progress-reading face: sums across state operators (the dedup
      * pipelines run one, but a caller may compose more). Null progress
      * (no batch yet) never fires. */
    def shouldCompact(
        progress: org.apache.spark.sql.streaming.StreamingQueryProgress,
        batchesThisGeneration: Int): Boolean =
      progress != null && shouldCompact(
        progress.stateOperators.map(_.numRowsTotal).sum,
        progress.stateOperators.map(_.memoryUsedBytes).sum,
        batchesThisGeneration)
  }

  /** Append `docs`' banded simhash rows to the compacted-history table
    * (created on first call), bucketed + sorted on the bucket key so
    * every later generation's [[simhashPairsWithIndex]] join reads it
    * with zero index-side exchange. Hot buckets are capped at
    * `maxBucket` members TOTAL across all compactions (ascending doc_id
    * within a call — the same first-N-admitted semantics the online cap
    * enforces; earlier generations' admissions count against the
    * budget, so a boilerplate bucket's cross-join fan-out stays bounded
    * by `maxBucket` regardless of how many generations a long-lived
    * ingest compacts). Returns the reloaded table. */
  def compactSimhashIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, table: String, buckets: Int = 8,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket): DataFrame = {
    val s = docs.sparkSession
    writeCapped(capAgainstExisting(
        withSimhashBandKeys(docs, idCol, textCol),
        Seq("band", "bkey"), "doc_id", maxBucket, s, table),
      path, table, buckets)
    s.table(table)
  }

  /** Append `docs`' banded MinHash rows to the compacted-history table —
    * same contract as [[compactSimhashIndex]]. */
  def compactMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, table: String, buckets: Int = 8,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket): DataFrame = {
    val s = docs.sparkSession
    writeCapped(capAgainstExisting(
        withBandKeys(docs, idCol, textCol),
        Seq("band", "bkey"), "doc_id", maxBucket, s, table),
      path, table, buckets)
    s.table(table)
  }

  /** Append `vecs`' exact-signature rows (the identity probe only — one
    * row per vector) to the compacted-history table, bucketed on the
    * signature. Same contract as [[compactSimhashIndex]]; the cap keys
    * on the exact signature. */
  def compactEmbeddingIndex(vecs: DataFrame, idCol: String, vecCol: String,
      bits: Int, path: String, table: String, buckets: Int = 8,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket): DataFrame = {
    val s = vecs.sparkSession
    val own = withProbeKeys(vecs, idCol, vecCol, bits)
      .filter(col("own"))
      .select(col("gkey").as("bkey"), col("vec_id"), col("embedding"),
        col("nrm"))
    writeCapped(
      capAgainstExisting(own, Seq("bkey"), "vec_id", maxBucket, s, table),
      path, table, buckets)
    s.table(table)
  }

  /** First-N-per-bucket cap with the admission budget charged against
    * what earlier compactions already wrote: rank this call's rows
    * ascending `idCol` within each bucket (one offline window per
    * compaction — a batch job, not the ingest hot path), then admit only
    * ranks ≤ `maxBucket − already-in-table`. The existing per-bucket
    * counts (one small row per bucket) are materialized eagerly so the
    * append never reads the table it is writing. */
  private def capAgainstExisting(rows: DataFrame, keys: Seq[String],
      idCol: String, maxBucket: Int, s: SparkSession, table: String)
      : DataFrame = {
    val ranked = rows.withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(idCol)))
    if (!s.catalog.tableExists(table)) {
      ranked.filter(col("_rk") <= maxBucket).drop("_rk")
    } else {
      val have = s.table(table).groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_have"))
        .localCheckpoint(true) // snapshot BEFORE the self-append starts
      ranked.join(have, keys, "left")
        .filter(col("_rk") <= lit(maxBucket.toLong)
          - coalesce(col("_have"), lit(0L)))
        .drop("_rk", "_have")
    }
  }

  private def writeCapped(df: DataFrame, path: String, table: String,
      buckets: Int): Unit =
    df.write.mode("append").bucketBy(buckets, "bkey").sortBy("bkey")
      .option("path", path).saveAsTable(table)

  private val packedHamming =
    "CAST(bit_count(CAST(conv(substring(sig, 1, 32), 2, 10) AS BIGINT) ^ " +
      "CAST(conv(substring(i_sig, 1, 32), 2, 10) AS BIGINT)) + " +
      "bit_count(CAST(conv(substring(sig, 33, 32), 2, 10) AS BIGINT) ^ " +
      "CAST(conv(substring(i_sig, 33, 32), 2, 10) AS BIGINT)) AS INT)"

  /** [[simhashPairs]] plus the cross-generation index join: in-generation
    * pairs from the stateful path, history pairs from a stream-static
    * equi-join on (band, bkey) against the compacted index (exact packed
    * popcount-of-xor Hamming verified on candidates only, like the batch
    * path). `index` is [[compactSimhashIndex]]'s table; ingest this
    * generation against a FRESH checkpoint, or state/index overlap will
    * duplicate pairs. CALLER CONTRACT — unique ids per generation: the
    * stateful side suppresses a doc_id re-delivered in a later
    * microbatch (its bucket state remembers it), but the index join is
    * stateless and would re-emit that doc's (doc, history) pairs once
    * per delivery, so an at-least-once source must be deduplicated on
    * doc_id upstream (e.g. `dropDuplicates("doc_id")` with a watermark)
    * before this operator — the exactly-once pair claim holds for
    * exactly-once arrivals. Emits the same (a, b, hamming, band) shape —
    * cross-band duplicates of one (a, b) stay the caller's downstream
    * distinct, same stance as the stateful path. */
  def simhashPairsWithIndex(banded: DataFrame, index: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val idx = index.select(col("band"), col("bkey"),
      col("doc_id").as("i_doc"), col("sig").as("i_sig"))
    val cross = banded.join(idx, Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("i_doc"))
      .withColumn("hamming", expr(packedHamming))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("doc_id"), col("i_doc")).as("a"),
        greatest(col("doc_id"), col("i_doc")).as("b"),
        col("hamming"), col("band"))
    simhashPairs(banded, maxHamming, maxBucket, capFired).toDF()
      .unionByName(cross)
  }

  /** [[nearDupPairs]] plus the cross-generation index join — MinHash
    * agreement estimated slot-wise on (band, bkey) candidates, same
    * contract as [[simhashPairsWithIndex]]. */
  def nearDupPairsWithIndex(banded: DataFrame, index: DataFrame,
      minEst: Double = 0.5,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val idx = index.select(col("band"), col("bkey"),
      col("doc_id").as("i_doc"), col("sig").as("i_sig"))
    val cross = banded.join(idx, Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("i_doc"))
      .withColumn("est", expr(
        "size(filter(zip_with(sig, i_sig, (x, y) -> x = y), v -> v)) / 8.0D"))
      .filter(col("est") >= minEst)
      .select(least(col("doc_id"), col("i_doc")).as("a"),
        greatest(col("doc_id"), col("i_doc")).as("b"),
        col("est"), col("band"))
    nearDupPairs(banded, minEst, maxBucket, capFired).toDF()
      .unionByName(cross)
  }

  /** [[embeddingPairs]] plus the cross-generation index join: the
    * arriving side's bits+1 probe rows equi-join the index's EXACT
    * signatures, so a Hamming≤1 pair still matches in exactly one probe —
    * the stateful path's exactly-once property carries over; exact cosine
    * (the codegen'd dot_f kernel) verified on candidates only. Same
    * fresh-checkpoint contract as [[simhashPairsWithIndex]]. */
  def embeddingPairsWithIndex(probed: Dataset[ProbedVec], index: DataFrame,
      minCos: Double = 0.9,
      maxBucket: Int = graft.ops.Dedup.defaultMaxBucket,
      capFired: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    graft.functions.FloatDotProduct.register(probed.sparkSession)
    val idx = index.select(col("bkey").as("gkey"),
      col("vec_id").as("i_vec"), col("embedding").as("i_emb"),
      col("nrm").as("i_nrm"))
    val cross = probed.toDF().join(idx, Seq("gkey"))
      .filter(col("vec_id") =!= col("i_vec"))
      .withColumn("cos",
        expr("dot_f(embedding, i_emb)") / (col("nrm") * col("i_nrm")))
      .filter(col("cos") >= minCos)
      .select(least(col("vec_id"), col("i_vec")).as("a"),
        greatest(col("vec_id"), col("i_vec")).as("b"), col("cos"))
    embeddingPairs(probed, minCos, maxBucket, capFired).toDF()
      .unionByName(cross)
  }
}
