package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming parity of the tumbling-window aggregate
  * (SURVEY.md §2.10 stretch): the same `window()` expression as
  * q_window_tumbling, fed incrementally from the events parquet via
  * readStream + memory sink, must agree with the batch answer. */
/** Top-level so Spark can derive an Encoder (local case classes capture an
  * outer pointer the product encoder cannot serialize). */
case class CdcChg(k: Long, seq: Long, op: String,
  price: Option[Double], status: Option[String])

class StreamingSpec extends SparkSpec {

  // events.ts has shipped as both TIMESTAMP(NANOS) (reads as raw-nanos Long)
  // and TIMESTAMP(MICROS, NTZ) across driver testdata generations; every
  // streaming read below takes its schema and ts conversion from the same
  // layout dispatch Tables.events uses, never a hardcoded `ts DIV 1000`.
  private lazy val layout = Tables.eventsLayout(spark, sf)

  test("streaming tumbling window == batch tumbling window") {
    // FileStreamSource requires a directory: stage the single parquet file.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    val stream = spark.readStream.schema(layout.schema)
      .parquet(dir.toString)
      .withColumn("ts", layout.tsTimestampExpr)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))

    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("stateful streaming: mapGroupsWithState running per-user counts == batch counts") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    import org.apache.spark.sql.types._
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    val counts = spark.readStream.schema(layout.schema).parquet(dir.toString)
      .select("user_id", "event_id").as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          (user, c)
      }

    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("state_out")
      .groupBy("_1").agg(org.apache.spark.sql.functions.max("_2").as("n"))
      .orderBy("_1").collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("flatMapGroupsWithState: threshold alerts fire once per crossing user") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_fmgws")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    // emit 0..1 rows per user per batch: an alert the first time a user's
    // cumulative value crosses 100 — the flatMap (variable arity) shape
    // mapGroupsWithState can't express.
    val alerts = spark.readStream.schema(layout.schema).parquet(dir.toString)
      .select("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Double)], state: GroupState[(Double, Boolean)]) =>
          val (prev, alerted) = state.getOption.getOrElse((0.0, false))
          val total = prev + it.map(_._2).sum
          val fire = !alerted && total > 100.0
          state.update((total, alerted || fire))
          if (fire) Iterator((user, total)) else Iterator.empty
      }

    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("alerts_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("alerts_out").collect()
      .map(r => r.getLong(0)).sorted
    val expected = Tables.events(spark, sf).groupBy("user_id")
      .agg(sum("value").as("s")).filter(col("s") > 100.0)
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(streamed.nonEmpty && streamed.sameElements(expected),
      "exactly the users whose total crosses 100 alert, each once")
  }

  test("streaming exact dedup: watermarked dropDuplicates == batch distinct") {
    // The streaming face of q_dedup_exact: content-hash dedup with
    // dropDuplicates over a watermarked stream — Spark keeps per-key state
    // only within the watermark horizon, so state is bounded at scale.
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))

    val deduped = spark.readStream.schema(schema).parquet(dir.toString)
      // synthetic event-time: documents carry none; a constant keeps every
      // row inside one watermark window for the equivalence check
      .withColumn("etime", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("h", md5(col("text")))
      .withWatermark("etime", "1 hour")
      .dropDuplicates("h", "etime")
      .select("h")

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamedN = spark.table("dedup_out").distinct().count()
    val batchN = Tables.documents(spark, sf)
      .select(md5(col("text"))).distinct().count()
    assert(streamedN == batchN && batchN > 0)
  }

  test("cross-microbatch dedup: duplicates arriving in a LATER batch drop via state") {
    // dedup-at-ingest, the streaming face of exactDedup: batch 2 replays
    // copies of batch-1 documents, so the only way the output stays
    // duplicate-free is the dropDuplicates state surviving the batch
    // boundary — a single-batch replay cannot prove that.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val raw = spark.read.schema(schema).parquet(s"$sf/documents.parquet")
    val med = raw.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0)
    val early = raw.filter(col("doc_id") < med)
    val late = raw.filter(col("doc_id") >= med)
      // planted cross-batch duplicates: every 7th early doc replayed late
      .unionByName(early.filter(col("doc_id") % 7 === 0))

    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_xbatch")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_dx_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(early, "0_early", 1000000L)
    stage(late, "1_late", 2000000L)

    val deduped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .withColumn("etime", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("h", md5(col("text")))
      .withWatermark("etime", "1 hour")
      .dropDuplicates("h", "etime")
      .select("h")

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_xbatch_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("dedup_xbatch_out")
    val batchN = raw.select(md5(col("text"))).distinct().count()
    assert(streamed.count() == batchN && batchN > 0,
      "replayed docs must be suppressed by state, not re-emitted")
    assert(streamed.distinct().count() == streamed.count(),
      "no hash may be emitted twice across batches")
  }

  test("streaming near-dedup: cross-microbatch candidate pairs == batch self-join") {
    // dedup-at-ingest for NEAR duplicates (StreamingDedup): batch 2 brings
    // mutated copies of batch-1 documents, so their candidate pairs can
    // only surface if the (band, bkey) bucket state carries the batch-1
    // signatures across the microbatch boundary. Ground truth is the
    // batch self-join over the SAME row-local banding projection.
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val mutated = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))

    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_nd_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw, "0_base", 1000000L)
    stage(mutated, "1_mutated", 2000000L)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val pairs = StreamingDedup.detect(stream)
    val q = pairs.toDF().writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("neardup_out")
      .select("a", "b", "est").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // batch ground truth: same banding projection, plain self-join
    val bb = StreamingDedup.withBandKeys(
      raw.unionByName(mutated), "doc_id", "text")
    val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
      col("sig").as("sa"))
    val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
      col("sig").as("sb"))
    val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
      .withColumn("est", expr(
        "CAST(size(filter(zip_with(sa, sb, (p, q) -> p = q), m -> m)) AS DOUBLE) / 8"))
      .filter(col("est") >= 0.5)
      .select("a", "b", "est").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(streamed == truth,
      s"streaming pairs must equal the batch self-join: " +
        s"missing=${truth -- streamed}, extra=${streamed -- truth}")
    // the cross-batch evidence: at least one pair links a mutated doc
    // (id >= 100000, batch 2) to its batch-1 original
    assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
      "mutated near-dups must pair with their batch-1 originals via state")
  }

  test("streaming simhash dedup: cross-microbatch banded H<=3 pairs == " +
      "batch self-join (Manku design at ingest)") {
    // The 64-bit banded simhash shipped this round, at ingest: batch 2
    // brings mutated copies of batch-1 documents; their pairs can only
    // surface if the (band, bkey) bucket state carries batch-1
    // signatures across the microbatch boundary. Ground truth is the
    // batch self-join over the SAME row-local banding projection.
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val mutated = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))

    val dir = java.nio.file.Files.createTempDirectory("graft_simhash_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sh_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw, "0_base", 1000000L)
    stage(mutated, "1_mutated", 2000000L)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = StreamingDedup.detectSimhash(stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("simhash_stream_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("simhash_stream_out")
      .select("a", "b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // batch ground truth: same banding projection, plain self-join,
    // distinct across bands
    val bb = StreamingDedup.withSimhashBandKeys(
      raw.unionByName(mutated), "doc_id", "text")
    val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
      col("sig").as("sa"))
    val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
      col("sig").as("sb"))
    val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
      .withColumn("hamming", expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> acc + " +
          "IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(streamed == truth,
      s"streaming simhash pairs must equal the batch self-join: " +
        s"missing=${truth -- streamed}, extra=${streamed -- truth}")
    assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
      "mutated docs must pair with their batch-1 originals via state")
  }

  test("hot-bucket cap fires a visible counter, not a silent drop") {
    // A mass-duplicated boilerplate document saturates its (band, bkey)
    // buckets; past maxBucket the bucket stops admitting (documented
    // superset-past-cap semantics). This test proves the cap event is
    // OBSERVABLE — an operator reading the accumulator between batches
    // sees saturation instead of mistaking a capped bucket for a quiet
    // one — and that emission stays bounded by the cap.
    import graft.streaming.StreamingDedup
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 10L).map(i => (i, boiler))
    val b1 = spark.createDataFrame(docs.take(5)).toDF("doc_id", "text")
    val b2 = spark.createDataFrame(docs.drop(5)).toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft_capfired")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_cf_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(b1, "0_first", 1000000L)
    stage(b2, "1_more", 2000000L)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val acc = spark.sparkContext.longAccumulator("graft.streaming.dedup.capFired")
    val pairs = StreamingDedup.nearDupPairs(
      StreamingDedup.withBandKeys(stream, "doc_id", "text"),
      minEst = 0.5, maxBucket = 3, capFired = Some(acc))
    val q = pairs.toDF().writeStream.outputMode("append")
      .format("memory").queryName("capfired_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    // 10 identical docs share one bkey per band (4 bands); cap 3 admits
    // docs 0-2 and refuses 3-9 in each → exactly 4 × 7 = 28 cap events.
    assert(acc.value == 28L,
      s"expected 28 cap-fired events (4 bands × 7 refused docs), got ${acc.value}")
    // and the cap bounded emission: only the 3 admitted members pair up
    val emitted = spark.table("capfired_out")
      .select("a", "b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"capped bucket must emit only the admitted members' pairs, got $emitted")
  }

  test("incremental sessionization: state carries open sessions across microbatches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    // Two files split at the median event time, one per microbatch
    // (maxFilesPerTrigger=1): every user's open session at the split must
    // survive in state and either continue or close in batch 2 — the real
    // incremental-sessionization contract, not a single-batch replay.
    val raw = spark.read.schema(layout.schema).parquet(s"$sf/events.parquet")
      .withColumn("us", layout.tsMicrosExpr)
    val med = raw.agg(expr("percentile(us, 0.5)")).head.getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sess_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("us") < med).drop("us"), "0_early", 1000000L)
    stage(raw.filter(col("us") >= med).drop("us"), "1_late", 2000000L)

    // state = (last event micros, sessions so far); 30-min gap like
    // q_sessionize. Each update emits the running per-user session count;
    // the last update per user is the final answer.
    val sessions = spark.readStream.schema(layout.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(col("user_id"), layout.tsMicrosExpr.as("us"),
        col("event_id")).as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (lastUs, n) = state.getOption.getOrElse((Long.MinValue, 0L))
          for ((_, us, _) <- it.toSeq.sortBy(e => (e._2, e._3))) {
            if (lastUs == Long.MinValue || us - lastUs > 1800000000L) n += 1
            lastUs = us
          }
          state.update((lastUs, n))
          Iterator((user, n))
      }

    val q = sessions.writeStream.outputMode("update")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("sess_out")
      .groupBy("_1").agg(max("_2").as("n")) // session count is monotone
      .orderBy("_1").collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "incremental session counts must equal the batch sessionization")
  }

  test("streaming markov: transition counts across microbatches == batch q_markov") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    // Same two-file median-time split as the sessionization test: each
    // user's LAST event type at the split must survive in state so the
    // boundary transition (last of batch 1 → first of batch 2) is counted
    // exactly once — the incremental analog of q_markov's lag window.
    val raw = spark.read.schema(layout.schema).parquet(s"$sf/events.parquet")
      .withColumn("us", layout.tsMicrosExpr)
    val med = raw.agg(expr("percentile(us, 0.5)")).head.getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_markov")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_markov_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("us") < med).drop("us"), "0_early", 1000000L)
    stage(raw.filter(col("us") >= med).drop("us"), "1_late", 2000000L)

    val trans = spark.readStream.schema(layout.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(col("user_id"), layout.tsMicrosExpr.as("us"),
        col("event_id"), col("event_type")).as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[String]) =>
          var prev = state.getOption.getOrElse("")
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          for ((_, _, _, t) <- it.toSeq.sortBy(e => (e._2, e._3))) {
            if (prev.nonEmpty) out += ((prev, t))
            prev = t
          }
          state.update(prev)
          out.iterator
      }

    val q = trans.writeStream.outputMode("append")
      .format("memory").queryName("markov_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("markov_out")
      .groupBy("_1", "_2").agg(count(lit(1)).as("n"))
      .orderBy("_1", "_2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val batch = SparkEntry.queries("q_markov")(spark, sf)
      .select("prev_type", "next_type", "n")
      .orderBy("prev_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "incremental transition counts must equal the batch markov matrix")
  }

  test("streaming drift monitor: incremental bin counts == batch q_drift inputs") {
    // The PSI drift gate run as a continuous monitor: documents arrive as
    // a stream, the (source, bin, snapshot) histogram aggregates
    // incrementally (complete mode), and the final bins must equal the
    // batch q_drift aggregation — binning and hash-snapshot assignment
    // are row-local, so streaming parity is exact, and PSI computed from
    // equal bins is equal by construction.
    val dir = java.nio.file.Files.createTempDirectory("graft_drift")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = Tables.documents(spark, sf).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("is_ref",
        expr("substring(md5(CAST(doc_id AS STRING)), 1, 1) < '8'"))
      .groupBy(col("source"), floor(col("n_chars") / 400).as("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cur_n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("drift_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("drift_out")
      .orderBy("source", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Tables.documents(spark, sf)
      .withColumn("is_ref",
        expr("substring(md5(CAST(doc_id AS STRING)), 1, 1) < '8'"))
      .groupBy(col("source"), floor(col("n_chars") / 400).as("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cur_n"))
      .orderBy("source", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming as-of join: stream-static backward as-of == batch q_join_asof") {
    // As-of-at-ingest: purchases ARRIVE as a stream, the click history is
    // static. Backward as-of is per-left-row against the static right
    // side, so microbatch boundaries cannot change the answer: each batch
    // runs the same union-tag window encoding as q_join_asof (clicks sort
    // before purchases at equal ts for the inclusive bound) over (batch
    // purchases ∪ all clicks), and the union of batch outputs must equal
    // the batch query exactly. foreachBatch is the stream-legal home for
    // the window (rank/last windows are unsupported on raw streams).
    val raw = spark.read.schema(layout.schema).parquet(s"$sf/events.parquet")
    val clicks = raw.filter(col("event_type") === "click")
      .withColumn("us", layout.tsMicrosExpr)
      .select(col("user_id"), col("us"), lit(0).as("is_p"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("click_id"),
        col("value").as("click_value"))

    val dir = java.nio.file.Files.createTempDirectory("graft_asof_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_as_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("event_id") % 2 === 0), "0_even", 1000000L)
    stage(raw.filter(col("event_id") % 2 === 1), "1_odd", 2000000L)

    val outDir = java.nio.file.Files.createTempDirectory("graft_asof_out")
    val stream = spark.readStream.schema(layout.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val purchases = batch.filter(col("event_type") === "purchase")
          .withColumn("us", layout.tsMicrosExpr)
          .select(col("user_id"), col("us"), lit(1).as("is_p"),
            col("event_id"),
            lit(null).cast("long").as("click_id"),
            lit(null).cast("double").as("click_value"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("is_p").asc)
          .rowsBetween(Long.MinValue, 0)
        purchases.unionByName(clicks)
          .withColumn("asof_click",
            last(col("click_id"), ignoreNulls = true).over(w))
          .withColumn("asof_value",
            last(col("click_value"), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1)
          .select(col("event_id"), col("user_id"),
            col("asof_click").as("click_id"),
            col("asof_value").as("click_value"))
          .write.mode("append").parquet(outDir.toString)
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)))
    val streamed = spark.read.parquet(outDir.toString)
      .orderBy("event_id").collect().map(key)
    val batchRes = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().map(key)
    assert(streamed.nonEmpty && streamed.sameElements(batchRes),
      "per-microbatch as-of against the static click history must equal the batch as-of")
  }

  test("stateful streaming as-of: per-user click state carries across microbatches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    // The TRUE streaming as-of (no static side): clicks and purchases
    // arrive in ONE time-ordered stream, split at the median event time so
    // batch 2's purchases can only match their batch-1 clicks through
    // per-user state surviving the microbatch boundary. State is O(1) per
    // user — exactly the latest click (ts, id, value) — which is what
    // makes backward as-of streamable at scale. Ground truth is the full
    // batch q_join_asof.
    val raw = spark.read.schema(layout.schema).parquet(s"$sf/events.parquet")
      .withColumn("us", layout.tsMicrosExpr)
    val med = raw.agg(expr("percentile(us, 0.5)")).head.getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_state")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_ass_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("us") < med).drop("us"), "0_early", 1000000L)
    stage(raw.filter(col("us") >= med).drop("us"), "1_late", 2000000L)

    val matched = spark.readStream.schema(layout.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), layout.tsMicrosExpr.as("us"), col("user_id"),
        (col("event_type") === "purchase").as("is_p"), col("value"))
      .as[(Long, Long, Long, Boolean, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, Boolean, Double)],
            state: GroupState[(Long, Long, Double)]) =>
          var last = state.getOption // latest click: (us, click_id, value)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Option[Long], Option[Double])]
          // within a batch, replay in event-time order; clicks sort before
          // purchases at equal ts — the batch encoding's inclusive >= bound
          for (e <- it.toSeq.sortBy(e => (e._2, e._4, e._1))) {
            if (!e._4) last = Some((e._2, e._1, e._5))
            else out += ((e._1, user, last.map(_._2), last.map(_._3)))
          }
          last.foreach(state.update)
          out.iterator
      }

    val q = matched.toDF("event_id", "user_id", "click_id", "click_value")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_state_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)))
    val streamed = spark.table("asof_state_out")
      .orderBy("event_id").collect().map(key)
    val batchRes = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().map(key)
    assert(streamed.nonEmpty && streamed.sameElements(batchRes),
      "stateful streaming as-of must equal the batch union-tag as-of")
    // the cross-batch evidence, asserted not assumed: at least one batch-2
    // purchase (us >= med) matched a batch-1 click (us < med), which only
    // state carried across the boundary can produce
    val ev = raw.select(col("event_id"), col("us"))
    val cross = spark.table("asof_state_out").as("m")
      .join(ev.as("p"), col("m.event_id") === col("p.event_id"))
      .join(ev.as("c"), col("m.click_id") === col("c.event_id"))
      .filter(col("p.us") >= med && col("c.us") < med).count()
    assert(cross > 0,
      "split must produce purchases whose as-of click lives in the earlier batch")
  }

  test("streaming embedding near-dedup: cross-microbatch pairs == batch multi-probe LSH") {
    // embedding-dedup-at-ingest (StreamingDedup.detectEmbedding): batch 2
    // brings ×2-scaled copies of batch-1 vectors (scaling is
    // signature-invariant, cosine 1.0), so their pairs can only surface if
    // the exact-signature buckets carry batch-1 members across the
    // boundary. Ground truth is the batch multi-probe path at the same
    // width.
    import graft.streaming.StreamingDedup
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val late = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))").as("embedding"))

    val dir = java.nio.file.Files.createTempDirectory("graft_embdup_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_ed_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(e, "0_base", 1000000L)
    stage(late, "1_late", 2000000L)

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val pairs = StreamingDedup.detectEmbedding(stream)
    val q = pairs.toDF().writeStream.outputMode("append")
      .format("memory").queryName("embdup_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val streamed = spark.table("embdup_out")
      .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.length == streamed.distinct.length,
      "emission must be exactly-once per pair")
    val truth = ops.Similarity.embeddingNearDup(
        e.unionByName(late), "vec_id", "embedding",
        bits = ops.Similarity.Planes, minCos = 0.9)
      .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSet == truth.toSet,
      s"streaming pairs must equal the batch multi-probe LSH: " +
        s"missing=${truth.toSet -- streamed.toSet}, extra=${streamed.toSet -- truth.toSet}")
    assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
      "late scaled copies must pair with their batch-1 originals via state")
  }

  test("streaming embedding near-dedup at a NON-DEFAULT width matches the " +
      "batch path (the rehearsal's widthForMult regime)") {
    // The 60× ingest rehearsal drives detectEmbedding at 14 bits — not
    // the default 8 — so batch/stream parity must hold for the
    // width-PARAMETERIZED signature and probe generation too: a drift in
    // sigExprN/probesExpr at any width ≠ Planes would pass the default
    // parity test above and silently diverge at scale.
    import graft.streaming.StreamingDedup
    val bits = 12
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val late = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_embdup_w12")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_edw_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(e, "0_base", 1000000L)
    stage(late, "1_late", 2000000L)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = StreamingDedup.detectEmbedding(stream, bits = bits)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("embdup_w12_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("embdup_w12_out")
      .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.length == streamed.distinct.length,
      "emission must be exactly-once per pair at width 12")
    val truth = ops.Similarity.embeddingNearDup(
        e.unionByName(late), "vec_id", "embedding",
        bits = bits, minCos = 0.9)
      .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSet == truth.toSet,
      s"width-12 streaming pairs must equal the width-12 batch LSH: " +
        s"missing=${truth.toSet -- streamed.toSet}, " +
        s"extra=${streamed.toSet -- truth.toSet}")
    // the scaled twins are signature-invariant at ANY width, so the
    // cross-batch state carry must still surface them
    assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
      "late scaled copies must pair with their originals at width 12")
  }

  test("streaming ingest projections drop dirty rows instead of wedging") {
    // poison rows (null/non-numeric id, null text, null embedding) must
    // be filtered by the stateless projections — under ANSI casts and
    // primitive-field encoders any of them would otherwise fail the
    // microbatch, and the checkpoint replays the same offsets forever
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val docs = Seq(("1", "a b c d"), ("oops", "e f g h"), (null, "i j"),
      ("4", null)).toDF("id", "text")
    val bandedIds = StreamingDedup.withBandKeys(docs, "id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(bandedIds == Set(1L),
      s"only the clean row survives banding, got $bandedIds")
    val vecs = Seq(("1", Array(1f, 0f)), ("nan", Array(0f, 1f)),
      ("3", null.asInstanceOf[Array[Float]]),
      (null.asInstanceOf[String], Array(1f, 1f))).toDF("vec_id", "embedding")
    val probedIds = StreamingDedup.withProbeKeys(vecs, "vec_id", "embedding", 8)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(probedIds == Set(1L),
      s"only the clean vector survives probing, got $probedIds")
  }

  test("streaming semdedup: offline-fit centroids admit batch-1, drop batch-2 copies") {
    // online SemDeDup (StreamingDedup.semDedupStream): centroids are fit
    // OFFLINE on the historic corpus (the batch fit-on-a-sample practice),
    // then the stream admits keep-first-arrival per cluster. Batch 2
    // brings ×2-scaled copies of batch-1 vectors — cosine-identical
    // centroid scores land them in their source's cluster, so they can
    // only be refused if the cluster state carries batch-1 members across
    // the microbatch boundary.
    import graft.streaming.StreamingDedup
    graft.functions.FloatDotProduct.register(spark)
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val late = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))").as("embedding"))
    val centers = ops.Similarity.fitCentroidsOn(
      e.withColumn("nrm", expr("sqrt(dot_f(embedding, embedding))")), 16)

    val dir = java.nio.file.Files.createTempDirectory("graft_semdd_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sd_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(e, "0_base", 1000000L)
    stage(late, "1_late", 2000000L)

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val verdicts = StreamingDedup.semDedupStream(stream, centers)
    val q = verdicts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("semdd_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val out = spark.table("semdd_out").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("kept"), r.getAs[Long]("witness")))).toMap
    val baseIds = e.select("vec_id").collect().map(_.getLong(0)).toSet
    val copyIds = late.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.size == baseIds.size + copyIds.size,
      "exactly one admission verdict per arriving vector")
    // batch 1: isotropic random vectors carry no 0.95-cosine organic
    // near-dups, so every base vector is admitted
    assert(baseIds.forall(out(_)._1), "all batch-1 vectors admitted")
    // batch 2: every ×2 copy refused, witnessed by its batch-1 source —
    // state crossed the microbatch boundary
    copyIds.foreach { id =>
      assert(!out(id)._1, s"copy $id must be refused")
      assert(out(id)._2 == id - 100000L,
        s"copy $id must be witnessed by its source, got ${out(id)._2}")
    }
  }

  test("streaming shard sink: foreachBatch AvroIO shards reassemble the corpus") {
    // training-shards-at-ingest: documents arrive as a stream and every
    // microbatch lands as Avro container shards (graft.sources.AvroIO,
    // one container per partition). The union of all shards read back
    // through the same IO must equal the batch corpus exactly — the sink
    // face of the q_scan_avro round-trip, across a batch boundary.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val raw = spark.read.schema(schema).parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_shard_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sh_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("doc_id") % 2 === 0), "0_even", 1000000L)
    stage(raw.filter(col("doc_id") % 2 === 1), "1_odd", 2000000L)

    val out = java.nio.file.Files.createTempDirectory("graft_shard_out")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        // one shard dir per microbatch: AvroIO.write overwrites its target,
        // so batches must not share one
        graft.sources.AvroIO.write(
          batch.select("doc_id", "text"), s"$out/batch_$id")
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split input must actually produce multiple microbatches")
    } finally q.stop()

    val shards = graft.sources.AvroIO.read(spark, s"$out/*")
    val shardAgg = shards.agg(count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(doc_id, text))").as("digest")).head
    val corpusAgg = raw.agg(count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(doc_id, text))").as("digest")).head
    assert(shardAgg == corpusAgg && corpusAgg.getLong(0) > 0,
      "reassembled shards must equal the batch corpus (order-independent digest)")
  }

  test("streaming decontamination: stream-static shingle semi-join == batch decontaminate") {
    // Decontamination-at-ingest: documents arrive as a stream, the eval
    // benchmark's (static, small-by-nature) shingle set joins against each
    // arriving doc's shingles — a stream-static equi semi-join, which is
    // append-mode-legal with no state, no watermark, and broadcasts the
    // static side. Contaminated doc ids out of the stream must equal the
    // batch decontaminate()'s complement exactly.
    val dir = java.nio.file.Files.createTempDirectory("graft_decon")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))

    val docs = Tables.documents(spark, sf)
    val eval = docs.filter(col("doc_id") % 97 === 3)
      .select(col("text").as("eval_text"))
    val kept = ops.Curation.decontaminate(docs, "doc_id", "text", eval, "eval_text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminatedTruth = all -- kept
    assert(contaminatedTruth.nonEmpty && kept.nonEmpty,
      "the planted eval overlap must split the corpus")

    // same 3-word shingles as Dedup.shinglesOf, row-local so stream-legal
    val shingles = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        expr("explode(transform(sequence(1, greatest(size(w) - 2, 1)), " +
          "i -> concat_ws(' ', try_element_at(w, i), " +
          "try_element_at(w, i + 1), try_element_at(w, i + 2))))").as("shingle"))
    val evalSh = shingles(
      eval.select(lit(0L).as("doc_id"), col("eval_text").as("text")))
      .select("shingle").distinct()
    val hits = shingles(spark.readStream.schema(schema).parquet(dir.toString))
      .join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .select("doc_id")
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamedContaminated = spark.table("decon_out")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(streamedContaminated == contaminatedTruth,
      s"stream/batch disagree: only-stream=${streamedContaminated -- contaminatedTruth} " +
        s"only-batch=${contaminatedTruth -- streamedContaminated}")
  }

  test("streaming CDC apply: latest-wins state across microbatches == batch q_cdc_apply") {
    // the streaming face of q_cdc_apply: all inserts land in microbatch 1,
    // every mutation (update / tombstone / re-insert) in microbatch 2 —
    // latest-wins can only happen in mapGroupsWithState state carried
    // across the batch boundary, not within a batch.
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import spark.implicits._

    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_totalprice").as("p"), col("o_orderstatus").as("st"))
    val ins = o.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
      round(col("p"), 2).as("price"), col("st").as("status"))
    val muts = o.filter(col("k") % 7 === 0)
      .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
        round(col("p") + 1.5, 2).as("price"), lit("R").as("status"))
      .unionByName(o.filter(col("k") % 13 === 0)
        .select(col("k"), lit(3L).as("seq"), lit("D").as("op"),
          lit(null).cast("double").as("price"),
          lit(null).cast("string").as("status")))
      .unionByName(o.filter(col("k") % 26 === 0)
        .select(col("k"), lit(4L).as("seq"), lit("I").as("op"),
          round(col("p"), 2).as("price"), col("st").as("status")))

    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_cdc_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(ins, "0_inserts", 1000000L)
    stage(muts, "1_mutations", 2000000L)

    val chgSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("op", StringType), StructField("price", DoubleType),
      StructField("status", StringType)))
    val applied = spark.readStream.schema(chgSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .as[CdcChg]
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[CdcChg], state: GroupState[CdcChg]) =>
          val latest = (rows ++ state.getOption.iterator).maxBy(_.seq)
          state.update(latest)
          latest
      }
    val q = applied.writeStream.outputMode("update")
      .format("memory").queryName("cdc_stream_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split changelog must produce multiple microbatches")
    } finally q.stop()

    // the memory sink holds one emission per (key, batch) — the final
    // materialized row per key is its max-seq emission
    val finalState = spark.table("cdc_stream_out").as[CdcChg].collect()
      .groupBy(_.k).map { case (_, rows) => rows.maxBy(_.seq) }
    val streamed = finalState
      .filter(c => c.op != "D" && (c.k % 7 == 0 || c.k % 13 == 0))
      .map(c => (c.k, c.seq, c.op, c.price.get, c.status.get)).toSet
    val batch = SparkEntry.queries("q_cdc_apply")(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("last_seq"),
        r.getAs[String]("last_op"), r.getAs[Double]("price"),
        r.getAs[String]("status"))).toSet
    assert(streamed == batch,
      s"stream/batch disagree: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
  }

  test("streaming heavy hitters: MG sketch aggregate keeps its guarantees over microbatches") {
    // the sketch as a STREAMING aggregate: complete-mode groupless agg
    // whose state is the k-entry MG map itself — corpus words stream in
    // two microbatches, and the partition-independent guarantees (no
    // overcount, presence + n/k bound for true heavy hitters) must hold
    // on the final sketch exactly as they do in batch.
    graft.functions.HeavyHittersAgg.register(spark)
    val k = graft.functions.HeavyHittersAgg.defaultK
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val raw = spark.read.schema(schema).parquet(s"$sf/documents.parquet")
    val med = raw.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0)

    val dir = java.nio.file.Files.createTempDirectory("graft_mg_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_mg_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw.filter(col("doc_id") < med), "0_early", 1000000L)
    stage(raw.filter(col("doc_id") >= med), "1_late", 2000000L)

    val words = "filter(split(text, ' '), x -> length(x) > 0)"
    val sketched = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(explode(expr(words)).as("term"))
      .agg(expr("mg_sketch(term)").as("mg"), count(lit(1)).as("n"))
    val q = sketched.writeStream.outputMode("complete")
      .format("memory").queryName("mg_stream_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        "split corpus must produce multiple microbatches")
    } finally q.stop()

    val row = spark.table("mg_stream_out").orderBy(desc("n")).head
    val m = row.getMap[String, Long](0)
    val n = row.getLong(1)
    val exact = Tables.documents(spark, sf)
      .select(explode(expr(words)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == exact.values.sum, "stream must have seen every word")
    assert(m.forall { case (t, est) => est <= exact(t) }, "no overcount")
    val heavy = exact.filter { case (_, c) => c > n.toDouble / k }
    assert(heavy.nonEmpty)
    for ((t, c) <- heavy) {
      assert(m.contains(t), s"true heavy hitter $t missing from stream sketch")
      assert(c - m(t) <= n.toDouble / k, s"undercount bound violated for $t")
    }
  }

  test("stateful dedup parity holds under the RocksDB state store " +
      "provider (the 100 TB deployment configuration)") {
    // Every stateful parity test above runs on the default HDFS-backed
    // (in-memory) provider; DESIGN.md's scale story says "at 100 TB the
    // state store is RocksDB on local disk". That swap must be
    // semantics-free: flatMapGroupsWithState reads/writes state through
    // the provider interface, so the SAME ingest pipeline under
    // RocksDBStateStoreProvider must emit the SAME cross-microbatch
    // pairs. The provider is a session conf read at stream START, so it
    // applies to this query only and is restored after.
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(col("doc_id") < 300)
    val mutated = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))

    val dir = java.nio.file.Files.createTempDirectory("graft_rocksdb_stream")
    def stage(part: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_rdb_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage(raw, "0_base", 1000000L)
    stage(mutated, "1_mutated", 2000000L)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val q = StreamingDedup.detectSimhash(stream).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("rocksdb_stream_out").start()
      try {
        q.processAllAvailable()
        assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
          "split input must actually produce multiple microbatches")
        // the provider actually engaged: the state operator reports
        // RocksDB-specific metrics the HDFS provider does not emit
        val custom = q.recentProgress.flatMap(p =>
          p.stateOperators.headOption.map(_.customMetrics.keySet()))
          .flatMap(_.toArray.map(_.toString))
        assert(custom.exists(_.toLowerCase.contains("rocksdb")),
          s"state operator must report RocksDB metrics, saw: " +
            custom.distinct.mkString(", "))
      } finally q.stop()
    } finally prevProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }

    val streamed = spark.table("rocksdb_stream_out")
      .select("a", "b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val bb = StreamingDedup.withSimhashBandKeys(
      raw.unionByName(mutated), "doc_id", "text")
    val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
      col("sig").as("sa"))
    val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
      col("sig").as("sb"))
    val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
      .withColumn("hamming", expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> acc + " +
          "IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(streamed == truth,
      s"RocksDB-backed pairs must equal the batch self-join: " +
        s"missing=${truth -- streamed}, extra=${streamed -- truth}")
    assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
      "cross-microbatch pairs must survive the provider swap")
  }

  // ------------------------------------------------------------------
  // Generation compaction (r11 task 3): parity across the boundary.
  // Each test ingests generation 1 with the plain stateful path, then
  // COMPACTS it into the bucketed index table, restarts with a fresh
  // checkpoint (empty state), ingests generation 2 with the
  // index-joined variant, and asserts gen1 ∪ gen2 pairs equal the batch
  // ground truth over the FULL corpus — the cross-boundary pairs can
  // only come from the index join, so a lost compaction shows up as
  // missing pairs, a state/index overlap as extras.
  // ------------------------------------------------------------------

  private def stageOne(dir: java.nio.file.Path,
      part: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_st_$name")
    part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val f = java.nio.file.Files.list(tmp)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dst = dir.resolve(s"$name.parquet")
    java.nio.file.Files.copy(f, dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  test("simhash compaction boundary: gen1 (stateful) + compact + gen2 " +
      "(index-joined, fresh state) == batch over the full corpus") {
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val mutated = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val idxTbl = s"graft_shc_idx_$tag"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_shc_idx").toString
    try {
      // generation 1: plain stateful ingest
      val dir1 = java.nio.file.Files.createTempDirectory("graft_shc_g1")
      stageOne(dir1, raw, "0_base", 1000000L)
      val s1 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir1.toString)
      val q1 = StreamingDedup.detectSimhash(s1).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("shc_g1").start()
      try q1.processAllAvailable() finally q1.stop()
      // compaction: gen1's banded rows land in the bucketed index table
      val index = StreamingDedup.compactSimhashIndex(
        raw, "doc_id", "text", s"$idxPath/idx", idxTbl)
      // generation 2: FRESH checkpoint/state, stateful + index join
      val dir2 = java.nio.file.Files.createTempDirectory("graft_shc_g2")
      stageOne(dir2, mutated, "0_mut", 1000000L)
      val s2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir2.toString)
      val q2 = StreamingDedup.simhashPairsWithIndex(
          StreamingDedup.withSimhashBandKeys(s2, "doc_id", "text"), index)
        .writeStream.outputMode("append")
        .format("memory").queryName("shc_g2").start()
      try q2.processAllAvailable() finally q2.stop()

      val streamed = spark.table("shc_g1").select("a", "b", "hamming")
        .unionByName(spark.table("shc_g2").select("a", "b", "hamming"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val bb = StreamingDedup.withSimhashBandKeys(
        raw.unionByName(mutated), "doc_id", "text")
      val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
        col("sig").as("sa"))
      val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
        col("sig").as("sb"))
      val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
        .withColumn("hamming", expr(
          "aggregate(sequence(1, 64), 0, (acc, i) -> acc + " +
            "IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
        .filter(col("hamming") <= 3)
        .select("a", "b", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == truth,
        s"compacted two-generation pairs must equal the batch self-join: " +
          s"missing=${truth -- streamed}, extra=${streamed -- truth}")
      assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
        "cross-boundary pairs must surface through the compacted index")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $idxTbl")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxPath))
    }
  }

  test("minhash compaction boundary: gen1 + compact + gen2 == batch") {
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val mutated = raw.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+", "zzz").as("text"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val idxTbl = s"graft_mhc_idx_$tag"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_mhc_idx").toString
    try {
      val dir1 = java.nio.file.Files.createTempDirectory("graft_mhc_g1")
      stageOne(dir1, raw, "0_base", 1000000L)
      val s1 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir1.toString)
      val q1 = StreamingDedup.detect(s1).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("mhc_g1").start()
      try q1.processAllAvailable() finally q1.stop()
      val index = StreamingDedup.compactMinhashIndex(
        raw, "doc_id", "text", s"$idxPath/idx", idxTbl)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_mhc_g2")
      stageOne(dir2, mutated, "0_mut", 1000000L)
      val s2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir2.toString)
      val q2 = StreamingDedup.nearDupPairsWithIndex(
          StreamingDedup.withBandKeys(s2, "doc_id", "text"), index)
        .writeStream.outputMode("append")
        .format("memory").queryName("mhc_g2").start()
      try q2.processAllAvailable() finally q2.stop()

      val streamed = spark.table("mhc_g1").select("a", "b", "est")
        .unionByName(spark.table("mhc_g2").select("a", "b", "est"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val bb = StreamingDedup.withBandKeys(
        raw.unionByName(mutated), "doc_id", "text")
      val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
        col("sig").as("sa"))
      val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
        col("sig").as("sb"))
      val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
        .withColumn("est", expr(
          "CAST(size(filter(zip_with(sa, sb, (p, q) -> p = q), m -> m)) AS DOUBLE) / 8"))
        .filter(col("est") >= 0.5)
        .select("a", "b", "est").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == truth,
        s"compacted two-generation pairs must equal the batch self-join: " +
          s"missing=${truth -- streamed}, extra=${streamed -- truth}")
      assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
        "cross-boundary pairs must surface through the compacted index")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $idxTbl")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxPath))
    }
  }

  test("CompactionPolicy semantics: thresholds, the batch floor, and " +
      "null progress") {
    import graft.streaming.StreamingDedup.CompactionPolicy
    val p = CompactionPolicy(maxStateRows = 1000, maxStateBytes = 1 << 20,
      minBatchesPerGeneration = 2)
    assert(!p.shouldCompact(999L, 100L, 5), "below both thresholds")
    assert(p.shouldCompact(1000L, 100L, 2), "row threshold fires at >=")
    assert(p.shouldCompact(10L, 1 << 20, 2), "byte threshold fires alone")
    assert(!p.shouldCompact(5000L, 1 << 21, 1),
      "the batch floor suppresses a first-batch fire (no thrashing)")
    assert(!p.shouldCompact(
      null: org.apache.spark.sql.streaming.StreamingQueryProgress, 9),
      "no progress yet never fires")
    intercept[IllegalArgumentException](CompactionPolicy(maxStateRows = 0))
  }

  test("policy-driven compaction: the CompactionPolicy trigger (not the " +
      "test) decides the generation boundary; parity holds across " +
      "however many generations it cuts") {
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val nChunks = 4
    val chunks = (0 until nChunks).map(k =>
      raw.filter(pmod(col("doc_id"), lit(nChunks.toLong)) === k))
    // threshold calibrated off chunk 0's bucket-group count (state rows =
    // one per (band, bkey) group), so the trigger fires mid-run at any
    // sf — the TEST never hardcodes a boundary index
    val g0 = StreamingDedup.withBandKeys(chunks(0), "doc_id", "text")
      .select("band", "bkey").distinct().count()
    val policy = StreamingDedup.CompactionPolicy(maxStateRows = g0 * 3 / 2)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val idxTbl = s"graft_pol_idx_$tag"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_pol_idx").toString
    val pairs = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val boundaryStateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    var gen = 0
    try {
      var index: org.apache.spark.sql.DataFrame = null
      var batchesThisGen = 0
      val genChunks =
        scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      var dir = java.nio.file.Files.createTempDirectory(s"graft_pol_g$gen")
      def start() = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        val out = if (gen == 0) StreamingDedup.detect(src).toDF()
          else StreamingDedup.nearDupPairsWithIndex(
            StreamingDedup.withBandKeys(src, "doc_id", "text"), index)
        out.writeStream.outputMode("append")
          .format("memory").queryName(s"pol_g$gen").start()
      }
      def drain(): Unit = {
        spark.table(s"pol_g$gen").select("a", "b", "est").distinct()
          .collect()
          .foreach(r => pairs += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
      }
      var q = start()
      for ((chunk, k) <- chunks.zipWithIndex) {
        stageOne(dir, chunk, f"c$k%02d", 1000000L * (k + 1))
        q.processAllAvailable()
        batchesThisGen += 1
        genChunks += chunk
        // THE SEAM UNDER TEST: the restart recipe runs iff the policy
        // fires (step 1 of the CompactionPolicy scaladoc recipe)
        if (k < nChunks - 1 &&
            policy.shouldCompact(q.lastProgress, batchesThisGen)) {
          boundaryStateRows +=
            q.lastProgress.stateOperators.map(_.numRowsTotal).sum
          q.stop() // step 2: stop between batches
          drain()
          index = StreamingDedup.compactMinhashIndex( // step 3: compact
            genChunks.reduce(_ unionByName _), "doc_id", "text",
            s"$idxPath/idx", idxTbl)
          gen += 1 // step 4: fresh checkpoint/state + index join
          batchesThisGen = 0
          genChunks.clear()
          dir = java.nio.file.Files.createTempDirectory(s"graft_pol_g$gen")
          q = start()
        }
      }
      q.stop()
      drain()
      assert(gen >= 1, "the policy never fired — threshold calibration " +
        s"is off (g0=$g0, maxStateRows=${policy.maxStateRows})")
      for (r <- boundaryStateRows)
        assert(r >= policy.maxStateRows,
          s"a boundary was cut below the policy threshold: $r")
      // parity over the FULL corpus, same ground truth as the fixed-
      // boundary tests — correct across however many cuts were made
      val bb = StreamingDedup.withBandKeys(raw, "doc_id", "text")
      val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
        col("sig").as("sa"))
      val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
        col("sig").as("sb"))
      val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
        .withColumn("est", expr(
          "CAST(size(filter(zip_with(sa, sb, (p, q) -> p = q), m -> m)) AS DOUBLE) / 8"))
        .filter(col("est") >= 0.5)
        .select("a", "b", "est").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs.toSet == truth,
        s"policy-cut generations must equal the batch self-join: " +
          s"missing=${truth -- pairs}, extra=${pairs.toSet -- truth}")
      assert(truth.exists { case (a, b, _) => a % nChunks != b % nChunks },
        "ground truth must contain cross-chunk pairs, or the index join " +
          "was never exercised")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $idxTbl")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxPath))
    }
  }

  test("compacting an EMPTY generation is safe: the index join over an " +
      "empty index changes nothing, and empty compaction does not fail") {
    // degenerate boundary: an operator may compact on a schedule even if
    // a generation ingested nothing (quiet pipeline). The empty compact
    // must still create a readable (empty) index table, and
    // simhashPairsWithIndex over it must emit exactly the plain
    // stateful pair set.
    import graft.streaming.StreamingDedup
    val raw = Tables.documents(spark, sf).select("doc_id", "text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val idxTbl = s"graft_emp_idx_$tag"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_emp_idx").toString
    try {
      val index = StreamingDedup.compactSimhashIndex(
        raw.filter(col("doc_id") < 0), "doc_id", "text",
        s"$idxPath/idx", idxTbl)
      assert(index.count() == 0, "empty generation compacts to empty index")
      val dir = java.nio.file.Files.createTempDirectory("graft_emp_g")
      stageOne(dir, raw, "0_base", 1000000L)
      val st = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val q = StreamingDedup.simhashPairsWithIndex(
          StreamingDedup.withSimhashBandKeys(st, "doc_id", "text"), index)
        .writeStream.outputMode("append")
        .format("memory").queryName("emp_idx_out").start()
      try q.processAllAvailable() finally q.stop()
      val withEmptyIdx = spark.table("emp_idx_out")
        .select("a", "b", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // plain stateful truth over the same single-generation corpus
      val bb = StreamingDedup.withSimhashBandKeys(raw, "doc_id", "text")
      val x = bb.select(col("band"), col("bkey"), col("doc_id").as("a"),
        col("sig").as("sa"))
      val y = bb.select(col("band"), col("bkey"), col("doc_id").as("b"),
        col("sig").as("sb"))
      val truth = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
        .withColumn("hamming", expr(
          "aggregate(sequence(1, 64), 0, (acc, i) -> acc + " +
            "IF(substring(sa, i, 1) = substring(sb, i, 1), 0, 1))"))
        .filter(col("hamming") <= 3)
        .select("a", "b", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(withEmptyIdx == truth,
        "an empty index must leave the stateful pair set unchanged")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $idxTbl")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxPath))
    }
  }

  test("embedding compaction boundary: gen1 + compact + gen2 == batch " +
      "multi-probe LSH, still exactly-once") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val late = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))").as("embedding"))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val bits = ops.Similarity.Planes
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val idxTbl = s"graft_emc_idx_$tag"
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_emc_idx").toString
    try {
      val dir1 = java.nio.file.Files.createTempDirectory("graft_emc_g1")
      stageOne(dir1, e, "0_base", 1000000L)
      val s1 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir1.toString)
      val q1 = StreamingDedup.detectEmbedding(s1, bits = bits).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("emc_g1").start()
      try q1.processAllAvailable() finally q1.stop()
      val index = StreamingDedup.compactEmbeddingIndex(
        e, "vec_id", "embedding", bits, s"$idxPath/idx", idxTbl)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_emc_g2")
      stageOne(dir2, late, "0_late", 1000000L)
      val s2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir2.toString)
      val q2 = StreamingDedup.embeddingPairsWithIndex(
          StreamingDedup.withProbeKeys(s2, "vec_id", "embedding", bits)
            .as[StreamingDedup.ProbedVec], index)
        .writeStream.outputMode("append")
        .format("memory").queryName("emc_g2").start()
      try q2.processAllAvailable() finally q2.stop()

      val streamed = spark.table("emc_g1")
        .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
        .unionByName(spark.table("emc_g2")
          .select(col("a"), col("b"), round(col("cos"), 6).as("c")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.length == streamed.distinct.length,
        "emission must stay exactly-once per pair across the boundary " +
          "(probes hit exact index signatures — one match per pair)")
      val truth = ops.Similarity.embeddingNearDup(
          e.unionByName(late), "vec_id", "embedding",
          bits = bits, minCos = 0.9)
        .select(col("a"), col("b"), round(col("cos"), 6).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.toSet == truth.toSet,
        s"compacted two-generation pairs must equal the batch LSH: " +
          s"missing=${truth.toSet -- streamed.toSet}, " +
          s"extra=${streamed.toSet -- truth.toSet}")
      assert(streamed.exists { case (a, b, _) => a < 100000L && b >= 100000L },
        "cross-boundary pairs must surface through the compacted index")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $idxTbl")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxPath))
    }
  }
}
