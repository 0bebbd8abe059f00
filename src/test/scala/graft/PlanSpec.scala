package graft

/** Physical-plan shape assertions: the 100 TB design properties (pushdown,
  * broadcast, no gratuitous shuffles, heap-based top-k) locked in as tests
  * so a regression in query construction fails loudly, not just slowly. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q_group_agg: shipdate filter pushed to the parquet scan, partial+final agg") {
    val p = plan("q_group_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter must reach the scan")
    assert(countOccurrences(p, "HashAggregate") >= 2, "expect partial+final aggregation")
  }

  test("q_group_agg: scan reads only the needed columns") {
    val p = plan("q_group_agg")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"unused columns not pruned: $read")
  }

  test("q_join_inner: dimension side broadcast (no fact shuffle for the join)") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("q_join_band: stays an equi hash join with the band as residual (no BNLJ)") {
    val p = plan("q_join_band")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "band condition must not degrade the join to a nested loop")
  }

  test("q_topk: compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_join_asof: exactly one shuffle before the running window") {
    val p = plan("q_join_asof")
    // user_id exchange for the window + the final output sort = 2 exchanges
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 1,
      s"as-of join should shuffle once by user_id:\n$p")
  }

  test("q_cumsum: one Window exec serves all three running aggregates") {
    val p = plan("q_cumsum")
    assert(countOccurrences(p, "RunningWindowFunction") <= 1 &&
      countOccurrences(p, "Window") - countOccurrences(p, "WindowGroupLimit") >= 1)
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 1,
      "all per-user running aggs must share one shuffle")
  }

  test("q_ann_bruteforce: query side broadcast, native dot_f in the plan") {
    val p = plan("q_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("dot_f"), "native expression should appear in the plan")
  }

  test("q_ann_ivf: cell search is a hash equi-join on the centroid cell") {
    val p = plan("q_ann_ivf")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"cell-to-cell candidate join must be an equi-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      "only the bounded 16-row centroid broadcast may be non-equi")
  }

  test("q_time_funcs: pure row-local projection — zero hash exchanges") {
    assert(countOccurrences(plan("q_time_funcs"), "Exchange hashpartitioning") == 0)
  }

  test("q_dedup_minhash: banding chain never degrades to cartesian/BNLJ") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_pipeline_curate: the whole curation pipeline stays equi-join-only") {
    val p = plan("q_pipeline_curate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no stage of the pipeline may fall back to an all-pairs product")
  }

  test("q_qcut_cutpoints: broadcast cut points, no window anywhere") {
    val p = plan("q_qcut_cutpoints")
    assert(p.contains("BroadcastHashJoin"), "cut points must broadcast onto the fact side")
    assert(!p.contains("Window"), s"no window may appear in the scale qcut:\n$p")
  }

  test("q_roc_binned: cumulative window runs over the bin aggregate, not raw rows") {
    val p = plan("q_roc_binned")
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, "binned ROC keeps one cumulative window over bins")
    assert(p.indexOf("HashAggregate", wIdx) > wIdx,
      "the window input must be the bounded per-bin aggregate, not the corpus")
  }

  test("q_quality_classifier_binned: AUC window runs over the bin aggregate, not held-out rows") {
    // the binned-AUC core on a synthetic scored frame (the full query
    // localCheckpoints its 1-row output, hiding the internal plan): the
    // cumulative window's input must be the bounded per-bin aggregate
    import spark.implicits._
    val scored = Seq((0.5, 1.0), (-0.3, 0.0), (1.2, 1.0), (0.1, 0.0))
      .toDF("margin", "label")
    val p = ops.Analytics.binnedAucAgg(scored)
      .queryExecution.executedPlan.toString
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, "binned AUC keeps one cumulative window over bins")
    assert(p.indexOf("HashAggregate", wIdx) > wIdx,
      "the window input must be the bounded per-bin aggregate, not the held-out rows")
  }

  test("q_dedup_embedding: LSH signature equi-join, no driver materialization") {
    val p = plan("q_dedup_embedding")
    assert(!p.contains("Scan ExistingRDD") && !p.contains("MapPartitions") &&
      !p.contains("LocalTableScan"),
      s"corpus must stay distributed (no collect/parallelize):\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "candidate generation must be an equi-join on the LSH signature")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "must not degrade to an all-pairs product")
  }

  test("q_dedup_simhash: bucket sizes via partial+final aggregate, no whole-bucket window") {
    val p = plan("q_dedup_simhash")
    assert(countOccurrences(p, "HashAggregate") >= 2,
      "bucket count must be a map-side-combined aggregate")
    assert(!p.contains("Window"),
      s"bucket count must not buffer whole signature buckets in one task:\n$p")
  }

  test("q_group_head: rank filter becomes WindowGroupLimit (pre-shuffle top-n)") {
    assert(plan("q_group_head").contains("WindowGroupLimit"))
  }

  test("q_group_sample: per-group sample rank-filter becomes WindowGroupLimit") {
    assert(plan("q_group_sample").contains("WindowGroupLimit"),
      "the k-per-source filter must pre-trim map-side — `source` is " +
        "low-cardinality, so a full window would route whole sources to one task")
  }

  test("q_sample_temperature: mix thresholds broadcast, corpus filter row-local") {
    val p = plan("q_sample_temperature")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny per-source threshold table must broadcast onto the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_embed_centroids: one partial+final aggregate, no collect_list") {
    val p = plan("q_embed_centroids")
    assert(countOccurrences(p, "HashAggregate") >= 2,
      "centroid sums must map-side combine on the (label, dim) key")
    assert(!p.contains("collect_list") && !p.contains("Window"),
      s"no vector buffering may appear in the centroid plan:\n$p")
  }

  test("q_join_asof_native: custom AsOfJoin exec with sort-merge movement (all strategies)") {
    for (n <- Seq("q_join_asof_native", "q_join_asof_fwd_native",
        "q_join_asof_nearest_native", "q_join_asof_tol_native")) {
      val p = plan(n)
      assert(p.contains("AsOfJoin"), s"$n: custom operator must be planned")
      assert(countOccurrences(p, "Exchange hashpartitioning") == 2,
        s"$n: one hash exchange per side, nothing else")
    }
  }

  test("q_contamination: benchmark shingles broadcast, corpus never all-pairs") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"),
      "the (small) eval shingle set must broadcast onto the corpus side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_pii_redact: row-local scan-speed redaction, zero hash exchanges") {
    assert(countOccurrences(plan("q_pii_redact"), "Exchange hashpartitioning") == 0)
  }

  /** Build the plan with FanOut disabled — identical to the at-scale plan,
    * where a many-splits input makes the fan-out gate a no-op. */
  private def planAtScale(name: String): String = {
    spark.conf.set(ops.FanOut.ConfKey, "false")
    try plan(name) finally spark.conf.unset(ops.FanOut.ConfKey)
  }

  test("q_ngram_entropy: per-doc trigram stats fold in the row — zero hash exchanges at scale") {
    // the relational form shuffled one row per CHARACTER of the corpus;
    // the graft_trigram_stats kernel makes the whole query a scan. The
    // only exchange the local plan may add is the small-input fan-out,
    // which is a no-op at scale — assert the scale shape with it off.
    val p = planAtScale("q_ngram_entropy")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
      "trigram entropy must not shuffle gram rows")
    assert(p.contains("graft_trigram_stats"), "kernel must be in the plan")
    // and locally the kernel pass must NOT fold on the scan's task count
    assert(countOccurrences(plan("q_ngram_entropy"),
      "Exchange hashpartitioning(doc_id") == 1,
      "single-split local input should fan the kernel pass across cores")
  }

  test("q_repetition: per-doc bigram max folds in the row — zero hash exchanges at scale") {
    val p = planAtScale("q_repetition")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
      "top-bigram must not shuffle gram rows")
    assert(p.contains("graft_top_bigram_count"), "kernel must be in the plan")
  }

  test("q_token_count/q_quality_score: byte-scan kernels in a row-local plan") {
    for (q <- Seq("q_token_count", "q_quality_score")) {
      val p = plan(q)
      assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
        s"$q must stay row-local")
      assert(!p.contains("split(text, '[^a-zA-Z0-9]+'"),
        s"$q must not re-grow the regex tokenizer")
    }
  }

  test("q_quality_gopher: rule verdicts are row-local, zero hash exchanges") {
    assert(countOccurrences(plan("q_quality_gopher"), "Exchange hashpartitioning") == 0,
      "quality rules must run at scan speed")
  }

  test("q_feature_hash: hashing-trick featurization is row-local, zero hash exchanges") {
    assert(countOccurrences(plan("q_feature_hash"), "Exchange hashpartitioning") == 0,
      "featurization must run at scan speed")
  }

  test("q_span_dedup: distinct-first aggregation, no count-distinct Expand") {
    val p = plan("q_span_dedup")
    assert(!p.contains("Expand"),
      "df must come from a two-level aggregate, not count(DISTINCT) expansion")
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 2,
      "one shuffle per aggregate level on the span key")
  }

  test("q_span_flag: bounded boilerplate inventory broadcasts onto the span stream") {
    val p = plan("q_span_flag")
    assert(p.contains("BroadcastHashJoin"),
      "the top-k span set must broadcast, not shuffle the corpus spans")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_source_balance: per-source thresholds broadcast, corpus filter row-local") {
    val p = plan("q_source_balance")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny threshold table must broadcast onto the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_hstack/q_row_count: global index stays in Tungsten (no RDD detour)") {
    for (n <- Seq("q_hstack", "q_row_count")) {
      val p = plan(n)
      assert(!p.contains("Scan ExistingRDD"),
        s"$n must compute the global index without leaving Tungsten:\n$p")
    }
  }

  test("q_perplexity/q_tfidf: the Zipf vocabulary head joins as a broadcast") {
    for (n <- Seq("q_perplexity", "q_tfidf")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"),
        s"$n: head terms must broadcast-join so Zipf-hot keys never shuffle:\n$p")
    }
  }

  // Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
  // every entry must be a broadcast of a PROVABLY tiny side (a
  // grouping-free aggregate = exactly one row, or a bounded literal/limit)
  // — the justification is part of the contract.
  private val bnljJustified: Map[String, String] = Map(
    "q_perplexity" -> "1-row corpus-total aggregate broadcast",
    "q_bigram_lm" -> "1-row vocabulary-size aggregate broadcast",
    "q_tfidf" -> "1-row doc-count aggregate broadcast",
    "q_source_balance" -> "1-row min-source-count aggregate broadcast",
    "q_ann_bruteforce" -> "bounded query-vector set broadcast (its own test)",
    "q_knn_label" -> "bounded query-vector set broadcast, same shape as q_ann_bruteforce",
    "q_length_buckets" -> "single-row percentile cut-point frame broadcast onto the corpus",
    "q_scan_text" -> "two single-row digest aggregates cross-joined for the verdict",
    "q_sink_zstd" -> "two single-row count aggregates cross-joined for the verdict",
    "q_ann_ivf" -> "bounded centroid-table broadcast",
    "q_ann_ivf_probe2" -> "bounded centroid-table broadcast",
    "q_roc_binned" -> "1-row positive/negative-totals aggregate broadcast",
    "q_roc" -> "1-row positive/negative-totals aggregate broadcast",
    "q_sample" -> "1-row binomial-bounds verdict join",
    "q_impute" -> "1-row global-mean aggregate broadcast",
    "q_join_cross" -> "the operator IS a cross join of bounded dims",
    "q_join_range" -> "pure theta join over the bounded nation dim",
    "q_layout_prune" -> "1-row files-touched count joins onto the 1-row stats",
    "q_layout_zorder" -> "two 1-row files-touched counts join onto the 1-row stats",
    "q_sample_temperature" -> "1-row min-mix-count aggregate broadcast",
    "q_shard_write" -> "1-row shard-stats × 1-row total verdict join",
    "q_heavy_hitters" -> "1-row (sketch, n) aggregate broadcast onto the exact counts",
    "q_interleave" -> "1-row source-count aggregate broadcast",
    "q_target_encode" -> "1-row global-prior aggregate broadcast",
    "q_rfm" -> "1-row now + 1-row quartile cut-point frames broadcast",
    // q_basket_lift's 1-row basket-total broadcast BNLJ is no longer
    // visible to this sweep: the qid eagerly checkpoints its top-20 so
    // the basket cache can release (r10 leak fix) — the returned plan is
    // the checkpoint scan, and the build plan executes inside the builder
    "q_survival_km" -> "1-row observation-end + user-total broadcasts",
    "q_winsorize" -> "1-row percentile cut-point frame broadcast",
    "q_cooccur_pmi" -> "1-row corpus-token-total aggregate broadcast",
    "q_acf" -> "1-row mean + 1-row denominator broadcasts onto the bounded daily series",
    "q_changepoint" -> "1-row series-total aggregate broadcast",
    "q_triangles" -> "three 1-row census aggregates cross-joined",
    "q_bm25" -> "1-row corpus-stats aggregate broadcast",
    "q_markov_eval" -> "1-row train-mass aggregate broadcast",
    "q_dedup_report" -> "three 1-row method aggregates × 1-row corpus total"
    // q_contamination_bloom's 1-row verdict joins are invisible to the
    // sweep: the query localCheckpoints its single-row output eagerly, as
    // do q_embed_pca / q_quality_classifier(_binned) / q_ann_ivf_kmeans /
    // q_semdedup
  )

  test("itemSims: ONE packed-pair exchange serves the count aggregate AND " +
      "the top-20 window (r13 packed-long shape)") {
    // the r13 shape: pairs packed into ONE long (p = s1·2³² + s2) and
    // repartitioned once by shiftright(p, 32) (= s1); the count
    // aggregate's clustering (its grouping keys include the partition
    // expression) and the window's partitionBy(s1) — via the aggregate's
    // alias-aware output partitioning — both ride that exchange. ANY
    // s1-keyed exchange means the window re-shuffled the sims table (the
    // alias mapping broke); a second shiftright exchange means the
    // aggregate stopped riding the repartition.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val e0 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 11L), (3L, 12L)).toDF("c", "sk")
      .repartition(spark.sparkContext.defaultParallelism, col("c"))
    val p = ops.Graph.itemSims(e0).queryExecution.executedPlan.toString
    val packedExchanges =
      "Exchange hashpartitioning\\(shiftright\\(p#\\d+L?, 32\\), \\d+\\)".r
        .findAllIn(p).length
    assert(packedExchanges == 1,
      s"expected exactly one packed-pair exchange (pairs → agg+window), got $packedExchanges:\n$p")
    assert(!p.contains("Exchange hashpartitioning(s1#"),
      s"no s1-keyed exchange may remain (window must ride the aggregate's alias-aware partitioning):\n$p")
  }

  test("q_cdc_apply: latest-wins is one partial+final aggregate — no window, no self-join") {
    val p = plan("q_cdc_apply")
    assert(countOccurrences(p, "HashAggregate") +
      countOccurrences(p, "SortAggregate") >= 2,
      "max(struct) must partial-aggregate map-side")
    assert(!p.contains("Window"), "no window in the changelog apply")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "no join in the changelog apply")
  }

  test("q_heavy_hitters: MG sketch partial-aggregates before the exchange") {
    val p = plan("q_heavy_hitters")
    // the udaf rides ObjectHashAggregate/SortAggregate with a partial mode
    // upstream of the single-partition exchange — terms never shuffle raw
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"sketch must run as an imperative aggregate:\n$p")
    assert(!p.contains("CollectLimit") || !p.contains("collect_list"),
      "no driver-side fold")
  }

  test("q_shuffle_det: epoch-shuffle head is a per-partition heap, not a global sort") {
    assert(plan("q_shuffle_det").contains("TakeOrderedAndProject"))
  }

  test("q_rolling_corr/q_rolling_ewm: lag + frame sums share the one user_id shuffle") {
    for (n <- Seq("q_rolling_corr", "q_rolling_ewm")) {
      val p = plan(n)
      assert(countOccurrences(p, "Exchange hashpartitioning") <= 1,
        s"$n must shuffle once by user_id:\n$p")
    }
  }

  test("q_dedup_url: canonicalization is row-local ahead of one partial+final aggregate") {
    val p = plan("q_dedup_url")
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 1,
      "one shuffle on the canonical key")
    assert(!p.contains("Window") && !p.contains("Join"))
  }

  test("q_funnel: both lookback windows and the depth aggregate share one user_id shuffle") {
    val p = plan("q_funnel")
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 2,
      s"funnel should shuffle by user_id once plus the stage rollup:\n$p")
    assert(!p.contains("Join"), "the funnel must not be a self-join")
  }

  test("q_markov/q_ab_test: event rows shuffle once by user_id, no joins") {
    val pm = plan("q_markov")
    assert(!pm.contains("Join"), "transition matrix must not self-join")
    // user_id window shuffle + bounded (prev,next) agg + tiny prob window
    assert(countOccurrences(pm, "Exchange hashpartitioning") <= 3, pm)
    val pa = plan("q_ab_test")
    assert(!pa.contains("Join") && !pa.contains("Window"),
      "A/B verdict is pure aggregation")
    assert(countOccurrences(pa, "Exchange hashpartitioning") <= 1,
      s"one user_id shuffle only:\n$pa")
  }

  test("q_span_merge: both island windows ride one doc_id shuffle at scale") {
    val p = planAtScale("q_span_merge")
    assert(countOccurrences(p, "Exchange hashpartitioning(doc_id") == 1,
      s"prev-end + island windows and the island aggregate must share a " +
        s"single doc_id exchange:\n$p")
    assert(countOccurrences(p, "Window") == 2)
    // locally the span explode also gets the small-input fan-out (one
    // extra doc_id exchange), which the at-scale gate removes
    assert(countOccurrences(plan("q_span_merge"),
      "Exchange hashpartitioning(doc_id") <= 2)
  }

  test("q_pagerank: bounded top-k head, no windows, BSP join-agg iterations") {
    val p = plan("q_pagerank")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must be a per-partition heap, not a global sort")
    assert(!p.contains("Window"), "power iteration is pure join+aggregate")
  }

  test("q_standardize/q_target_encode: group stats broadcast back, no window") {
    for (n <- Seq("q_standardize", "q_target_encode")) {
      val p = plan(n)
      assert(!p.contains("Window"), s"$n must not window over corpus rows")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$n rejoins tiny stats via broadcast:\n$p")
    }
  }

  test("q_join_overlap: interval θ-join decomposes to a bucket equi-join") {
    val p = plan("q_join_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the overlap join must never degenerate to all-pairs:\n$p")
    assert(p.contains("Generate"), "sessions must explode into hour buckets")
  }

  test("q_dedup_cross_source: banding chain + equi source joins, no pair blowup") {
    val p = plan("q_dedup_cross_source")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the source matrix must ride the banding candidates, never all-pairs:\n$p")
  }

  test("sweep: no CartesianProduct anywhere; BNLJ only where justified") {
    val withBnlj = scala.collection.mutable.Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name degenerates to an all-pairs CartesianProduct")
      if (p.contains("BroadcastNestedLoopJoin")) withBnlj += name
    }
    val unjustified = withBnlj.toSet -- bnljJustified.keySet
    // stale ledger entries are as much a failure as unjustified BNLJs: the
    // justification list must exactly track reality
    val stale = bnljJustified.keySet -- withBnlj
    assert(unjustified.isEmpty && stale.isEmpty,
      s"unjustified BNLJ: $unjustified; stale ledger entries: $stale; " +
        s"actual BNLJ set: ${withBnlj.toSeq.sorted}")
  }

  test("withGlobalIndex refuses an unsorted input and keeps a total order " +
      "on a sorted one") {
    import org.apache.spark.sql.functions._
    val base = Tables.customer(spark, sf).select("c_custkey", "c_name")
    // unsorted frame: the (partition, local-row) encoding would be
    // arbitrary partition order — must fail loudly, not index silently
    val e = intercept[IllegalArgumentException] {
      graft.ops.Reshape.withGlobalIndex(base, "idx")
    }
    assert(e.getMessage.contains("orderBy"), e.getMessage)
    // sorted (with an ordering-preserving projection on top): accepted,
    // and the index is exactly 1..n in sort order
    val idx = graft.ops.Reshape
      .withGlobalIndex(base.orderBy("c_custkey").select("c_custkey", "c_name"), "idx")
      .orderBy("idx").collect()
    assert(idx.map(_.getAs[Long]("idx")).toSeq == (1L to idx.length).toSeq)
    val keys = idx.map(_.getAs[Long]("c_custkey")).toSeq
    assert(keys == keys.sorted, "index order must follow the sort order")
  }

  test("q_validate: row checks fuse into one scan; no window, no all-pairs") {
    val p = plan("q_validate")
    // lineitem: fused row-check aggregate + pk groupBy + fk anti-join
    // probe; orders: fk build side — four scans for six checks, and the
    // row-check family stays ONE scan no matter how many checks join it
    assert(countOccurrences(p, "FileScan") == 4,
      s"expected 4 scans (3×lineitem + 1×orders):\n$p")
    assert(p.contains("Generate"), "stack must unpivot the fused aggregate")
    assert(!p.contains("Window") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_scan_parquet/q_project: no shuffle except the output sort") {
    for (n <- Seq("q_scan_parquet", "q_project")) {
      val p = plan(n)
      assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
        s"$n should only range-partition for the sort")
    }
  }

  test("q_pagerank: iterations reuse the cached edge table and never " +
      "re-shuffle it, even when broadcast is off (the 100 TB regime)") {
    // At bench scale AQE broadcasts the small cached edge table, which
    // hides the design property that matters at 100 TB: the edge frame is
    // repartitioned by src ONCE (inside the persisted plan) and each BSP
    // iteration joins against that partitioning — only the small
    // (node, rank) table moves. Disable broadcast to surface that regime.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = SparkEntry.queries("q_pagerank")(spark, sf)
      df.collect()
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      // the OUTER final plan is everything before the outer (unindented)
      // "== Initial Plan ==" marker; inner cached-plan sections are
      // indented, so the ^-anchored split keeps them
      val finalPlan = full.split("(?m)^\\+- == Initial Plan ==")(0)
      assert(finalPlan.contains("TakeOrderedAndProject"),
        "top-50 must be a bounded heap, not a global sort")
      // each of the 3 BSP iterations must read the EDGE cache (the edge
      // build never re-runs). Match on the (src, dst, …) column pair so
      // the r12 degree-table cache — (src, deg) only — doesn't count:
      // its two reads are the deduped broadcast/init subtree, not
      // iterations.
      val scanIds = "InMemoryTableScan \\[src#(\\d+)L?, dst#".r
        .findAllMatchIn(finalPlan).map(_.group(1)).toSet
      assert(scanIds.size == 3,
        s"expected 3 edge-cache reads (one per iteration), got $scanIds")
      // ...and the runtime plan must contain NO exchange keyed on any
      // cache-output src attribute: the one-time repartition inside the
      // persisted plan is the only src movement, iterations inherit it
      // (AQE drops the statically-planned ENSURE_REQUIREMENTS exchanges
      // once the materialized cache reports hashpartitioning(src))
      for (id <- scanIds)
        assert(!finalPlan.contains(s"Exchange hashpartitioning(src#$id"),
          s"iteration re-shuffled the cached edge frame on src#$id")
    } finally spark.conf.set(key, old)
  }

  test("connectedComponents rounds: the edge table never re-shuffles and " +
      "the pair chain never re-runs (q_dedup_clusters iteration pin)") {
    // the q_pagerank pin, extended to the CC loop behind q_dedup_clusters/
    // q_dedup_keep_best/q_split_leakage (r11 verdict task 1): edges are
    // repartitioned by dst ONCE before their checkpoint, so each min-label
    // round's neighbor join must inherit that partitioning and move only
    // the (node, label) table — and the upstream pair-build chain (a file
    // scan here; the banding+verify chain in production) must have
    // executed exactly once, at checkpoint time, never inside a round.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc_plan").toString
    // a 64-node chain: pointer jumping needs several rounds to converge,
    // so the probe sees multiple per-round plans
    (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val pairs = spark.read.parquet(dir)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val got = ops.Dedup.connectedComponents(pairs, None, Some(plans += _))
    assert(got.select("cluster_id").distinct().count() == 1,
      "the chain is one component")
    assert(got.count() == 64)
    assert(plans.nonEmpty, "at least one round must have run")
    for (p <- plans) {
      val fin = p.split("== Initial Plan ==")(0)
      assert(!fin.contains("FileScan"),
        s"a round re-ran the pair-build chain:\n$fin")
      // the edges checkpoint scans as ExistingRDD[src#X, dst#Y]; no
      // exchange in the round may key on that Y — the one-time
      // repartition before the checkpoint is the only dst movement
      val dstIds = "Scan ExistingRDD\\[src#(\\d+)L?, ?dst#(\\d+)".r
        .findAllMatchIn(fin).map(_.group(2)).toSet
      assert(dstIds.nonEmpty, s"edges RDD scan not found in round plan:\n$fin")
      for (id <- dstIds)
        assert(!fin.contains(s"Exchange hashpartitioning(dst#$id"),
          s"a round re-shuffled the edge table on dst#$id:\n$fin")
    }
    org.apache.spark.sql.graftshim.GraftDataset.freeLocalCheckpoint(got)
  }
}
