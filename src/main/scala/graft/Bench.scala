package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE compact JSON line. The line is deliberately kept short
  * (headline subset, 3-decimal seconds) so it survives intact in a
  * bounded stdout tail capture — round 1's full-registry line with
  * 9-decimal doubles exceeded the capture window and failed to parse.
  * Set SPARK_GRAFT_BENCH_ALL=1 to time the whole registry locally.
  */
object Bench {

  /** Representative subset spanning every query family in SURVEY §2. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",
    "p4_filter_predicate", "p8_masked_update",
    "f4_string_agg", "f13_json_extract",
    "o1_sort_chrono", "o3_topk",
    "u1_union_distinct", "u4_union_all",
    "j1_semi_join", "j2_anti_join", "j3_inner_join", "j4_full_outer_align",
    "j5_left_join_agg", "j7_theta_range_join", "j9_asof_join",
    "j10_salted_skew_join",
    "a2_counts", "a3_last_per_key", "a5_daily_dedup",
    "a6_upsert_daily_close", "a7_group_stats", "a8_rollup", "a11_percentiles",
    "a16_funnel", "a17_retention",
    "w1_lag_lead", "w2_moving_avg", "w3_topn_per_group", "w4_running_sum",
    "s1_tumbling_window", "s2_sliding_window", "s3_session_window",
    "x1_token_stats", "x2_lang_id", "x3_quality_score", "x5_token_freq",
    "d1_exact_dedup", "d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
    "d7_incremental_dedup",
    "e1_cosine_topk", "e2_ann_ivf", "e3_bucket_neardup", "e4_ann_kmeans",
    "e5_ann_hyperplane", "e7_ann_batch",
    "m1_binary_meta",
    "q05_revenue_by_nation", "q06_forecast_revenue",
    "w5_rank_analytics", "w7_range_frame", "a12_stats_moments",
    "a15_grouping_sets", "p9_pivot", "p11_hash_sample",
    "x7_bpe_tokens", "d5_dup_clusters",
    "c1_contamination", "c2_corpus_build", "x8_repetition", "p12_stratified_sample",
    "x9_seq_packing", "x10_unigram_surprisal", "d6_segment_dedup", "e6_semantic_dedup",
    "f19_bucket_categorize", "m3_resize_meta",
    "c3_mixture_build", "p13_weighted_sample", "x11_bigram_surprisal",
    "d8_incremental_neardup", "e8_pq_adc", "x12_retention_policy",
    "m4_media_dedup", "x13_bm25", "a19_sketch_rollup",
    "q07_sql_above_avg", "q08_sql_not_exists", "v4_column_profile",
    "a18_sessionize",
    "s4_schedule_fire", "d9_containment", "c4_split_leakage",
    "c5_shard_manifest", "d10_dup_spans", "c6_fuzzy_decontam",
    "c7_epoch_shuffle", "e9_ann_recall", "v5_source_overlap",
    "d11_lsh_recall", "c8_dsir_admission", "x15_bpe_pairs", "v6_shard_skew",
    "d12_oph_minhash", "d13_oph_dense", "c9_temperature_mixture",
    "x16_pii_scrub", "c10_curriculum", "e10_mmr_rerank", "v7_data_card",
    "c11_epoch_allocation", "e11_embedding_qa", "x17_vocab_growth",
    "q09_sql_correlated",
    "g1_pagerank", "h1_scd2_history", "r1_entity_match", "d14_cdc_chunks",
    "v8_pipeline_yield", "q10_sql_exists_chain", "e12_sq_recall",
    "g2_triangle_count", "r2_golden_record", "v9_expectations",
    "p14_split_assign", "h2_point_in_time", "w8_streak", "q11_sql_nested_in",
    "e13_ivf_pq", "g3_kcore", "a20_anomaly", "x18_readability",
    "q12_sql_top_supplier", "x19_unigram_entropy", "v10_psi_drift",
    "c12_dedup_discount", "w9_ewma",
    "w10_drawdown", "a21_histogram", "v11_freshness", "g4_label_prop",
    "q13_sql_min_cost", "x20_zipf_slope", "x21_ngram_novelty",
    "e14_filtered_ann", "w11_cusum", "w12_seasonality", "x22_lang_confusion",
    "d15_band_tuning", "a22_count_min", "d16_tfidf_dedup", "e15_nprobe_sweep",
    "e16_hybrid_rrf", "x23_bpe_train", "x33_bpe_vocab", "x34_bpe_encode",
    "g5_bfs_hops", "g6_link_predict", "a23_transitions", "h3_scd2_dim_join",
    "p15_zorder_layout", "j11_bloom_semi_join", "x24_boilerplate",
    "x25_kneser_ney",
    "h4_gap_fill", "h5_split_adjust", "a24_concurrency", "w13_bollinger",
    "j12_interval_join", "x26_hash_classifier", "c13_ccnet_buckets",
    "g7_personalized_pagerank", "x27_gopher_gates", "j13_asof_forward",
    "j14_asof_native", "u6_except_all", "u7_intersect_all", "w14_rsi",
    "m5_audio_segments", "q14_sql_window", "x28_chunking", "e18_mean_pool",
    "o5_keyset_page", "a25_time_to_convert",
    "h6_vwap", "h7_weekly_bars", "h8_beta", "x29_kl_divergence",
    "a26_mode", "v12_benford", "q15_sql_recursive", "e17_hard_negatives",
    "g8_modularity", "p16_target_encode", "a27_path_census", "e19_centroid_drift",
    "s5_late_data", "r3_blocking_recall", "w16_underwater", "a28_cohort_ltv",
    "h9_overnight_gap", "a29_rfm", "j15_asof_nearest", "v13_seq_gaps",
    "m6_patch_grid", "a30_kmv_distinct", "a31_kmv_rollup",
    "q16_sql_disjunctive", "q17_sql_large_orders", "w15_macd",
    "h10_rolling_corr", "g9_knn_graph", "x30_lexical_diversity",
    "x31_perplexity_filter", "h11_event_study",
    "h12_atr", "w17_obv", "h13_pairs_spread", "h14_sharpe",
    "q18_sql_global_avg", "c14_cluster_balanced",
    "d18_dedup_agreement", "x32_calibration", "e20_pca_power",
    "v14_ref_integrity", "e21_anisotropy", "v15_pk_unique",
    "w18_stochastic", "v16_two_sample_drift",
    "g10_hits", "q19_sql_shipping_priority", "q20_sql_supplier_census",
    "q21_sql_volume_shipping", "p17_compaction_plan", "e22_jl_projection",
    "c15_doremi_step", "v17_rule_quarantine",
    "d17_bloom_admission", "m7_shot_boundary",
    "q22_sql_lateral_topn", "a32_attribution",
    "q23_sql_pivot", "u8_union_by_name", "h15_momentum_portfolio",
    "a33_root_cause", "e23_ann_ndcg", "v18_k_anonymity", "q24_sql_unpivot",
    "j16_asof_native_forward", "j17_asof_native_nearest",
    "q25_sql_exists_range", "q26_sql_market_share", "q27_sql_priority_split",
    "e24_matryoshka_recall", "a34_bootstrap_ci", "v19_split_balance",
    "m8_phash_dct", "q28_sql_profit", "q29_sql_cust_dist",
    "d19_max_dup_spans", "e25_ivf_balanced", "m9_audio_fingerprint",
    "p18_layout_cost", "d20_span_partners", "e26_ivf_census_drift",
    "v20_embedding_drift",
    "g11_clustering_coeff", "e27_range_search", "h16_parkinson_vol",
    "p19_hilbert_layout", "e28_multiprobe_lsh", "p20_cdc_apply",
    "d21_simhash_wide", "m10_media_dedup_wide", "d22_simhash_dual",
    "e29_pq_refine")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // One pathological query must never zero the whole bench artifact
    // (round 2's fatal-executor crash left parsed:null): each query runs on
    // a watchdogged thread; on timeout its job group is cancelled and the
    // query records -1.
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see graft.Tables.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Small-shuffle syscall churn: the bypass-merge writer creates one
      // file PER REDUCE PARTITION per map task (32×32 = 1024 files per
      // exchange on join shuffles, which have no map-side combine), and
      // reduce fetches mmap each block — stack dumps showed map0/unmap0
      // dominating the dedup family. The sort writer emits ONE file per
      // map task regardless of partition count.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // Let AQE coalesce genuinely tiny exchanges down to few tasks
      // instead of padding to parallelism (Spark's recommended production
      // setting); at real scale partitions exceed the 64m advisory size
      // and this is a no-op.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // Shuffle/spill files live on tmpfs: the container's root fs mounts
      // ext4 with `discard`, so the burst file deletions of Spark's
      // ContextCleaner issue TRIM storms that stall the virtio device for
      // seconds (observed as episodic multi-x slowdowns with high sys%,
      // mmap/unmap-bound executor stacks, and idle CPUs). On a real
      // cluster these are executor-local SSD scratch dirs anyway.
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // Backstop for the between-queries System.gc(): ContextCleaner is
      // GC-driven and the default periodic GC is 30 min — longer than a
      // whole bench run, so without this nothing would ever reclaim
      // dereferenced shuffles if the explicit gc were skipped.
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM/codegen warmup (no benchmark data touched): the first
    // timed query should measure the engine, not JIT + codegen-compiler
    // cold start. The parquet round-trip on SYNTHETIC rows warms the
    // reader/writer/columnar-to-row classes that otherwise bill their
    // classloading to whichever query runs first (~1.5 s on q01).
    spark.range(1000).selectExpr("sum(id * 2)").collect()
    val warmDir = s"/tmp/graft-bench-warm-${System.nanoTime()}"
    spark.range(1000).selectExpr("id", "cast(id as double) AS v", "cast(id as string) AS s")
      .write.mode("overwrite").parquet(warmDir)
    spark.read.parquet(warmDir)
      .filter(org.apache.spark.sql.functions.col("id") > 10)
      .groupBy("s").count().collect()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    // Host-window calibration canary (r9 verdict #5): a FIXED CPU-bound
    // codegen fold with no I/O and no shuffle, timed first and last in
    // every session and committed in the artifact. The container's 32
    // vCPUs deliver a host-dependent 7-30 cores of parallel throughput;
    // two artifacts taken in different windows (the r9 driver-vs-builder
    // 206.8 vs 148.6 s pair) are adjudicable from the canary ratio alone
    // instead of needing a cross-read of BENCH_NOTES. 64 partitions of a
    // 200M-row mixed-arith fold ≈ 6 CPU-seconds: ~0.3 s wall on a healthy
    // window, scaling inversely with delivered parallelism.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 64)
        .selectExpr(
          // ANSI-safe mixing: (id % 1e6) * Knuth-multiplier tops out ~2.7e15,
          // well inside a signed long (a full 64-bit LCG multiply throws
          // ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode).
          "sum(((id % 1000003) * 2654435761 + shiftright(id, 13)) % 999983)")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    val all = SparkEntry.queries
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) => only.split(",").map(_.trim).filter(all.contains).toSeq
      case None if sys.env.contains("SPARK_GRAFT_BENCH_ALL") => all.keys.toSeq
      case None => headline.filter(all.contains)
    }
    // Diagnostic: SPARK_GRAFT_BENCH_DUMP=<secs> prints RUNNABLE executor
    // stacks that long into every query — pinpoints interpreted-eval or
    // GC-bound hot paths without a UI.
    sys.env.get("SPARK_GRAFT_BENCH_DUMP").map(_.toLong).foreach { secs =>
      val d = new Thread(() => {
        while (true) {
          Thread.sleep(secs * 1000)
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              t.getName.startsWith("Executor task"))
              System.err.println(
                s"[dump] ${t.getName}: ${st.take(5).mkString(" <- ")}")
          }
        }
      }, "bench-dumper")
      d.setDaemon(true)
      d.start()
    }
    // Effective-parallelism instrumentation (r7 verdict ask #2): sum
    // executor task run time per measurement window so every artifact row
    // carries cores_eff = task-seconds / wall-seconds. Host drift (the
    // container's 32 vCPUs deliver 7-30 effective cores run-to-run) is
    // then adjudicated FROM the artifact instead of manual isolated
    // re-measures: a ≥1.5x wall flag with matching cores_eff drop is
    // delivery variance, not a plan change.
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) taskMs.addAndGet(m.executorRunTime)
      }
    })
    // A query that timed out leaves an abandoned daemon thread that may
    // keep submitting work and accruing executorRunTime into LATER
    // windows — cores_eff for the timed-out query and everything after it
    // in this process is unreliable and reported as -1 (r8 advice).
    @volatile var effTainted = false
    // THE bench materialization, shared by the timed rows and the e9
    // variant-attribution legs so the two can never drift (r10 advice):
    // count() is deliberate — it matches every committed artifact back to
    // r1, and what it measures (the full shuffle/sort pipeline with output
    // columns prunable) is the same on both paths by construction.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit = { df.count(); () }
    def once(name: String): (Boolean, Double, Double) = {
      val task0 = taskMs.get()
      val t0 = System.nanoTime()
      @volatile var ok = false
      val runner = new Thread(() => {
        try {
          spark.sparkContext
            .setJobGroup(s"bench-$name", name, interruptOnCancel = true)
          materialize(all(name)(spark, sfDir))
          ok = true
        } catch { case _: Throwable => () }
      }, s"bench-$name")
      runner.setDaemon(true)
      runner.start()
      runner.join(timeoutSec * 1000L)
      if (runner.isAlive) {
        // cancelJobGroup only kills jobs RUNNING at call time — a query
        // with a driver-side loop (e.g. iterative graph convergence) would
        // keep submitting fresh jobs from its abandoned thread and poison
        // every later measurement. Interrupt the thread too; loop
        // operators check the interrupt flag between rounds.
        spark.sparkContext.cancelJobGroup(s"bench-$name")
        runner.interrupt()
        runner.join(10000L) // grace; a stuck thread is abandoned (daemon)
        effTainted = true
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener-bus lag: task-end events post asynchronously and a fixed
      // sleep can lose the tail under load (r8 advice) — poll the counter
      // OUTSIDE the timed window until it holds still for two consecutive
      // 50 ms reads (bounded at 2 s so a tainted window can't hang us).
      var last = taskMs.get()
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 40) {
        Thread.sleep(50); waited += 1
        val cur = taskMs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      (ok, wall, if (effTainted) -1.0 else (taskMs.get() - task0) / 1e3)
    }
    // The container's 32 vCPUs deliver a host-dependent 7-30 cores of
    // parallel throughput (oversubscription), so parallel-stage wall time
    // varies up to ~10x run to run through no fault of the plan. EVERY
    // query is measured twice FROM A CLEAN SLATE (session cache + pair
    // memo dropped, so the re-run repeats all the work) and reports the
    // min — a least-noise estimate, flagged in the JSON. Sub-second
    // queries fluctuating ±50% contributed several seconds of pure noise
    // to single-shot totals.
    def clearSlate(): Unit = {
      graft.queries.DedupQueries.clearMemo()
      graft.queries.GraphQueries.clearMemo()
      graft.queries.SimilarityQueries.clearPcaMemo()
      graft.queries.SimilarityQueries.clearAdcMemo()
      spark.catalog.clearCache()
    }
    // Pre-build every session view BEFORE the timed loop (r8 verdict #7):
    // each one-time build cost is reported separately in view_build_sec,
    // so no per-query row silently carries the build of whichever view it
    // happened to touch first (the driver's r8 headline had d15 at 5.1 s
    // for exactly that reason). Disable with SPARK_GRAFT_NO_PREBUILD=1 to
    // measure cold first-consumer behavior.
    if (!sys.env.contains("SPARK_GRAFT_NO_PREBUILD")) {
      val t0 = System.nanoTime()
      graft.queries.DedupQueries.prebuildViews(spark, sfDir)
      graft.queries.GraphQueries.prebuildViews(spark, sfDir)
      graft.queries.SimilarityQueries.prebuildViews(spark, sfDir)
      graft.queries.PipelineExtras.prebuildViews(spark, sfDir)
      System.err.println(
        f"[bench] view pre-build ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          "(per-table costs in view_build_sec)")
      clearSlate()
      System.gc()
    }
    canary() // untimed codegen warm: canary_first must measure the host, not JIT
    val canaryFirst = canary()
    // Mid-session canary stamps (r12 verdict #2): the open/close canaries
    // cannot see a degraded EPISODE inside a ~11-minute session (S8's
    // e9 = 25.4 s and S12's g5 = 8.1 s had clean canaries both ends and
    // had to be adjudicated by narration). Stamp the same fold every ~50
    // queries — outside every timed window — so an episodic outlier row is
    // machine-attributable to a window from the artifact alone.
    val canaryMids = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var sinceStamp = 0
    val results = names.map { name =>
      graft.sources.MatView.drainTouched() // reset the view-read tracker
      val (ok1, t1, task1) = once(name)
      val (best, bestTask) =
        if (ok1) {
          clearSlate()
          val (ok2, t2, task2) = once(name)
          if (ok2 && t2 < t1) (t2, task2) else (t1, task1)
        } else (t1, task1)
      // View-backed tagging (r7 advice): min-of-2 under the clean-slate
      // protocol reports warm-materialized-view time; the artifact must
      // say so per query (one-time build costs land in view_build_sec).
      val views = graft.sources.MatView.drainTouched()
      // Post-query hygiene (r6 verdict: the closing artifact recorded d3 at
      // 9.6 s in-session vs 1.9 s isolated — accumulated session state, not
      // the plan). Two mechanisms, both bounded here:
      //  1. run 2's memos/persists used to linger into the NEXT query's
      //     first run — clear again so every measurement starts clean;
      //  2. Spark's ContextCleaner is GC-driven, and a 128 GiB heap may
      //     never collect during a 3-minute 238-query run (the periodicGC
      //     default is 30 min) — so every query's shuffle files and
      //     broadcasts pile up in spark.local.dir for the whole session.
      //     An explicit gc BETWEEN queries (outside the timed window)
      //     lets the cleaner reclaim them while nothing is measured.
      clearSlate()
      System.gc()
      sinceStamp += 1
      if (sinceStamp >= 50) {
        sinceStamp = 0
        canaryMids += ((names.indexOf(name) + 1) -> canary())
      }
      // Per-query progress on stderr (stdout stays the single JSON line);
      // failures and timeouts are marked, not silently timed.
      // bestTask < 0 = eff window tainted by an earlier timeout; propagate
      // -1 so the artifact marks the row unreliable instead of lying.
      val eff = if (bestTask < 0) -1.0 else if (best > 0) bestTask / best else 0.0
      System.err.println(
        f"[bench] $name%-28s $best%8.3f s  eff=$eff%5.1f" +
          (if (views.nonEmpty) "  [view]" else "") +
          (if (ok1) "" else "  FAILED"))
      (name, if (ok1) best else -1.0, eff, views)
    }
    def f(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // Failed queries carry -1 in the per-query map; the headline total sums
    // only successful runs (failures are visible, not negative credit).
    val total = results.map(_._2).filter(_ >= 0).sum
    // Effective parallelism of the reported (min) run, 1 decimal: the
    // host-drift adjudicator (task-seconds / wall-seconds).
    val effs = results.map { case (k, _, e, _) => "\"" + k + "\":" + f"$e%.1f" }
      .mkString("{", ",", "}")
    // Queries whose reported time leans on a warm materialized view, and
    // what the one-time builds cost in THIS session (r7 advice: keep
    // cross-round comparisons self-describing).
    val viewBacked = results.filter(_._4.nonEmpty)
      .map { case (k, _, _, v) =>
        "\"" + k + "\":[" + v.toSeq.sorted.map("\"" + _ + "\"").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val viewBuilds = graft.sources.MatView.buildCosts.toSeq.sortBy(_._1)
      .map { case (t, sec) => "\"" + t + "\":" + f(sec) }
      .mkString("{", ",", "}")
    // e9 attribution (r9 verdict #7): the perennial bench ceiling re-runs
    // five shipped ANN variants BY DESIGN, so its wall is a harness total,
    // not one operator's. Time each variant alone, clean-slate, OUTSIDE
    // any timed row (e9's own measurement is untouched) — a future e9
    // regression then attributes to a variant from the artifact alone.
    val e9Var: String =
      if (names.contains("e9_ann_recall")) {
        val variants = Seq(
          "e2_ivf" -> "e2_ann_ivf", "e4_kmeans" -> "e4_ann_kmeans",
          "e5_hyperplane" -> "e5_ann_hyperplane", "e13_ivf_pq" -> "e13_ivf_pq",
          "e14_filtered" -> "e14_filtered_ann",
          // r10 verdict #3: the harness now audits all nine shipped ANN
          // variants — attribution must cover the same set. Tags equal the
          // variant labels e9's recall rows emit (r11 advice), so artifact
          // consumers can join walls to recall rows without a special case.
          "e25_balanced" -> "e25_ivf_balanced", "e27_range" -> "e27_range_search",
          "e28_multiprobe" -> "e28_multiprobe_lsh",
          "e29_pq_refine" -> "e29_pq_refine")
        val walls = variants.map { case (tag, qn) =>
          clearSlate()
          val t0 = System.nanoTime()
          // Same materialization as the timed rows (r10 advice): the legs
          // must pay exactly what a bench row pays or the per-variant walls
          // understate e9's cost and the artifact can't attribute a
          // regression.
          materialize(all(qn)(spark, sfDir))
          "\"" + tag + "\":" + f((System.nanoTime() - t0) / 1e9)
        }
        walls.mkString(""","e9_variant_sec":{""", ",", "}")
      } else ""
    val canaryLastRaw = canary()
    // Session-aging control (r12): across EVERY full-registry session
    // since the canary exists (r10: 1, r11: 4, r12: 3), the closing
    // canary read 0.36–0.56 s REGARDLESS of the opening (0.11–0.49) —
    // after ~300 queries it measures the aged JVM (cached plans, GC
    // state, listener/session residue) as much as the host window, and
    // the r10 commit gate was structurally unsatisfiable. Re-read the
    // canary from a clean slate + full GC: a degraded HOST shows in both
    // readings; session aging shows only in the raw one. The gate and
    // the normalized total use (first + clean)/2; the raw close is still
    // emitted so artifacts stay cross-readable.
    clearSlate()
    System.gc()
    Thread.sleep(1000)
    val canaryLast = canary()
    // Canary COMMIT gate (r10 verdict #1): the r10 round committed a
    // best-of-five artifact taken entirely inside a degraded host day and
    // every perf conclusion had to be rescued by hand. The healthy
    // reference reading is 0.152 s (BENCH_NOTES_r10 §7); a session whose
    // canaries average past ~0.25 s is NOT a commit-grade comparator —
    // say so loudly, and carry a canary-normalized total alongside the raw
    // one so even a degraded artifact is comparable. The normalization
    // deliberately only DISCOUNTS (never inflates a healthy run), and is a
    // whole-session CPU-throughput correction — I/O-light rows normalize
    // well, latency-bound rows less so; per-row adjudication still uses
    // cores_eff + control ratios.
    // Host-class override (r11 advice): 0.152 s is THIS container's healthy
    // reading (BENCH_NOTES_r10 §7); a different host class sets
    // SPARK_GRAFT_CANARY_REF to its own measured healthy canary so the gate
    // neither misfires nor silently discounts real regressions there. The
    // ref used is stamped into the artifact either way.
    val canaryHealthyRef = sys.env.get("SPARK_GRAFT_CANARY_REF")
      .map(_.toDouble).getOrElse(0.152)
    val canaryMean = (canaryFirst + canaryLast) / 2.0
    // canaryMean == 0 would NaN-poison totalNorm; a sub-clock-resolution
    // canary just means "healthy" (no discount).
    val totalNorm =
      if (canaryMean <= 0.0) total
      else total * math.min(1.0, canaryHealthyRef / canaryMean)
    // Gate at ~1.64× the healthy ref (the r10-calibrated 0.25 s absolute
    // threshold, expressed as a ratio so a host-class ref override moves
    // the gate with it).
    if (canaryMean > canaryHealthyRef * 1.64)
      System.err.println(
        f"[bench] CANARY GATE: session canaries ${canaryFirst}%.3f/" +
          f"${canaryLast}%.3f s vs healthy ${canaryHealthyRef}%.3f s — " +
          "DEGRADED WINDOW; re-run before committing this artifact " +
          "(total_canary_norm_sec is the discounted comparator if you must)")
    // Mid-session stamps, keyed by 1-based query index ("after query N").
    val midStamps = canaryMids
      .map { case (i, sec) => "\"" + i + "\":" + f(sec) }
      .mkString("{", ",", "}")
    val canaries =
      s""""canary_first_sec":${f(canaryFirst)},"canary_mid_sec":$midStamps,""" +
        s""""canary_last_sec":${f(canaryLast)},""" +
        s""""canary_last_raw_sec":${f(canaryLastRaw)},""" +
        s""""canary_healthy_ref_sec":${f(canaryHealthyRef)},"total_canary_norm_sec":${f(totalNorm)}"""
    // The driver records only the LAST ~2000 chars of stdout (BENCH_r01:
    // rc=0 yet parsed:null — the 4 KB full-map line had its FRONT cut off
    // by the tail window, so the JSON never parsed). Print the full
    // per-query map first for humans/judges, then END with a compact line
    // guaranteed to fit the tail window: same metric/value schema, slowest
    // 15 queries inline, full map one line up.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"cores_eff":$effs,"view_backed":$viewBacked,"view_build_sec":$viewBuilds$e9Var,$canaries,"sf":"$sfDir","agg":"per-query min of 2 clean-slate runs (host parallelism varies run-to-run); cores_eff = executor-task-sec/wall-sec of the reported run; view_backed queries read warm materialized views whose one-time build cost is view_build_sec; canary_*_sec time the same fixed CPU-bound no-I/O fold first/last in the session; cross-artifact host windows normalize by canary ratio; cross-session regression adjudication protocol + per-round session inventory live in BENCH_NOTES_r{N}.md next to this artifact"}""")
    // STABLE-UNDER-IMPROVEMENT compact map (r12 verdict #2): a pure
    // slowest-15 window churns when the suite gets FASTER — r12's PERF
    // diff manufactured 7 phantom "dropped_from_bench" rows for queries
    // that merely fell out of the top 15. The driver contract allows
    // ADDING map entries but never removing one, so the compact line now
    // pins every name the r12 committed artifact carried (they can only
    // leave by genuinely leaving the registry) and unions the current
    // slowest 15 on top. ~30 entries ≈ 1.3 KB — inside the driver's
    // 2000-char stdout tail with the canary block.
    val pinned = Seq(
      "e9_ann_recall", "d2_ngram_jaccard", "e25_ivf_balanced", "e13_ivf_pq",
      "e29_pq_refine", "x34_bpe_encode", "g1_pagerank", "d15_band_tuning",
      "g5_bfs_hops", "g4_label_prop", "x33_bpe_vocab", "m8_phash_dct",
      "d16_tfidf_dedup", "g9_knn_graph", "g3_kcore")
    val byName = results.collect { case (k, v, _, _) if v >= 0 => k -> v }.toMap
    val slowNames = results.filter(_._2 >= 0).sortBy(-_._2).take(15).map(_._1)
    val compactNames =
      (slowNames ++ pinned.filter(p => byName.contains(p) && !slowNames.contains(p)))
    val slow = compactNames.map(k => "\"" + k + "\":" + f(byName(k)))
      .mkString("{", ",", "}")
    val nFail = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$slow,"sf":"$sfDir","n_queries":${results.size},"n_failed":$nFail,$canaries,"note":"slowest 15 of ${results.size} + the pinned r12 comparator set (stable under improvement); full per-query map with cores_eff and view tags on the previous stdout line; canary = fixed CPU-bound fold timed first/mid/last (host-window normalizer)"}""")
    spark.stop()
  }
}
