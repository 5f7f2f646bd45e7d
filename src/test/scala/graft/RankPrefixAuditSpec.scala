package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}

/** The audited TopKRewrite contract (VERDICT r14 items 2 & 8): for
  * EVERY registered query, whether the Filter(row_number ≤ k over
  * Window) → TopKRowsAgg rewrite fires is asserted here — the rule is
  * no longer "fires when the shape happens to match" but a contract a
  * shape regression breaks loudly.
  *
  * Expected-FIRED queries (the rank-prefix family): any future edit
  * that silently disqualifies one (an extra Project the guard doesn't
  * traverse, a condition shape RankLimit doesn't parse) fails this
  * spec instead of shipping as a quiet n-log-n sort regression at
  * scale. The r15 audit that seeded this list found exactly that
  * class live: every rank filter consumed by a join had its limit
  * conjoined with inferred isnotnulls and was silently skipped
  * (embed_prefix_recall: 8 windows, 0 rewrites), and every FIRED
  * query carried a redundant WindowGroupLimit that physically planned
  * as two full sorts of the candidate stream.
  *
  * Expected-absent queries keep windows for reasons the rewrite must
  * NOT touch:
  *  - running/offset windows (sum/lag/lead/max over frames):
  *    ann_lsh_bucket, ann_range_search, etl_active_streaks,
  *    etl_bounce_rate, etl_burst_detection, etl_cusum_shift,
  *    etl_ewma_daily, etl_gap_fill, etl_inter_arrival,
  *    etl_interval_join, etl_lateness_profile, etl_ohlc_downsample,
  *    etl_scd2_history, etl_seasonal_profile, etl_sessionize,
  *    etl_star_join(+salted), mm_scene_cut, q15_top_supplier
  *    (max-over-window, ties kept), q_* trend/statistics windows,
  *    text_* profile windows;
  *  - ntile / percentile binning: q_ntile_deciles, q_decile_lift,
  *    q_abc_class;
  *  - row_number as a SEQUENCE INDEX with no prefix filter:
  *    dedup_segments, pipeline_curriculum_order, pipeline_epoch_shuffle,
  *    pipeline_interleave_sources, pipeline_pack_sequences,
  *    pipeline_shard_order, pipeline_dedup_cascade (rank>1 flag),
  *    mm_shot_keyframes (rank feeds an agg), text_zipf_slope
  *    (rank regression needs every row);
  *  - rank filter with a PER-ROW (non-foldable) limit:
  *    dedup_winnow_pairs (rn ≤ f(n)), pipeline_token_budget.
  */
class RankPrefixAuditSpec extends SparkSpec {

  private val expectedFired = Set(
    "ann_bruteforce", "ann_filtered_topk", "ann_graph_beam",
    "ann_ivf_pq", "ann_ivf_pq_residual", "ann_ivf_recall_sweep",
    "ann_ivf_topk", "ann_knn_classify", "ann_knn_graph",
    "ann_lsh_multiprobe", "ann_lsh_topk", "ann_matryoshka_rerank",
    "ann_nndescent", "ann_pq_adc", "ann_recall_report",
    "dedup_apply", "dedup_keep_best",
    "embed_bitsign_recall", "embed_prefix_recall",
    "etl_attribution", "etl_cdc_apply", "etl_dim_firstseen",
    "etl_latest_state",
    "q9_window_rank", "q_approx_sketches", "q_quantile_sketch",
    "q_region_top_parts",
    "text_tfidf")

  test("TopKRewrite fires on exactly the expected rank-prefix queries; " +
      "no fired plan keeps a redundant WindowGroupLimit") {
    GraftExtensions.install(spark)
    val prev = spark.conf.getOption("spark.graft.topkRewrite.enabled")
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    val fired = scala.collection.mutable.LinkedHashSet.empty[String]
    val wglLeft = scala.collection.mutable.LinkedHashSet.empty[String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val opt = fn(spark, sf0001).queryExecution.optimizedPlan
        val nTopK = opt.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
              if a.aggregateExpressions.exists(_.exists {
                case _: graft.functions.TopKRowsAgg => true; case _ => false
              }) => a
        }.size
        if (nTopK > 0) {
          fired += name
          if (opt.collect { case w: WindowGroupLimit => w }.nonEmpty)
            wglLeft += name
        }
        Caches.releaseAll()
        spark.catalog.clearCache()
      }
    } finally {
      prev.fold(spark.conf.unset("spark.graft.topkRewrite.enabled"))(
        spark.conf.set("spark.graft.topkRewrite.enabled", _))
      Caches.releaseAll(); spark.catalog.clearCache()
    }
    val newlyFired = fired.toSet -- expectedFired
    val stoppedFiring = expectedFired -- fired.toSet
    assert(stoppedFiring.isEmpty,
      s"rank-prefix queries SILENTLY lost the rewrite: $stoppedFiring")
    assert(newlyFired.isEmpty,
      s"queries newly fire the rewrite — audit and add to expectedFired: $newlyFired")
    assert(wglLeft.isEmpty,
      s"fired plans keep a redundant WindowGroupLimit (double sort): $wglLeft")
  }

  test("q_region_top_parts: rewrite fires and no Window survives (r14 flag item 2)") {
    GraftExtensions.install(spark)
    val prev = spark.conf.getOption("spark.graft.topkRewrite.enabled")
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    try {
      val opt = SparkEntry.queries("q_region_top_parts")(spark, sf0001)
        .queryExecution.optimizedPlan
      assert(opt.collect { case w: LWindow => w }.isEmpty,
        s"window survived optimization:\n$opt")
      assert(opt.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.aggregateExpressions.exists(_.exists {
              case _: graft.functions.TopKRowsAgg => true; case _ => false
            }) => a
      }.nonEmpty)
    } finally {
      prev.fold(spark.conf.unset("spark.graft.topkRewrite.enabled"))(
        spark.conf.set("spark.graft.topkRewrite.enabled", _))
      Caches.releaseAll(); spark.catalog.clearCache()
    }
  }
}
