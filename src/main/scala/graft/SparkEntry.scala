package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.EventsEtl
import graft.operators.Relational
import graft.ops.{Dedup, Graph, Multimodal, Pipeline, Profile, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7.
  *
  * Every `queries` key has a matching DuckDB `oracleSql` entry unless the
  * op is not SQL-expressible (then the driver records a rows-only
  * check). Column names are aligned exactly between the Spark result
  * and the oracle SQL (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5JoinChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Registration style: eta-expansion (`Obj.method _`) for the
    * exact-arity (SparkSession, String) methods; an explicit lambda
    * only where the method carries tuning defaults (k, thresholds,
    * sample mods — eta-expansion would expose the wider arity).
    * SurveyKeysSpec pins this key set to the SURVEY §2 table. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 reference-surface ETL ops (events)
    "etl_parse_props"    -> EventsEtl.parseProps _,
    "etl_parse_errors"   -> EventsEtl.parseErrors _,
    "etl_snapshot_stats" -> EventsEtl.snapshotStats _,
    "etl_dim_firstseen"  -> EventsEtl.dimFirstSeen _,
    "etl_dim_surrogate"  -> EventsEtl.dimSurrogate _,
    "etl_upsert_newkeys" -> EventsEtl.upsertNewKeys _,
    "etl_upsert_bloom"   -> EventsEtl.upsertNewKeysBloom _,
    "etl_cdc_apply"      -> EventsEtl.cdcApply _,
    "etl_star_join_salted" -> EventsEtl.starJoinSalted _,
    "etl_latest_state"   -> EventsEtl.latestState _,
    "etl_missing_minutes" -> EventsEtl.missingMinutes _,
    "etl_sessionize"     -> EventsEtl.sessionize _,
    "etl_star_join"      -> EventsEtl.starJoin _,
    "etl_validate_recon" -> EventsEtl.validateRecon _,
    "etl_retry_dedup"    -> EventsEtl.retryDedup _,
    "etl_asof_join"      -> EventsEtl.asofLatestView _,
    "etl_asof_forward"   -> EventsEtl.asofNextPurchase _,
    "etl_gap_fill"       -> EventsEtl.gapFillLocf _,
    "q_ntile_deciles"    -> Relational.qNtileDeciles _,
    "q_grouping_sets_mix" -> Relational.qGroupingSetsMix _,
    "text_length_histogram" -> TextAnalysis.lengthHistogram _,
    "etl_sliding_window" -> EventsEtl.slidingWindowStats _,
    "etl_session_window" -> EventsEtl.sessionWindow _,
    "etl_scd2_history"   -> EventsEtl.scd2History _,
    "etl_incremental_agg" -> EventsEtl.incrementalAgg _,
    "etl_interval_join"  -> EventsEtl.intervalJoin _,
    // §2.2 relational core
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q3_top_unshipped"   -> Relational.q3TopUnshipped _,
    "q5_join_chain"      -> Relational.q5JoinChain _,
    "q6_selective_filter" -> Relational.q6SelectiveFilter _,
    "q7_semi_join"       -> Relational.q7SemiJoin _,
    "q8_anti_join"       -> Relational.q8AntiJoin _,
    "q9_window_rank"     -> Relational.q9WindowRank _,
    "q10_rollup"         -> Relational.q10Rollup _,
    "q12_case_agg"       -> Relational.q12CaseAgg _,
    "q14_cond_ratio"     -> Relational.q14CondRatio _,
    "q18_having_join"    -> Relational.q18HavingJoin _,
    "q_topk_global"      -> Relational.qTopkGlobal _,
    "q16_distinct_count" -> Relational.q16DistinctCount _,
    "q22_wealthy_inactive" -> Relational.q22WealthyInactive _,
    "q_median_value"     -> Relational.qMedianValue _,
    "q_approx_sketches"  -> Relational.qApproxSketches _,
    "q_hll_portable"     -> Relational.qHllPortable _,
    "q_quantile_sketch"  -> Relational.qQuantileSketch _,
    "text_cms_heavy_hitters" -> TextAnalysis.cmsHeavyHitters _,
    "q4_priority_exists" -> Relational.q4PriorityExists _,
    "q11_value_concentration" -> Relational.q11ValueConcentration _,
    "q13_cust_distribution" -> Relational.q13CustDistribution _,
    "q17_small_qty_revenue" -> Relational.q17SmallQtyRevenue _,
    "q19_disjunctive_join" -> Relational.q19DisjunctiveJoin _,
    "q20_supplier_semi_chain" -> Relational.q20SupplierSemiChain _,
    "q21_sole_returner"  -> Relational.q21SoleReturner _,
    "q2_min_within_group" -> Relational.q2MinWithinGroup _,
    "q15_top_supplier"   -> Relational.q15TopSupplier _,
    "q_pivot_segment_status" -> Relational.qPivotSegmentStatus _,
    "q_running_total"    -> Relational.qRunningTotal _,
    "q_trailing_spend"   -> Relational.qTrailingSpend _,
    "q_funnel_sequence"  -> Relational.qFunnelSequence _,
    "q_cohort_retention" -> Relational.qCohortRetention _,
    "q_cube_priority_status" -> Relational.qCubePriorityStatus _,
    "q_repeat_customers" -> Relational.qRepeatCustomers _,
    "q_market_share"     -> Relational.qMarketShare _,
    "ann_knn_graph"      -> Similarity.annKnnGraph _,
    "ann_nndescent"      -> Similarity.annNnDescent _,
    // §2.3 training-data pipeline ops (documents / embeddings)
    "text_tokens"         -> TextAnalysis.tokens _,
    "text_quality"        -> TextAnalysis.quality _,
    "text_langid"         -> TextAnalysis.langid _,
    "text_fingerprint"    -> TextAnalysis.fingerprint _,
    "text_winnow"         -> TextAnalysis.winnow _,
    "text_tfidf"          -> TextAnalysis.tfidf _,
    "text_lm_score"       -> TextAnalysis.lmScore _,
    "dedup_exact"         -> Dedup.exact _,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccard _,
    "dedup_minhash_lsh"   -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"       -> Dedup.simhash _,
    "dedup_winnow_pairs"  -> Dedup.winnowPairs _,
    "dedup_components"    -> Dedup.components _,
    "dedup_components_star" -> Dedup.componentsStar _,
    "dedup_components_minlabel" -> Dedup.componentsMinLabel _,
    "ann_bruteforce"      -> Similarity.annBruteforce _,
    "ann_ivf"             -> Similarity.annIvf _,
    "ann_hier_route"      -> Similarity.annHierRoute _,
    "ann_hier_route3"     -> Similarity.annHierRoute3 _,
    "embed_centroids"     -> Similarity.centroids _,
    "mm_binary_features"  -> Multimodal.binaryFeatures _,
    "mm_frame_sample"     -> Multimodal.frameSample _,
    "dedup_embed_cosine"  -> Similarity.dedupEmbedCosine _,
    "ann_lsh_bucket"      -> Similarity.annLshBucket _,
    "ann_ivf_topk"        -> Similarity.annIvfTopk _,
    "ann_lsh_topk"        -> Similarity.annLshTopk _,
    "ann_lsh_multiprobe"  -> Similarity.annLshMultiprobe _,
    "ann_kmeans_refine"   -> Similarity.annKmeansRefine _,
    "pipeline_corpus_filter" -> Pipeline.corpusFilter _,
    "pipeline_train_split"   -> Pipeline.trainSplit _,
    "pipeline_decontaminate" -> Pipeline.decontaminate _,
    "pipeline_shard_order"   -> Pipeline.shardOrder _,
    "pipeline_pack_sequences"    -> Pipeline.packSequences _,
    "pipeline_stratified_sample" -> Pipeline.stratifiedSample _,
    "pipeline_doc_chunks"        -> Pipeline.docChunks _,
    "pipeline_sample_weighted"   -> ((s, d) => Pipeline.sampleWeighted(s, d)),
    "text_char_entropy"          -> TextAnalysis.charEntropy _,
    "graph_triangles"            -> Graph.triangleCounts _,
    "graph_components"           -> Graph.componentsOverCoOccurrence _,
    "profile_orders"             -> Profile.profileOrders _,
    "text_pii_scrub"      -> TextAnalysis.piiScrub _,
    "text_top_bigrams"    -> TextAnalysis.topBigrams _,
    "embed_quantize"      -> Similarity.quantize _,
    "graph_pagerank"      -> ((s, d) => Graph.pageRank(s, d)),
    "ann_pq_adc"          -> ((s, d) => Similarity.annPqAdc(s, d)),
    "embed_outliers"      -> Similarity.embedOutliers _,
    "dedup_containment"   -> Dedup.containmentPairs _,
    "pipeline_domain_mix" -> Pipeline.domainMix _,
    "pipeline_quality_gate" -> Pipeline.qualityGate _,
    "ann_ivf_pq"          -> Similarity.annIvfPq _,
    "pipeline_token_budget" -> ((s, d) => Pipeline.tokenBudget(s, d)),
    "pipeline_contamination_ngram" -> Pipeline.contaminationNgram _,
    "text_repetition"     -> TextAnalysis.repetition _,
    "embed_dim_stats"     -> Similarity.dimStats _,
    "dedup_cluster_stats" -> Dedup.clusterStats _,
    "ann_recall_report"   -> Similarity.annRecallReport _,
    "q_lapsed_customers" -> Relational.qLapsedCustomers _,
    "text_boilerplate_ngrams" -> TextAnalysis.boilerplateNgrams _,
    "graph_jaccard_neighbors" -> Graph.neighborJaccard _,
    "graph_kcore_peel"   -> ((s, d) => Graph.kCorePeel(s, d)),
    "ann_matryoshka_rerank" -> ((s, d) => Similarity.annMatryoshkaRerank(s, d)),
    "pipeline_epoch_shuffle" -> ((s, d) => Pipeline.epochShuffle(s, d)),
    "graph_bfs_levels"    -> ((s, d) => Graph.bfsLevels(s, d)),
    "mm_phash_dedup"      -> ((s, d) => Multimodal.phashDedup(s, d)),
    "ann_graph_search"    -> ((s, d) => Similarity.annGraphSearch(s, d)),
    "ann_graph_beam"      -> ((s, d) => Similarity.annGraphBeam(s, d)),
    "embed_ivf_balance"   -> Similarity.ivfBalance _,
    "text_ngram_novelty"  -> TextAnalysis.ngramNovelty _,
    "etl_lateness_profile" -> EventsEtl.latenessProfile _,
    "etl_rolling_actives" -> ((s, d) => EventsEtl.rollingActives(s, d)),
    "etl_cusum_shift"     -> EventsEtl.cusumShift _,
    "text_source_divergence" -> TextAnalysis.sourceDivergence _,
    "pipeline_tokenizer_fertility" -> Pipeline.tokenizerFertility _,
    "pipeline_interleave_sources" -> Pipeline.interleaveSources _,
    "dedup_lsh_eval"      -> ((s, d) => Dedup.lshEval(s, d)),
    "dedup_lsh_eval_sampled" -> ((s, d) => Dedup.lshEval(s, d, sampleMod = 4)),
    "pipeline_dsir_weights" -> Pipeline.dsirWeights _,
    "embed_pca_power"     -> ((s, d) => Similarity.pcaPower(s, d)),
    "dedup_semdedup"      -> Similarity.semDedup _,
    "pipeline_mixture_resample" -> Pipeline.mixtureResample _,
    "pipeline_dsir_resample" -> ((s, d) => Pipeline.dsirResample(s, d)),
    "ann_knn_classify"    -> Similarity.annKnnClassify _,
    "text_langid_eval"    -> TextAnalysis.langidEval _,
    "text_gopher_rules"   -> TextAnalysis.gopherRules _,
    "text_ccnet_buckets"  -> TextAnalysis.ccnetBuckets _,
    "graph_lpa"           -> ((s, d) => Graph.labelPropagation(s, d)),
    "etl_asof_tolerance"  -> EventsEtl.asofViewWithinHour _,
    "profile_join_skew"   -> Profile.profileJoinSkew _,
    "etl_ohlc_downsample" -> EventsEtl.ohlcDownsample _,
    "q_hll_rollup"        -> Relational.qHllRollup _,
    "dedup_keep_best"     -> Dedup.keepBest _,
    "ann_ivf_recall_sweep" -> Similarity.annIvfRecallSweep _,
    "q_hll_set_ops"       -> Relational.qHllSetOps _,
    "dedup_apply"         -> Dedup.applyDedup _,
    "pipeline_shard_manifest" -> Pipeline.shardManifest _,
    "embed_quantize_error" -> Similarity.quantizeError _,
    "text_zipf_slope"     -> TextAnalysis.zipfSlope _,
    "etl_conversion_rate" -> EventsEtl.conversionRate _,
    "etl_dq_checks"       -> EventsEtl.dqChecks _,
    "graph_hits"          -> ((s, d) => Graph.hits(s, d)),
    "text_lm_kn"          -> TextAnalysis.knScore _,
    "dedup_segments"      -> ((s, d) => Dedup.segmentDedup(s, d)),
    "ann_ivf_pq_residual" -> ((s, d) => Similarity.annIvfPqResidual(s, d)),
    "graph_modularity"    -> Graph.modularity _,
    "mm_audio_energy"     -> Multimodal.audioEnergy _,
    "dedup_minhash_est_error" -> Dedup.minhashEstError _,
    "embed_spherical_kmeans"  -> Similarity.sphericalKmeans _,
    "text_readability"        -> TextAnalysis.readability _,
    "pipeline_curriculum_order" -> Pipeline.curriculumOrder _,
    "etl_anomaly_mad"         -> EventsEtl.anomalyMad _,
    "etl_benford"             -> EventsEtl.benfordAudit _,
    "mm_scene_cut"            -> Multimodal.sceneCut _,
    "graph_assortativity"     -> Graph.assortativity _,
    "pipeline_padding_waste"  -> Pipeline.paddingWaste _,
    "ann_range_search"        -> ((s, d) => Similarity.annRangeSearch(s, d)),
    "embed_triplet_margin"    -> Similarity.tripletMargin _,
    "q_decile_lift"           -> Relational.qDecileLift _,
    "text_oov_rate"           -> TextAnalysis.oovRate _,
    "pipeline_dedup_cascade"  -> Pipeline.dedupCascade _,
    "etl_seasonal_profile"    -> EventsEtl.seasonalProfile _,
    "etl_ewma_daily"          -> ((s, d) => EventsEtl.ewmaDaily(s, d)),
    "q_skyline_pareto"        -> Relational.qSkylinePareto _,
    "q_gini_spend"            -> Relational.qGiniSpend _,
    "q_markov_transitions"    -> Relational.qMarkovTransitions _,
    "q_welch_ttest"           -> Relational.qWelchTtest _,
    "pipeline_temperature_mix" -> ((s, d) => Pipeline.temperatureMix(s, d)),
    "embed_anisotropy"        -> Similarity.anisotropy _,
    "embed_pq_code_entropy"   -> Similarity.pqCodeEntropy _,
    "graph_degree_dist"       -> Graph.degreeDist _,
    "graph_walk_corpus"       -> ((s, d) => Graph.walkCorpus(s, d)),
    "text_yule_k"             -> TextAnalysis.yuleK _,
    "q_basket_lift"           -> ((s, d) => Graph.basketLift(s, d)),
    "etl_inter_arrival"       -> EventsEtl.interArrival _,
    "q_new_vs_returning"      -> Relational.qNewVsReturning _,
    "q_discount_qty_corr"     -> Relational.qDiscountQuantityCorr _,
    "dedup_threshold_sweep"   -> Dedup.thresholdSweep _,
    "ann_filtered_topk"       -> ((s, d) => Similarity.annFilteredTopk(s, d)),
    "embed_abtt"              -> ((s, d) => Similarity.abtt(s, d)),
    "q_rfm_segments"          -> Relational.qRfmSegments _,
    "q_abc_class"             -> Relational.qAbcClass _,
    "q_mann_whitney"          -> Relational.qMannWhitney _,
    "graph_clustering_coeff"  -> Graph.clusteringCoeff _,
    "graph_adamic_adar"       -> ((s, d) => Graph.adamicAdar(s, d)),
    "etl_active_streaks"      -> EventsEtl.activeStreaks _,
    "embed_bitsign_recall"    -> Similarity.bitsignRecall _,
    "q_chi2_independence"     -> Relational.qChi2Independence _,
    "pipeline_length_buckets" -> ((s, d) => Pipeline.lengthBuckets(s, d)),
    "pipeline_mixture_kl"     -> ((s, d) => Pipeline.mixtureKl(s, d)),
    "text_burstiness"         -> ((s, d) => TextAnalysis.burstiness(s, d)),
    "dedup_bbit_minhash"      -> Dedup.bbitMinhash _,
    "q_percentile_bands"      -> Relational.qPercentileBands _,
    "q_priority_trend"        -> Relational.qPriorityTrend _,
    "q_region_top_parts"      -> Relational.qRegionTopParts _,
    "etl_conversion_latency"  -> EventsEtl.conversionLatency _,
    "pipeline_data_card"      -> Pipeline.dataCard _,
    "embed_knn_purity"        -> ((s, d) => Similarity.knnPurity(s, d)),
    "q_yoy_growth"            -> Relational.qYoyGrowth _,
    "etl_mix_drift"           -> EventsEtl.mixDrift _,
    "etl_ship_lag"            -> EventsEtl.shipLag _,
    "embed_prefix_recall"     -> Similarity.prefixRecallSweep _,
    "graph_harmonic_sample"   -> ((s, d) => Graph.harmonicSample(s, d)),
    "text_vocab_growth"       -> TextAnalysis.vocabGrowth _,
    "q_cohort_ltv"            -> Relational.qCohortLtv _,
    "q_reorder_gap"           -> Relational.qReorderGap _,
    "text_pmi_pairs"          -> ((s, d) => TextAnalysis.pmiPairs(s, d)),
    "dedup_band_tuning"       -> Dedup.bandTuning _,
    "embed_split_stability"   -> Similarity.splitStability _,
    "graph_triangle_estimate" -> Graph.triangleEstimate _,
    "etl_window_funnel"       -> EventsEtl.windowFunnel _,
    "etl_attribution"         -> EventsEtl.attribution _,
    "graph_square_count"      -> Graph.squareCount _,
    "embed_random_projection" -> Similarity.randomProjection _,
    "pipeline_dataset_hash"   -> Pipeline.datasetHash _,
    "mm_shot_keyframes"       -> Multimodal.shotKeyframes _,
    "mm_silence_trim"         -> Multimodal.silenceTrim _,
    "mm_image_histogram"      -> Multimodal.imageHistogram _,
    "graph_rich_club"         -> Graph.richClub _,
    "q_hhi_concentration"     -> Relational.qHhiConcentration _,
    "q_bucket_migration"      -> Relational.qBucketMigration _,
    "text_rake_keywords"      -> ((s, d) => TextAnalysis.rakeKeywords(s, d)),
    "etl_user_lifecycle"      -> EventsEtl.userLifecycle _,
    "etl_bounce_rate"         -> EventsEtl.bounceRate _,
    "etl_funnel_window_sweep" -> EventsEtl.funnelWindowSweep _,
    "etl_power_users"         -> EventsEtl.powerUsers _,
    "text_compression_proxy"  -> TextAnalysis.compressionProxy _,
    "embed_cosine_calibration" -> ((s, d) => Similarity.cosineCalibration(s, d)),
    "q_part_growth_topk"      -> Relational.qPartGrowthTopk _,
    "pipeline_source_dup_rate" -> Pipeline.sourceDupRate _,
    "q_weekday_anova"         -> Relational.qWeekdayAnova _,
    "q_seasonal_decompose"    -> Relational.qSeasonalDecompose _,
    "text_code_detection"     -> TextAnalysis.codeDetection _,
    "q_lorenz_deciles"        -> Relational.qLorenzDeciles _,
    "dedup_shingle_df_profile" -> Dedup.shingleDfProfile _,
    "q_ks_test"               -> Relational.qKsTest _,
    "q_spearman_corr"         -> ((s, d) => Relational.qSpearmanCorr(s, d)),
    "q_theil_index"           -> Relational.qTheilIndex _,
    "etl_burst_detection"     -> EventsEtl.burstDetection _,
    "text_jaccard_sources"    -> TextAnalysis.jaccardSourceOverlap _,
    "embed_hubness"           -> Similarity.embedHubness _,
  )

  /** DuckDB-runnable equivalents over the same parquet tables. */
  /** MinHash band-bucket CTE chain (documents → shingles → signatures
    * → LSH bands) — the shared candidate-generation surface for the
    * components oracles and the decontamination oracle. */
  /** Trained-IVF CTE chain — mirrors Similarity.trainedIndex (label-
    * seeded centroids → one Lloyd refinement → refined centroid table
    * `cent` + refined assignment `asg` with v/norm/dist). Shared by the
    * four IVF oracles so they all route through the SAME trained index
    * the Spark paths use. */
  private val ivfCtes: String =
    """pe0 AS (SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
      |c0p AS (SELECT CAST(label AS BIGINT) AS cell, CAST(pos - 1 AS BIGINT) AS pos,
      |   round(avg(x), 6) AS centroid FROM pe0 GROUP BY 1, 2),
      |c0 AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM c0p GROUP BY 1),
      |e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |s1 AS (SELECT e0.vec_id, e0.v, c0.cell,
      |   round(sqrt(list_sum(list_transform(list_zip(e0.v, c0.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
      |  FROM e0 CROSS JOIN c0),
      |a1c AS (SELECT vec_id, v, cell AS cell1 FROM s1
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
      |p1 AS (SELECT cell1, i AS pos, v[i] AS x
      |  FROM a1c CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
      |c1p AS (SELECT cell1 AS cell, CAST(pos - 1 AS BIGINT) AS pos,
      |   round(avg(x), 6) AS centroid FROM p1 GROUP BY 1, 2),
      |cent AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM c1p GROUP BY 1),
      |s2 AS (SELECT e0.vec_id, e0.v, cent.cell,
      |   round(sqrt(list_sum(list_transform(list_zip(e0.v, cent.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
      |  FROM e0 CROSS JOIN cent),
      |asg AS (SELECT vec_id, v, cell, dist,
      |   sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM s2
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1)""".stripMargin

  /** NN-Descent CTE chain — mirrors Similarity.nnDescentGraph (md5-
    * bucketed ring seed, one neighbors-of-neighbors round, exact
    * cosine, top-3): produces the refined graph `ndg`(src, nbr_id,
    * cosine, rk) plus the base relation `nd_n`(vec_id, v, norm).
    * Shared by the graph searchers that consume the descent-built
    * graph (the production build→query pairing). */
  private val ndCtes: String =
    """nd_e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |nd_n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm,
      |   ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS bkt FROM nd_e),
      |nd_g0 AS (SELECT u, w FROM (
      |   SELECT vec_id AS u, unnest([
      |     lead(vec_id, 1) OVER (PARTITION BY bkt ORDER BY vec_id),
      |     lead(vec_id, 2) OVER (PARTITION BY bkt ORDER BY vec_id),
      |     lead(vec_id, 3) OVER (PARTITION BY bkt ORDER BY vec_id)]) AS w
      |   FROM nd_n) WHERE w IS NOT NULL),
      |nd_adj AS (SELECT DISTINCT m, x FROM (
      |   SELECT u AS m, w AS x FROM nd_g0 UNION ALL SELECT w, u FROM nd_g0)),
      |nd_meet AS (SELECT DISTINCT a.x AS u, b.x AS w
      |  FROM nd_adj a JOIN nd_adj b ON a.m = b.m AND a.x < b.x),
      |nd_cand AS (SELECT DISTINCT u, w FROM (
      |   SELECT u, w FROM nd_meet UNION ALL SELECT w, u FROM nd_meet
      |   UNION ALL SELECT u, w FROM nd_g0)),
      |nd_sc AS (SELECT nd_cand.u, nd_cand.w,
      |   round(list_sum(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2]))
      |     / (x.norm * y.norm), 6) AS cosine
      |  FROM nd_cand JOIN nd_n x ON x.vec_id = nd_cand.u JOIN nd_n y ON y.vec_id = nd_cand.w),
      |ndg AS (SELECT u AS src, w AS nbr_id, cosine,
      |   CAST(row_number() OVER (PARTITION BY u ORDER BY cosine DESC, w) AS BIGINT) AS rk
      |  FROM nd_sc QUALIFY rk <= 3)""".stripMargin

  /** [[bandsCtes]] over the deterministic 1/4 hash sample — the oracle
    * side of the sample-at-scale lshEval path (identical predicate to
    * Dedup.sampleDocs at mod 4, portable md5 hash). */
  private def bandsCtesSampled: String = bandsCtes.replace(
    "FROM documents)",
    "FROM documents WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-lsheval'), 1, 15))::BIGINT % 4) = 0)")

  private val bandsCtes: String =
    """t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |shl AS (SELECT doc_id, list_distinct(
      |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
      |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END) AS shingles FROM t),
      |sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
      |   list_min(list_transform(shingles, s ->
      |     ((1 + 2*i) * (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) + 7 + 11*i) % 2147483647))) AS sg
      |  FROM shl),
      |bands AS (SELECT doc_id, j AS band,
      |   md5(concat_ws(',', sg[4*j+1], sg[4*j+2], sg[4*j+3], sg[4*j+4])) AS bkey
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS j))""".stripMargin

  /** Transitive-closure clustering CTE chain, extending [[bandsCtes]]
    * with pairs → symmetric edges → recursive reachability. */
  private val componentsCtes: String =
    s"""$bandsCtes,
      |pairs AS (
      |  SELECT x.doc_id AS u, y.doc_id AS v
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
      |walk(node, reach) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach)""".stripMargin

  /** Shared by the min-label and star-contraction execution paths
    * (identical semantics). */
  private val componentsOracleSql: String =
    s"""WITH RECURSIVE $componentsCtes
      |SELECT node AS doc_id, min(reach) AS component
      |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "etl_parse_props" ->
      """SELECT event_id, user_id, event_type,
        | TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_parse_errors" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        | CAST(sum(CASE WHEN event_type <> 'error' AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_ok,
        | CAST(sum(CASE WHEN event_type <> 'error' AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_parse_failed
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_snapshot_stats" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        | count(*) AS n_records,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | min(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS first_sec,
        | max(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS last_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_dim_firstseen" ->
      """SELECT user_id, event_type,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS first_sec,
        | event_id AS first_event_id
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "etl_dim_surrogate" ->
      """SELECT CAST(dense_rank() OVER (ORDER BY user_id, event_type) AS BIGINT) AS surrogate_id,
        | user_id, event_type
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |ORDER BY surrogate_id""".stripMargin,
    "etl_upsert_newkeys" ->
      """SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |EXCEPT
        |SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY user_id, event_type""".stripMargin,
    "etl_upsert_bloom" ->
      """SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |EXCEPT
        |SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY user_id, event_type""".stripMargin,
    "etl_cdc_apply" ->
      """SELECT user_id, event_type AS final_type, value AS final_value,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS updated_sec
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |  AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "etl_latest_state" ->
      """SELECT user_id, event_type AS last_event_type, value AS last_value,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS last_sec
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "etl_missing_minutes" ->
      """WITH b AS (SELECT CAST(date_trunc('minute', min(ts)) AS TIMESTAMP) AS mn,
        |                  CAST(date_trunc('minute', max(ts)) AS TIMESTAMP) AS mx FROM events),
        |mins AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |obs AS (SELECT DISTINCT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute FROM events)
        |SELECT CAST(epoch(minute) AS BIGINT) AS minute_epoch
        |FROM mins WHERE minute NOT IN (SELECT minute FROM obs) ORDER BY 1""".stripMargin,
    "etl_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events),
        |t AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_sess FROM s),
        |u AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_num FROM t)
        |SELECT user_id, CAST(session_num AS BIGINT) AS session_num, count(*) AS n_events,
        | min(sec) AS start_sec, max(sec) AS end_sec
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "etl_incremental_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | min(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS first_sec,
        | max(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS last_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle is the naive theta-join over the same session
    // derivation — the binned equi-join must find exactly its matches
    "etl_interval_join" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events),
        |t AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_sess FROM s),
        |u AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_num FROM t),
        |sess AS (SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
        |   min(sec) AS start_sec, max(sec) AS end_sec FROM u GROUP BY 1, 2)
        |SELECT e.user_id, e.event_id, sess.session_num
        |FROM (SELECT user_id, event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events) e
        |JOIN sess ON e.user_id = sess.user_id AND e.sec BETWEEN sess.start_sec AND sess.end_sec
        |ORDER BY 1, 2""".stripMargin,
    "etl_star_join" ->
      """WITH dim AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY user_id, event_type) AS BIGINT) AS dim_id, user_id, event_type
        |  FROM (SELECT DISTINCT user_id, event_type FROM events))
        |SELECT d.dim_id, d.user_id, d.event_type, count(*) AS n_facts,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d USING (user_id, event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "etl_star_join_salted" ->
      """WITH dim AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY user_id, event_type) AS BIGINT) AS dim_id, user_id, event_type
        |  FROM (SELECT DISTINCT user_id, event_type FROM events))
        |SELECT d.dim_id, d.user_id, d.event_type, count(*) AS n_facts,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d USING (user_id, event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "etl_validate_recon" ->
      """WITH a AS (SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch, count(*) AS n_a FROM events GROUP BY 1),
        |b AS (SELECT minute_epoch, count(*) AS n_b FROM (
        |  SELECT DISTINCT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch, event_id FROM events) GROUP BY 1)
        |SELECT coalesce(a.minute_epoch, b.minute_epoch) AS minute_epoch,
        | coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        | coalesce(n_a, 0) = coalesce(n_b, 0) AS is_match
        |FROM a FULL OUTER JOIN b ON a.minute_epoch = b.minute_epoch ORDER BY 1""".stripMargin,
    "profile_join_skew" ->
      """WITH a AS (SELECT 'l_orderkey' AS key_col, CAST(count(*) AS BIGINT) AS n_distinct,
        |    max(cnt) AS max_cnt, round(avg(cnt), 6) AS avg_cnt,
        |    round(max(cnt) / avg(cnt), 6) AS skew_ratio
        |  FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1)),
        |b AS (SELECT 'l_partkey', CAST(count(*) AS BIGINT), max(cnt), round(avg(cnt), 6),
        |    round(max(cnt) / avg(cnt), 6)
        |  FROM (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)),
        |c AS (SELECT 'l_suppkey', CAST(count(*) AS BIGINT), max(cnt), round(avg(cnt), 6),
        |    round(max(cnt) / avg(cnt), 6)
        |  FROM (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1))
        |SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
        |ORDER BY key_col""".stripMargin,
    "etl_ohlc_downsample" ->
      """WITH x AS (SELECT event_type, date_trunc('hour', ts) AS hr, value, ts, event_id
        |  FROM events),
        |w AS (SELECT *,
        |   row_number() OVER (PARTITION BY event_type, hr ORDER BY ts, event_id) AS rn_a,
        |   row_number() OVER (PARTITION BY event_type, hr ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM x)
        |SELECT event_type, CAST(epoch(hr) AS BIGINT) AS hour_epoch,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS volume
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "etl_dq_checks" ->
      """SELECT 'lineitem_orphan_orderkey' AS rule, CAST(count(*) AS BIGINT) AS n_violations
        |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
        |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem_nonpositive_quantity', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_quantity <= 0
        |UNION ALL
        |SELECT 'lineitem_nonpositive_price', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_extendedprice <= 0
        |UNION ALL
        |SELECT 'lineitem_discount_out_of_range', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |UNION ALL
        |SELECT 'orders_null_custkey', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NULL
        |ORDER BY rule""".stripMargin,
    "etl_conversion_rate" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id AS vuser, ts AS vts FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.purchase_id, p.ts, v.view_id, v.vts
        |  FROM p LEFT JOIN v ON p.user_id = v.vuser
        |    AND v.vts <= p.ts AND v.vts >= p.ts - INTERVAL 1 HOUR),
        |m AS (SELECT purchase_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS purchase_sec, view_id
        |  FROM j
        |  QUALIFY row_number() OVER (PARTITION BY purchase_id ORDER BY vts DESC NULLS LAST) = 1)
        |SELECT CAST(floor(purchase_sec / 86400) AS BIGINT) AS day_num,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(count(view_id) AS BIGINT) AS n_converted,
        |  round(CAST(count(view_id) AS DOUBLE) / count(*), 6) AS conversion_rate
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_asof_tolerance" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id AS vuser, ts AS vts FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.purchase_id, p.user_id, p.ts, v.view_id, v.vts
        |  FROM p LEFT JOIN v ON p.user_id = v.vuser
        |    AND v.vts <= p.ts AND v.vts >= p.ts - INTERVAL 1 HOUR)
        |SELECT purchase_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS purchase_sec,
        | view_id, CAST(epoch(date_trunc('second', vts)) AS BIGINT) AS view_sec
        |FROM j
        |QUALIFY row_number() OVER (PARTITION BY purchase_id ORDER BY vts DESC NULLS LAST) = 1
        |ORDER BY purchase_id""".stripMargin,
    "etl_asof_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id AS vuser, ts AS vts FROM events WHERE event_type = 'view')
        |SELECT purchase_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS purchase_sec,
        | view_id, CAST(epoch(date_trunc('second', vts)) AS BIGINT) AS view_sec
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.vuser AND p.ts >= v.vts
        |ORDER BY purchase_id""".stripMargin,
    "etl_asof_forward" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id AS puser, ts AS pts FROM events WHERE event_type = 'purchase')
        |SELECT view_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS view_sec,
        | purchase_id, CAST(epoch(date_trunc('second', pts)) AS BIGINT) AS purchase_sec
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.puser AND v.ts <= p.pts
        |ORDER BY view_id""".stripMargin,
    "etl_gap_fill" ->
      """SELECT user_id, event_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS event_sec,
        | round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS last_purchase_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_grouping_sets_mix" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(o_orderstatus, 'ALL') AS status,
        | CAST(count(1) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY priority, status""".stripMargin,
    "text_length_histogram" ->
      """SELECT CAST(floor(log2(length(text))) AS BIGINT) AS log2_len,
        | CAST(count(1) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ntile_deciles" ->
      """WITH s AS (SELECT o_custkey,
        |   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, round(total_spend, 6) AS total_spend,
        | CAST(ntile(10) OVER (ORDER BY total_spend DESC, o_custkey) AS BIGINT) AS decile
        |FROM s ORDER BY o_custkey""".stripMargin,
    "etl_retry_dedup" ->
      """SELECT event_type, count(*) AS n FROM (
        | SELECT DISTINCT * FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT l_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join_chain" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_selective_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q9_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |FROM orders
        |QUALIFY rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q12_case_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_cond_ratio" ->
      """SELECT round(
        | CAST(sum(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) * 100.0 /
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
        | 6) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin,
    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | round(
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
        |  6) AS mkt_share
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_having_join" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_words,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH q AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE) AS np,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS nd,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS DOUBLE) AS ns,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nt
        | FROM documents)
        |SELECT doc_id, len_chars,
        | round(np / len_chars, 6) AS punct_ratio,
        | round(nd / len_chars, 6) AS digit_ratio,
        | round(ns / nt, 6) AS stop_ratio,
        | round(least(len_chars / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE)) * (1.0 - np / len_chars) * (0.5 + ns / nt), 6) AS quality_score
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH c AS (SELECT doc_id, lang AS tagged_lang,
        |  CAST(len(regexp_extract_all(text, 'th|he|an|in|er')) AS BIGINT) AS c_en,
        |  CAST(len(regexp_extract_all(text, 'sch|ein|der|ung')) AS BIGINT) AS c_de,
        |  CAST(len(regexp_extract_all(text, 'el |la |de |os ')) AS BIGINT) AS c_es
        | FROM documents)
        |SELECT doc_id, tagged_lang, c_en, c_de, c_es,
        | CASE WHEN c_en >= c_de AND c_en >= c_es THEN 'en'
        |      WHEN c_de >= c_es THEN 'de' ELSE 'es' END AS predicted_lang
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH f AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        | FROM documents)
        |SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    "text_winnow" ->
      """WITH g AS (SELECT doc_id,
        |  CASE WHEN length(text) < 8 THEN [('0x' || substr(md5(text), 1, 15))::BIGINT]
        |  ELSE list_transform(range(1, length(text) - 8 + 2),
        |    i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT) END AS h
        | FROM documents),
        |wins AS (SELECT doc_id, h, greatest(1, len(h) - 4 + 1) AS nw FROM g),
        |fps AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, nw + 1),
        |   j -> list_min(h[j:least(j + 4 - 1, len(h))])))) AS fp FROM wins)
        |SELECT doc_id, fp FROM fps ORDER BY doc_id, fp""".stripMargin,
    "dedup_winnow_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + (SELECT (max(doc_id)//100000 + 1)*100000
        |    FROM documents) AS doc_id, text FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN length(text) < 16 THEN [('0x' || substr(md5(text), 1, 15))::BIGINT]
        |  ELSE list_transform(range(1, length(text) - 16 + 2),
        |    i -> ('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT) END AS h
        | FROM d),
        |wins AS (SELECT doc_id, h, greatest(1, len(h) - 4 + 1) AS nw FROM g),
        |fps AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, nw + 1),
        |   j -> list_min(h[j:least(j + 4 - 1, len(h))])))) AS fp FROM wins),
        |nfp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM fps GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared
        |FROM pairs
        |JOIN nfp x ON x.doc_id = doc_a JOIN nfp y ON y.doc_id = doc_b
        |WHERE n_shared * 5 >= least(x.nfp, y.nfp) * 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |  FROM t WHERE len(toks) >= 2),
        |bs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |uc AS (SELECT w1, count(*) AS uc FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |bc AS (SELECT w1, w2, count(*) AS bc FROM bs GROUP BY 1, 2),
        |v AS (SELECT count(*) AS v FROM uc)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln((bc + 1.0) / (uc.uc + v.v))), 6) AS lm_score
        |FROM bs JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, tf.term,
        |    round(tf * (ln((n + 1.0) / (df + 1.0)) + 1), 6) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, score, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS BIGINT) AS rk FROM s) t
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + (SELECT (max(doc_id)//100000 + 1)*100000
        |    FROM documents), text FROM documents)
        |SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END)) AS s FROM t),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) AS jaccard
        |FROM common JOIN cnt x ON doc_a = x.doc_id JOIN cnt y ON doc_b = y.doc_id
        |WHERE round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |shl AS (SELECT doc_id, list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END) AS shingles FROM t),
        |sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |   list_min(list_transform(shingles, s ->
        |     ((1 + 2*i) * (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) + 7 + 11*i) % 2147483647))) AS sg
        |  FROM shl),
        |bands AS (SELECT doc_id, j AS band,
        |   md5(concat_ws(',', sg[4*j+1], sg[4*j+2], sg[4*j+3], sg[4*j+4])) AS bkey
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $componentsCtes,
        |comp AS (SELECT node AS doc_id, min(reach) AS component FROM walk GROUP BY 1)
        |SELECT component, count(*) AS n_members,
        | CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
        | CAST(sum(CASE WHEN comp.doc_id != component THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_reclaimed
        |FROM comp JOIN documents d ON comp.doc_id = d.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_recall_report" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |nn AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |pp AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm FROM nn WHERE vec_id < 5),
        |bfs AS (SELECT pp.probe_id, nn.vec_id,
        |   round(list_sum(list_transform(list_zip(pp.pv, nn.v), z -> z[1]*z[2])) / (pp.pnorm * nn.norm), 6) AS cosine
        |  FROM pp CROSS JOIN nn WHERE nn.vec_id <> pp.probe_id),
        |bf AS (SELECT probe_id, vec_id FROM bfs
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 5),
        |planes AS (
        |  SELECT b, list_transform(range(0, 64), j ->
        |    ((('0x' || substr(md5(b::VARCHAR || '-' || j::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS plane
        |  FROM (SELECT unnest(range(0, 8)) AS b)),
        |bits AS (SELECT e.vec_id, b,
        |   CASE WHEN list_sum(list_transform(list_zip(e.v, plane), z -> z[1]*z[2])) >= 0
        |     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM e CROSS JOIN planes),
        |buck AS (SELECT vec_id, CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS bucket FROM bits GROUP BY 1),
        |nb AS (SELECT nn.vec_id, buck.bucket, nn.v, nn.norm
        |  FROM nn JOIN buck ON nn.vec_id = buck.vec_id),
        |pb AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm, bucket AS pbucket
        |  FROM nb WHERE vec_id < 5),
        |ls AS (SELECT pb.probe_id, nb.vec_id,
        |   round(list_sum(list_transform(list_zip(pb.pv, nb.v), z -> z[1]*z[2]))
        |     / (pb.pnorm * nb.norm), 6) AS cosine
        |  FROM pb JOIN nb ON nb.bucket = pb.pbucket AND nb.vec_id <> pb.probe_id),
        |lsh AS (SELECT probe_id, vec_id FROM ls
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 5),
        |hits AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM bf JOIN lsh USING (probe_id, vec_id) GROUP BY 1),
        |ex AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact FROM bf GROUP BY 1)
        |SELECT ex.probe_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits, n_exact,
        | round(CAST(coalesce(n_hits, 0) AS DOUBLE) / n_exact, 6) AS recall_at_5
        |FROM ex LEFT JOIN hits ON ex.probe_id = hits.probe_id
        |ORDER BY ex.probe_id""".stripMargin,
    "dedup_components" -> componentsOracleSql,
    // same clustering semantics, star-contraction / min-label execution
    // paths — the oracle (transitive closure) is identical by construction
    "dedup_components_star" -> componentsOracleSql,
    "dedup_components_minlabel" -> componentsOracleSql,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $componentsCtes,
        |comp AS (SELECT node AS doc_id, min(reach) AS component
        |  FROM walk GROUP BY 1),
        |q AS (SELECT doc_id,
        |   round(least(CAST(length(text) AS BIGINT) / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |     * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE) / length(text))
        |     * (0.5 + CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE)
        |         / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)), 6) AS quality_score
        |  FROM documents),
        |j AS (SELECT comp.component, comp.doc_id, q.quality_score
        |  FROM comp JOIN q ON comp.doc_id = q.doc_id)
        |SELECT component, doc_id AS keep_doc_id, quality_score FROM j
        |QUALIFY row_number() OVER (PARTITION BY component
        |  ORDER BY quality_score DESC, doc_id) = 1
        |ORDER BY component""".stripMargin,
    "dedup_apply" ->
      s"""WITH RECURSIVE $componentsCtes,
        |comp AS (SELECT node AS doc_id, min(reach) AS component
        |  FROM walk GROUP BY 1),
        |q AS (SELECT doc_id,
        |   round(least(CAST(length(text) AS BIGINT) / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |     * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE) / length(text))
        |     * (0.5 + CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE)
        |         / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)), 6) AS quality_score
        |  FROM documents),
        |keepers AS (SELECT doc_id FROM (
        |  SELECT comp.component, comp.doc_id, qq.quality_score,
        |    row_number() OVER (PARTITION BY comp.component
        |      ORDER BY qq.quality_score DESC, comp.doc_id) AS rk
        |  FROM comp JOIN q qq ON comp.doc_id = qq.doc_id) t WHERE rk = 1),
        |dropped AS (SELECT doc_id FROM comp
        |  WHERE doc_id NOT IN (SELECT doc_id FROM keepers))
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_train_split" ->
      """SELECT doc_id, lang, bucket,
        | CASE WHEN bucket < 80 THEN 'train'
        |      WHEN bucket < 90 THEN 'validation' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_decontaminate" ->
      s"""WITH $bandsCtes,
        |bench AS (SELECT band, bkey, doc_id AS bench_id FROM bands WHERE doc_id % 10 = 0)
        |SELECT b.doc_id, count(DISTINCT bench.bench_id) AS n_benchmark_hits
        |FROM bands b JOIN bench ON b.band = bench.band AND b.bkey = bench.bkey
        |WHERE b.doc_id % 10 != 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_pack_sequences" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard
        |  FROM documents),
        |s AS (SELECT doc_id, shard,
        |   CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_chars AS start_off
        |  FROM d)
        |SELECT doc_id, shard, start_off // 2048 AS pack_id, start_off % 2048 AS pack_offset
        |FROM s ORDER BY doc_id""".stripMargin,
    "pipeline_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-sample'), 1, 15))::BIGINT % 1000 AS h,
        |    CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 250 ELSE 100 END AS rate
        |  FROM documents)
        |WHERE h < rate ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH r AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS raw
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(raw, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(
        |   regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "text_top_bigrams" ->
      """WITH t AS (SELECT regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> {'w1': toks[i], 'w2': toks[i+1]})) AS bg
        |  FROM t WHERE len(toks) >= 2)
        |SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY 1, 2 ORDER BY n DESC, w1, w2 LIMIT 25""".stripMargin,
    "pipeline_shard_order" ->
      """WITH h AS (SELECT doc_id,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-order'), 1, 15))::BIGINT AS ord_hash
        |  FROM documents)
        |SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY ord_hash, doc_id) AS BIGINT) AS order_in_shard
        |FROM h ORDER BY doc_id""".stripMargin,
    // composed C4-style curation chain: quality gate + language gate +
    // drop non-canonical near-dup members (reuses the clustering CTEs)
    "pipeline_corpus_filter" ->
      s"""WITH RECURSIVE $componentsCtes,
        |comp AS (SELECT node AS doc_id, min(reach) AS component FROM walk GROUP BY 1),
        |dropped AS (SELECT doc_id FROM comp WHERE doc_id != component),
        |q AS (SELECT doc_id,
        |  round(least(length(text) / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE) / length(text))
        |    * (0.5 + CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS DOUBLE)
        |        / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)), 6) AS quality_score
        | FROM documents),
        |l AS (SELECT doc_id,
        |  CASE WHEN len(regexp_extract_all(text, 'th|he|an|in|er')) >= len(regexp_extract_all(text, 'sch|ein|der|ung'))
        |        AND len(regexp_extract_all(text, 'th|he|an|in|er')) >= len(regexp_extract_all(text, 'el |la |de |os '))
        |       THEN 'en'
        |       WHEN len(regexp_extract_all(text, 'sch|ein|der|ung')) >= len(regexp_extract_all(text, 'el |la |de |os '))
        |       THEN 'de' ELSE 'es' END AS predicted_lang
        | FROM documents)
        |SELECT q.doc_id, q.quality_score, l.predicted_lang
        |FROM q JOIN l ON q.doc_id = l.doc_id
        |WHERE q.quality_score >= 0.3 AND l.predicted_lang = 'en'
        |  AND q.doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY 1""".stripMargin,
    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, list_distinct(regexp_extract_all(text, '\S+')) AS toks FROM documents),
        |sims AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j ->
        |   CASE WHEN list_sum(list_transform(toks, s ->
        |       CASE WHEN (('0x' || substr(md5(s), 1, 15))::BIGINT >> j) % 2 = 1 THEN 1 ELSE -1 END)) > 0
        |     THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sim FROM t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "ann_ivf_recall_sweep" ->
      s"""WITH $ivfCtes,
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm FROM asg WHERE vec_id < 5),
        |routed AS (
        |  SELECT probe_id, pv, pnorm, cell, crk FROM (
        |    SELECT p.probe_id, p.pv, p.pnorm, cent.cell,
        |      row_number() OVER (PARTITION BY p.probe_id ORDER BY
        |        round(sqrt(list_sum(list_transform(list_zip(p.pv, cent.cv),
        |          z -> (z[1]-z[2])*(z[1]-z[2])))), 6), cent.cell) AS crk
        |    FROM p CROSS JOIN cent) t
        |  WHERE crk <= 4),
        |nps AS (SELECT unnest([1, 2, 4]) AS nprobe),
        |apx AS (SELECT nprobe, probe_id, vec_id FROM (
        |  SELECT nps.nprobe, routed.probe_id, n.vec_id,
        |    row_number() OVER (PARTITION BY routed.probe_id, nps.nprobe ORDER BY
        |      round(list_sum(list_transform(list_zip(routed.pv, n.v), z -> z[1]*z[2]))
        |        / (routed.pnorm * n.norm), 6) DESC, n.vec_id) AS rk
        |  FROM routed CROSS JOIN nps JOIN asg n ON n.cell = routed.cell
        |  WHERE routed.crk <= nps.nprobe AND n.vec_id <> routed.probe_id) t
        |  WHERE rk <= 5),
        |ex AS (SELECT probe_id, vec_id FROM (
        |  SELECT p.probe_id, n.vec_id,
        |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
        |      round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |        / (p.pnorm * n.norm), 6) DESC, n.vec_id) AS rk
        |  FROM p CROSS JOIN asg n WHERE n.vec_id <> p.probe_id) t
        |  WHERE rk <= 5),
        |tot AS (SELECT count(*) AS n_truth FROM ex)
        |SELECT CAST(nprobe AS BIGINT) AS nprobe,
        |  CAST(count(*) AS BIGINT) AS n_hits,
        |  tot.n_truth,
        |  round(CAST(count(*) AS DOUBLE) / tot.n_truth, 6) AS recall_at_5
        |FROM apx JOIN ex ON apx.probe_id = ex.probe_id AND apx.vec_id = ex.vec_id
        |CROSS JOIN tot
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH $ivfCtes,
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm FROM asg WHERE vec_id < 5),
        |routed AS (
        |  SELECT probe_id, pv, pnorm, cell FROM (
        |    SELECT p.probe_id, p.pv, p.pnorm, cent.cell,
        |      round(sqrt(list_sum(list_transform(list_zip(p.pv, cent.cv),
        |        z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS cdist
        |    FROM p CROSS JOIN cent) t
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cdist, cell) <= 2),
        |s AS (SELECT routed.probe_id, asg.vec_id,
        |   round(list_sum(list_transform(list_zip(routed.pv, asg.v), z -> z[1]*z[2]))
        |     / (routed.pnorm * asg.norm), 6) AS cosine
        |  FROM routed JOIN asg ON asg.cell = routed.cell
        |  WHERE asg.vec_id <> routed.probe_id)
        |SELECT probe_id, vec_id, cosine,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "embed_quantize_error" ->
      """WITH pe AS (SELECT CAST(i - 1 AS BIGINT) AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM pe GROUP BY 1),
        |d AS (SELECT pe.pos, x, mn, mx,
        |   CASE WHEN mx = mn THEN 0
        |        ELSE CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) END AS q
        |  FROM pe JOIN st ON pe.pos = st.pos),
        |e AS (SELECT pos, mn, mx,
        |   abs(x - (CASE WHEN mx = mn THEN mn
        |        ELSE mn + (q + 0.5::DOUBLE) * (mx - mn) / 255 END)) AS abs_err
        |  FROM d)
        |SELECT pos, round(avg(abs_err), 6) AS avg_abs_err,
        |  round(max(abs_err), 6) AS max_abs_err,
        |  round(max((mx - mn) / 255), 6) AS cell_width
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "embed_quantize" ->
      """WITH pe AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM pe GROUP BY 1)
        |SELECT vec_id, pe.pos,
        |  CAST(CASE WHEN mx = mn THEN 0
        |       ELSE floor((x - mn) / (mx - mn) * 255) END AS BIGINT) AS q
        |FROM pe JOIN st ON pe.pos = st.pos ORDER BY vec_id, pe.pos""".stripMargin,
    "ann_bruteforce" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm FROM n WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, n.vec_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id)
        |SELECT probe_id, vec_id, cosine,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "ann_ivf" ->
      s"""WITH $ivfCtes
        |SELECT asg.vec_id AS vec_id, asg.cell AS cell, asg.dist AS dist_to_cell,
        |  asg.cell = CAST(emb.label AS BIGINT) AS matches_label
        |FROM asg JOIN embeddings emb USING (vec_id) ORDER BY vec_id""".stripMargin,
    // 128 mod-seeded cells (≥ 64): the one oracle row that adjudicates
    // the HIERARCHICAL CellIndex scan path (every label-seeded IVF
    // oracle rides the fixtures' 10 labels = flat scan)
    "ann_hier_route" ->
      """WITH pe AS (SELECT vec_id, vec_id % 128 AS cell, i AS pos,
        |   CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |cp AS (SELECT cell, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(x), 6) AS centroid FROM pe GROUP BY 1, 2),
        |c AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM cp GROUP BY 1),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s AS (SELECT e.vec_id, c.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, c.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist_to_cell
        |  FROM e CROSS JOIN c)
        |SELECT vec_id, cell, dist_to_cell FROM s
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist_to_cell, cell) = 1
        |ORDER BY vec_id""".stripMargin,
    // 4500 mod-seeded cells over the ×16-expanded corpus (o/1024 is an
    // exact binary fraction — bit-identical doubles in both engines):
    // the one oracle row that adjudicates the THREE-level CellIndex
    // recursion (≥4096 cells ⇒ parent level; ann_hier_route's 128
    // cells stop at level 2). 50 probes bound the brute-force side.
    "ann_hier_route3" ->
      """WITH ex AS (SELECT (vec_id * 16 + o) % 4500 AS cell, o,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE) + o / 1024.0) AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 16)) AS o)),
        |pe AS (SELECT cell, i AS pos, v[i] AS x
        |  FROM ex CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |cp AS (SELECT cell, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(x), 6) AS centroid FROM pe GROUP BY 1, 2),
        |c AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM cp GROUP BY 1),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 50),
        |s AS (SELECT e.vec_id, c.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, c.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist_to_cell
        |  FROM e CROSS JOIN c)
        |SELECT vec_id, cell, dist_to_cell FROM s
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist_to_cell, cell) = 1
        |ORDER BY vec_id""".stripMargin,
    "embed_ivf_balance" ->
      s"""WITH $ivfCtes,
        |c AS (SELECT cell, count(*) AS sz FROM asg GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        | min(sz) AS min_sz, max(sz) AS max_sz,
        | round(avg(sz), 6) AS mean_sz,
        | round(CAST(max(sz) AS DOUBLE) / avg(sz), 6) AS imbalance
        |FROM c""".stripMargin,
    "ann_kmeans_refine" ->
      """WITH pe AS (SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |c0p AS (SELECT CAST(label AS BIGINT) AS cell, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(x), 6) AS centroid FROM pe GROUP BY 1, 2),
        |c0 AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM c0p GROUP BY 1),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s1 AS (SELECT e.vec_id, e.v, c0.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, c0.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
        |  FROM e CROSS JOIN c0),
        |a1 AS (SELECT vec_id, v, cell AS cell1 FROM s1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |p1 AS (SELECT cell1, i AS pos, v[i] AS x
        |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |c1p AS (SELECT cell1 AS cell, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(x), 6) AS centroid FROM p1 GROUP BY 1, 2),
        |c1 AS (SELECT cell, list(centroid ORDER BY pos) AS cv FROM c1p GROUP BY 1),
        |s2 AS (SELECT e.vec_id, c1.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, c1.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
        |  FROM e CROSS JOIN c1),
        |a2 AS (SELECT vec_id, cell, dist FROM s2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1)
        |SELECT a2.vec_id, a2.cell, a2.dist, a2.cell != a1.cell1 AS moved
        |FROM a2 JOIN a1 USING (vec_id) ORDER BY a2.vec_id""".stripMargin,
    "ann_lsh_bucket" ->
      """WITH planes AS (
        |  SELECT b, list_transform(range(0, 64), j ->
        |    ((('0x' || substr(md5(b::VARCHAR || '-' || j::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS plane
        |  FROM (SELECT unnest(range(0, 8)) AS b)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |bits AS (SELECT vec_id, b,
        |   CASE WHEN list_sum(list_transform(list_zip(v, plane), z -> z[1]*z[2])) >= 0
        |     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM e CROSS JOIN planes),
        |buck AS (SELECT vec_id, CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS bucket FROM bits GROUP BY 1)
        |SELECT vec_id, bucket, count(*) OVER (PARTITION BY bucket) AS n_in_bucket
        |FROM buck ORDER BY vec_id""".stripMargin,
    "ann_lsh_multiprobe" ->
      """WITH planes AS (
        |  SELECT b, list_transform(range(0, 64), j ->
        |    ((('0x' || substr(md5(b::VARCHAR || '-' || j::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS plane
        |  FROM (SELECT unnest(range(0, 8)) AS b)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |bits AS (SELECT vec_id, b,
        |   CASE WHEN list_sum(list_transform(list_zip(v, plane), z -> z[1]*z[2])) >= 0
        |     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM e CROSS JOIN planes),
        |buck AS (SELECT vec_id, CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS bucket FROM bits GROUP BY 1),
        |n AS (SELECT e.vec_id, buck.bucket, e.v,
        |   sqrt(list_sum(list_transform(e.v, x -> x*x))) AS norm
        |  FROM e JOIN buck ON e.vec_id = buck.vec_id),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm, bucket AS pbucket
        |  FROM n WHERE vec_id < 5),
        |px AS (SELECT probe_id, pv, pnorm, unnest(list_transform(range(0, 9),
        |   i -> CASE WHEN i = 0 THEN pbucket
        |        ELSE xor(pbucket, (CAST(1 AS BIGINT) << (i - 1))) END)) AS sbucket FROM p),
        |s AS (SELECT px.probe_id, n.vec_id,
        |   round(list_sum(list_transform(list_zip(px.pv, n.v), z -> z[1]*z[2]))
        |     / (px.pnorm * n.norm), 6) AS cosine
        |  FROM px JOIN n ON n.bucket = px.sbucket AND n.vec_id <> px.probe_id)
        |SELECT probe_id, vec_id, cosine,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "ann_lsh_topk" ->
      """WITH planes AS (
        |  SELECT b, list_transform(range(0, 64), j ->
        |    ((('0x' || substr(md5(b::VARCHAR || '-' || j::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS plane
        |  FROM (SELECT unnest(range(0, 8)) AS b)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |bits AS (SELECT vec_id, b,
        |   CASE WHEN list_sum(list_transform(list_zip(v, plane), z -> z[1]*z[2])) >= 0
        |     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM e CROSS JOIN planes),
        |buck AS (SELECT vec_id, CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS bucket FROM bits GROUP BY 1),
        |n AS (SELECT e.vec_id, buck.bucket, e.v,
        |   sqrt(list_sum(list_transform(e.v, x -> x*x))) AS norm
        |  FROM e JOIN buck ON e.vec_id = buck.vec_id),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm, bucket AS pbucket
        |  FROM n WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, n.vec_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p JOIN n ON n.bucket = p.pbucket AND n.vec_id <> p.probe_id)
        |SELECT probe_id, vec_id, cosine,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "embed_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
        | round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid, count(*) AS n_vecs
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_min_within_group" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part x WHERE x.p_type = p.p_type)
        |ORDER BY p_type, p_partkey""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q2_min_within_group" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part x WHERE x.p_type = p.p_type)
        |ORDER BY p_type, p_partkey""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_distinct_count" ->
      """SELECT p_brand, p_type, count(DISTINCT p_size) AS size_cnt, count(*) AS part_cnt
        |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q22_wealthy_inactive" ->
      """SELECT c_mktsegment, count(*) AS n_custs,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.2
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_median_value" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value,
        | round(quantile_cont(value, 0.9), 6) AS p90_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_session_window" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |t AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |        THEN 1 ELSE 0 END AS new_sess FROM s),
        |u AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sn FROM t)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS start_sec,
        |  max(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS end_sec
        |FROM u GROUP BY user_id, sn ORDER BY user_id, start_sec""".stripMargin,
    "etl_sliding_window" ->
      """WITH e AS (
        |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es, event_type, value
        |  FROM events),
        |w AS (
        |  SELECT es - (es % 300) AS ws, event_type, value FROM e
        |  UNION ALL
        |  SELECT es - (es % 300) - 300 AS ws, event_type, value FROM e)
        |SELECT ws AS window_start_epoch, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "etl_scd2_history" ->
      """WITH chg AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |pts AS (
        |  SELECT user_id, event_type, ts, event_id FROM chg
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS valid_from_sec,
        |  COALESCE(lead(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS valid_to_sec,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM pts ORDER BY user_id, valid_from_sec""".stripMargin,
    "q_pivot_segment_status" ->
      """SELECT c_mktsegment,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
        | o_totalprice,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS running_spend
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, order_epoch, o_orderkey""".stripMargin,
    "q_repeat_customers" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "q_cube_priority_status" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(o_orderstatus, 'ALL') AS status,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q_trailing_spend" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
        | o_totalprice,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS trailing_30d_spend
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, order_epoch, o_orderkey""".stripMargin,
    "q_funnel_sequence" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |tv AS (SELECT user_id, min(tus) AS t_view FROM ev WHERE event_type = 'view' GROUP BY 1),
        |tc AS (SELECT ev.user_id, t_view, min(tus) AS t_click
        |  FROM ev JOIN tv ON ev.user_id = tv.user_id
        |  WHERE event_type = 'click' AND tus > t_view GROUP BY 1, 2)
        |SELECT ev.user_id, t_view, t_click, min(tus) AS t_purchase
        |FROM ev JOIN tc ON ev.user_id = tc.user_id
        |WHERE event_type = 'purchase' AND tus > t_click
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q_cohort_retention" ->
      """WITH u AS (SELECT DISTINCT user_id,
        |   CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM u GROUP BY 1)
        |SELECT c.cohort_wk, (u.wk - c.cohort_wk) // 604800 AS week_offset,
        | CAST(count(*) AS BIGINT) AS n_users
        |FROM u JOIN c ON u.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ann_nndescent" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm,
        |   ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS bkt FROM e),
        |g0 AS (SELECT u, w FROM (
        |   SELECT vec_id AS u, unnest([
        |     lead(vec_id, 1) OVER (PARTITION BY bkt ORDER BY vec_id),
        |     lead(vec_id, 2) OVER (PARTITION BY bkt ORDER BY vec_id),
        |     lead(vec_id, 3) OVER (PARTITION BY bkt ORDER BY vec_id)]) AS w
        |   FROM n) WHERE w IS NOT NULL),
        |adj AS (SELECT DISTINCT m, x FROM (
        |   SELECT u AS m, w AS x FROM g0 UNION ALL SELECT w, u FROM g0)),
        |meet AS (SELECT DISTINCT a.x AS u, b.x AS w
        |  FROM adj a JOIN adj b ON a.m = b.m AND a.x < b.x),
        |cand AS (SELECT DISTINCT u, w FROM (
        |   SELECT u, w FROM meet UNION ALL SELECT w, u FROM meet
        |   UNION ALL SELECT u, w FROM g0)),
        |sc AS (SELECT cand.u, cand.w,
        |   round(list_sum(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2]))
        |     / (x.norm * y.norm), 6) AS cosine
        |  FROM cand JOIN n x ON x.vec_id = cand.u JOIN n y ON y.vec_id = cand.w),
        |top AS (SELECT u, w, cosine,
        |   CAST(row_number() OVER (PARTITION BY u ORDER BY cosine DESC, w) AS BIGINT) AS rk
        |  FROM sc QUALIFY rk <= 3)
        |SELECT top.u AS vec_id, top.w AS nbr_id, cosine, rk,
        |  g0.u IS NULL AS gained
        |FROM top LEFT JOIN g0 ON g0.u = top.u AND g0.w = top.w
        |ORDER BY vec_id, rk""".stripMargin,
    "ann_knn_graph" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |s AS (SELECT a.vec_id, b.vec_id AS nbr_id,
        |   round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]))
        |     / (a.norm * b.norm), 6) AS cosine
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT vec_id, nbr_id, cosine,
        | CAST(row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q11_value_concentration" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS v
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM pv WHERE v > (SELECT sum(v) * 0.0006 FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q13_cust_distribution" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q19_disjunctive_join" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_supplier_semi_chain" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%'
        |  GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 100)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_sole_returner" ->
      """WITH per_order AS (
        |  SELECT l_orderkey AS po_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
        |  FROM lineitem GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l
        |  JOIN per_order ON l.l_orderkey = po_orderkey
        |  JOIN orders ON o_orderkey = l.l_orderkey
        |  WHERE o_orderstatus = 'F' AND l.l_returnflag = 'R'
        |    AND n_supp > 1 AND n_r_supp = 1) t
        |JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "dedup_embed_cosine" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |   round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2])) / (a.norm * b.norm), 6) AS cosine
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,
    "mm_binary_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | hex(encode(substr(text, 1, 4))) AS header_hex,
        | md5(hex(encode(text))) AS content_hash,
        | CAST(octet_length(encode(text)) // 256 AS BIGINT) AS n_frames,
        | CASE WHEN hex(encode(substr(text, 1, 4))) LIKE '89504E47%' THEN 'png'
        |      WHEN hex(encode(substr(text, 1, 4))) LIKE 'FFD8FF%' THEN 'jpeg'
        |      WHEN hex(encode(substr(text, 1, 4))) LIKE '47494638%' THEN 'gif'
        |      WHEN hex(encode(substr(text, 1, 4))) LIKE '52494646%' THEN 'riff'
        |      WHEN hex(encode(substr(text, 1, 4))) LIKE '664C6143%' THEN 'flac'
        |      ELSE 'unknown' END AS detected_type,
        | 'stubbed-no-codec' AS decode_status
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(length(text) // 64 AS INT) AS n_frames, text
        |  FROM documents WHERE length(text) >= 64),
        |x AS (
        |  SELECT doc_id, unnest(range(0, n_frames, 2)) AS frame_idx, text FROM f)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,
    // each triangle {a<b<c} is enumerated exactly once over the
    // canonical u<v edge list: (a,b)+(a,c) wedge closed by (b,c)
    "graph_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM edges e1 JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([a, b, c]) AS part FROM tri)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_components" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |pairs AS (
        |  SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        |walk(node, reach) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach)
        |SELECT node AS part, min(reach) AS component
        |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_doc_chunks" ->
      """WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
        |n AS (SELECT doc_id, text, len,
        |   CASE WHEN len > 256 THEN (len - 256 + 191) // 192 + 1 ELSE CAST(1 AS BIGINT) END AS n_chunks
        |  FROM d),
        |x AS (SELECT doc_id, text, len, unnest(range(0, n_chunks)) AS chunk_id FROM n)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(chunk_id * 192 AS BIGINT) AS chunk_start,
        |  CAST(least(256, len - chunk_id * 192) AS BIGINT) AS chunk_len,
        |  md5(substr(text, CAST(chunk_id * 192 + 1 AS INT), 256)) AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    "pipeline_sample_weighted" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |   (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-wsample'), 1, 15))::BIGINT % 1000000 + 0.5) / 1000000.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_chars, round(ln(u) / n_chars, 9) AS wkey
        |FROM d ORDER BY wkey DESC, doc_id LIMIT 100""".stripMargin,
    "profile_orders" ->
      """WITH kv AS (
        |  SELECT 'o_orderkey' AS column_name, CAST(o_orderkey AS VARCHAR) AS val FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_totalprice', CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
        |counts AS (
        |  SELECT column_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT val) AS BIGINT) AS n_distinct
        |  FROM kv GROUP BY 1),
        |mm AS (
        |  SELECT 'o_orderkey' AS column_name, CAST(min(o_orderkey) AS VARCHAR) AS min_val, CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', min(o_orderstatus), max(o_orderstatus) FROM orders
        |  UNION ALL SELECT 'o_totalprice', CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR), CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderdate', strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'), strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
        |  UNION ALL SELECT 'o_orderpriority', min(o_orderpriority), max(o_orderpriority) FROM orders)
        |SELECT counts.column_name, n_rows, n_nulls, n_distinct, min_val, max_val
        |FROM counts JOIN mm USING (column_name)
        |ORDER BY column_name""".stripMargin,
    // three unrolled damped-PageRank steps; ranks round to 9 dp per
    // iteration in both engines so float-sum order can't compound
    "graph_lpa" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |l0 AS (SELECT DISTINCT u AS nd, u AS lbl FROM e),
        |c1 AS (SELECT e.u, l.lbl, count(*) AS cnt
        |  FROM e JOIN l0 l ON l.nd = e.v GROUP BY 1, 2),
        |l1 AS (SELECT u AS nd, lbl FROM c1
        |  QUALIFY row_number() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) = 1),
        |c2 AS (SELECT e.u, l.lbl, count(*) AS cnt
        |  FROM e JOIN l1 l ON l.nd = e.v GROUP BY 1, 2),
        |l2 AS (SELECT u AS nd, lbl FROM c2
        |  QUALIFY row_number() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) = 1)
        |SELECT nd AS node, lbl AS community FROM l2 ORDER BY node""".stripMargin,
    "graph_pagerank" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |od AS (SELECT u, count(*) AS od FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS c FROM od),
        |r0 AS (SELECT u AS nd, CAST(1.0 AS DOUBLE) / (SELECT c FROM nn) AS rank FROM od),
        |r1 AS (SELECT e.v AS nd,
        |   round(CAST(0.15 AS DOUBLE) / (SELECT c FROM nn)
        |     + CAST(0.85 AS DOUBLE) * sum(r.rank / od.od), 9) AS rank
        |  FROM e JOIN r0 r ON r.nd = e.u JOIN od ON od.u = e.u GROUP BY e.v),
        |r2 AS (SELECT e.v AS nd,
        |   round(CAST(0.15 AS DOUBLE) / (SELECT c FROM nn)
        |     + CAST(0.85 AS DOUBLE) * sum(r.rank / od.od), 9) AS rank
        |  FROM e JOIN r1 r ON r.nd = e.u JOIN od ON od.u = e.u GROUP BY e.v),
        |r3 AS (SELECT e.v AS nd,
        |   round(CAST(0.15 AS DOUBLE) / (SELECT c FROM nn)
        |     + CAST(0.85 AS DOUBLE) * sum(r.rank / od.od), 9) AS rank
        |  FROM e JOIN r2 r ON r.nd = e.u JOIN od ON od.u = e.u GROUP BY e.v)
        |SELECT nd AS part, round(rank, 6) AS rank FROM r3 ORDER BY part""".stripMargin,
    "ann_pq_adc" ->
      """WITH pe AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   CAST(i - 1 AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |sub AS (SELECT vec_id, label, pos // 8 AS s, pos % 8 AS j, x FROM pe),
        |cb AS (SELECT label AS code, s, j, round(avg(x), 6) AS c FROM sub GROUP BY 1, 2, 3),
        |cbarr AS (SELECT code, s, list(c ORDER BY j) AS cw FROM cb GROUP BY 1, 2),
        |vsub AS (SELECT vec_id, s, list(x ORDER BY j) AS sv FROM sub GROUP BY 1, 2),
        |encd AS (SELECT vec_id, s, code,
        |   round(list_sum(list_transform(list_zip(sv, cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS d
        |  FROM vsub JOIN cbarr USING (s)),
        |enc AS (SELECT vec_id, s, code FROM encd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) = 1),
        |dtab AS (SELECT v.vec_id AS probe_id, v.s, cbarr.code,
        |   round(list_sum(list_transform(list_zip(v.sv, cbarr.cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS dsq
        |  FROM vsub v JOIN cbarr ON v.s = cbarr.s WHERE v.vec_id < 5),
        |adc AS (SELECT probe_id, vec_id, round(sqrt(sum(dsq)), 6) AS adist
        |  FROM enc JOIN dtab USING (s, code)
        |  WHERE vec_id <> probe_id GROUP BY 1, 2)
        |SELECT probe_id, vec_id, adist,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS BIGINT) AS rk
        |FROM adc QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    // IVF routing (nprobe=2 coarse cells) + PQ asymmetric distance —
    // same codebook/encoding CTEs as ann_pq_adc plus the cell filter
    "ann_ivf_pq" ->
      s"""WITH $ivfCtes,
        |pe AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   CAST(i - 1 AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |sub AS (SELECT vec_id, label, pos // 8 AS s, pos % 8 AS j, x FROM pe),
        |cb AS (SELECT label AS code, s, j, round(avg(x), 6) AS c FROM sub GROUP BY 1, 2, 3),
        |cbarr AS (SELECT code, s, list(c ORDER BY j) AS cw FROM cb GROUP BY 1, 2),
        |vsub AS (SELECT vec_id, s, list(x ORDER BY j) AS sv FROM sub GROUP BY 1, 2),
        |encd AS (SELECT vec_id, s, code,
        |   round(list_sum(list_transform(list_zip(sv, cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS d
        |  FROM vsub JOIN cbarr USING (s)),
        |enc AS (SELECT vec_id, s, code FROM encd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) = 1),
        |dtab AS (SELECT v.vec_id AS probe_id, v.s, cbarr.code,
        |   round(list_sum(list_transform(list_zip(v.sv, cbarr.cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS dsq
        |  FROM vsub v JOIN cbarr ON v.s = cbarr.s WHERE v.vec_id < 5),
        |pr AS (SELECT vec_id AS probe_id, v AS pv FROM asg WHERE vec_id < 5),
        |routed AS (SELECT probe_id, cell FROM (
        |   SELECT pr.probe_id, cent.cell,
        |     round(sqrt(list_sum(list_transform(list_zip(pr.pv, cent.cv),
        |       z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS cdist
        |   FROM pr CROSS JOIN cent) t
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cdist, cell) <= 2),
        |cand AS (SELECT routed.probe_id, asg.vec_id
        |  FROM routed JOIN asg ON asg.cell = routed.cell
        |  WHERE asg.vec_id <> routed.probe_id),
        |adc AS (SELECT cand.probe_id, cand.vec_id, round(sqrt(sum(dsq)), 6) AS adist
        |  FROM cand JOIN enc ON enc.vec_id = cand.vec_id
        |  JOIN dtab ON dtab.probe_id = cand.probe_id
        |    AND dtab.s = enc.s AND dtab.code = enc.code
        |  GROUP BY 1, 2)
        |SELECT probe_id, vec_id, adist,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS BIGINT) AS rk
        |FROM adc QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |   ELSE CAST([] AS VARCHAR[]) END AS grams FROM t)
        |SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        | round(CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS dup_token_ratio,
        | CASE WHEN len(grams) > 0
        |   THEN round(CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
        |   ELSE 0.0 END AS dup_3gram_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "pipeline_contamination_ngram" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 3),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
        |   ELSE CAST([] AS VARCHAR[]) END)) AS s FROM t),
        |tr AS (SELECT doc_id, s FROM g WHERE doc_id % 10 != 0),
        |be AS (SELECT doc_id AS bench_id, s FROM g WHERE doc_id % 10 = 0),
        |p AS (SELECT DISTINCT tr.doc_id, tr.s, be.bench_id FROM tr JOIN be USING (s)),
        |a AS (SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_shared_ngrams FROM p GROUP BY 1),
        |b AS (SELECT doc_id, CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs FROM p GROUP BY 1)
        |SELECT doc_id, n_shared_ngrams, n_bench_docs
        |FROM a JOIN b USING (doc_id) ORDER BY doc_id""".stripMargin,
    "embed_dim_stats" ->
      """WITH pe AS (SELECT CAST(i - 1 AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i))
        |SELECT pos, count(*) AS n, round(avg(x), 6) AS mean,
        | round(stddev_pop(x), 6) AS stddev, min(x) AS mn, max(x) AS mx
        |FROM pe GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_token_budget" ->
      """WITH q AS (SELECT doc_id,
        |  round(least(length(text) / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE) / length(text))
        |    * (0.5 + CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS DOUBLE)
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE)), 6) AS quality_score
        | FROM documents),
        |s AS (SELECT d.doc_id, d.lang, d.n_chars, q.quality_score
        |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
        |c AS (SELECT doc_id, lang, quality_score, n_chars,
        |   CAST(sum(n_chars) OVER (PARTITION BY lang
        |     ORDER BY quality_score DESC, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
        |  FROM s)
        |SELECT doc_id, lang, quality_score, n_chars, cum_chars
        |FROM c WHERE cum_chars <= 50000 ORDER BY doc_id""".stripMargin,
    "embed_outliers" ->
      """WITH pe AS (SELECT CAST(label AS BIGINT) AS label, i AS pos, embedding[i] AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |c AS (SELECT label, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(CAST(x AS DOUBLE)), 6) AS centroid FROM pe GROUP BY 1, 2),
        |cent AS (SELECT label, list(centroid ORDER BY pos) AS cv FROM c GROUP BY 1),
        |e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |d AS (SELECT vec_id, e.label,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, cent.cv),
        |     z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
        |  FROM e JOIN cent ON e.label = cent.label),
        |st AS (SELECT label, round(avg(dist), 6) AS mu,
        |   round(stddev_pop(dist), 6) AS sigma FROM d GROUP BY 1)
        |SELECT vec_id, d.label, dist,
        | round((dist - mu) / sigma, 6) AS z,
        | round((dist - mu) / sigma, 6) >= 2.0 AS is_outlier
        |FROM d JOIN st ON d.label = st.label ORDER BY vec_id""".stripMargin,
    // directional containment pairs; integer threshold (c*10 >= n*9)
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END)) AS s FROM t),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |common AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |dirs AS (
        |  SELECT da AS contained, db AS container, c, x.n AS n
        |  FROM common JOIN cnt x ON x.doc_id = da
        |  UNION ALL
        |  SELECT db, da, c, y.n FROM common JOIN cnt y ON y.doc_id = db)
        |SELECT contained, container, round(CAST(c AS DOUBLE) / n, 6) AS containment
        |FROM dirs WHERE c * 10 >= n * 9
        |ORDER BY contained, container""".stripMargin,
    "pipeline_domain_mix" ->
      """WITH agg AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, source, n_docs, sum_chars,
        | round(CAST(sum_chars AS DOUBLE) / CAST(sum(sum_chars) OVER () AS DOUBLE), 6) AS char_share
        |FROM agg ORDER BY lang, source""".stripMargin,
    "pipeline_quality_gate" ->
      """WITH q AS (SELECT doc_id,
        |  round(least(length(text) / CAST(400 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE) / length(text))
        |    * (0.5 + CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS DOUBLE)
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE)), 6) AS quality_score
        | FROM documents),
        |s AS (SELECT d.doc_id, d.lang, q.quality_score
        |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
        |th AS (SELECT lang, round(quantile_cont(quality_score, 0.25), 6) AS p25
        |  FROM s GROUP BY 1)
        |SELECT doc_id, s.lang, quality_score, p25
        |FROM s JOIN th ON s.lang = th.lang
        |WHERE quality_score >= p25 ORDER BY doc_id""".stripMargin,
    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch FROM documents),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_total,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |  round((ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c)) / ln(2.0), 6) AS entropy_bits
        |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_cms_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
        |cells AS (SELECT w, i AS row_i,
        |   ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || w), 1, 15))::BIGINT % 512 AS cell
        |  FROM toks CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)),
        |sketch AS (SELECT row_i, cell, count(*) AS cnt FROM cells GROUP BY 1, 2),
        |top AS (SELECT w, count(*) AS exact_c FROM toks GROUP BY 1
        |  ORDER BY exact_c DESC, w LIMIT 10),
        |probes AS (SELECT t.w, t.exact_c, i AS row_i,
        |   ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t.w), 1, 15))::BIGINT % 512 AS cell
        |  FROM top t CROSS JOIN (SELECT unnest([0, 1, 2]) AS i))
        |SELECT p.w, p.exact_c, min(s.cnt) AS cms_estimate,
        |  CAST(min(s.cnt) - p.exact_c AS BIGINT) AS overcount
        |FROM probes p JOIN sketch s ON p.row_i = s.row_i AND p.cell = s.cell
        |GROUP BY 1, 2 ORDER BY p.exact_c DESC, p.w""".stripMargin,
    "q_hll_set_ops" ->
      """WITH a AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |b AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |ra AS (SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % 256 AS bucket,
        |   max(least(53 - length(bin((('0x' || substr(md5(k), 1, 15))::BIGINT) // 256)), 40)) AS mj
        |  FROM a GROUP BY 1),
        |rb AS (SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % 256 AS bucket,
        |   max(least(53 - length(bin((('0x' || substr(md5(k), 1, 15))::BIGINT) // 256)), 40)) AS mj
        |  FROM b GROUP BY 1),
        |ru AS (SELECT bucket, max(mj) AS mj
        |  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
        |ea AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |   sum((1::BIGINT) << CAST(40 - mj AS INT)) AS sp FROM ra),
        |eb AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |   sum((1::BIGINT) << CAST(40 - mj AS INT)) AS sp FROM rb),
        |eu AS (SELECT CAST(count(*) AS BIGINT) AS nb,
        |   sum((1::BIGINT) << CAST(40 - mj AS INT)) AS sp FROM ru),
        |ca AS (SELECT CASE WHEN nb < 256 AND raw <= 640.0
        |    THEN round(256.0 * ln(256.0 / (256 - nb)), 4) ELSE raw END AS est
        |  FROM (SELECT nb, round(0.7183::DOUBLE * 65536 * 1099511627776
        |      / (sp + (256 - nb) * 1099511627776), 4) AS raw FROM ea)),
        |cb AS (SELECT CASE WHEN nb < 256 AND raw <= 640.0
        |    THEN round(256.0 * ln(256.0 / (256 - nb)), 4) ELSE raw END AS est
        |  FROM (SELECT nb, round(0.7183::DOUBLE * 65536 * 1099511627776
        |      / (sp + (256 - nb) * 1099511627776), 4) AS raw FROM eb)),
        |cu AS (SELECT CASE WHEN nb < 256 AND raw <= 640.0
        |    THEN round(256.0 * ln(256.0 / (256 - nb)), 4) ELSE raw END AS est
        |  FROM (SELECT nb, round(0.7183::DOUBLE * 65536 * 1099511627776
        |      / (sp + (256 - nb) * 1099511627776), 4) AS raw FROM eu)),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS nx
        |  FROM (SELECT DISTINCT k FROM a INTERSECT SELECT DISTINCT k FROM b)),
        |na AS (SELECT count(DISTINCT k) AS n_exact_a FROM a),
        |nb2 AS (SELECT count(DISTINCT k) AS n_exact_b FROM b)
        |SELECT na.n_exact_a, ca.est AS est_a, nb2.n_exact_b, cb.est AS est_b,
        |  cu.est AS est_union, ex.nx AS n_exact_intersection,
        |  round(ca.est + cb.est - cu.est, 4) AS est_intersection,
        |  round(abs(round(ca.est + cb.est - cu.est, 4) - ex.nx) / ex.nx, 4) AS rel_err
        |FROM ca CROSS JOIN cb CROSS JOIN cu CROSS JOIN ex CROSS JOIN na CROSS JOIN nb2""".stripMargin,
    "q_hll_rollup" ->
      """WITH ev AS (SELECT event_type, CAST(user_id AS VARCHAR) AS k,
        |    date_trunc('day', ts) AS day FROM events),
        |h AS (SELECT event_type, day,
        |    ('0x' || substr(md5(k), 1, 15))::BIGINT AS h FROM ev),
        |daily AS (SELECT event_type, day, h % 256 AS bucket,
        |    max(least(53 - length(bin(h // 256)), 40)) AS mj
        |  FROM h GROUP BY 1, 2, 3),
        |monthly AS (SELECT event_type, bucket, max(mj) AS mj
        |  FROM daily GROUP BY 1, 2),
        |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |    sum((1::BIGINT) << CAST(40 - mj AS INT)) AS s_present
        |  FROM monthly GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT k) AS n_exact FROM ev GROUP BY 1),
        |est AS (SELECT agg.event_type, n_buckets, n_exact,
        |    round(0.7183::DOUBLE * 65536 * 1099511627776 /
        |      (s_present + (256 - n_buckets) * 1099511627776), 4) AS raw_estimate
        |  FROM agg JOIN ex ON agg.event_type = ex.event_type),
        |corr AS (SELECT *, CASE WHEN n_buckets < 256 AND raw_estimate <= 640.0
        |    THEN round(256.0 * ln(256.0 / (256 - n_buckets)), 4)
        |    ELSE raw_estimate END AS estimate FROM est)
        |SELECT event_type, n_buckets, n_exact, raw_estimate, estimate,
        |  round(abs(estimate - n_exact) / n_exact, 4) AS rel_err
        |FROM corr ORDER BY event_type""".stripMargin,
    "q_quantile_sketch" ->
      """WITH h AS (SELECT event_type, CAST(floor(value * 2) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |cum AS (SELECT event_type, bin, c,
        |   sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum FROM h),
        |ps AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS p),
        |r AS (SELECT cum.event_type, bin, c, cum.cum, ps.p,
        |   CAST(ceil(ps.p * t.n) AS BIGINT) AS rk
        |  FROM cum JOIN t USING (event_type) CROSS JOIN ps),
        |sel AS (SELECT *, row_number() OVER (PARTITION BY event_type, p ORDER BY bin) AS rn
        |  FROM r WHERE cum >= rk),
        |est AS (SELECT event_type, p,
        |   round(bin * 0.5::DOUBLE + 0.5::DOUBLE * (rk - (cum - c)) / c, 4) AS est_q
        |  FROM sel WHERE rn = 1),
        |ex AS (SELECT event_type, 0.5::DOUBLE AS p, round(quantile_cont(value, 0.5), 4) AS exact_q
        |  FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT event_type, 0.95::DOUBLE AS p, round(quantile_cont(value, 0.95), 4) AS exact_q
        |  FROM events GROUP BY 1)
        |SELECT est.event_type, est.p, est_q, exact_q,
        |  round(abs(est_q - exact_q), 4) AS abs_err
        |FROM est JOIN ex ON est.event_type = ex.event_type AND est.p = ex.p
        |ORDER BY est.event_type, est.p""".stripMargin,
    "text_zipf_slope" ->
      """WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM t GROUP BY 1 ORDER BY c DESC, w LIMIT 100),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x,
        |   ln(CAST(c AS DOUBLE)) AS y FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        |  round((count(*) * sum(x*y) - sum(x) * sum(y)) /
        |    (count(*) * sum(x*x) - sum(x) * sum(x)), 4) AS zipf_slope,
        |  round((sum(y) - ((count(*) * sum(x*y) - sum(x) * sum(y)) /
        |    (count(*) * sum(x*x) - sum(x) * sum(x))) * sum(x)) / count(*), 4) AS intercept
        |FROM r""".stripMargin,
    "text_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 6) AS mean_word_len,
        |  round(CAST(len(regexp_extract_all(text, '[#*^~|]')) AS DOUBLE) / len(toks), 6) AS symbol_word_ratio,
        |  round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks), 6) AS alpha_word_ratio,
        |  CAST(len(list_intersect(list_distinct(toks),
        |    ['the','a','of','and','to','in','that','is'])) AS BIGINT) AS n_stopwords
        | FROM t)
        |SELECT *,
        |  n_tokens BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND symbol_word_ratio <= 0.1 AND alpha_word_ratio >= 0.8
        |    AND n_stopwords >= 2 AS passes
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |  FROM t WHERE len(toks) >= 2),
        |bs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |uc AS (SELECT w1, count(*) AS uc FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |bc AS (SELECT w1, w2, count(*) AS bc FROM bs GROUP BY 1, 2),
        |v AS (SELECT count(*) AS v FROM uc),
        |sc AS (SELECT doc_id, round(avg(ln((bc + 1.0) / (uc.uc + v.v))), 6) AS lm_score
        |  FROM bs JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
        |  GROUP BY doc_id),
        |nt AS (SELECT doc_id, lm_score,
        |   ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS tercile FROM sc)
        |SELECT doc_id, lm_score,
        |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM nt ORDER BY doc_id""".stripMargin,
    "text_langid_eval" ->
      """WITH c AS (SELECT doc_id, lang AS tagged_lang,
        |  CAST(len(regexp_extract_all(text, 'th|he|an|in|er')) AS BIGINT) AS c_en,
        |  CAST(len(regexp_extract_all(text, 'sch|ein|der|ung')) AS BIGINT) AS c_de,
        |  CAST(len(regexp_extract_all(text, 'el |la |de |os ')) AS BIGINT) AS c_es
        | FROM documents),
        |pred AS (SELECT tagged_lang,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es THEN 'en'
        |       WHEN c_de >= c_es THEN 'de' ELSE 'es' END AS predicted_lang
        | FROM c),
        |cm AS (SELECT tagged_lang, predicted_lang, count(*) AS n
        | FROM pred GROUP BY 1, 2)
        |SELECT tagged_lang, predicted_lang, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY tagged_lang), 6) AS share_of_true
        |FROM cm ORDER BY tagged_lang, predicted_lang""".stripMargin,
    "ann_knn_classify" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm, label AS true_label
        |  FROM n WHERE vec_id < 25),
        |s AS (SELECT p.probe_id, p.true_label, n.vec_id, n.label,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id),
        |top5 AS (SELECT * FROM s
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 5),
        |votes AS (SELECT probe_id, true_label, label, count(*) AS votes
        |  FROM top5 GROUP BY 1, 2, 3)
        |SELECT probe_id, CAST(true_label AS BIGINT) AS true_label,
        |  CAST(label AS BIGINT) AS pred_label, votes,
        |  label = true_label AS correct
        |FROM votes
        |QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) = 1
        |ORDER BY probe_id""".stripMargin,
    "q_approx_sketches" ->
      """WITH h AS (SELECT event_type,
        |   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h FROM events),
        |r AS (SELECT event_type, h % 256 AS bucket,
        |   least(53 - length(bin(h // 256)), 40) AS rho FROM h),
        |reg AS (SELECT event_type, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
        |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |   sum((1::BIGINT) << CAST(40 - mj AS INT)) AS s_present FROM reg GROUP BY 1),
        |users AS (SELECT event_type,
        |   CASE WHEN n_buckets < 256 AND raw <= 640.0
        |     THEN round(256.0 * ln(256.0 / (256 - n_buckets)), 4) ELSE raw END AS approx_users
        |  FROM (SELECT event_type, n_buckets,
        |     round(0.7183::DOUBLE * 65536 * 1099511627776 /
        |       (s_present + (256 - n_buckets) * 1099511627776), 4) AS raw FROM agg)),
        |hist AS (SELECT event_type, CAST(floor(value * 2) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |cum AS (SELECT event_type, bin, c,
        |   sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum FROM hist),
        |ps AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS p),
        |r2 AS (SELECT cum.event_type, bin, c, cum.cum, ps.p,
        |   CAST(ceil(ps.p * t.n) AS BIGINT) AS rk
        |  FROM cum JOIN t USING (event_type) CROSS JOIN ps),
        |sel AS (SELECT *, row_number() OVER (PARTITION BY event_type, p ORDER BY bin) AS rn
        |  FROM r2 WHERE cum >= rk),
        |est AS (SELECT event_type, p,
        |   round(bin * 0.5::DOUBLE + 0.5::DOUBLE * (rk - (cum - c)) / c, 4) AS est_q
        |  FROM sel WHERE rn = 1),
        |quants AS (SELECT event_type,
        |   max(CASE WHEN p = 0.5 THEN est_q END) AS approx_p50,
        |   max(CASE WHEN p = 0.95 THEN est_q END) AS approx_p95
        |  FROM est GROUP BY 1)
        |SELECT users.event_type AS event_type, approx_users, approx_p50, approx_p95, n
        |FROM users JOIN quants USING (event_type) JOIN t USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_hll_portable" ->
      """WITH h AS (SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h,
        |   l_partkey FROM lineitem),
        |r AS (SELECT h % 256 AS bucket,
        |   least(53 - length(bin(h // 256)), 40) AS rho FROM h),
        |reg AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |   sum((1::BIGINT) << CAST(40 - mj AS INT)) AS s_present FROM reg),
        |ex AS (SELECT count(DISTINCT l_partkey) AS n_exact FROM h),
        |est AS (SELECT CAST(256 AS BIGINT) AS m, n_buckets, n_exact,
        |   round(0.7183::DOUBLE * 65536 * 1099511627776 /
        |     (s_present + (256 - n_buckets) * 1099511627776), 4) AS raw_estimate
        |  FROM agg CROSS JOIN ex),
        |corr AS (SELECT m, n_buckets, n_exact, raw_estimate,
        |   CASE WHEN n_buckets < 256 AND raw_estimate <= 640.0
        |     THEN round(256.0 * ln(256.0 / (256 - n_buckets)), 4)
        |     ELSE raw_estimate END AS estimate
        |  FROM est)
        |SELECT m, n_buckets, n_exact, raw_estimate,
        |  estimate, round(abs(estimate - n_exact) / n_exact, 4) AS rel_err
        |FROM corr""".stripMargin,
    "dedup_semdedup" ->
      """WITH pe AS (SELECT label, i AS pos, embedding[i] AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |c AS (SELECT CAST(label AS BIGINT) AS label, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(CAST(x AS DOUBLE)), 6) AS centroid FROM pe GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(centroid ORDER BY pos) AS cv FROM c GROUP BY 1),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s AS (SELECT e.vec_id, e.v, cent.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e.v, cent.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
        |  FROM e CROSS JOIN cent),
        |a AS (SELECT vec_id, v, cell, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm
        |  FROM s QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |p AS (SELECT y.vec_id AS vec_id, y.cell AS cell, x.vec_id AS dup,
        |   round(list_sum(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2])) / (x.norm * y.norm), 6) AS cosine
        |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |SELECT vec_id, cell, min(dup) AS dup_of, CAST(count(*) AS BIGINT) AS n_dups,
        |  max(cosine) AS max_cosine
        |FROM p WHERE cosine >= 0.35 GROUP BY 1, 2 ORDER BY vec_id""".stripMargin,
    "pipeline_mixture_resample" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        |m AS (SELECT min(n_lang) AS n_min FROM c),
        |h AS (SELECT doc_id, lang,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-mix'), 1, 15))::BIGINT % 1000000 AS h
        |  FROM documents)
        |SELECT doc_id, h.lang AS lang FROM h
        |JOIN c ON h.lang = c.lang CROSS JOIN m
        |WHERE h.h * c.n_lang < 1000000 * m.n_min
        |ORDER BY doc_id""".stripMargin,
    "text_boilerplate_ngrams" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |gl AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS grams FROM t),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM gl),
        |nd AS (SELECT count(*) AS n FROM documents),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS dfc FROM g GROUP BY 1),
        |freq AS (SELECT gram FROM df CROSS JOIN nd WHERE 20 * dfc >= n)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN freq.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |  round(CAST(sum(CASE WHEN freq.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS boilerplate_fraction
        |FROM g LEFT JOIN freq ON g.gram = freq.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lapsed_customers" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "ann_graph_search" ->
      """WITH e AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS MATERIALIZED (SELECT vec_id, label, v,
        |   sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |g0 AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS nbr_id,
        |   round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]))
        |     / (a.norm * b.norm), 6) AS cosine
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |g AS MATERIALIZED (SELECT src, nbr_id FROM (SELECT src, nbr_id,
        |   row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nbr_id) AS rk FROM g0) t
        |  WHERE rk <= 3),
        |p AS MATERIALIZED (SELECT vec_id AS probe_id, label AS plabel, v AS pv, norm AS pnorm
        |  FROM n WHERE vec_id < 25),
        |h0 AS MATERIALIZED (SELECT probe_id, cur, cosine FROM (SELECT p.probe_id,
        |   n.vec_id AS cur,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine,
        |   row_number() OVER (PARTITION BY p.probe_id ORDER BY n.vec_id) AS rk
        |  FROM p JOIN n ON n.label = p.plabel AND n.vec_id <> p.probe_id) t
        |  WHERE rk = 1),
        |h1c AS MATERIALIZED (SELECT h0.probe_id, g.nbr_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM h0 JOIN p ON p.probe_id = h0.probe_id
        |  JOIN g ON g.src = h0.cur JOIN n ON n.vec_id = g.nbr_id
        |  WHERE g.nbr_id <> h0.probe_id),
        |h1 AS MATERIALIZED (SELECT probe_id, nbr_id AS cur, cosine FROM (SELECT *,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rk FROM h1c) t
        |  WHERE rk = 1),
        |h2c AS MATERIALIZED (SELECT h1.probe_id, g.nbr_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM h1 JOIN p ON p.probe_id = h1.probe_id
        |  JOIN g ON g.src = h1.cur JOIN n ON n.vec_id = g.nbr_id
        |  WHERE g.nbr_id <> h1.probe_id),
        |h2 AS MATERIALIZED (SELECT probe_id, nbr_id AS cur, cosine FROM (SELECT *,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rk FROM h2c) t
        |  WHERE rk = 1),
        |h3c AS MATERIALIZED (SELECT h2.probe_id, g.nbr_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM h2 JOIN p ON p.probe_id = h2.probe_id
        |  JOIN g ON g.src = h2.cur JOIN n ON n.vec_id = g.nbr_id
        |  WHERE g.nbr_id <> h2.probe_id),
        |h3 AS MATERIALIZED (SELECT probe_id, nbr_id AS cur, cosine FROM (SELECT *,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rk FROM h3c) t
        |  WHERE rk = 1)
        |SELECT probe_id, CAST(0 AS BIGINT) AS hop, cur AS node_id, cosine FROM h0
        |UNION ALL SELECT probe_id, 1, cur, cosine FROM h1
        |UNION ALL SELECT probe_id, 2, cur, cosine FROM h2
        |UNION ALL SELECT probe_id, 3, cur, cosine FROM h3
        |ORDER BY probe_id, hop""".stripMargin,
    // Beam search mirrors annGraphBeam: NN-Descent refined graph
    // (ndCtes), base-layer entry at the probe's rk=1 refined neighbor,
    // beam-4 frontier for 3 hops, top-5 of the visited set vs
    // brute-force truth over the 25-probe sample.
    "ann_graph_beam" ->
      s"""WITH $ndCtes,
        |n AS MATERIALIZED (SELECT vec_id, v, norm FROM nd_n),
        |g AS MATERIALIZED (SELECT src, nbr_id FROM ndg),
        |p AS MATERIALIZED (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm
        |  FROM n WHERE vec_id < 25),
        |en AS MATERIALIZED (SELECT ndg.src AS probe_id, ndg.nbr_id AS node
        |  FROM ndg JOIN p ON p.probe_id = ndg.src WHERE ndg.rk = 1),
        |f0 AS MATERIALIZED (SELECT en.probe_id, en.node,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM en JOIN p USING (probe_id) JOIN n ON n.vec_id = en.node),
        |bs1 AS MATERIALIZED (SELECT c.probe_id, c.node,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM (SELECT DISTINCT f.probe_id, g.nbr_id AS node FROM f0 f
        |        JOIN g ON g.src = f.node WHERE g.nbr_id <> f.probe_id) c
        |  JOIN p USING (probe_id) JOIN n ON n.vec_id = c.node),
        |bf1 AS MATERIALIZED (SELECT probe_id, node, cosine FROM (SELECT u.*,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, node) AS rk
        |  FROM (SELECT * FROM f0 UNION SELECT * FROM bs1) u) t WHERE rk <= 4),
        |bs2 AS MATERIALIZED (SELECT c.probe_id, c.node,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM (SELECT DISTINCT f.probe_id, g.nbr_id AS node FROM bf1 f
        |        JOIN g ON g.src = f.node WHERE g.nbr_id <> f.probe_id) c
        |  JOIN p USING (probe_id) JOIN n ON n.vec_id = c.node),
        |bf2 AS MATERIALIZED (SELECT probe_id, node, cosine FROM (SELECT u.*,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, node) AS rk
        |  FROM (SELECT * FROM bf1 UNION SELECT * FROM bs2) u) t WHERE rk <= 4),
        |bs3 AS MATERIALIZED (SELECT c.probe_id, c.node,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |     / (p.pnorm * n.norm), 6) AS cosine
        |  FROM (SELECT DISTINCT f.probe_id, g.nbr_id AS node FROM bf2 f
        |        JOIN g ON g.src = f.node WHERE g.nbr_id <> f.probe_id) c
        |  JOIN p USING (probe_id) JOIN n ON n.vec_id = c.node),
        |vis AS MATERIALIZED (SELECT * FROM f0 UNION SELECT * FROM bs1
        |  UNION SELECT * FROM bs2 UNION SELECT * FROM bs3),
        |top AS MATERIALIZED (SELECT probe_id, node, cosine, rk FROM (SELECT probe_id, node, cosine,
        |   CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, node) AS BIGINT) AS rk
        |  FROM vis) t WHERE rk <= 5),
        |tr AS MATERIALIZED (SELECT probe_id, node FROM (SELECT p.probe_id, n.vec_id AS node,
        |   row_number() OVER (PARTITION BY p.probe_id ORDER BY
        |     round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2]))
        |       / (p.pnorm * n.norm), 6) DESC, n.vec_id) AS trk
        |  FROM p JOIN n ON n.vec_id <> p.probe_id) t WHERE trk <= 5)
        |SELECT top.probe_id, top.rk, top.node AS node_id, top.cosine,
        |  (tr.node IS NOT NULL) AS hit
        |FROM top LEFT JOIN tr ON tr.probe_id = top.probe_id AND tr.node = top.node
        |ORDER BY 1, 2""".stripMargin,
    // Mirrors Multimodal.PHash exactly: same pixel formula, same
    // INLINED fixed-point cosine table (no libm drift), same rank-31
    // threshold — the Spark side additionally round-trips the pixels
    // through a real PNG encode/decode, which is lossless, so the
    // hashes agree bit-for-bit.
    "mm_phash_dedup" ->
      s"""WITH fp AS (SELECT doc_id,
        |   ((doc_id // 12) * 2654435761) % 4294967296 AS h,
        |   (doc_id // 12) % 23 AS m, doc_id % 3 AS dd FROM documents),
        |px AS (SELECT d.doc_id, rx.x, ry.y,
        |   least(((rx.x+1)*((d.h % 256)+3) + (ry.y+1)*(((d.h // 256) % 256)+5)
        |     + ((rx.x*ry.y) % (d.m+2))*7) % 256
        |   + CASE WHEN rx.x BETWEEN 12 AND 13 AND ry.y BETWEEN 12 AND 13
        |       THEN d.dd ELSE 0 END, 255) AS p
        |  FROM fp d CROSS JOIN range(32) rx(x) CROSS JOIN range(32) ry(y)),
        |ct(x, u, c) AS (SELECT * FROM (VALUES ${graft.ops.Multimodal.PHash.ctabSqlValues}) t(x, u, c)),
        |co AS (SELECT px.doc_id, cu.u AS u, cv.u AS v, sum(px.p * cu.c * cv.c) AS coeff
        |  FROM px JOIN ct cu ON cu.x = px.x JOIN ct cv ON cv.x = px.y
        |  GROUP BY 1, 2, 3),
        |ac AS (SELECT doc_id, u*8+v AS idx, coeff FROM co WHERE u*8+v BETWEEN 1 AND 60),
        |th AS (SELECT doc_id, coeff AS t FROM (SELECT doc_id, coeff,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY coeff, idx) AS rn FROM ac)
        |  WHERE rn = 31),
        |sims AS (SELECT ac.doc_id, CAST(sum(CASE WHEN ac.coeff > th.t
        |    THEN (CAST(1 AS BIGINT) << (ac.idx-1)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sim
        |  FROM ac JOIN th ON ac.doc_id = th.doc_id GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "graph_bfs_levels" ->
      """WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS u, y.pk AS v FROM items x
        |  JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |l0 AS MATERIALIZED (SELECT min(u) AS node FROM e),
        |l1 AS MATERIALIZED (SELECT DISTINCT e.v AS node FROM e JOIN l0 ON e.u = l0.node
        |  WHERE e.v NOT IN (SELECT node FROM l0)),
        |l2 AS MATERIALIZED (SELECT DISTINCT e.v AS node FROM e JOIN l1 ON e.u = l1.node
        |  WHERE e.v NOT IN (SELECT node FROM l0)
        |    AND e.v NOT IN (SELECT node FROM l1)),
        |l3 AS MATERIALIZED (SELECT DISTINCT e.v AS node FROM e JOIN l2 ON e.u = l2.node
        |  WHERE e.v NOT IN (SELECT node FROM l0)
        |    AND e.v NOT IN (SELECT node FROM l1)
        |    AND e.v NOT IN (SELECT node FROM l2))
        |SELECT node, CAST(0 AS BIGINT) AS level FROM l0
        |UNION ALL SELECT node, 1 FROM l1
        |UNION ALL SELECT node, 2 FROM l2
        |UNION ALL SELECT node, 3 FROM l3
        |ORDER BY node""".stripMargin,
    "text_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |gl AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS grams FROM t),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM gl),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty
        |FROM g JOIN f ON g.gram = f.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |   len(regexp_extract_all(text, '\S+')) AS nw,
        |   len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS nb
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(nw) AS BIGINT) AS n_words, CAST(sum(nb) AS BIGINT) AS n_bpeish,
        | round(CAST(sum(nb) AS DOUBLE) / sum(nw), 6) AS fertility
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_interleave_sources" ->
      """WITH h AS (SELECT source, doc_id,
        |   md5(CAST(doc_id AS VARCHAR) || ':il') AS hkey FROM documents),
        |r AS (SELECT source, doc_id,
        |   row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS pos FROM h),
        |s AS (SELECT source, count(*) AS n FROM documents GROUP BY 1)
        |SELECT r.source AS source, r.doc_id AS doc_id,
        | CAST(pos AS BIGINT) AS pos_in_source,
        | round((pos - 0.5) / n, 9) AS ikey
        |FROM r JOIN s USING (source) ORDER BY ikey, source, doc_id""".stripMargin,
    "etl_cusum_shift" ->
      """WITH daily AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
        |   count(*) AS n FROM events GROUP BY 1),
        |m AS (SELECT avg(CAST(n AS DOUBLE)) AS mu FROM daily),
        |c AS (SELECT day, n, round(sum(n - mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 6) AS cusum
        |  FROM daily CROSS JOIN m),
        |r AS (SELECT day, n, cusum, row_number() OVER (ORDER BY abs(cusum) DESC, day) AS rk FROM c)
        |SELECT day, n, cusum, rk = 1 AS is_peak FROM r ORDER BY day""".stripMargin,
    "text_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
        |st AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |stot AS (SELECT source, sum(c) AS ns FROM st GROUP BY 1),
        |corpus AS (SELECT w, sum(c) AS cc FROM st GROUP BY 1),
        |ctot AS (SELECT sum(cc) AS nc FROM corpus),
        |j AS (SELECT st.source,
        |   CAST(st.c AS DOUBLE) / stot.ns AS p,
        |   CAST(corpus.cc AS DOUBLE) / ctot.nc AS q
        |  FROM st JOIN stot USING (source) JOIN corpus USING (w) CROSS JOIN ctot),
        |agg AS (SELECT source,
        |   sum(p * ln(p / ((p + q) / 2))) AS kl_pm,
        |   sum(q * ln(q / ((p + q) / 2))) AS kl_qm_seen,
        |   sum(q) AS q_seen
        |  FROM j GROUP BY 1)
        |SELECT source, round((kl_pm + kl_qm_seen + (1.0 - q_seen) * ln(2.0)) / 2, 6) AS js
        |FROM agg ORDER BY source""".stripMargin,
    "etl_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |f AS (SELECT ud.user_id, d2.day AS day FROM ud
        |  JOIN days d2 ON d2.day BETWEEN ud.day AND ud.day + 6),
        |roll AS (SELECT day, count(DISTINCT user_id) AS actives_7d FROM f GROUP BY 1)
        |SELECT dau.day AS day, dau.dau AS dau, roll.actives_7d AS actives_7d
        |FROM dau JOIN roll ON dau.day = roll.day
        |ORDER BY day""".stripMargin,
    "etl_lateness_profile" ->
      """WITH s AS (SELECT user_id, event_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events),
        |h AS (SELECT user_id, event_id, sec,
        |   max(sec) OVER (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm FROM s),
        |l AS (SELECT greatest(coalesce(hwm - sec, 0), 0) AS late_s FROM h),
        |b AS (SELECT CASE WHEN late_s = 0 THEN 'a_ontime'
        |   WHEN late_s <= 60 THEN 'b_1min'
        |   WHEN late_s <= 300 THEN 'c_5min'
        |   WHEN late_s <= 3600 THEN 'd_1hr'
        |   ELSE 'e_over_1hr' END AS bucket, late_s FROM l)
        |SELECT bucket, count(*) AS n_events, max(late_s) AS max_late_s
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_matryoshka_rerank" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, v[1:16] AS v16,
        |  sqrt(list_sum(list_transform(v, x -> x*x))) AS norm,
        |  sqrt(list_sum(list_transform(v[1:16], x -> x*x))) AS n16 FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, v16 AS p16, norm AS pnorm, n16 AS pn16
        |  FROM n WHERE vec_id < 25),
        |c AS (SELECT p.probe_id, n.vec_id, n.v, n.norm, p.pv, p.pnorm,
        |   round(list_sum(list_transform(list_zip(p.p16, n.v16), z -> z[1]*z[2])) / (p.pn16 * n.n16), 6) AS cos16
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id),
        |cand AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos16 DESC, vec_id) AS BIGINT) AS coarse_rk
        |  FROM c QUALIFY coarse_rk <= 20),
        |r AS (SELECT probe_id, vec_id, coarse_rk,
        |   round(list_sum(list_transform(list_zip(pv, v), z -> z[1]*z[2])) / (pnorm * norm), 6) AS cosine
        |  FROM cand)
        |SELECT probe_id, vec_id, cosine, coarse_rk,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM r QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "pipeline_epoch_shuffle" ->
      """WITH x AS (SELECT doc_id, e.epoch FROM documents
        |  CROSS JOIN (SELECT CAST(0 AS BIGINT) AS epoch UNION ALL SELECT 1) e),
        |h AS (SELECT epoch, doc_id,
        |  md5(concat('ep', CAST(epoch AS VARCHAR), ':', CAST(doc_id AS VARCHAR))) AS hkey FROM x),
        |s AS (SELECT epoch, doc_id, hkey,
        |  CAST((strpos('0123456789abcdef', substr(hkey, 1, 1)) - 1) % 8 AS BIGINT) AS shard FROM h)
        |SELECT epoch, shard,
        | CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY hkey, doc_id) AS BIGINT) AS pos,
        | doc_id
        |FROM s ORDER BY epoch, shard, pos""".stripMargin,
    "graph_kcore_peel" ->
      """WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS u, y.pk AS v FROM items x
        |  JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |d0 AS MATERIALIZED (SELECT n, count(*) AS d FROM (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |kk AS MATERIALIZED (SELECT CAST(floor(median(d)) AS BIGINT) AS k FROM d0),
        |k1 AS MATERIALIZED (SELECT n FROM d0 CROSS JOIN kk WHERE d >= k),
        |e1 AS MATERIALIZED (SELECT u, v FROM e0 WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)),
        |d1 AS MATERIALIZED (SELECT n, count(*) AS d FROM (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY 1),
        |k2 AS MATERIALIZED (SELECT n FROM d1 CROSS JOIN kk WHERE d >= k),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1 WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)),
        |d2 AS MATERIALIZED (SELECT n, count(*) AS d FROM (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY 1),
        |k3 AS MATERIALIZED (SELECT n FROM d2 CROSS JOIN kk WHERE d >= k),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2 WHERE u IN (SELECT n FROM k3) AND v IN (SELECT n FROM k3)),
        |d3 AS MATERIALIZED (SELECT n, count(*) AS d FROM (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3) GROUP BY 1),
        |k4 AS MATERIALIZED (SELECT n FROM d3 CROSS JOIN kk WHERE d >= k),
        |e4 AS MATERIALIZED (SELECT u, v FROM e3 WHERE u IN (SELECT n FROM k4) AND v IN (SELECT n FROM k4)),
        |s AS (
        | SELECT 0 AS round,
        |  (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)) AS n_nodes,
        |  (SELECT count(*) FROM e0) AS n_edges
        | UNION ALL SELECT 1,
        |  (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)),
        |  (SELECT count(*) FROM e1)
        | UNION ALL SELECT 2,
        |  (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)),
        |  (SELECT count(*) FROM e2)
        | UNION ALL SELECT 3,
        |  (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)),
        |  (SELECT count(*) FROM e3)
        | UNION ALL SELECT 4,
        |  (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e4 UNION ALL SELECT v FROM e4)),
        |  (SELECT count(*) FROM e4))
        |SELECT CAST(round AS BIGINT) AS round, kk.k AS k,
        |  CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges
        |FROM s CROSS JOIN kk ORDER BY round""".stripMargin,
    "graph_jaccard_neighbors" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |edges AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |sym AS (SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT a, count(*) AS d FROM sym GROUP BY 1),
        |common AS (SELECT x.a AS u, y.a AS v, count(*) AS n_common
        |  FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a GROUP BY 1, 2)
        |SELECT u, v, n_common,
        |  round(CAST(n_common AS DOUBLE) / (du.d + dv.d - n_common), 6) AS jaccard
        |FROM common JOIN deg du ON common.u = du.a JOIN deg dv ON common.v = dv.a
        |WHERE round(CAST(n_common AS DOUBLE) / (du.d + dv.d - n_common), 6) >= 0.25
        |ORDER BY u, v""".stripMargin,
    "dedup_lsh_eval" ->
      s"""WITH $bandsCtes,
        |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |sh AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) AS j
        |  FROM common JOIN cnt x ON doc_a = x.doc_id JOIN cnt y ON doc_b = y.doc_id
        |  WHERE round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) >= 0.5),
        |flagged AS (SELECT j.j, CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM jac j LEFT JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b),
        |th AS (SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
        |nc AS (SELECT count(*) AS n_candidates FROM cand)
        |SELECT th.threshold, nc.n_candidates, count(*) AS n_true,
        |  CAST(sum(hit) AS BIGINT) AS n_hit,
        |  round(CAST(sum(hit) AS DOUBLE) / nc.n_candidates, 6) AS precision,
        |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
        |FROM flagged JOIN th ON flagged.j >= th.threshold CROSS JOIN nc
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // Identical report over the deterministic 1/4 hash sample — the
    // sample-at-scale path: every CTE below bands sees 1/4 of the
    // docs because the predicate sits on the scan.
    "dedup_lsh_eval_sampled" ->
      s"""WITH $bandsCtesSampled,
        |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |sh AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) AS j
        |  FROM common JOIN cnt x ON doc_a = x.doc_id JOIN cnt y ON doc_b = y.doc_id
        |  WHERE round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) >= 0.5),
        |flagged AS (SELECT j.j, CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM jac j LEFT JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b),
        |th AS (SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
        |nc AS (SELECT count(*) AS n_candidates FROM cand)
        |SELECT th.threshold, nc.n_candidates, count(*) AS n_true,
        |  CAST(sum(hit) AS BIGINT) AS n_hit,
        |  round(CAST(sum(hit) AS DOUBLE) / nc.n_candidates, 6) AS precision,
        |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
        |FROM flagged JOIN th ON flagged.j >= th.threshold CROSS JOIN nc
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "pipeline_shard_manifest" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 15))::BIGINT % 16 AS shard,
        |   printf('%020d', doc_id) || ':' || md5(text) AS entry
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  md5(string_agg(entry, ',' ORDER BY entry)) AS content_digest
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS bucket, count(*) AS cnt
        |  FROM tok GROUP BY 1, 2, 3),
        |tgt AS (SELECT bucket, sum(cnt) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
        |rw AS (SELECT bucket, sum(cnt) AS cr FROM b GROUP BY 1),
        |tot AS (SELECT
        |    (SELECT sum(cnt) FROM b WHERE lang = 'en') AS nt,
        |    (SELECT sum(cnt) FROM b) AS nr),
        |lr AS (SELECT rw.bucket,
        |    ln(((COALESCE(tgt.ct, 0) + 1.0) / (tot.nt + 64)) / ((rw.cr + 1.0) / (tot.nr + 64))) AS llr
        |  FROM rw LEFT JOIN tgt ON rw.bucket = tgt.bucket CROSS JOIN tot)
        |SELECT b.doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  round(sum(cnt * lr.llr), 6) AS weight
        |FROM b JOIN lr ON b.bucket = lr.bucket
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_dsir_resample" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS bucket, count(*) AS cnt
        |  FROM tok GROUP BY 1, 2, 3),
        |tgt AS (SELECT bucket, sum(cnt) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
        |rw AS (SELECT bucket, sum(cnt) AS cr FROM b GROUP BY 1),
        |tot AS (SELECT
        |    (SELECT sum(cnt) FROM b WHERE lang = 'en') AS nt,
        |    (SELECT sum(cnt) FROM b) AS nr),
        |lr AS (SELECT rw.bucket,
        |    ln(((COALESCE(tgt.ct, 0) + 1.0) / (tot.nt + 64)) / ((rw.cr + 1.0) / (tot.nr + 64))) AS llr
        |  FROM rw LEFT JOIN tgt ON rw.bucket = tgt.bucket CROSS JOIN tot),
        |wt AS (SELECT b.doc_id, round(sum(cnt * lr.llr), 6) AS weight
        |  FROM b JOIN lr ON b.bucket = lr.bucket GROUP BY 1),
        |g AS (SELECT doc_id, weight,
        |   round(8.0::DOUBLE * weight - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-dsir'), 1, 15))::BIGINT % 1000000 + 0.5) / 1000000.0)), 6) AS gkey
        |  FROM wt)
        |SELECT doc_id, weight, gkey FROM g
        |ORDER BY gkey DESC, doc_id LIMIT 100""".stripMargin,
    "embed_pca_power" ->
      """WITH e AS (SELECT vec_id, j AS d, CAST(embedding[j+1] AS DOUBLE) AS x
        |    FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
        |s1 AS (SELECT vec_id, sum(x * 0.125) AS s FROM e GROUP BY 1),
        |u1 AS (SELECT d, round(sum(e.x * s1.s), 6) AS u FROM e JOIN s1 USING (vec_id) GROUP BY 1),
        |n1 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u1),
        |v1 AS (SELECT d, round(u / nrm, 6) AS vd FROM u1 CROSS JOIN n1),
        |s2 AS (SELECT vec_id, sum(e.x * v1.vd) AS s FROM e JOIN v1 USING (d) GROUP BY 1),
        |u2 AS (SELECT d, round(sum(e.x * s2.s), 6) AS u FROM e JOIN s2 USING (vec_id) GROUP BY 1),
        |n2 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u2),
        |v2 AS (SELECT d, round(u / nrm, 6) AS vd FROM u2 CROSS JOIN n2),
        |s3 AS (SELECT vec_id, sum(e.x * v2.vd) AS s FROM e JOIN v2 USING (d) GROUP BY 1),
        |u3 AS (SELECT d, round(sum(e.x * s3.s), 6) AS u FROM e JOIN s3 USING (vec_id) GROUP BY 1),
        |n3 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u3),
        |v3 AS (SELECT d, round(u / nrm, 6) AS vd FROM u3 CROSS JOIN n3)
        |SELECT d AS dim, vd AS component FROM v3 ORDER BY dim""".stripMargin,
    // robust MAD anomaly fence per event type (mirrors
    // EventsEtl.anomalyMad; 4.4478 = 3 * 1.4826 written identically)
    "etl_anomaly_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM ev GROUP BY 1),
        |dev AS (SELECT ev.event_type, abs(value - med.med) AS adev, med.med AS med
        |  FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(max(dev.med), 6) AS median_value,
        |  round(max(mad.mad), 6) AS mad,
        |  CAST(sum(CASE WHEN adev > mad.mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Benford first-significant-digit audit (mirrors
    // EventsEtl.benfordAudit; identical double expression + clamp)
    "etl_benford" ->
      """WITH ev AS (SELECT abs(value) AS av FROM events WHERE abs(value) > 0),
        |dg AS (SELECT least(greatest(CAST(floor(av * power(10, -floor(log10(av)))) AS BIGINT), 1), 9) AS digit FROM ev),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g)
        |SELECT digit, n, round(n / tot, 6) AS obs_frac,
        |  round(log10(1.0 + 1.0 / digit), 6) AS benford_frac,
        |  round(abs(round(n / tot, 6) - round(log10(1.0 + 1.0 / digit), 6)), 6) AS abs_dev
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,
    // scene cuts: consecutive-frame RMS delta over the mm_audio_energy
    // frame chain (mirrors Multimodal.sceneCut)
    "mm_scene_cut" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) // 64 > 0),
        |fr AS (SELECT doc_id, unnest(range(0, len(text) // 64)) AS f, text FROM t),
        |frames AS (SELECT doc_id, f, substr(text, CAST(f*64+1 AS INT), 64) AS fx FROM fr),
        |rms AS (SELECT doc_id, f,
        |   round(sqrt(list_sum(list_transform(range(0, 32),
        |     i -> CAST(ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1)) AS DOUBLE)
        |          * (ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1))))) / 32), 6) AS rms
        |  FROM frames),
        |c AS (SELECT doc_id, f, CASE WHEN abs(rms - lag(rms) OVER
        |    (PARTITION BY doc_id ORDER BY f)) > 2000.0 THEN 1 ELSE 0 END AS cut
        |  FROM rms)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(cut) AS BIGINT) AS n_cuts,
        |  CAST(sum(cut) + 1 AS BIGINT) AS n_shots,
        |  round(count(*) / CAST(sum(cut) + 1 AS DOUBLE), 6) AS mean_shot_len
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // degree assortativity over the symmetrized co-occurrence edges
    // (mirrors Graph.assortativity; corr normalization cancels the
    // sample/population choice)
    "graph_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |deg AS (SELECT u AS nd, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY 1)
        |SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
        |  round(avg(du.d), 6) AS mean_end_deg,
        |  round(corr(du.d, dv.d), 6) AS assortativity
        |FROM e JOIN deg du ON du.nd = e.u JOIN deg dv ON dv.nd = e.v""".stripMargin,
    // power-of-two padding-waste profile; the bucket is integer-derived
    // via the base-2 string (mirrors Pipeline.paddingWaste)
    "pipeline_padding_waste" ->
      """WITH d AS (SELECT n_chars FROM documents WHERE n_chars > 0),
        |b AS (SELECT n_chars, CAST(1 << length(bin(n_chars - 1)) AS BIGINT) AS pad_len FROM d)
        |SELECT pad_len, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(*) * pad_len AS BIGINT) AS padded_chars,
        |  round(1.0 - sum(n_chars) / CAST(count(*) * pad_len AS DOUBLE), 6) AS waste_frac
        |FROM b GROUP BY pad_len ORDER BY pad_len""".stripMargin,
    // cosine range search, radius 0.3, probes vec_id < 8 (mirrors
    // Similarity.annRangeSearch; the ann_bruteforce CTE chain minus
    // the top-k window)
    "ann_range_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm FROM n WHERE vec_id < 8),
        |s AS (SELECT p.probe_id, n.vec_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id)
        |SELECT probe_id, vec_id, cosine,
        |  CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT) AS n_in_range
        |FROM s WHERE cosine >= 0.3 ORDER BY probe_id, vec_id""".stripMargin,
    // hardest-positive vs hardest-negative triplet margin per probe
    // (mirrors Similarity.tripletMargin)
    "embed_triplet_margin" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT vec_id AS probe_id, label AS plabel, v AS pv, norm AS pnorm FROM n WHERE vec_id < 25),
        |s AS (SELECT p.probe_id, p.plabel, n.label,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id),
        |m AS (SELECT probe_id, plabel,
        |   round(min(CASE WHEN label = plabel THEN cosine END), 6) AS hardest_pos,
        |   round(max(CASE WHEN label <> plabel THEN cosine END), 6) AS hardest_neg
        |  FROM s GROUP BY 1, 2)
        |SELECT probe_id, CAST(plabel AS BIGINT) AS label, hardest_pos, hardest_neg,
        |  round(hardest_pos - hardest_neg, 6) AS margin,
        |  (hardest_pos - hardest_neg) > 0 AS satisfied
        |FROM m ORDER BY probe_id""".stripMargin,
    // decile lift over customer spend (mirrors Relational.qDecileLift;
    // exact DECIMAL sums, the share division is the only float)
    "q_decile_lift" ->
      """WITH s AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (SELECT o_custkey, spend,
        |   CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS decile FROM s),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |   sum(spend) AS rev FROM d GROUP BY 1),
        |t AS (SELECT sum(rev) AS tot FROM g)
        |SELECT decile, n_customers, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share,
        |  round(CAST(sum(rev) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(tot AS DOUBLE), 6) AS cum_share,
        |  round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) * 10.0, 6) AS lift
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin,
    // rare-token rate: corpus frequency table reduced from the
    // (doc, token) relation, joined back (mirrors TextAnalysis.oovRate)
    "text_oov_rate" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
        |tok AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |cf AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tok GROUP BY 1)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cf <= 2 THEN tf ELSE 0 END) AS BIGINT) AS n_rare_tokens,
        |  CAST(count(CASE WHEN cf <= 2 THEN 1 END) AS BIGINT) AS n_rare_types,
        |  round(sum(CASE WHEN cf <= 2 THEN tf ELSE 0 END) / CAST(sum(tf) AS DOUBLE), 6) AS rare_rate
        |FROM tok JOIN cf USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact → minhash-LSH → semdedup cascade funnel: the components
    // walk chain + the semdedup cell/cosine chain + an md5 window,
    // marginal attribution in cascade order (mirrors
    // Pipeline.dedupCascade)
    "pipeline_dedup_cascade" ->
      s"""WITH RECURSIVE $componentsCtes,
        |comp AS (SELECT node AS doc_id, min(reach) AS component FROM walk GROUP BY 1),
        |pe AS (SELECT label, i AS pos, embedding[i] AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |c AS (SELECT CAST(label AS BIGINT) AS label, CAST(pos - 1 AS BIGINT) AS pos,
        |   round(avg(CAST(x AS DOUBLE)), 6) AS centroid FROM pe GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(centroid ORDER BY pos) AS cv FROM c GROUP BY 1),
        |e2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s2 AS (SELECT e2.vec_id, e2.v, cent.cell,
        |   round(sqrt(list_sum(list_transform(list_zip(e2.v, cent.cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS dist
        |  FROM e2 CROSS JOIN cent),
        |a AS (SELECT vec_id, v, cell, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm
        |  FROM s2 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |pp AS (SELECT y.vec_id AS vec_id,
        |   round(list_sum(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2])) / (x.norm * y.norm), 6) AS cosine
        |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |sd AS (SELECT DISTINCT vec_id FROM pp WHERE cosine >= 0.35),
        |ex AS (SELECT doc_id, CASE WHEN row_number() OVER
        |    (PARTITION BY md5(text) ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS rm1
        |  FROM documents),
        |f AS (SELECT ex.doc_id, ex.rm1,
        |   CASE WHEN comp.component IS NOT NULL AND comp.component <> ex.doc_id THEN 1 ELSE 0 END AS rm2,
        |   CASE WHEN sd.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rm3
        |  FROM ex LEFT JOIN comp ON comp.doc_id = ex.doc_id
        |  LEFT JOIN sd ON sd.vec_id = ex.doc_id),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(rm1) AS BIGINT) AS r1,
        |  CAST(sum(CASE WHEN rm1 = 0 AND rm2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
        |  CAST(sum(CASE WHEN rm1 = 0 AND rm2 = 0 AND rm3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r3
        |  FROM f)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_id, 'exact' AS stage, n0 AS n_in,
        |    r1 AS n_removed, n0 - r1 AS n_out,
        |    round((n0 - r1) / CAST(n0 AS DOUBLE), 6) AS kept_frac FROM tot
        |  UNION ALL SELECT 2, 'minhash_lsh', n0 - r1, r2, n0 - r1 - r2,
        |    round((n0 - r1 - r2) / CAST(n0 AS DOUBLE), 6) FROM tot
        |  UNION ALL SELECT 3, 'semdedup', n0 - r1 - r2, r3, n0 - r1 - r2 - r3,
        |    round((n0 - r1 - r2 - r3) / CAST(n0 AS DOUBLE), 6) FROM tot)
        |ORDER BY stage_id""".stripMargin,
    // MinHash estimator calibration over the LSH candidates — the sig
    // CTE mirrors graft_minhash_sig, exact side over string shingles
    // (mirrors Dedup.minhashEstError)
    "dedup_minhash_est_error" ->
      s"""WITH $bandsCtes,
        |cpairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
        |   AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |est AS (SELECT doc_a, doc_b,
        |   round(len(list_filter(range(1, 17), i -> sa.sg[i] = sb.sg[i])) / 16.0, 6) AS est_jaccard
        |  FROM cpairs JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b),
        |ex AS (SELECT doc_a, doc_b,
        |   round(len(list_intersect(a.shingles, b.shingles)) /
        |     CAST(len(a.shingles) + len(b.shingles)
        |       - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE), 6) AS exact_jaccard
        |  FROM cpairs JOIN shl a ON a.doc_id = doc_a JOIN shl b ON b.doc_id = doc_b)
        |SELECT doc_a, doc_b, est_jaccard, exact_jaccard,
        |  round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
        |FROM est JOIN ex USING (doc_a, doc_b) ORDER BY doc_a, doc_b""".stripMargin,
    // spherical k-means: unit vectors, renormalized mean directions,
    // argmax cosine (mirrors Similarity.sphericalKmeans)
    "embed_spherical_kmeans" ->
      """WITH ue AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |un AS (SELECT vec_id, label, list_transform(v,
        |   x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) AS u FROM ue),
        |pe AS (SELECT label AS cell, i AS pos, u[i] AS x
        |  FROM un CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |cml AS (SELECT cell, CAST(pos - 1 AS BIGINT) AS pos, round(avg(x), 6) AS m
        |  FROM pe GROUP BY 1, 2),
        |ca AS (SELECT cell, list(m ORDER BY pos) AS cm FROM cml GROUP BY 1),
        |cu AS (SELECT cell, list_transform(cm,
        |   x -> round(x / sqrt(list_sum(list_transform(cm, y -> y*y))), 6)) AS cu FROM ca),
        |sc AS (SELECT un.vec_id, un.label, cu.cell,
        |   round(list_sum(list_transform(list_zip(un.u, cu.cu), z -> z[1]*z[2])), 6) AS cos
        |  FROM un CROSS JOIN cu)
        |SELECT vec_id, cell, cos AS cos_to_cell, cell = label AS matches_label
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) = 1
        |ORDER BY vec_id""".stripMargin,
    // Flesch-style readability with documented stand-ins (mirrors
    // TextAnalysis.readability)
    "text_readability" ->
      """WITH t AS (SELECT doc_id,
        |   len(regexp_extract_all(lower(text), '\S+')) AS n_words,
        |   len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CAST(ceil(n_words / 15.0) AS BIGINT) AS n_sentences,
        |  round(206.835 - 1.015 * (n_words / CAST(ceil(n_words / 15.0) AS DOUBLE))
        |    - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 6) AS flesch
        |FROM t WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // short-to-long curriculum staging against exact interpolated
    // quartiles (mirrors Pipeline.curriculumOrder)
    "pipeline_curriculum_order" ->
      """WITH q AS (SELECT quantile_cont(n_chars, 0.25) AS q1,
        |   quantile_cont(n_chars, 0.5) AS q2, quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents),
        |staged AS (SELECT doc_id, n_chars,
        |   CASE WHEN n_chars <= q1 THEN 0 WHEN n_chars <= q2 THEN 1
        |        WHEN n_chars <= q3 THEN 2 ELSE 3 END AS stage,
        |   md5(CAST(doc_id AS VARCHAR) || '-curr') AS hkey
        |  FROM documents CROSS JOIN q)
        |SELECT doc_id, n_chars, CAST(stage AS BIGINT) AS stage,
        |  CAST(row_number() OVER (PARTITION BY stage ORDER BY hkey, doc_id) AS BIGINT) AS pos
        |FROM staged ORDER BY stage, pos""".stripMargin,
    // frame RMS energy over the synthesized byte payload — list-order
    // accumulation both engines (mirrors Multimodal.audioEnergy)
    "mm_audio_energy" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) // 64 > 0),
        |fr AS (SELECT doc_id, unnest(range(0, len(text) // 64)) AS f, text FROM t),
        |frames AS (SELECT doc_id, f, substr(text, CAST(f*64+1 AS INT), 64) AS fx FROM fr),
        |rms AS (SELECT doc_id, f,
        |   round(sqrt(list_sum(list_transform(range(0, 32),
        |     i -> CAST(ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1)) AS DOUBLE)
        |          * (ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1))))) / 32), 6) AS rms
        |  FROM frames),
        |agg AS (SELECT doc_id, count(*) AS nf2,
        |   sum(CAST(CAST(rms AS DECIMAL(24,6)) * 1000000 AS BIGINT)) AS s6,
        |   round(max(rms), 6) AS max_rms,
        |   sum(CASE WHEN rms < 25500 THEN 1 ELSE 0 END) AS lo
        |  FROM rms GROUP BY doc_id)
        |SELECT doc_id, CAST(nf2 AS BIGINT) AS n_frames,
        |  CAST((2*s6 + nf2) // (2*nf2) AS DOUBLE) / 1000000.0 AS mean_rms,
        |  max_rms,
        |  CAST((2*lo*1000000 + nf2) // (2*nf2) AS DOUBLE) / 1000000.0 AS low_energy_frac
        |FROM agg ORDER BY doc_id""".stripMargin,
    // Newman modularity of the LPA communities: the graph_lpa CTE
    // chain + integer intra-edge/degree-mass aggs (mirrors
    // Graph.modularity)
    "graph_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |l0 AS (SELECT DISTINCT u AS nd, u AS lbl FROM e),
        |c1 AS (SELECT e.u, l.lbl, count(*) AS cnt
        |  FROM e JOIN l0 l ON l.nd = e.v GROUP BY 1, 2),
        |l1 AS (SELECT u AS nd, lbl FROM c1
        |  QUALIFY row_number() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) = 1),
        |c2 AS (SELECT e.u, l.lbl, count(*) AS cnt
        |  FROM e JOIN l1 l ON l.nd = e.v GROUP BY 1, 2),
        |l2 AS (SELECT u AS nd, lbl FROM c2
        |  QUALIFY row_number() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) = 1),
        |m AS (SELECT count(*) AS m FROM p),
        |din AS (SELECT a.lbl, count(*) AS e_in
        |  FROM p JOIN l2 a ON a.nd = p.u JOIN l2 b ON b.nd = p.v
        |  WHERE a.lbl = b.lbl GROUP BY 1),
        |deg AS (SELECT u AS nd, count(*) AS d FROM e GROUP BY 1),
        |dc AS (SELECT l2.lbl, count(*) AS n_nodes, sum(deg.d) AS d_tot
        |  FROM l2 JOIN deg USING (nd) GROUP BY 1),
        |base AS (SELECT dc.lbl AS community, CAST(dc.n_nodes AS BIGINT) AS n_nodes,
        |   CAST(coalesce(din.e_in, 0) AS BIGINT) AS e_in,
        |   CAST(dc.d_tot AS BIGINT) AS d_tot,
        |   (CAST(4 AS HUGEINT) * m.m * coalesce(din.e_in, 0)
        |    - CAST(dc.d_tot AS HUGEINT) * dc.d_tot) * 1000000 AS n6,
        |   CAST(4 AS HUGEINT) * m.m * m.m AS dd
        |  FROM dc LEFT JOIN din USING (lbl) CROSS JOIN m)
        |SELECT community, n_nodes, e_in, d_tot,
        |  CAST(CASE WHEN n6 >= 0 THEN (2*n6 + dd) // (2*dd)
        |       ELSE -((-2*n6 + dd) // (2*dd)) END AS DOUBLE) / 1000000.0 AS q_contrib
        |FROM base ORDER BY community""".stripMargin,
    // HITS: 2 unrolled mutual-reinforcement rounds, max-normalized
    // (max of rounded values is order-independent) — mirrors Graph.hits
    "graph_hits" ->
      """WITH e AS (SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |h0 AS (SELECT DISTINCT cust, 1.0 AS h FROM e),
        |a1r AS (SELECT part, round(sum(h), 9) AS raw FROM e JOIN h0 USING (cust) GROUP BY 1),
        |a1 AS (SELECT part, round(raw / (SELECT max(raw) FROM a1r), 9) AS a FROM a1r),
        |h1r AS (SELECT cust, round(sum(a), 9) AS raw FROM e JOIN a1 USING (part) GROUP BY 1),
        |h1 AS (SELECT cust, round(raw / (SELECT max(raw) FROM h1r), 9) AS h FROM h1r),
        |a2r AS (SELECT part, round(sum(h), 9) AS raw FROM e JOIN h1 USING (cust) GROUP BY 1),
        |a2 AS (SELECT part, round(raw / (SELECT max(raw) FROM a2r), 9) AS a FROM a2r),
        |h2r AS (SELECT cust, round(sum(a), 9) AS raw FROM e JOIN a2 USING (part) GROUP BY 1),
        |h2 AS (SELECT cust, round(raw / (SELECT max(raw) FROM h2r), 9) AS h FROM h2r)
        |SELECT 'hub' AS role, cust AS node, round(h, 6) AS score FROM h2
        |UNION ALL
        |SELECT 'authority' AS role, part AS node, round(a, 6) AS score FROM a2
        |ORDER BY role, node""".stripMargin,
    // interpolated Kneser-Ney bigram score, discount 0.75 — every
    // input to the ln is an exact integer ratio (mirrors knScore)
    "text_lm_kn" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |  FROM t WHERE len(toks) >= 2),
        |bs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |bc AS (SELECT w1, w2, count(*) AS bc FROM bs GROUP BY 1, 2),
        |fwd AS (SELECT w1, sum(bc) AS c1, count(*) AS n1fw FROM bc GROUP BY 1),
        |bwd AS (SELECT w2, count(*) AS n1bw FROM bc GROUP BY 1),
        |bt AS (SELECT count(*) AS b FROM bc)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln((bc - 0.75) / c1 + 0.75 * n1fw / c1 * n1bw / b)), 6) AS kn_score
        |FROM bs JOIN bc USING (w1, w2) JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN bt
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // segment-level first-occurrence dedup (10-token segments) —
    // mirrors Dedup.segmentDedup
    "dedup_segments" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |js AS (SELECT doc_id, toks,
        |   unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS j FROM t),
        |segs AS (SELECT doc_id, j AS seg_idx,
        |   array_to_string(toks[j*10+1 : j*10+10], ' ') AS seg FROM js),
        |mk AS (SELECT doc_id, seg_idx, seg,
        |   row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
        |  FROM segs)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS kept_frac,
        |  CAST(sum(CASE WHEN keep THEN len(seg) ELSE 0 END) AS BIGINT) AS n_chars_kept
        |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // residual IVF-PQ: trained-index CTEs + residual codebook +
    // per-routed-cell ADC tables — mirrors Similarity.annIvfPqResidual
    "ann_ivf_pq_residual" ->
      s"""WITH $ivfCtes,
        |resd AS (SELECT asg.vec_id,
        |   list_transform(list_zip(asg.v, cent.cv), z -> round(z[1] - z[2], 6)) AS r
        |  FROM asg JOIN cent USING (cell)),
        |rsub AS (SELECT vec_id, (i-1)//8 AS s, (i-1)%8 AS j, r[i] AS x
        |  FROM resd CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS code FROM embeddings),
        |cb AS (SELECT code, s, j, round(avg(x), 6) AS c
        |  FROM rsub JOIN lab USING (vec_id) GROUP BY 1, 2, 3),
        |cbarr AS (SELECT code, s, list(c ORDER BY j) AS cw FROM cb GROUP BY 1, 2),
        |vsub AS (SELECT vec_id, s, list(x ORDER BY j) AS sv FROM rsub GROUP BY 1, 2),
        |encd AS (SELECT vec_id, s, code,
        |   round(list_sum(list_transform(list_zip(sv, cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS d
        |  FROM vsub JOIN cbarr USING (s)),
        |enc AS (SELECT vec_id, s, code FROM encd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) = 1),
        |probes AS (SELECT vec_id AS probe_id, v AS pv FROM asg WHERE vec_id < 5),
        |routedd AS (SELECT probe_id, cell, pv,
        |   round(sqrt(list_sum(list_transform(list_zip(pv, cv), z -> (z[1]-z[2])*(z[1]-z[2])))), 6) AS cdist
        |  FROM probes CROSS JOIN cent),
        |routed AS (SELECT probe_id, cell, pv FROM routedd
        |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cdist, cell) <= 2),
        |presd AS (SELECT probe_id, cell,
        |   list_transform(list_zip(pv, cv), z -> round(z[1] - z[2], 6)) AS pr
        |  FROM routed JOIN cent USING (cell)),
        |psubx AS (SELECT probe_id, cell, (i-1)//8 AS s, (i-1)%8 AS j, pr[i] AS x
        |  FROM presd CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |psub AS (SELECT probe_id, cell, s, list(x ORDER BY j) AS psv
        |  FROM psubx GROUP BY 1, 2, 3),
        |dtab AS (SELECT probe_id, cell, s, code,
        |   round(list_sum(list_transform(list_zip(psv, cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS dsq
        |  FROM psub JOIN cbarr USING (s)),
        |cand AS (SELECT probe_id, asg.vec_id, cell
        |  FROM routed JOIN asg USING (cell) WHERE asg.vec_id <> routed.probe_id),
        |adc AS (SELECT cand.probe_id, cand.vec_id, round(sqrt(sum(dsq)), 6) AS adist
        |  FROM cand JOIN enc ON enc.vec_id = cand.vec_id
        |  JOIN dtab ON dtab.probe_id = cand.probe_id AND dtab.cell = cand.cell
        |   AND dtab.s = enc.s AND dtab.code = enc.code
        |  GROUP BY 1, 2)
        |SELECT probe_id, vec_id, adist,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS BIGINT) AS rk
        |FROM adc QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    // day-of-week × hour-of-day seasonal profile; dow/hour via pure
    // integer epoch arithmetic (mirrors EventsEtl.seasonalProfile)
    "etl_seasonal_profile" ->
      """WITH c AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, value FROM events),
        |g AS (SELECT (sec // 86400 + 4) % 7 AS dow, (sec // 3600) % 24 AS hour,
        |   CAST(count(*) AS BIGINT) AS n_events, round(avg(value), 6) AS mean_value
        |  FROM c GROUP BY 1, 2),
        |t AS (SELECT sum(n_events) AS total FROM g)
        |SELECT dow, hour, n_events, mean_value,
        |  round(n_events / CAST(total AS DOUBLE), 6) AS share,
        |  row_number() OVER (ORDER BY n_events DESC, dow, hour) = 1 AS is_peak
        |FROM g CROSS JOIN t ORDER BY dow, hour""".stripMargin,
    // EWMA (alpha 0.25) over daily counts, closed-form with a 60-day
    // lookback (mirrors EventsEtl.ewmaDaily)
    "etl_ewma_daily" ->
      """WITH daily AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |ix AS (SELECT day, n, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |e AS (SELECT b.day,
        |   round(sum(CASE WHEN a.i = 1 THEN power(0.75, b.i - a.i)
        |     ELSE 0.25 * power(0.75, b.i - a.i) END * a.n), 6) AS ewma
        |  FROM ix b JOIN ix a ON a.i <= b.i AND a.i > b.i - 60 GROUP BY 1)
        |SELECT ix.day, ix.n, e.ewma,
        |  round(ix.n / lag(e.ewma) OVER (ORDER BY ix.day), 6) AS vs_smoothed
        |FROM ix JOIN e ON e.day = ix.day ORDER BY ix.day""".stripMargin,
    // 2-d skyline: per-price max size + running-max over cheaper
    // prices (mirrors Relational.qSkylinePareto)
    "q_skyline_pareto" ->
      """WITH p AS (SELECT p_partkey, p_retailprice, p_size FROM part),
        |pp AS (SELECT p_retailprice, max(p_size) AS msize FROM p GROUP BY 1),
        |sk AS (SELECT p_retailprice, msize,
        |   max(msize) OVER (ORDER BY p_retailprice
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM pp)
        |SELECT p.p_partkey, round(p.p_retailprice, 2) AS price, CAST(p.p_size AS BIGINT) AS size
        |FROM p JOIN sk USING (p_retailprice)
        |WHERE p.p_size = sk.msize AND (sk.prev_max IS NULL OR sk.msize > sk.prev_max)
        |ORDER BY p.p_partkey""".stripMargin,
    // Gini over per-customer spend in exact integer cents; rank-sum
    // formula (mirrors Relational.qGiniSpend)
    "q_gini_spend" ->
      """WITH s AS (SELECT o_custkey,
        |   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents, CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rk FROM s),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(cents) AS tot, sum(rk * cents) AS rx FROM r)
        |SELECT n AS n_customers, round(CAST(tot AS DOUBLE) / 100.0, 2) AS total_spend,
        | round(CAST(2*rx - (n+1)*tot AS DOUBLE) /
        |   (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini
        |FROM a""".stripMargin,
    // per-user lag window → (from, to) transition counts + row-
    // normalized probabilities (mirrors Relational.qMarkovTransitions)
    "q_markov_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |m AS (SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM o WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  round(n_transitions / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // Welch t-test from exact decimal moment sums; identical double
    // expression chain both engines (mirrors Relational.qWelchTtest)
    "q_welch_ttest" ->
      """WITH x AS (SELECT user_id % 2 AS arm, CAST(value AS DECIMAL(18,2)) AS x
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS sx,
        |   CAST(sum(x*x) AS DOUBLE) AS sxx FROM x GROUP BY 1),
        |m AS (SELECT arm, n, sx/n AS mean, (sxx - sx*sx/n)/(n-1) AS v FROM g),
        |a AS (SELECT n AS n_a, mean AS m_a, v AS v_a FROM m WHERE arm = 0),
        |b AS (SELECT n AS n_b, mean AS m_b, v AS v_b FROM m WHERE arm = 1),
        |j AS (SELECT *, v_a/n_a + v_b/n_b AS se2 FROM a CROSS JOIN b)
        |SELECT CAST(n_a AS BIGINT) AS n_a, round(m_a, 6) AS mean_a, round(v_a, 6) AS var_a,
        |  CAST(n_b AS BIGINT) AS n_b, round(m_b, 6) AS mean_b, round(v_b, 6) AS var_b,
        |  round((m_a - m_b) / sqrt(se2), 6) AS t_stat,
        |  round(se2*se2 / (v_a*v_a/(n_a*n_a*(n_a-1)) + v_b*v_b/(n_b*n_b*(n_b-1))), 6) AS welch_df
        |FROM j""".stripMargin,
    // temperature-scaled (alpha 0.3) language sampling shares
    // (mirrors Pipeline.temperatureMix)
    "pipeline_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |   power(CAST(count(*) AS DOUBLE), 0.3) AS wt FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n_tot, sum(wt) AS w_tot FROM c)
        |SELECT lang, n_docs, round(n_docs / n_tot, 6) AS raw_share,
        |  round(wt / w_tot, 6) AS temp_share,
        |  round((wt / w_tot) / (n_docs / n_tot), 6) AS sample_factor
        |FROM c CROSS JOIN t ORDER BY lang""".stripMargin,
    // anisotropy via the sum-vector identity: mean pairwise cosine =
    // (|Σu|² − Σ|u|²)/(n(n−1)) — no pairwise join (mirrors
    // Similarity.anisotropy)
    "embed_anisotropy" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n0 AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |u AS (SELECT vec_id, label, list_transform(v, x -> round(x / norm, 6)) AS u FROM n0),
        |c AS (SELECT label, CAST(i - 1 AS BIGINT) AS pos, u[i] AS x
        |  FROM u CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |s AS (SELECT label, pos, sum(x) AS sx FROM c GROUP BY 1, 2),
        |m AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
        |   sum(list_sum(list_transform(u, x -> x*x))) AS ssq FROM u GROUP BY 1),
        |pl AS (SELECT label, sum(sx*sx) AS s2 FROM s GROUP BY 1),
        |lab AS (SELECT pl.label, m.n,
        |   round((pl.s2 - m.ssq) / CAST(m.n * (m.n - 1) AS DOUBLE), 6) AS mean_pairwise_cos
        |  FROM pl JOIN m USING (label)),
        |g AS (SELECT pos, sum(sx) AS gx FROM s GROUP BY 1),
        |ga AS (SELECT sum(gx*gx) AS s2 FROM g),
        |gm AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(ssq) AS ssq FROM m),
        |allr AS (SELECT CAST(-1 AS BIGINT) AS label, gm.n,
        |   round((ga.s2 - gm.ssq) / CAST(gm.n * (gm.n - 1) AS DOUBLE), 6) AS mean_pairwise_cos
        |  FROM ga CROSS JOIN gm)
        |SELECT * FROM lab UNION ALL SELECT * FROM allr ORDER BY label""".stripMargin,
    // per-subspace PQ code-histogram entropy over the ann_pq_adc
    // encode chain (mirrors Similarity.pqCodeEntropy)
    "embed_pq_code_entropy" ->
      """WITH pe AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   CAST(i - 1 AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
        |sub AS (SELECT vec_id, label, pos // 8 AS s, pos % 8 AS j, x FROM pe),
        |cb AS (SELECT label AS code, s, j, round(avg(x), 6) AS c FROM sub GROUP BY 1, 2, 3),
        |cbarr AS (SELECT code, s, list(c ORDER BY j) AS cw FROM cb GROUP BY 1, 2),
        |vsub AS (SELECT vec_id, s, list(x ORDER BY j) AS sv FROM sub GROUP BY 1, 2),
        |encd AS (SELECT vec_id, s, code,
        |   round(list_sum(list_transform(list_zip(sv, cw), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) AS d
        |  FROM vsub JOIN cbarr USING (s)),
        |enc AS (SELECT vec_id, s, code FROM encd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) = 1),
        |hist AS (SELECT s, code, CAST(count(*) AS BIGINT) AS c FROM enc GROUP BY 1, 2),
        |tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1),
        |cbn AS (SELECT s, CAST(count(*) AS BIGINT) AS n_cb FROM cbarr GROUP BY 1),
        |ent AS (SELECT hist.s, CAST(count(*) AS BIGINT) AS n_codes_used,
        |   round(-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)) / ln(2)), 6) AS entropy_bits
        |  FROM hist JOIN tot ON tot.s = hist.s GROUP BY 1)
        |SELECT ent.s, n_codes_used, entropy_bits,
        |  round(entropy_bits / (ln(CAST(n_cb AS DOUBLE)) / ln(2)), 6) AS utilization
        |FROM ent JOIN cbn ON cbn.s = ent.s ORDER BY ent.s""".stripMargin,
    // power-of-two degree histogram over the co-occurrence graph
    // (mirrors Graph.degreeDist)
    "graph_degree_dist" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u FROM p UNION ALL SELECT v FROM p),
        |deg AS (SELECT u AS nd, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |b AS (SELECT CAST(1 << length(bin(deg - 1)) AS BIGINT) AS bucket, deg FROM deg),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_nodes,
        |   CAST(sum(deg) AS BIGINT) AS deg_sum FROM b GROUP BY 1),
        |t AS (SELECT sum(n_nodes) AS tn, sum(deg_sum) AS td FROM g)
        |SELECT bucket, n_nodes, round(n_nodes / CAST(tn AS DOUBLE), 6) AS node_share,
        |  round(deg_sum / CAST(td AS DOUBLE), 6) AS edge_end_share
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
    // deterministic hash-argmin random walks over the sparsified
    // graph, 3 hops (mirrors Graph.walkCorpus)
    "graph_walk_corpus" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |adj AS (SELECT u AS cur, v FROM p UNION ALL SELECT v AS cur, u AS v FROM p),
        |s0 AS (SELECT DISTINCT cur AS walk_id, CAST(0 AS BIGINT) AS step, cur AS node FROM adj),
        |h1 AS (SELECT s0.walk_id, adj.v,
        |   ('0x' || substr(md5(CAST(s0.walk_id AS VARCHAR) || '-1-' || CAST(adj.v AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM s0 JOIN adj ON adj.cur = s0.node),
        |s1 AS (SELECT walk_id, CAST(1 AS BIGINT) AS step, v AS node FROM (
        |   SELECT walk_id, v, row_number() OVER (PARTITION BY walk_id ORDER BY h, v) AS rk FROM h1)
        |  WHERE rk = 1),
        |h2 AS (SELECT s1.walk_id, adj.v,
        |   ('0x' || substr(md5(CAST(s1.walk_id AS VARCHAR) || '-2-' || CAST(adj.v AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM s1 JOIN adj ON adj.cur = s1.node),
        |s2 AS (SELECT walk_id, CAST(2 AS BIGINT) AS step, v AS node FROM (
        |   SELECT walk_id, v, row_number() OVER (PARTITION BY walk_id ORDER BY h, v) AS rk FROM h2)
        |  WHERE rk = 1),
        |h3 AS (SELECT s2.walk_id, adj.v,
        |   ('0x' || substr(md5(CAST(s2.walk_id AS VARCHAR) || '-3-' || CAST(adj.v AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM s2 JOIN adj ON adj.cur = s2.node),
        |s3 AS (SELECT walk_id, CAST(3 AS BIGINT) AS step, v AS node FROM (
        |   SELECT walk_id, v, row_number() OVER (PARTITION BY walk_id ORDER BY h, v) AS rk FROM h3)
        |  WHERE rk = 1)
        |SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |UNION ALL SELECT * FROM s3 ORDER BY walk_id, step""".stripMargin,
    // Yule's K from the token frequency spectrum: 10^4 (Σtf² − N)/N²
    // (mirrors TextAnalysis.yuleK)
    "text_yule_k" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents),
        |tok AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_types,
        |   CAST(sum(tf*tf) AS BIGINT) AS s2 FROM tok GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  round(10000.0 * (s2 - n_tokens) / CAST(n_tokens * n_tokens AS DOUBLE), 6) AS yule_k
        |FROM a ORDER BY doc_id""".stripMargin,
    // association rules (support/confidence/lift) over co-bought part
    // pairs, min 3 shared orders (mirrors Graph.basketLift)
    "q_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
        |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY 1),
        |pc AS (SELECT x.pk AS u, y.pk AS v, CAST(count(*) AS BIGINT) AS n_both
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2
        |  HAVING count(*) >= 3),
        |d AS (SELECT u AS ante, v AS cons, n_both FROM pc
        |  UNION ALL SELECT v AS ante, u AS cons, n_both FROM pc)
        |SELECT ante, cons, n_both,
        |  round(n_both / CAST(n_orders AS DOUBLE), 6) AS support,
        |  round(n_both / CAST(a.n_item AS DOUBLE), 6) AS confidence,
        |  round(CAST(n_orders AS DOUBLE) * n_both / CAST(a.n_item * c.n_item AS DOUBLE), 6) AS lift
        |FROM d JOIN ic a ON a.pk = d.ante JOIN ic c ON c.pk = d.cons CROSS JOIN no
        |ORDER BY ante, cons""".stripMargin,
    // pooled per-user inter-arrival gap stats (mirrors
    // EventsEtl.interArrival)
    "etl_inter_arrival" ->
      """WITH o AS (SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |   lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (SELECT sec - prev AS gap FROM o WHERE prev IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps, round(avg(gap), 6) AS mean_gap_s,
        |  round(quantile_cont(gap, 0.5), 6) AS p50_gap_s,
        |  round(quantile_cont(gap, 0.95), 6) AS p95_gap_s,
        |  CAST(max(gap) AS BIGINT) AS max_gap_s
        |FROM g""".stripMargin,
    // daily new vs returning user split (mirrors
    // Relational.qNewVsReturning)
    "q_new_vs_returning" ->
      """WITH u AS (SELECT DISTINCT user_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM u GROUP BY 1),
        |g AS (SELECT day, CAST(count(*) AS BIGINT) AS dau,
        |   CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        |  FROM u JOIN f USING (user_id) GROUP BY 1)
        |SELECT day, dau, new_users, dau - new_users AS returning_users,
        |  round(new_users / CAST(dau AS DOUBLE), 6) AS new_frac
        |FROM g ORDER BY day""".stripMargin,
    // per-brand Pearson correlation of discount vs quantity (mirrors
    // Relational.qDiscountQuantityCorr)
    "q_discount_qty_corr" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(corr(l_discount, l_quantity), 6) AS corr_disc_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Jaccard-threshold sweep over the exact 3-gram pair relation at
    // the loosest threshold (mirrors Dedup.thresholdSweep; the pair
    // CTE is the dedup_ngram_jaccard chain at 0.5)
    "dedup_threshold_sweep" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END)) AS s FROM t),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b,
        |   round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) AS jaccard
        |  FROM common JOIN cnt x ON doc_a = x.doc_id JOIN cnt y ON doc_b = y.doc_id
        |  WHERE round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) >= 0.5),
        |th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[]) AS threshold),
        |sw AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
        |   CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
        |  FROM pairs JOIN th ON jaccard >= threshold GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT threshold, n_pairs, n_docs_dropped,
        |  round(1.0 - n_docs_dropped / CAST(n_docs AS DOUBLE), 6) AS keep_frac
        |FROM sw CROSS JOIN nd ORDER BY threshold""".stripMargin,
    // label-filtered exact cosine top-k (mirrors
    // Similarity.annFilteredTopk; the ann_bruteforce chain plus the
    // label predicate fused into the probe join)
    "ann_filtered_topk" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |p AS (SELECT vec_id AS probe_id, label AS plabel, v AS pv, norm AS pnorm FROM n WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, p.plabel AS label, n.vec_id,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) / (p.pnorm * n.norm), 6) AS cosine
        |  FROM p CROSS JOIN n WHERE n.vec_id <> p.probe_id AND n.label = p.plabel)
        |SELECT probe_id, label, vec_id, cosine,
        | CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        |FROM s QUALIFY rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    // all-but-the-top: centered power iteration (embed_pca_power's
    // round structure on centered data), top-PC removal, anisotropy
    // identity on raw vs corrected (mirrors Similarity.abtt)
    "embed_abtt" ->
      """WITH e AS (SELECT vec_id, j AS d, CAST(embedding[j+1] AS DOUBLE) AS x
        |    FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
        |mu AS (SELECT d, round(avg(x), 6) AS m FROM e GROUP BY 1),
        |c AS (SELECT vec_id, e.d, round(x - m, 6) AS x FROM e JOIN mu ON mu.d = e.d),
        |s1 AS (SELECT vec_id, sum(x * 0.125) AS s FROM c GROUP BY 1),
        |u1 AS (SELECT d, round(sum(c.x * s1.s), 6) AS u FROM c JOIN s1 USING (vec_id) GROUP BY 1),
        |n1 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u1),
        |v1 AS (SELECT d, round(u / nrm, 6) AS vd FROM u1 CROSS JOIN n1),
        |s2 AS (SELECT vec_id, sum(c.x * v1.vd) AS s FROM c JOIN v1 USING (d) GROUP BY 1),
        |u2 AS (SELECT d, round(sum(c.x * s2.s), 6) AS u FROM c JOIN s2 USING (vec_id) GROUP BY 1),
        |n2 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u2),
        |v2 AS (SELECT d, round(u / nrm, 6) AS vd FROM u2 CROSS JOIN n2),
        |s3 AS (SELECT vec_id, sum(c.x * v2.vd) AS s FROM c JOIN v2 USING (d) GROUP BY 1),
        |u3 AS (SELECT d, round(sum(c.x * s3.s), 6) AS u FROM c JOIN s3 USING (vec_id) GROUP BY 1),
        |n3 AS (SELECT sqrt(sum(u*u)) AS nrm FROM u3),
        |v3 AS (SELECT d, round(u / nrm, 6) AS vd FROM u3 CROSS JOIN n3),
        |pr AS (SELECT vec_id, sum(c.x * v3.vd) AS s FROM c JOIN v3 USING (d) GROUP BY 1),
        |w AS (SELECT c.vec_id, c.d, round(c.x - pr.s * v3.vd, 6) AS x
        |  FROM c JOIN v3 USING (d) JOIN pr ON pr.vec_id = c.vec_id),
        |rnorm AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM e GROUP BY 1),
        |ru AS (SELECT e.vec_id, d, round(x / nrm, 6) AS ux FROM e JOIN rnorm USING (vec_id)),
        |rs AS (SELECT d, sum(ux) AS sx FROM ru GROUP BY 1),
        |rs2 AS (SELECT sum(sx*sx) AS s2 FROM rs),
        |rm AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n, sum(ux*ux) AS ssq FROM ru),
        |rrow AS (SELECT 'a_raw' AS variant, n,
        |   round((s2 - ssq) / CAST(n * (n-1) AS DOUBLE), 6) AS mean_pairwise_cos
        |  FROM rs2 CROSS JOIN rm),
        |wnorm AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM w GROUP BY 1),
        |wu AS (SELECT w.vec_id, d, round(x / nrm, 6) AS ux FROM w JOIN wnorm USING (vec_id)),
        |ws AS (SELECT d, sum(ux) AS sx FROM wu GROUP BY 1),
        |ws2 AS (SELECT sum(sx*sx) AS s2 FROM ws),
        |wm AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n, sum(ux*ux) AS ssq FROM wu),
        |wrow AS (SELECT 'b_abtt' AS variant, n,
        |   round((s2 - ssq) / CAST(n * (n-1) AS DOUBLE), 6) AS mean_pairwise_cos
        |  FROM ws2 CROSS JOIN wm)
        |SELECT * FROM rrow UNION ALL SELECT * FROM wrow ORDER BY variant""".stripMargin,
    // RFM quintile grid (mirrors Relational.qRfmSegments)
    "q_rfm_segments" ->
      """WITH rfm AS (SELECT o_custkey,
        |   max(CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) // 86400) AS last_day,
        |   count(*) AS freq,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |s AS (SELECT
        |   CAST(ntile(5) OVER (ORDER BY last_day, o_custkey) AS BIGINT) AS r_bucket,
        |   CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f_bucket,
        |   CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_bucket,
        |   monetary FROM rfm)
        |SELECT r_bucket, f_bucket, m_bucket,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST((2 * CAST(sum(monetary) * 100 AS BIGINT) * 10000 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 1000000.0 AS mean_monetary
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // ABC/Pareto revenue classes (mirrors Relational.qAbcClass; the
    // class cut is the exact decimal comparison cum*10 <= total*k)
    "q_abc_class" ->
      """WITH rev AS (SELECT l_partkey,
        |   sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_partkey, rev,
        |   sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(rev) OVER () AS total FROM rev),
        |cls AS (SELECT CASE WHEN cum * 10 <= total * 7 THEN 'A'
        |    WHEN cum * 10 <= total * 9 THEN 'B' ELSE 'C' END AS abc_class,
        |   rev, total FROM c)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(rev) AS DOUBLE), 2) AS class_rev,
        |  CAST((2 * CAST(sum(rev) * 1000000 AS HUGEINT) * 1000000
        |    + CAST(any_value(total) * 1000000 AS HUGEINT))
        |    // (2 * CAST(any_value(total) * 1000000 AS HUGEINT)) AS DOUBLE)
        |    / 1000000.0 AS rev_share
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mann-Whitney U with tie-corrected normal approximation (mirrors
    // Relational.qMannWhitney; avg-rank via avg(row_number) per value)
    "q_mann_whitney" ->
      """WITH pooled AS (SELECT
        |   CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS arm,
        |   o_totalprice AS x, o_orderkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |rn AS (SELECT arm, x,
        |   row_number() OVER (ORDER BY x, o_orderkey) AS rn FROM pooled),
        |rk AS (SELECT arm, x, avg(rn) OVER (PARTITION BY x) AS ar FROM rn),
        |arms AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n, sum(ar) AS r
        |  FROM rk GROUP BY 1),
        |ties AS (SELECT CAST(sum(t*t*t - t) AS DOUBLE) AS tie_term FROM
        |  (SELECT count(*) AS t FROM pooled GROUP BY x)),
        |a AS (SELECT n AS n_a, r AS r_a FROM arms WHERE arm = 0),
        |b AS (SELECT n AS n_b FROM arms WHERE arm = 1),
        |z AS (SELECT n_a, n_b, r_a, n_a + n_b AS nn,
        |   r_a - n_a * (n_a + 1) / 2 AS u_a, tie_term
        |  FROM a CROSS JOIN b CROSS JOIN ties)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  round(r_a, 2) AS rank_sum_a, round(u_a, 2) AS u_stat,
        |  round((u_a - n_a * n_b / 2) / sqrt(n_a * n_b / 12 *
        |    ((nn + 1) - tie_term / (nn * (nn - 1)))), 6) AS z_score
        |FROM z""".stripMargin,
    // per-node local clustering coefficient over the sparse graph
    // (mirrors Graph.clusteringCoeff)
    "graph_clustering_coeff" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |edges AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |tri AS (SELECT part, count(*) AS n_triangles FROM (
        |  SELECT unnest([e1.u, e1.v, e2.v]) AS part
        |  FROM edges e1 JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) GROUP BY 1),
        |deg AS (SELECT part, count(*) AS degree FROM (
        |  SELECT unnest([u, v]) AS part FROM edges) GROUP BY 1)
        |SELECT d.part, CAST(d.degree AS BIGINT) AS degree,
        |  CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
        |  round(CAST(coalesce(t.n_triangles, 0) AS DOUBLE) * 2 /
        |    CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) AS coeff
        |FROM deg d LEFT JOIN tri t ON d.part = t.part
        |WHERE d.degree >= 2 ORDER BY d.part""".stripMargin,
    // Adamic-Adar link prediction, top-25 non-adjacent pairs (mirrors
    // Graph.adamicAdar; apex terms rounded to 9dp and summed as
    // DECIMAL so the score is addition-order-independent)
    "graph_adamic_adar" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |edges AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |sym AS (SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges),
        |term AS (SELECT b, CAST(round(1.0 / ln(CAST(count(*) AS DOUBLE)), 9)
        |    AS DECIMAL(18,9)) AS w
        |  FROM sym GROUP BY b HAVING count(*) >= 2),
        |pairs AS (SELECT x.a AS u, y.a AS v, count(*) AS n_common, sum(w) AS sw
        |  FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
        |  JOIN term t ON t.b = x.b GROUP BY 1, 2),
        |np AS (SELECT * FROM pairs p WHERE NOT EXISTS
        |  (SELECT 1 FROM edges e WHERE e.u = p.u AND e.v = p.v))
        |SELECT u, v, CAST(n_common AS BIGINT) AS n_common,
        |  round(CAST(sw AS DOUBLE), 6) AS aa_score
        |FROM np ORDER BY aa_score DESC, u, v LIMIT 25""".stripMargin,
    // consecutive-active-day streak histogram (mirrors
    // EventsEtl.activeStreaks; day - row_number islands)
    "etl_active_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day FROM events),
        |i AS (SELECT user_id,
        |   day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d),
        |s AS (SELECT user_id, island, count(*) AS streak_len FROM i GROUP BY 1, 2)
        |SELECT streak_len, CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // sign-bit binarization recall@10 vs exact cosine (mirrors
    // Similarity.bitsignRecall)
    "embed_bitsign_recall" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS norm,
        |   list_transform(v, x -> x >= 0) AS bits FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, norm AS pnorm, bits AS pbits
        |  FROM n WHERE vec_id < 5),
        |s AS (SELECT probe_id, vec_id,
        |   len(list_filter(list_zip(n.bits, p.pbits), z -> z[1] = z[2])) AS agree,
        |   round(list_sum(list_transform(list_zip(p.pv, n.v), z -> z[1]*z[2])) /
        |     (p.pnorm * n.norm), 6) AS cosine
        |  FROM n CROSS JOIN p WHERE n.vec_id <> p.probe_id),
        |ap AS (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY agree DESC, vec_id) AS rk
        |  FROM s) WHERE rk <= 10),
        |ex AS (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
        |  FROM s) WHERE rk <= 10),
        |h AS (SELECT probe_id, count(*) AS n_hits
        |  FROM ex JOIN ap USING (probe_id, vec_id) GROUP BY 1),
        |t AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY 1)
        |SELECT t.probe_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  round(coalesce(n_hits, 0) / CAST(n_exact AS DOUBLE), 6) AS recall_at_10
        |FROM t LEFT JOIN h ON t.probe_id = h.probe_id ORDER BY t.probe_id""".stripMargin,
    // chi-squared independence of segment x priority (mirrors
    // Relational.qChi2Independence; 9dp-decimal-staged contributions)
    "q_chi2_independence" ->
      """WITH obs AS (SELECT c_mktsegment, o_orderpriority, count(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |m AS (SELECT c_mktsegment, o_orderpriority, o,
        |   sum(o) OVER (PARTITION BY c_mktsegment) AS rt,
        |   sum(o) OVER (PARTITION BY o_orderpriority) AS ct,
        |   sum(o) OVER () AS n FROM obs),
        |x AS (SELECT c_mktsegment, o_orderpriority, n,
        |   CAST(round((o - rt * ct / CAST(n AS DOUBLE)) *
        |     (o - rt * ct / CAST(n AS DOUBLE)) /
        |     (rt * ct / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS contrib FROM m),
        |agg AS (SELECT count(DISTINCT c_mktsegment) AS r,
        |   count(DISTINCT o_orderpriority) AS c2,
        |   any_value(n) AS n, sum(contrib) AS chi2d FROM x)
        |SELECT round(CAST(chi2d AS DOUBLE), 6) AS chi2,
        |  CAST((r - 1) * (c2 - 1) AS BIGINT) AS dof, CAST(n AS BIGINT) AS n,
        |  round(sqrt(CAST(chi2d AS DOUBLE) /
        |    (n * least(r - 1, c2 - 1))), 6) AS cramers_v
        |FROM agg""".stripMargin,
    // length-bucketed batching manifest (mirrors
    // Pipeline.lengthBuckets; all-integer batch arithmetic)
    "pipeline_length_buckets" ->
      """WITH d AS (SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ntok
        |  FROM documents),
        |b AS (SELECT ntok, CAST(1 << length(bin(ntok - 1)) AS BIGINT) AS cap
        |  FROM d WHERE ntok > 0),
        |g AS (SELECT cap, count(*) AS n_docs, sum(ntok) AS sum_tok FROM b GROUP BY 1),
        |m AS (SELECT cap, n_docs, sum_tok,
        |   greatest(4096 // cap, 1) AS docs_per_batch FROM g),
        |f AS (SELECT *, (n_docs + docs_per_batch - 1) // docs_per_batch AS n_batches FROM m)
        |SELECT cap, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(docs_per_batch AS BIGINT) AS docs_per_batch,
        |  CAST(n_batches AS BIGINT) AS n_batches,
        |  round(1.0 - sum_tok /
        |    CAST(n_batches * docs_per_batch * cap AS DOUBLE), 6) AS waste_frac
        |FROM f ORDER BY cap""".stripMargin,
    // per-shard source-mixture KL drift (mirrors Pipeline.mixtureKl;
    // md5-hash shards, 9dp-decimal-staged KL terms)
    "pipeline_mixture_kl" ->
      """WITH d AS (SELECT source,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
        |  FROM documents),
        |cell AS (SELECT shard, source, count(*) AS c FROM d GROUP BY 1, 2),
        |st AS (SELECT shard, sum(c) AS st FROM cell GROUP BY 1),
        |gt AS (SELECT source, sum(c) AS gt FROM cell GROUP BY 1),
        |g AS (SELECT sum(c) AS n FROM cell),
        |t AS (SELECT shard, st, c / CAST(st AS DOUBLE) AS ps,
        |   gt / CAST(n AS DOUBLE) AS pg
        |  FROM cell JOIN st USING (shard) JOIN gt USING (source) CROSS JOIN g),
        |x AS (SELECT shard, st,
        |   CAST(round(ps * ln(ps / pg), 9) AS DECIMAL(18,9)) AS term,
        |   abs(ps - pg) AS delta FROM t)
        |SELECT shard, CAST(any_value(st) AS BIGINT) AS n_docs,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS kl_vs_corpus,
        |  round(max(delta), 6) AS max_share_delta
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // top-20-DF term burstiness (mirrors TextAnalysis.burstiness)
    "text_burstiness" ->
      """WITH tok AS (SELECT doc_id,
        |   unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents),
        |pd AS (SELECT term, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |m AS (SELECT term, count(*) AS df, sum(c) AS tf, sum(c*c) AS s2
        |  FROM pd GROUP BY 1),
        |x AS (SELECT term, df, tf, tf / CAST(n_docs AS DOUBLE) AS mean,
        |   (s2 / CAST(n_docs AS DOUBLE) -
        |    (tf / CAST(n_docs AS DOUBLE)) * (tf / CAST(n_docs AS DOUBLE))) /
        |     (tf / CAST(n_docs AS DOUBLE)) AS vmr
        |  FROM m CROSS JOIN nd)
        |SELECT term, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
        |  round(mean, 6) AS mean_count, round(vmr, 6) AS burstiness
        |FROM x ORDER BY df DESC, term LIMIT 20""".stripMargin,
    // b-bit (b=4) minhash estimate vs full-width vs exact (mirrors
    // Dedup.bbitMinhash; the dedup_minhash_est_error CTE chain plus
    // the low-4-bit truncation and the Li-Konig correction)
    "dedup_bbit_minhash" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |shl AS (SELECT doc_id, list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END) AS shingles FROM t),
        |sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |   list_min(list_transform(shingles, s ->
        |     ((1 + 2*i) * (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) + 7 + 11*i) % 2147483647))) AS sg
        |  FROM shl),
        |bands AS (SELECT doc_id, j AS band,
        |   md5(concat_ws(',', sg[4*j+1], sg[4*j+2], sg[4*j+3], sg[4*j+4])) AS bkey
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
        |cpairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
        |   AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |est AS (SELECT doc_a, doc_b,
        |   round(len(list_filter(range(1, 17), i -> sa.sg[i] = sb.sg[i])) / 16.0, 6) AS est_full,
        |   len(list_filter(range(1, 17), i -> sa.sg[i] % 16 = sb.sg[i] % 16)) / 16.0 AS r4
        |  FROM cpairs JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b),
        |ex AS (SELECT doc_a, doc_b,
        |   round(len(list_intersect(a.shingles, b.shingles)) /
        |     CAST(len(a.shingles) + len(b.shingles)
        |       - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE), 6) AS exact_jaccard
        |  FROM cpairs JOIN shl a ON a.doc_id = doc_a JOIN shl b ON b.doc_id = doc_b)
        |SELECT doc_a, doc_b, est_full,
        |  round(greatest((r4 - 1.0/16) / (15.0/16), 0), 6) AS est_b4, exact_jaccard,
        |  round(abs(est_full - exact_jaccard), 6) AS err_full,
        |  round(abs(round(greatest((r4 - 1.0/16) / (15.0/16), 0), 6) - exact_jaccard), 6) AS err_b4
        |FROM est JOIN ex USING (doc_a, doc_b) ORDER BY doc_a, doc_b""".stripMargin,
    // per-segment exact spend percentile bands (mirrors
    // Relational.qPercentileBands)
    "q_percentile_bands" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
        |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // OLS slope of monthly priority share (mirrors
    // Relational.qPriorityTrend; integer/decimal moment arithmetic)
    "q_priority_trend" ->
      """WITH m AS (SELECT
        |   CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_sec,
        |   o_orderpriority, count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |g AS (SELECT month_sec, o_orderpriority, c,
        |   sum(c) OVER (PARTITION BY month_sec) AS mt,
        |   CAST(dense_rank() OVER (ORDER BY month_sec) AS BIGINT) AS mi FROM m),
        |s AS (SELECT o_orderpriority, mi,
        |   CAST(round(c / CAST(mt AS DOUBLE), 6) AS DECIMAL(18,6)) AS share FROM g),
        |agg AS (SELECT o_orderpriority, count(*) AS n_months,
        |   sum(mi) AS sx, sum(share) AS sy, sum(mi * share) AS sxy,
        |   sum(mi * mi) AS sxx FROM s GROUP BY 1)
        |SELECT o_orderpriority, CAST(n_months AS BIGINT) AS n_months,
        |  round(CAST(sy / n_months AS DOUBLE), 6) AS mean_share,
        |  round(CAST(CAST(n_months * sxy - sx * sy AS DOUBLE) /
        |    (n_months * sxx - sx * sx) AS DOUBLE), 9) AS share_slope
        |FROM agg ORDER BY 1""".stripMargin,
    // top-3 revenue parts per region (mirrors Relational.qRegionTopParts)
    "q_region_top_parts" ->
      """WITH rev AS (SELECT r_name,  l_partkey,
        |   sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT r_name, l_partkey, rev,
        |   CAST(row_number() OVER (PARTITION BY r_name
        |     ORDER BY rev DESC, l_partkey) AS BIGINT) AS rk FROM rev)
        |SELECT r_name, l_partkey, round(CAST(rev AS DOUBLE), 2) AS revenue, rk
        |FROM rk WHERE rk <= 3 ORDER BY r_name, rk""".stripMargin,
    // view->purchase latency profile over the attributed purchases
    // (mirrors EventsEtl.conversionLatency; the conversion_rate as-of
    // CTE chain with the delay percentiles on top)
    "etl_conversion_latency" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id AS vuser, ts AS vts FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.purchase_id, p.ts, v.view_id, v.vts
        |  FROM p LEFT JOIN v ON p.user_id = v.vuser
        |    AND v.vts <= p.ts AND v.vts >= p.ts - INTERVAL 1 HOUR),
        |m AS (SELECT purchase_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS purchase_sec,
        |   view_id, CAST(epoch(date_trunc('second', vts)) AS BIGINT) AS view_sec
        |  FROM j
        |  QUALIFY row_number() OVER (PARTITION BY purchase_id ORDER BY vts DESC NULLS LAST) = 1),
        |d AS (SELECT purchase_sec - view_sec AS delay_s FROM m WHERE view_id IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(avg(delay_s), 6) AS mean_delay_s,
        |  round(quantile_cont(delay_s, 0.5), 6) AS p50_delay_s,
        |  round(quantile_cont(delay_s, 0.9), 6) AS p90_delay_s,
        |  round(quantile_cont(delay_s, 0.99), 6) AS p99_delay_s,
        |  CAST(max(delay_s) AS BIGINT) AS max_delay_s
        |FROM d""".stripMargin,
    // dataset card rollup at three grains (mirrors Pipeline.dataCard)
    "pipeline_data_card" ->
      """WITH d AS (SELECT source, lang, n_chars,
        |   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ntok FROM documents)
        |SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  round(sum(n_chars) / CAST(count(*) AS DOUBLE), 6) AS mean_chars
        |FROM d GROUP BY GROUPING SETS ((source, lang), (source), ())
        |ORDER BY source, lang""".stripMargin,
    // trained-IVF-routed 5-NN label purity per label (mirrors
    // Similarity.knnPurity: every vector probes its nprobe=2 nearest
    // refined cells, exact cosine top-5 within their members; integer
    // hit counting)
    "embed_knn_purity" ->
      s"""WITH $ivfCtes,
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |pr AS (SELECT vec_id, v, cell FROM s2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) <= 2),
        |p AS (SELECT pr.vec_id AS probe_id, lab.label AS plabel, pr.v AS pv,
        |   sqrt(list_sum(list_transform(pr.v, x -> x*x))) AS pnorm, pr.cell
        |  FROM pr JOIN lab ON lab.vec_id = pr.vec_id),
        |nb AS (SELECT asg.vec_id, lab.label, asg.v, asg.norm, asg.cell
        |  FROM asg JOIN lab ON lab.vec_id = asg.vec_id),
        |s AS (SELECT p.probe_id, p.plabel, nb.vec_id AS nbr_id, nb.label AS nbr_label,
        |   round(list_sum(list_transform(list_zip(p.pv, nb.v), z -> z[1]*z[2])) /
        |     (p.pnorm * nb.norm), 6) AS cosine
        |  FROM p JOIN nb ON nb.cell = p.cell AND nb.vec_id <> p.probe_id),
        |nn AS (SELECT probe_id, plabel, nbr_label FROM (SELECT *,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nbr_id) AS rk
        |  FROM s) WHERE rk <= 5),
        |h AS (SELECT probe_id, plabel,
        |   sum(CASE WHEN nbr_label = plabel THEN 1 ELSE 0 END) AS hits
        |  FROM nn GROUP BY 1, 2)
        |SELECT plabel AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(sum(hits) / CAST(5 * count(*) AS DOUBLE), 6) AS mean_purity
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    // year-over-year monthly revenue growth (mirrors
    // Relational.qYoyGrowth; integer month index join, IEEE ratio)
    "q_yoy_growth" ->
      """WITH m AS (SELECT
        |   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
        |   CAST(year(o_orderdate) AS BIGINT) AS yr,
        |   CAST(month(o_orderdate) AS BIGINT) AS mo,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT cur.yr, cur.mo, round(CAST(cur.rev AS DOUBLE), 2) AS revenue,
        |  round(CAST(prev.rev AS DOUBLE), 2) AS prev_revenue,
        |  round((CAST(cur.rev AS DOUBLE) - CAST(prev.rev AS DOUBLE)) /
        |    CAST(prev.rev AS DOUBLE), 6) AS yoy_growth
        |FROM m cur JOIN m prev ON cur.mi = prev.mi + 12
        |ORDER BY cur.yr, cur.mo""".stripMargin,
    // daily event-type mix JS divergence vs the corpus mix (mirrors
    // EventsEtl.mixDrift; 9dp-decimal-staged divergence terms)
    "etl_mix_drift" ->
      """WITH ev AS (SELECT
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
        |   event_type FROM events),
        |cell AS (SELECT day, event_type, count(*) AS c FROM ev GROUP BY 1, 2),
        |dt AS (SELECT day, sum(c) AS dt FROM cell GROUP BY 1),
        |gt AS (SELECT event_type, sum(c) AS gt FROM cell GROUP BY 1),
        |g AS (SELECT sum(c) AS n FROM cell),
        |grid AS (SELECT d.day, t.event_type, d.dt, t.gt, n, coalesce(cell.c, 0) AS c
        |  FROM dt d CROSS JOIN gt t CROSS JOIN g
        |  LEFT JOIN cell ON cell.day = d.day AND cell.event_type = t.event_type),
        |x AS (SELECT day, dt, c / CAST(dt AS DOUBLE) AS p,
        |   gt / CAST(n AS DOUBLE) AS q FROM grid),
        |y AS (SELECT day, dt,
        |   (CASE WHEN p > 0
        |      THEN CAST(round(p * ln(p / ((p + q) / 2)), 9) AS DECIMAL(18,9))
        |      ELSE CAST(0 AS DECIMAL(18,9)) END
        |    + CAST(round(q * ln(q / ((p + q) / 2)), 9) AS DECIMAL(18,9))) AS term
        |  FROM x)
        |SELECT day, CAST(any_value(dt) AS BIGINT) AS n_events,
        |  round(CAST(sum(term) AS DOUBLE) / 2, 6) AS js_divergence
        |FROM y GROUP BY 1 ORDER BY 1""".stripMargin,
    // order-to-ship lag SLA per order month (mirrors EventsEtl.shipLag)
    "etl_ship_lag" ->
      """WITH j AS (SELECT
        |   CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS order_month,
        |   CAST(epoch(date_trunc('second', l_shipdate)) AS BIGINT) // 86400
        |     - CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) // 86400 AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT order_month, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(avg(lag_days), 6) AS mean_lag_days,
        |  round(quantile_cont(lag_days, 0.5), 6) AS p50_lag_days,
        |  round(quantile_cont(lag_days, 0.9), 6) AS p90_lag_days,
        |  CAST(max(lag_days) AS BIGINT) AS max_lag_days
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // Matryoshka prefix-dim recall sweep (mirrors
    // Similarity.prefixRecallSweep)
    "embed_prefix_recall" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |s AS (SELECT probe_id, vec_id,
        |   round(list_sum(list_transform(list_zip(pv[1:8], v[1:8]), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(pv[1:8], x -> x*x))) *
        |      sqrt(list_sum(list_transform(v[1:8], x -> x*x)))), 6) AS cos8,
        |   round(list_sum(list_transform(list_zip(pv[1:16], v[1:16]), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(pv[1:16], x -> x*x))) *
        |      sqrt(list_sum(list_transform(v[1:16], x -> x*x)))), 6) AS cos16,
        |   round(list_sum(list_transform(list_zip(pv[1:32], v[1:32]), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(pv[1:32], x -> x*x))) *
        |      sqrt(list_sum(list_transform(v[1:32], x -> x*x)))), 6) AS cos32,
        |   round(list_sum(list_transform(list_zip(pv[1:64], v[1:64]), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(pv[1:64], x -> x*x))) *
        |      sqrt(list_sum(list_transform(v[1:64], x -> x*x)))), 6) AS cos64
        |  FROM e CROSS JOIN p WHERE e.vec_id <> p.probe_id),
        |t AS (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |   row_number() OVER (PARTITION BY probe_id ORDER BY cos64 DESC, vec_id) AS rk
        |  FROM s) WHERE rk <= 10),
        |r8 AS (SELECT 8 AS prefix_dim, count(*) AS n_hits FROM t JOIN
        |  (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos8 DESC, vec_id) AS rk
        |   FROM s) WHERE rk <= 10) a USING (probe_id, vec_id)),
        |r16 AS (SELECT 16 AS prefix_dim, count(*) AS n_hits FROM t JOIN
        |  (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos16 DESC, vec_id) AS rk
        |   FROM s) WHERE rk <= 10) a USING (probe_id, vec_id)),
        |r32 AS (SELECT 32 AS prefix_dim, count(*) AS n_hits FROM t JOIN
        |  (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos32 DESC, vec_id) AS rk
        |   FROM s) WHERE rk <= 10) a USING (probe_id, vec_id)),
        |r64 AS (SELECT 64 AS prefix_dim, count(*) AS n_hits FROM t JOIN
        |  (SELECT probe_id, vec_id FROM (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos64 DESC, vec_id) AS rk
        |   FROM s) WHERE rk <= 10) a USING (probe_id, vec_id)),
        |u AS (SELECT * FROM r8 UNION ALL SELECT * FROM r16
        |  UNION ALL SELECT * FROM r32 UNION ALL SELECT * FROM r64),
        |pc AS (SELECT count(*) AS np FROM p)
        |SELECT CAST(prefix_dim AS BIGINT) AS prefix_dim,
        |  CAST(pc.np AS BIGINT) AS n_probes, CAST(n_hits AS BIGINT) AS n_hits,
        |  round(n_hits / (10.0 * pc.np), 6) AS recall_at_10
        |FROM u CROSS JOIN pc ORDER BY prefix_dim""".stripMargin,
    // bounded-radius harmonic centrality for the 5 smallest nodes
    // (mirrors Graph.harmonicSample; min-dist BFS via recursive CTE)
    "graph_harmonic_sample" ->
      """WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |edges AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
        |seeds AS (SELECT DISTINCT u AS seed FROM sym ORDER BY 1 LIMIT 5),
        |r AS (
        |  SELECT seed, seed AS node, 0 AS dist FROM seeds
        |  UNION
        |  SELECT r.seed, sym.v AS node, r.dist + 1
        |  FROM r JOIN sym ON sym.u = r.node WHERE r.dist < 3),
        |d AS (SELECT seed, node, min(dist) AS dist FROM r GROUP BY 1, 2)
        |SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hop1,
        |  CAST(sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hop2,
        |  CAST(sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hop3,
        |  round(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END) * 0.5
        |    + sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END) * 0.333333333, 6) AS harmonic
        |FROM d WHERE dist > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    // Heaps'-law vocabulary growth at quarter checkpoints (mirrors
    // TextAnalysis.vocabGrowth; decimal-staged log-log OLS)
    "text_vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |ck AS (SELECT i AS q, CAST(mx * i // 4 AS BIGINT) AS ckpt
        |  FROM mx CROSS JOIN (SELECT unnest(range(1, 5)) AS i)),
        |tok AS (SELECT doc_id,
        |   unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents),
        |fs AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
        |pd AS (SELECT doc_id, count(*) AS nt FROM tok GROUP BY 1),
        |va AS (SELECT q, ckpt, count(*) AS vocab
        |  FROM fs CROSS JOIN ck WHERE fd <= ckpt GROUP BY 1, 2),
        |ta AS (SELECT q, count(*) AS n_docs, sum(nt) AS n_tokens
        |  FROM pd CROSS JOIN ck WHERE doc_id <= ckpt GROUP BY 1),
        |pts AS (SELECT q, ckpt, n_docs, n_tokens, vocab,
        |   CAST(round(ln(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |   CAST(round(ln(CAST(vocab AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM va JOIN ta USING (q)),
        |b AS (SELECT round(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) /
        |    CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE), 6) AS heaps_beta
        |  FROM pts)
        |SELECT CAST(q AS BIGINT) AS quarter, ckpt, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
        |  heaps_beta
        |FROM pts CROSS JOIN b ORDER BY quarter""".stripMargin,
    // cohort LTV triangle (mirrors Relational.qCohortLtv)
    "q_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
        |   CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |ch AS (SELECT o_custkey, min(mi) AS cohort_mi FROM o GROUP BY 1),
        |sz AS (SELECT cohort_mi, count(*) AS n_customers FROM ch GROUP BY 1),
        |cell AS (SELECT cohort_mi, mi - cohort_mi AS month_offset, sum(price) AS rev
        |  FROM o JOIN ch USING (o_custkey) GROUP BY 1, 2),
        |cum AS (SELECT cohort_mi, month_offset,
        |   sum(rev) OVER (PARTITION BY cohort_mi ORDER BY month_offset
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM cell)
        |SELECT cohort_mi, month_offset, CAST(n_customers AS BIGINT) AS n_customers,
        |  round(CAST(cum_rev AS DOUBLE), 2) AS cum_revenue,
        |  round(CAST(cum_rev AS DOUBLE) / n_customers, 6) AS ltv_per_customer
        |FROM cum JOIN sz USING (cohort_mi) ORDER BY cohort_mi, month_offset""".stripMargin,
    // repeat-purchase day-gap profile (mirrors Relational.qReorderGap)
    "q_reorder_gap" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |   CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) // 86400 AS day
        |  FROM orders),
        |g AS (SELECT day - lag(day) OVER
        |   (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS gap FROM o)
        |SELECT CAST(count(gap) AS BIGINT) AS n_gaps,
        |  round(avg(gap), 6) AS mean_gap_days,
        |  round(quantile_cont(gap, 0.5), 6) AS p50_gap_days,
        |  round(quantile_cont(gap, 0.9), 6) AS p90_gap_days,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days
        |FROM g WHERE gap IS NOT NULL""".stripMargin,
    // top-25 adjacent-pair PMI collocations (mirrors
    // TextAnalysis.pmiPairs)
    "text_pmi_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS cw FROM
        |  (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |nu AS (SELECT sum(cw) AS nu FROM uni),
        |bi AS (SELECT b[1] AS w1, b[2] AS w2 FROM (SELECT unnest(
        |   list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS b
        |  FROM t WHERE len(toks) >= 2)),
        |cb AS (SELECT w1, w2, count(*) AS cxy FROM bi GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |nb AS (SELECT sum(len(toks) - 1) AS nb FROM t WHERE len(toks) >= 2)
        |SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy,
        |  round(ln((cxy / CAST(nb AS DOUBLE)) /
        |    ((x.cw / CAST(nu AS DOUBLE)) * (y.cw / CAST(nu AS DOUBLE)))), 6) AS pmi
        |FROM cb JOIN uni x ON w1 = x.w JOIN uni y ON w2 = y.w
        |CROSS JOIN nu CROSS JOIN nb
        |ORDER BY pmi DESC, w1, w2 LIMIT 25""".stripMargin,
    // LSH banding config sweep over the same signatures (mirrors
    // Dedup.bandTuning; band key = the r-length signature slice)
    "dedup_band_tuning" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |shl AS (SELECT doc_id, list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END) AS shingles FROM t),
        |sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |   list_min(list_transform(shingles, s ->
        |     ((1 + 2*i) * (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) + 7 + 11*i) % 2147483647))) AS sg
        |  FROM shl),
        |b2 AS (SELECT doc_id, j, sg[8*j+1 : 8*j+8] AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 2)) AS j)),
        |p2 AS (SELECT count(*) AS n FROM (SELECT DISTINCT x.doc_id, y.doc_id
        |  FROM b2 x JOIN b2 y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id)),
        |b4 AS (SELECT doc_id, j, sg[4*j+1 : 4*j+4] AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
        |p4 AS (SELECT count(*) AS n FROM (SELECT DISTINCT x.doc_id, y.doc_id
        |  FROM b4 x JOIN b4 y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id)),
        |b8 AS (SELECT doc_id, j, sg[2*j+1 : 2*j+2] AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
        |p8 AS (SELECT count(*) AS n FROM (SELECT DISTINCT x.doc_id, y.doc_id
        |  FROM b8 x JOIN b8 y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id))
        |SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS bands, CAST(8 AS BIGINT) AS rows_per_band,
        |    round(pow(1.0/2, 1.0/8), 6) AS s_curve_threshold,
        |    CAST(n AS BIGINT) AS n_candidate_pairs FROM p2
        |  UNION ALL SELECT 4, 4, round(pow(1.0/4, 1.0/4), 6), CAST(n AS BIGINT) FROM p4
        |  UNION ALL SELECT 8, 2, round(pow(1.0/8, 1.0/2), 6), CAST(n AS BIGINT) FROM p8)
        |ORDER BY bands""".stripMargin,
    // split-half centroid stability per label (mirrors
    // Similarity.splitStability)
    "embed_split_stability" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   vec_id % 2 AS half,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |comp AS (SELECT half, label, d, round(avg(v[d]), 6) AS m
        |  FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS d) GROUP BY 1, 2, 3),
        |cent AS (SELECT half, label, list(m ORDER BY d) AS c FROM comp GROUP BY 1, 2),
        |nn AS (SELECT half, label, count(*) AS n FROM e GROUP BY 1, 2),
        |a AS (SELECT cent.label, nn.n AS n_even, c AS ca
        |  FROM cent JOIN nn ON cent.half = nn.half AND cent.label = nn.label
        |  WHERE cent.half = 0),
        |b AS (SELECT cent.label, nn.n AS n_odd, c AS cb
        |  FROM cent JOIN nn ON cent.half = nn.half AND cent.label = nn.label
        |  WHERE cent.half = 1)
        |SELECT label, CAST(n_even AS BIGINT) AS n_even,
        |  CAST(n_odd AS BIGINT) AS n_odd,
        |  round(list_sum(list_transform(list_zip(ca, cb), z -> z[1]*z[2])) /
        |    (sqrt(list_sum(list_transform(ca, x -> x*x))) *
        |     sqrt(list_sum(list_transform(cb, x -> x*x)))), 6) AS centroid_cosine
        |FROM a JOIN b USING (label) ORDER BY label""".stripMargin,
    // Doulion sampled triangle estimate vs exact (mirrors
    // Graph.triangleEstimate; the md5 edge sample must agree across
    // engines, so both hash the identical 'u-v' string)
    "graph_triangle_estimate" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 48),
        |edges AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |s AS (SELECT u, v FROM edges WHERE
        |  ('0x' || substr(md5(CAST(u AS VARCHAR) || '-' || CAST(v AS VARCHAR)), 1, 15))::BIGINT % 4 = 0),
        |tx AS (SELECT count(*) AS n FROM edges e1
        |  JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
        |ts AS (SELECT count(*) AS n FROM s e1
        |  JOIN s e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN s e3 ON e3.u = e1.v AND e3.v = e2.v),
        |ne AS (SELECT count(*) AS n FROM edges),
        |ns AS (SELECT count(*) AS n FROM s)
        |SELECT CAST(ne.n AS BIGINT) AS n_edges,
        |  CAST(ns.n AS BIGINT) AS n_sampled_edges,
        |  round(ns.n / CAST(ne.n AS DOUBLE), 6) AS edge_sample_frac,
        |  CAST(tx.n AS BIGINT) AS exact_triangles,
        |  CAST(ts.n AS BIGINT) AS sampled_triangles,
        |  CAST(ts.n * 64 AS BIGINT) AS estimated_triangles,
        |  round(abs(ts.n * 64 - tx.n) / CAST(tx.n AS DOUBLE), 6) AS rel_error
        |FROM ne, ns, tx, ts""".stripMargin,
    // ClickHouse-style windowFunnel: deepest view->click->purchase
    // prefix with every step inside 4h of the anchoring view (mirrors
    // EventsEtl.windowFunnel)
    "etl_window_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |l3 AS (SELECT DISTINCT v.user_id FROM v
        |  JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        |    AND c.ts <= v.ts + INTERVAL 4 HOUR
        |  JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
        |    AND p.ts <= v.ts + INTERVAL 4 HOUR),
        |l2 AS (SELECT DISTINCT v.user_id FROM v
        |  JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        |    AND c.ts <= v.ts + INTERVAL 4 HOUR),
        |lv AS (SELECT u.user_id,
        |  CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
        |       WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
        |       WHEN u.user_id IN (SELECT user_id FROM v) THEN 1
        |       ELSE 0 END AS funnel_level FROM u)
        |SELECT CAST(funnel_level AS BIGINT) AS funnel_level,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin,
    // first/last-touch attribution with a 7-day lookback; out-of-window
    // purchases attribute to 'none' (mirrors EventsEtl.attribution)
    "etl_attribution" ->
      """WITH b AS (SELECT user_id, ts AS pt, event_id AS pid FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts AS tt, event_id AS tid, event_type AS channel
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT b.pid, t.channel, t.tt, t.tid FROM b
        |  LEFT JOIN t ON t.user_id = b.user_id AND t.tt < b.pt
        |    AND t.tt >= b.pt - INTERVAL 7 DAY),
        |f AS (SELECT pid, coalesce(channel, 'none') AS channel FROM j
        |  QUALIFY row_number() OVER (PARTITION BY pid
        |    ORDER BY tt ASC NULLS LAST, tid ASC NULLS LAST) = 1),
        |l AS (SELECT pid, coalesce(channel, 'none') AS channel FROM j
        |  QUALIFY row_number() OVER (PARTITION BY pid
        |    ORDER BY tt DESC NULLS LAST, tid DESC NULLS LAST) = 1),
        |un AS (SELECT 'first_touch' AS model, channel FROM f
        |  UNION ALL SELECT 'last_touch' AS model, channel FROM l)
        |SELECT model, channel, CAST(count(*) AS BIGINT) AS n_purchases
        |FROM un GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 4-cycle census over the qty>=40 co-occurrence slice: top-15
    // diagonals by common-neighbor count + a TOTAL row (mirrors
    // Graph.squareCount)
    "graph_square_count" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 40),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |w AS (SELECT a.u AS x, b.v AS y, count(*) AS cn
        |  FROM e a JOIN e b ON a.v = b.u AND a.u < b.v GROUP BY 1, 2),
        |d AS (SELECT x, y, cn, (cn * (cn - 1)) // 2 AS sq FROM w WHERE cn >= 2),
        |top AS (SELECT x, y, cn AS common_neighbors, sq AS n_squares FROM d
        |  ORDER BY cn DESC, x, y LIMIT 15),
        |tot AS (SELECT CAST(-1 AS BIGINT) AS x, CAST(-1 AS BIGINT) AS y,
        |   count(*) AS common_neighbors, sum(sq) // 2 AS n_squares FROM d)
        |SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
        |  CAST(common_neighbors AS BIGINT) AS common_neighbors,
        |  CAST(n_squares AS BIGINT) AS n_squares
        |FROM (SELECT * FROM top UNION ALL SELECT * FROM tot)
        |ORDER BY x, y""".stripMargin,
    // Johnson-Lindenstrauss distortion audit: deterministic +/-1 sign
    // matrix inlined verbatim from Similarity.jlSigns (mirrors
    // Similarity.randomProjection)
    "embed_random_projection" ->
      s"""WITH e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |pr AS (SELECT vec_id, v, list_transform(range(0, 16), j ->
        |   list_reduce(list_transform(range(0, 64), i ->
        |     CASE WHEN substr('${graft.ops.Similarity.jlSigns}', CAST(j*64 + i + 1 AS INT), 1) = '+'
        |          THEN v[CAST(i + 1 AS INT)] ELSE -v[CAST(i + 1 AS INT)] END),
        |     (a, b) -> a + b)) AS p
        |  FROM e),
        |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |   a.v AS va, b.v AS vb, a.p AS pa, b.p AS pb
        |  FROM pr a JOIN pr b ON a.vec_id < b.vec_id),
        |sc AS (SELECT vec_a, vec_b,
        |   round(list_sum(list_transform(list_zip(va, vb), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(va, x -> x*x))) *
        |      sqrt(list_sum(list_transform(vb, x -> x*x)))), 6) AS cos_full,
        |   round(list_sum(list_transform(list_zip(pa, pb), z -> z[1]*z[2])) /
        |     (sqrt(list_sum(list_transform(pa, x -> x*x))) *
        |      sqrt(list_sum(list_transform(pb, x -> x*x)))), 6) AS cos_proj
        |  FROM pairs)
        |SELECT vec_a, vec_b, cos_full, cos_proj,
        |  round(abs(cos_full - cos_proj), 6) AS abs_err
        |FROM sc ORDER BY vec_a, vec_b""".stripMargin,
    // order-independent corpus fingerprint: sum of 60-bit md5 folds mod
    // 2^60, per source + ALL (mirrors Pipeline.datasetHash)
    "pipeline_dataset_hash" ->
      """WITH d AS (SELECT source, n_chars,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))::BIGINT AS hv
        |  FROM documents),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |   CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |   CAST(sum(CAST(hv AS HUGEINT)) % 1152921504606846976 AS BIGINT) AS fingerprint
        |  FROM d GROUP BY 1),
        |tot AS (SELECT 'ALL' AS source, CAST(count(*) AS BIGINT) AS n_docs,
        |   CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |   CAST(sum(CAST(hv AS HUGEINT)) % 1152921504606846976 AS BIGINT) AS fingerprint
        |  FROM d)
        |SELECT * FROM per UNION ALL SELECT * FROM tot ORDER BY source""".stripMargin,
    // per-shot keyframe extraction over the scene-cut segmentation
    // (mirrors Multimodal.shotKeyframes)
    "mm_shot_keyframes" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) // 64 > 0),
        |fr AS (SELECT doc_id, unnest(range(0, len(text) // 64)) AS f, text FROM t),
        |frames AS (SELECT doc_id, f, substr(text, CAST(f*64+1 AS INT), 64) AS fx FROM fr),
        |rms AS (SELECT doc_id, f,
        |   round(sqrt(list_sum(list_transform(range(0, 32),
        |     i -> CAST(ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1)) AS DOUBLE)
        |          * (ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1))))) / 32), 6) AS rms
        |  FROM frames),
        |c AS (SELECT doc_id, f, rms, CASE WHEN abs(rms - lag(rms) OVER
        |    (PARTITION BY doc_id ORDER BY f)) > 2000.0 THEN 1 ELSE 0 END AS cut
        |  FROM rms),
        |s AS (SELECT doc_id, f, rms,
        |   sum(cut) OVER (PARTITION BY doc_id ORDER BY f) AS shot_id FROM c),
        |kf AS (SELECT doc_id, shot_id, f, rms FROM s
        |  QUALIFY row_number() OVER (PARTITION BY doc_id, shot_id
        |    ORDER BY rms DESC, f) = 1),
        |g AS (SELECT doc_id, shot_id, count(*) AS n_frames FROM s GROUP BY 1, 2)
        |SELECT g.doc_id, CAST(g.shot_id AS BIGINT) AS shot_id,
        |  CAST(g.n_frames AS BIGINT) AS n_frames,
        |  CAST(kf.f AS BIGINT) AS key_f, kf.rms AS key_rms
        |FROM g JOIN kf USING (doc_id, shot_id)
        |ORDER BY doc_id, shot_id""".stripMargin,
    // leading/trailing silence trim over the same frame-RMS stream
    // (mirrors Multimodal.silenceTrim; threshold = audioEnergy's 25500)
    "mm_silence_trim" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) // 64 > 0),
        |fr AS (SELECT doc_id, unnest(range(0, len(text) // 64)) AS f, text FROM t),
        |frames AS (SELECT doc_id, f, substr(text, CAST(f*64+1 AS INT), 64) AS fx FROM fr),
        |rms AS (SELECT doc_id, f,
        |   round(sqrt(list_sum(list_transform(range(0, 32),
        |     i -> CAST(ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1)) AS DOUBLE)
        |          * (ord(substr(fx, CAST(2*i+1 AS INT), 1)) * 256
        |          + ord(substr(fx, CAST(2*i+2 AS INT), 1))))) / 32), 6) AS rms
        |  FROM frames),
        |agg AS (SELECT doc_id, count(*) AS nf,
        |   min(CASE WHEN rms >= 25500 THEN f END) AS fa,
        |   max(CASE WHEN rms >= 25500 THEN f END) AS la
        |  FROM rms GROUP BY doc_id)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(coalesce(fa, -1) AS BIGINT) AS first_active,
        |  CAST(coalesce(la, -1) AS BIGINT) AS last_active,
        |  CAST(CASE WHEN fa IS NULL THEN nf ELSE nf - (la - fa + 1) END
        |    AS BIGINT) AS n_trimmed
        |FROM agg ORDER BY doc_id""".stripMargin,
    // 16-bin luminance histogram from the SAME pixel formula the PNG
    // payloads encode (mirrors Multimodal.imageHistogram / PHash.pixelGrid)
    "mm_image_histogram" ->
      """WITH d AS (SELECT doc_id,
        |   (((doc_id // 12) * 2654435761) % 4294967296) % 256 AS g,
        |   ((((doc_id // 12) * 2654435761) % 4294967296) // 256) % 256 AS w,
        |   (doc_id // 12) % 23 AS m, doc_id % 3 AS dd FROM documents),
        |cells AS (SELECT doc_id, g, w, m, dd, x.i AS x, y.i AS y
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 32)) AS i) x
        |  CROSS JOIN (SELECT unnest(range(0, 32)) AS i) y),
        |px AS (SELECT doc_id, least(
        |   ((x+1) * (g+3) + (y+1) * (w+5) + ((x*y) % (m+2)) * 7) % 256
        |   + (CASE WHEN x BETWEEN 12 AND 13 AND y BETWEEN 12 AND 13
        |      THEN dd ELSE 0 END), 255) AS v FROM cells)
        |SELECT doc_id, CAST(v // 16 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_px
        |FROM px GROUP BY 1, 2 ORDER BY doc_id, bin""".stripMargin,
    // rich-club coefficient curve over the co-occurrence graph
    // (mirrors Graph.richClub; tie-free 6-dp rounding)
    "graph_rich_club" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
        |deg AS (SELECT n, count(*) AS deg FROM
        |  (SELECT u AS n FROM p UNION ALL SELECT v FROM p) GROUP BY 1),
        |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
        |nodes AS (SELECT k, count(*) AS n_nodes FROM deg CROSS JOIN ks
        |  WHERE deg > k GROUP BY k),
        |edges AS (SELECT k, count(*) AS n_edges FROM p
        |  JOIN deg du ON p.u = du.n JOIN deg dv ON p.v = dv.n
        |  CROSS JOIN ks WHERE du.deg > k AND dv.deg > k GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(coalesce(n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN n_nodes < 2 THEN 0.0 ELSE
        |   CAST((2 * coalesce(n_edges, 0) * 2 * 1000000
        |     + n_nodes * (n_nodes - 1))
        |    // (2 * n_nodes * (n_nodes - 1)) AS DOUBLE) / 1000000.0 END AS phi
        |FROM nodes LEFT JOIN edges USING (k) ORDER BY k""".stripMargin,
    // per-nation supplier-revenue HHI in exact integer micro-units
    // (mirrors Relational.qHhiConcentration)
    "q_hhi_concentration" ->
      """WITH sr AS (SELECT l_suppkey,
        |   sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_suppkey, CAST(rev * 1000000 AS HUGEINT) AS c FROM sr),
        |g AS (SELECT n_name, count(*) AS n_suppliers,
        |   sum(c * c) AS s2, sum(c) AS t
        |  FROM c JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey GROUP BY 1)
        |SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
        |  round(CAST(t AS DOUBLE) / 1000000.0, 2) AS total_rev,
        |  CAST((2 * s2 * 1000000 + t * t) // (2 * t * t) AS DOUBLE)
        |    / 1000000.0 AS hhi
        |FROM g ORDER BY n_name""".stripMargin,
    // year-over-year spend-quintile migration (mirrors
    // Relational.qBucketMigration; ntile tie-broken on custkey)
    "q_bucket_migration" ->
      """WITH yearly AS (SELECT o_custkey,
        |   CAST(year(o_orderdate) AS BIGINT) AS yr,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1, 2),
        |q AS (SELECT o_custkey, yr, CAST(ntile(5) OVER
        |   (PARTITION BY yr ORDER BY spend, o_custkey) AS BIGINT) AS bucket
        |  FROM yearly),
        |mx AS (SELECT max(yr) AS max_yr FROM q)
        |SELECT a.bucket AS from_bucket,
        |  coalesce(b.bucket, 0) AS to_bucket,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM q a LEFT JOIN q b
        |  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
        |CROSS JOIN mx WHERE a.yr < max_yr
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // RAKE keyword scores: phrase runs between stopwords, deg/freq
    // (mirrors TextAnalysis.rakeKeywords; tie-free 6-dp)
    "text_rake_keywords" ->
      """WITH t AS (SELECT doc_id,
        |   regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |   i -> struct_pack(pos := i, w := toks[i]))) AS u FROM t),
        |st AS (SELECT doc_id, u.pos AS pos, u.w AS w,
        |   CASE WHEN u.w IN ('the','a','of','and','to','in')
        |     THEN 1 ELSE 0 END AS is_stop FROM tok),
        |ph AS (SELECT doc_id, pos, w, is_stop, sum(is_stop) OVER
        |   (PARTITION BY doc_id ORDER BY pos) AS phrase_id FROM st),
        |np AS (SELECT doc_id, pos, w, phrase_id FROM ph WHERE is_stop = 0),
        |pl AS (SELECT doc_id, w, count(*) OVER
        |   (PARTITION BY doc_id, phrase_id) AS phrase_len FROM np),
        |ag AS (SELECT w, count(*) AS freq, sum(phrase_len) AS deg
        |  FROM pl GROUP BY 1)
        |SELECT w, CAST(freq AS BIGINT) AS freq, CAST(deg AS BIGINT) AS deg,
        |  CAST((2 * deg * 1000000 + freq) // (2 * freq) AS DOUBLE)
        |    / 1000000.0 AS score
        |FROM ag ORDER BY score DESC, w LIMIT 25""".stripMargin,
    // Lorenz curve at decile grain (mirrors Relational.qLorenzDeciles;
    // exact micro-unit shares, integer cumulative before division)
    "q_lorenz_deciles" ->
      """WITH sp AS (SELECT o_custkey,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (SELECT CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS BIGINT)
        |   AS decile, spend FROM sp),
        |g AS (SELECT decile, count(*) AS n_customers,
        |   sum(CAST(spend * 1000000 AS HUGEINT)) AS s6 FROM d GROUP BY 1),
        |c AS (SELECT decile, n_customers, s6,
        |   sum(s6) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW) AS c6 FROM g),
        |t AS (SELECT sum(s6) AS t6 FROM g)
        |SELECT decile, CAST(n_customers AS BIGINT) AS n_customers,
        |  round(CAST(s6 AS DOUBLE) / 1e6, 2) AS spend,
        |  CAST((2 * s6 * 1000000 + t6) // (2 * t6) AS DOUBLE) / 1000000.0
        |    AS spend_share,
        |  CAST((2 * c6 * 1000000 + t6) // (2 * t6) AS DOUBLE) / 1000000.0
        |    AS cum_share
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,
    // shingle document-frequency profile (mirrors
    // Dedup.shingleDfProfile; pow2 buckets like graph_degree_dist)
    "dedup_shingle_df_profile" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |shl AS (SELECT doc_id, list_distinct(
        |   CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [text] END) AS shingles FROM t),
        |sh0 AS (SELECT unnest(shingles) AS s FROM shl),
        |sh AS (SELECT ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh0),
        |df AS (SELECT h, count(*) AS df FROM sh GROUP BY 1),
        |b AS (SELECT CAST(1 << length(bin(df - 1)) AS BIGINT) AS bucket, df FROM df),
        |g AS (SELECT bucket, count(*) AS n_shingles, sum(df) AS n_postings
        |  FROM b GROUP BY 1),
        |tt AS (SELECT sum(n_shingles) AS ts, sum(n_postings) AS tp FROM g)
        |SELECT bucket, CAST(n_shingles AS BIGINT) AS n_shingles,
        |  CAST(n_postings AS BIGINT) AS n_postings,
        |  CAST((2 * n_shingles * 1000000 + ts) // (2 * ts) AS DOUBLE)
        |    / 1000000.0 AS shingle_share,
        |  CAST((2 * n_postings * 1000000 + tp) // (2 * tp) AS DOUBLE)
        |    / 1000000.0 AS posting_share
        |FROM g CROSS JOIN tt ORDER BY bucket""".stripMargin,
    // one-way weekday ANOVA over order totals (mirrors
    // Relational.qWeekdayAnova; wide single-row fixed-order doubles)
    "q_weekday_anova" -> {
      val n = (0 until 7).map(d => s"CAST(n$d AS DOUBLE)").mkString(" + ")
      val sx = (0 until 7).map(d => s"CAST(sx$d AS DOUBLE)").mkString(" + ")
      val sxx = (0 until 7).map(d => s"CAST(sxx$d AS DOUBLE)").mkString(" + ")
      val ssb = (0 until 7)
        .map(d => s"CAST(sx$d AS DOUBLE) * CAST(sx$d AS DOUBLE) / CAST(n$d AS DOUBLE)")
        .mkString(" + ")
      val accs = (0 until 7).map { d =>
        s"""sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS n$d,
           |   sum(CASE WHEN dow = $d THEN x END) AS sx$d,
           |   sum(CASE WHEN dow = $d THEN x * x END) AS sxx$d""".stripMargin
      }.mkString(",\n|   ")
      s"""WITH b AS (SELECT
        |   (CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) // 86400) % 7 AS dow,
        |   CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders),
        |wide AS (SELECT
        |   $accs
        |  FROM b)
        |SELECT CAST(7 AS BIGINT) AS k_groups,
        |  CAST($n AS BIGINT) AS n_total,
        |  round(($ssb) - ($sx) * ($sx) / ($n), 6) AS ss_between,
        |  round(($sxx) - ($ssb), 6) AS ss_within,
        |  round(((($ssb) - ($sx) * ($sx) / ($n)) / 6.0)
        |    / ((($sxx) - ($ssb)) / (($n) - 7.0)), 6) AS f_stat,
        |  round((($ssb) - ($sx) * ($sx) / ($n))
        |    / (($sxx) - ($sx) * ($sx) / ($n)), 6) AS eta_sq
        |FROM wide""".stripMargin
    },
    // exact-integer STL-lite decomposition of monthly revenue
    // (mirrors Relational.qSeasonalDecompose)
    "q_seasonal_decompose" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (SELECT mi, rev,
        |   count(*) OVER win AS win_n,
        |   sum(CAST(rev * 1000000 AS HUGEINT)) OVER win AS win_sum6
        |  FROM m WINDOW win AS (ORDER BY mi ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)),
        |t AS (SELECT mi, rev,
        |   (2 * win_sum6 + 13) // 26 AS t6,
        |   CAST(rev * 1000000 AS HUGEINT) - (2 * win_sum6 + 13) // 26 AS d6
        |  FROM w WHERE win_n = 13),
        |s AS (SELECT mi % 12 AS moy,
        |   CASE WHEN sum(d6) >= 0 THEN (2 * sum(d6) + count(*)) // (2 * count(*))
        |     ELSE -((2 * (-sum(d6)) + count(*)) // (2 * count(*))) END AS s6
        |  FROM t GROUP BY 1)
        |SELECT t.mi AS month_index, round(CAST(rev AS DOUBLE), 2) AS revenue,
        |  CAST(t6 AS DOUBLE) / 1e6 AS trend,
        |  CAST(s6 AS DOUBLE) / 1e6 AS seasonal,
        |  CAST(t6 - t6 + d6 - s6 AS DOUBLE) / 1e6 AS residual
        |FROM t JOIN s ON t.mi % 12 = s.moy
        |ORDER BY month_index""".stripMargin,
    // code-vs-prose density screen (mirrors TextAnalysis.codeDetection)
    "text_code_detection" ->
      """WITH d AS (SELECT source, len(text) AS len,
        |   len(regexp_extract_all(text, '[{}();=<>\[\]]')) AS sym
        |  FROM documents WHERE len(text) > 0),
        |r AS (SELECT source, len, sym,
        |   (2 * sym * 1000000 + len) // (2 * len) AS r6 FROM d),
        |g AS (SELECT source, count(*) AS n_docs,
        |   sum(CASE WHEN sym * 20 >= len THEN 1 ELSE 0 END) AS n_code,
        |   sum(r6) AS s6 FROM r GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_code AS BIGINT) AS n_code_like,
        |  CAST((2 * s6 + n_docs) // (2 * n_docs) AS DOUBLE) / 1000000.0
        |    AS mean_symbol_density
        |FROM g ORDER BY source""".stripMargin,
    // daily bounce rate over the sessionize session grain (mirrors
    // EventsEtl.bounceRate; tie-free 6-dp)
    "etl_bounce_rate" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events),
        |t AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_sess FROM s),
        |u AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_num FROM t),
        |sess AS (SELECT user_id, session_num, count(*) AS n_events,
        |   min(sec) // 86400 AS day FROM u GROUP BY 1, 2),
        |g AS (SELECT day, count(*) AS n_sessions,
        |   sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces
        |  FROM sess GROUP BY 1)
        |SELECT day, CAST(n_sessions AS BIGINT) AS n_sessions,
        |  CAST(n_bounces AS BIGINT) AS n_bounces,
        |  CAST((2 * n_bounces * 1000000 + n_sessions) // (2 * n_sessions)
        |    AS DOUBLE) / 1000000.0 AS bounce_rate
        |FROM g ORDER BY day""".stripMargin,
    // window-size sensitivity sweep of the funnel (mirrors
    // EventsEtl.funnelWindowSweep: the window_funnel chain at 1h/4h/24h)
    "etl_funnel_window_sweep" -> Seq(1, 4, 24).map { h =>
      s"""SELECT CAST($h AS BIGINT) AS window_hours,
        |  CAST(funnel_level AS BIGINT) AS funnel_level,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM (WITH u AS (SELECT DISTINCT user_id FROM events),
        | v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        | c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        | p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        | l3 AS (SELECT DISTINCT v.user_id FROM v
        |   JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        |     AND c.ts <= v.ts + INTERVAL $h HOUR
        |   JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
        |     AND p.ts <= v.ts + INTERVAL $h HOUR),
        | l2 AS (SELECT DISTINCT v.user_id FROM v
        |   JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        |     AND c.ts <= v.ts + INTERVAL $h HOUR)
        | SELECT u.user_id,
        |  CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
        |       WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
        |       WHEN u.user_id IN (SELECT user_id FROM v) THEN 1
        |       ELSE 0 END AS funnel_level FROM u)
        |GROUP BY 1, 2""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY window_hours, funnel_level"),
    // top-p% activity concentration (mirrors EventsEtl.powerUsers;
    // exact ceil cohort cut, tie-free shares)
    "etl_power_users" ->
      """WITH uc AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n_users, sum(n_events) AS tot FROM uc),
        |rk AS (SELECT user_id, n_events,
        |   row_number() OVER (ORDER BY n_events DESC, user_id) AS rk FROM uc),
        |ks AS (SELECT unnest([1, 5, 10]) AS pct),
        |g AS (SELECT pct, count(*) AS n_top_users, sum(n_events) AS top_events
        |  FROM rk CROSS JOIN ks CROSS JOIN tot
        |  WHERE rk <= (n_users * pct + 99) // 100 GROUP BY 1)
        |SELECT CAST(pct AS BIGINT) AS pct,
        |  CAST(n_top_users AS BIGINT) AS n_top_users,
        |  CAST(top_events AS BIGINT) AS top_events,
        |  CAST((2 * top_events * 1000000 + tot) // (2 * tot) AS DOUBLE)
        |    / 1000000.0 AS event_share
        |FROM g CROSS JOIN tot ORDER BY pct""".stripMargin,
    // growth-accounting lifecycle (mirrors EventsEtl.userLifecycle;
    // churn booked on prev-active-day + 8 when confirmable in-range)
    "etl_user_lifecycle" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day FROM events),
        |lg AS (SELECT user_id, day,
        |   lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |   lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt FROM ud),
        |mx AS (SELECT max(day) AS max_day FROM ud),
        |states AS (SELECT day, CASE WHEN prev IS NULL THEN 'new'
        |   WHEN day - prev > 7 THEN 'resurrected'
        |   ELSE 'retained' END AS state FROM lg),
        |churn AS (SELECT day + 8 AS day, 'churned' AS state
        |  FROM lg CROSS JOIN mx
        |  WHERE coalesce(nxt - day, 9223372036854775807) > 7
        |    AND day + 8 <= max_day),
        |u AS (SELECT * FROM states UNION ALL SELECT * FROM churn)
        |SELECT day,
        |  CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(sum(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM u GROUP BY day ORDER BY day""".stripMargin,
    // distinct-4-gram compression proxy (mirrors
    // TextAnalysis.compressionProxy; tie-free micro-unit mean)
    "text_compression_proxy" ->
      """WITH d AS (SELECT source, len(text) - 3 AS n4,
        |   len(list_distinct(list_transform(range(0, len(text) - 3),
        |     i -> substr(text, CAST(i + 1 AS INT), 4)))) AS d4
        |  FROM documents WHERE len(text) >= 4),
        |r AS (SELECT source, n4, d4,
        |   (2 * d4 * 1000000 + n4) // (2 * n4) AS r6 FROM d),
        |g AS (SELECT source, count(*) AS n_docs, sum(r6) AS s6,
        |   sum(CASE WHEN d4 * 5 < n4 THEN 1 ELSE 0 END) AS n_low
        |  FROM r GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST((2 * s6 + n_docs) // (2 * n_docs) AS DOUBLE) / 1000000.0
        |    AS mean_distinct_ratio,
        |  CAST(n_low AS BIGINT) AS n_low_diversity
        |FROM g ORDER BY source""".stripMargin,
    // sampled pairwise-cosine histogram (mirrors
    // Similarity.cosineCalibration; constant-size md5-rank top-300
    // sample, integer micro-unit binning)
    "embed_cosine_calibration" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 300),
        |n AS (SELECT vec_id, v,
        |   sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |p AS (SELECT round(list_sum(list_transform(list_zip(a.v, b.v),
        |     z -> z[1] * z[2])) / (a.norm * b.norm), 6) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
        |b AS (SELECT (CAST(CAST(cos AS DECIMAL(9,6)) * 1000000 AS BIGINT)
        |   + 1000000) // 100000 AS bin FROM p),
        |g AS (SELECT bin, count(*) AS n_pairs FROM b GROUP BY 1),
        |t AS (SELECT sum(n_pairs) AS tot FROM g)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST((2 * n_pairs * 1000000 + tot) // (2 * tot) AS DOUBLE)
        |    / 1000000.0 AS share
        |FROM g CROSS JOIN t ORDER BY bin""".stripMargin,
    // top part-level YoY growers (mirrors Relational.qPartGrowthTopk;
    // sign-split half-away-from-zero rounding)
    "q_part_growth_topk" ->
      """WITH py AS (SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |   sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |lg AS (SELECT l_partkey, yr, rev,
        |   lag(rev) OVER (PARTITION BY l_partkey ORDER BY yr) AS prev,
        |   lag(yr) OVER (PARTITION BY l_partkey ORDER BY yr) AS prev_yr
        |  FROM py),
        |d AS (SELECT l_partkey, yr, rev, prev,
        |   CAST((rev - prev) * 1000000 AS HUGEINT) AS n6,
        |   CAST(prev * 1000000 AS HUGEINT) AS d6
        |  FROM lg WHERE prev IS NOT NULL AND yr - prev_yr = 1)
        |SELECT l_partkey, yr, round(CAST(rev AS DOUBLE), 2) AS revenue,
        |  round(CAST(prev AS DOUBLE), 2) AS prev_revenue,
        |  CAST(CASE WHEN n6 >= 0 THEN (2 * n6 * 1000000 + d6) // (2 * d6)
        |    ELSE -((2 * (-n6) * 1000000 + d6) // (2 * d6)) END AS DOUBLE)
        |    / 1000000.0 AS growth
        |FROM d ORDER BY growth DESC, l_partkey, yr LIMIT 15""".stripMargin,
    // per-source near-dup rate over the LSH component labels (mirrors
    // Pipeline.sourceDupRate; canonical = cluster-min doc_id)
    "pipeline_source_dup_rate" ->
      s"""WITH RECURSIVE $componentsCtes,
        |lbl AS (SELECT node AS doc_id, min(reach) AS component
        |  FROM walk GROUP BY 1),
        |j AS (SELECT d.source, d.doc_id, lbl.component
        |  FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc_id),
        |g AS (SELECT source, count(*) AS n_docs,
        |   sum(CASE WHEN component IS NOT NULL THEN 1 ELSE 0 END) AS n_clustered,
        |   sum(CASE WHEN component IS NOT NULL AND component <> doc_id
        |     THEN 1 ELSE 0 END) AS n_removable
        |  FROM j GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_clustered AS BIGINT) AS n_clustered,
        |  CAST(n_removable AS BIGINT) AS n_removable,
        |  CAST((2 * n_removable * 1000000 + n_docs) // (2 * n_docs) AS DOUBLE)
        |    / 1000000.0 AS removable_share
        |FROM g ORDER BY source""".stripMargin,
    // two-sample KS on order totals, BUILDING vs MACHINERY (mirrors
    // Relational.qKsTest; integer CDF-gap numerators, tie-free round)
    "q_ks_test" ->
      """WITH seg AS (SELECT c_mktsegment AS seg,
        |   CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |bv AS (SELECT v,
        |   sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS d1,
        |   sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS d2
        |  FROM seg GROUP BY 1),
        |cdf AS (SELECT
        |   sum(d1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
        |   sum(d2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2,
        |   sum(d1) OVER () AS n1, sum(d2) OVER () AS n2
        |  FROM bv),
        |a AS (SELECT max(n1) AS n1, max(n2) AS n2,
        |   max(abs(c1 * n2 - c2 * n1)) AS dnum FROM cdf)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST((2 * dnum * 1000000 + n1 * n2) // (2 * n1 * n2) AS DOUBLE)
        |    / 1000000.0 AS ks_d,
        |  round(sqrt(n1 * n2 / CAST(n1 + n2 AS DOUBLE)) *
        |    (dnum / CAST(n1 * n2 AS DOUBLE)), 6) AS ks_scaled
        |FROM a""".stripMargin,
    // Spearman rank correlation, quantity vs extendedprice (mirrors
    // Relational.qSpearmanCorr; tie-averaged ranks held integer as
    // 2·avgrank = 2·rank + cnt − 1, exact DECIMAL moments)
    "q_spearman_corr" ->
      """WITH r AS (SELECT
        |   CAST(2 * rank() OVER (ORDER BY l_quantity)
        |     + count(*) OVER (PARTITION BY l_quantity) - 1 AS DECIMAL(38,0)) AS rq,
        |   CAST(2 * rank() OVER (ORDER BY l_extendedprice)
        |     + count(*) OVER (PARTITION BY l_extendedprice) - 1 AS DECIMAL(38,0)) AS rp
        |  FROM lineitem),
        |a AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
        |   sum(rq * rp) AS sxy, sum(rq) AS sx, sum(rp) AS sy,
        |   sum(rq * rq) AS sxx, sum(rp * rp) AS syy FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
        |FROM a""".stripMargin,
    // Theil T inequality of customer spend, nation decomposition
    // (mirrors Relational.qTheilIndex)
    "q_theil_index" ->
      """WITH spend AS (SELECT o_custkey,
        |   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
        |  FROM orders GROUP BY 1),
        |sx AS (SELECT n_name, x FROM spend
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |tot AS (SELECT CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |   count(*) AS n FROM sx),
        |g AS (SELECT n_name, count(*) AS n_cust,
        |   CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sg,
        |   sum(x * ln(x)) AS sxlx, max(s) AS s, max(n) AS n
        |  FROM sx CROSS JOIN tot GROUP BY 1),
        |t AS (SELECT n_cust, sg / s AS share,
        |   sxlx / sg - ln(sg / n_cust) AS tw,
        |   ln((sg / n_cust) / (s / n)) AS tb FROM g)
        |SELECT CAST(sum(n_cust) AS BIGINT) AS n_customers,
        |  round(sum(share * (tw + tb)), 6) AS theil_total,
        |  round(sum(share * tb), 6) AS theil_between,
        |  round(sum(share * tw), 6) AS theil_within
        |FROM t""".stripMargin,
    // trailing-day top-20 burst profile over per-hour counts
    // (mirrors EventsEtl.burstDetection; exact integer z2 ranking)
    "etl_burst_detection" ->
      """WITH ph AS (SELECT
        |   CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |   count(*) AS c FROM events GROUP BY 1),
        |t AS (SELECT h, c,
        |   count(c) OVER w AS trail_n,
        |   sum(c) OVER w AS s1,
        |   sum(c * c) OVER w AS s2
        |  FROM ph WINDOW w AS (ORDER BY h RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT h, c, trail_n,
        |   trail_n * c - s1 AS e, trail_n * s2 - s1 * s1 AS vv
        |  FROM t WHERE trail_n >= 12)
        |SELECT h AS hour_epoch, CAST(c AS BIGINT) AS cnt,
        |  CAST(trail_n AS BIGINT) AS trail_n,
        |  CAST((2 * e * e * 1000000 + vv) // (2 * vv) AS DOUBLE)
        |    / 1000000.0 AS z2,
        |  e * e > 9 * vv AS is_burst
        |FROM f WHERE e > 0 AND vv > 0
        |ORDER BY z2 DESC, hour_epoch LIMIT 20""".stripMargin,
    // pairwise bigram-vocabulary Jaccard between sources (mirrors
    // TextAnalysis.jaccardSourceOverlap; integer set algebra)
    "text_jaccard_sources" ->
      """WITH t AS (SELECT source,
        |   regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
        |sw AS (SELECT DISTINCT source, w FROM
        |   (SELECT source, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS w
        |    FROM t WHERE len(toks) >= 2) tok),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM sw GROUP BY 1),
        |i AS (SELECT a.source AS source_a, b.source AS source_b,
        |   CAST(count(*) AS BIGINT) AS n_inter
        |  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_inter, na + nb - n_inter AS n_union,
        |  CAST((2 * n_inter * 1000000 + (na + nb - n_inter)) //
        |    (2 * (na + nb - n_inter)) AS DOUBLE) / 1000000.0 AS jaccard
        |FROM i
        |JOIN (SELECT source AS source_a, nv AS na FROM sizes) sa USING (source_a)
        |JOIN (SELECT source AS source_b, nv AS nb FROM sizes) sb USING (source_b)
        |ORDER BY source_a, source_b""".stripMargin,
    // k-occurrence histogram of the exact cosine 5-NN digraph
    // (mirrors Similarity.embedHubness; zero bucket via left join)
    "embed_hubness" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |   sqrt(list_sum(list_transform(v, x -> x*x))) AS norm FROM e),
        |s AS (SELECT a.vec_id, b.vec_id AS nbr_id,
        |   round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]))
        |     / (a.norm * b.norm), 6) AS cosine
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |nn AS (SELECT nbr_id FROM (SELECT *,
        |   row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id) AS rk
        |  FROM s) WHERE rk <= 5),
        |occ AS (SELECT e.vec_id, CAST(count(nn.nbr_id) AS BIGINT) AS k_occ
        |  FROM n e LEFT JOIN nn ON nn.nbr_id = e.vec_id GROUP BY 1)
        |SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vecs
        |FROM occ GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
