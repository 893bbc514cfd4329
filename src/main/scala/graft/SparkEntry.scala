package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    // flagship: the end-to-end corpus job (normalize -> gate -> dedup ->
    // pack -> report) as one declarative plan
    CorpusPipeline.pipeE2eCorpus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Analytics.q1PricingSummary _),
    "q2_revenue_by_nation" -> (Analytics.q2RevenueByNation _),
    "q3_topk_orders" -> (Analytics.q3TopkOrders _),
    "q4_filter_range" -> (Analytics.q4FilterRange _),
    "q5_window_running" -> (Analytics.q5WindowRunning _),
    "q6_distinct_users" -> (Analytics.q6DistinctUsers _),
    "q6b_approx_distinct" -> (Analytics.q6bApproxDistinct _),
    "q7_semi_anti" -> (Analytics.q7SemiAnti _),
    "q8_rollup" -> (Analytics.q8Rollup _),
    "q9_above_avg" -> (Analytics.q9AboveAvg _),
    "q10_repeat_buyers" -> (Analytics.q10RepeatBuyers _),
    "q11_pivot_events" -> (Analytics.q11PivotEvents _),
    "q12_json_props" -> (Analytics.q12JsonProps _),
    "q13_asof_join" -> (Analytics.q13AsofJoin _),
    "q14_sessionize" -> (Analytics.q14Sessionize _),
    "q15_tumbling_agg" -> (Analytics.q15TumblingAgg _),
    "q16_full_outer" -> (Analytics.q16FullOuter _),
    "q17_percentiles" -> (Analytics.q17Percentiles _),
    "q18_cube" -> (Analytics.q18Cube _),
    "q19_string_ops" -> (Analytics.q19StringOps _),
    "q20_filtered_agg" -> (Analytics.q20FilteredAgg _),
    "q21_ntile" -> (Analytics.q21Ntile _),
    "q22_correlated_subq" -> (Analytics.q22CorrelatedSubquery _),
    "q23_time_rollup" -> (Analytics.q23TimeRollup _),
    "q24_collect_arrays" -> (Analytics.q24CollectArrays _),
    "q25_null_semantics" -> (Analytics.q25NullSemantics _),
    "q26_grouping_sets" -> (Analytics.q26GroupingSets _),
    "q27_range_frame" -> (Analytics.q27RangeFrame _),
    "q28_window_nav" -> (Analytics.q28WindowNav _),
    "q29_stats" -> (Analytics.q29Stats _),
    "q30_anomaly" -> (Analytics.q30Anomaly _),
    "q31_sample" -> (Analytics.q31Sample _),
    "q32_latest_per_key" -> (Analytics.q32LatestPerKey _),
    "q36_approx_quantile" -> (Analytics.q36ApproxQuantile _),
    "pipe_clean_corpus" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeCleanCorpus(s, d)),
    "q33_except" -> (Analytics.q33Except _),
    "q34_date_arith" -> (Analytics.q34DateArith _),
    "q35_regex_extract" -> (Analytics.q35RegexExtract _),
    "txt_normalize" -> (TextAnalysis.txtNormalize _),
    "txt_bigrams" -> ((s: SparkSession, d: String) => TextAnalysis.txtBigrams(s, d)),
    "txt_vocab" -> (TextAnalysis.txtVocab _),
    "txt_len_hist" -> (TextAnalysis.txtLenHist _),
    "txt_pii_mask" -> (TextAnalysis.txtPiiMask _),
    "sim_quantize" -> (Similarity.simQuantize _),
    "sim_centroid_dist" -> (Similarity.simCentroidDist _),
    "dd_keepers" -> (Dedup.ddKeepers _),
    "sim_kmeans_step" -> (Similarity.simKmeansStep _),
    "odns_typing" -> (OdnsOps.odnsTyping _),
    "odns_scan_date" -> (OdnsOps.odnsScanDate _),
    "dd_exact" -> (Dedup.ddExact _),
    "dd_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.ddMinhashLsh(s, d)),
    "dd_simhash" -> (Dedup.ddSimhash _),
    "dd_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ddNgramJaccard(s, d)),
    "dd_embed_cos" -> ((s: SparkSession, d: String) => Dedup.ddEmbedCos(s, d)),
    "dd_components" -> ((s: SparkSession, d: String) => Dedup.ddComponents(s, d)),
    // the dup-density guard config: hot shingles (df > 100) stop-listed
    // before the pair self-join — the input-side bound for the sf1
    // Σdf² blowup; cap replicated exactly in the oracle. Cap tuned ON
    // the dup-dense sf1 itself: 20 zeroed its pair graph, 100 drops
    // 5.2k hot shingles and 58% of the pair input while keeping every
    // replica family connected (both guard sides live at sf1)
    "dd_components_capped" ->
      ((s: SparkSession, d: String) => Dedup.ddComponents(s, d, shingleDfCap = Some(100))),
    "dd_edit_distance" -> (Dedup.ddEditDistance _),
    "dd_edit_gate" -> ((s: SparkSession, d: String) => Dedup.ddEditGate(s, d)),
    "dd_cdc_chunks" -> ((s: SparkSession, d: String) => Dedup.ddCdcChunks(s, d)),
    "dd_chunk_containment" -> ((s: SparkSession, d: String) => Dedup.ddChunkContainment(s, d)),
    "dd_cdc_ingest" -> ((s: SparkSession, d: String) => Dedup.ddCdcIngest(s, d)),
    "q169_runs_up_down" -> (Analytics.q169RunsUpDown _),
    "q170_mantel_haenszel" -> (Analytics.q170MantelHaenszel _),
    "q171_theil_sen" -> (Analytics.q171TheilSen _),
    "q172_mad_outliers" -> (Analytics.q172MadOutliers _),
    "txt_theil_u" -> (TextAnalysis.txtTheilU _),
    "q173_durbin_watson" -> (Analytics.q173DurbinWatson _),
    "q174_turning_points" -> (Analytics.q174TurningPoints _),
    "q175_bartels_rank" -> (Analytics.q175BartelsRank _),
    "q176_kpss" -> (Analytics.q176KpssInputs _),
    "q177_hits" -> (Analytics.q177Hits _),
    "dd_bbit_minhash" -> (Dedup.ddBbitMinhash _),
    "mm_phash_hamming_hist" -> ((s: SparkSession, d: String) => Multimodal.mmPhashHammingHist(s, d)),
    "sim_bq_rerank" -> ((s: SparkSession, d: String) => Similarity.simBqRerank(s, d)),
    "sim_kmeanspar_step" -> ((s: SparkSession, d: String) => Similarity.simKmeansParStep(s, d)),
    "q178_gamma_somers" -> (Analytics.q178GammaSomers _),
    "q179_cliffs_delta" -> (Analytics.q179CliffsDelta _),
    "q180_ljung_box" -> (Analytics.q180LjungBox _),
    "q181_sign_test" -> (Analytics.q181SignTest _),
    "sim_ivf_imbalance" -> (Similarity.simIvfImbalance _),
    "pipe_class_weights" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeClassWeights(s, d)),
    "pipe_cluster_split" -> (CorpusPipeline.pipeClusterSplit _),
    "sim_hard_negatives" -> ((s: SparkSession, d: String) => Similarity.simHardNegatives(s, d)),
    "sim_hard_negatives_ivf" -> ((s: SparkSession, d: String) => Similarity.simHardNegativesIvf(s, d)),
    "pipe_source_drift" -> ((s: SparkSession, d: String) => TextAnalysis.pipeSourceDrift(s, d)),
    "q160_kruskal_wallis" -> (Analytics.q160KruskalWallis _),
    "pipe_split_leakage" -> (CorpusPipeline.pipeSplitLeakage _),
    "sim_pq_rerank" -> ((s: SparkSession, d: String) => Similarity.simPqRerank(s, d)),
    "q161_jonckheere" -> (Analytics.q161Jonckheere _),
    "txt_yule_k" -> (TextAnalysis.txtYuleK _),
    "mm_frame_energy" -> ((s: SparkSession, d: String) => Multimodal.mmFrameEnergy(s, d)),
    "q162_cochran_armitage" -> (Analytics.q162CochranArmitage _),
    "q163_page_trend" -> (Analytics.q163PageTrend _),
    "txt_top_terms" -> ((s: SparkSession, d: String) => TextAnalysis.txtTopTerms(s, d)),
    "sim_topk_bruteforce" -> (Similarity.simTopkBruteforce _),
    "sim_ivf_ann" -> (Similarity.simIvfAnn _),
    "sim_lsh_ann" -> (Similarity.simLshAnn _),
    "sim_lsh_multiprobe" -> (Similarity.simLshMultiProbe _),
    "txt_quality" -> (TextAnalysis.txtQuality _),
    "txt_langid" -> (TextAnalysis.txtLangid _),
    "txt_tokens" -> (TextAnalysis.txtTokens _),
    "txt_fingerprint" -> (TextAnalysis.txtFingerprint _),
    "mm_binary_meta" -> (Multimodal.mmBinaryMeta _),
    "mm_decode_stub" -> (Multimodal.mmDecodeStub _),
    "mm_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.mmFrameSample(s, d)),
    "dd_decontaminate" -> (Dedup.ddDecontaminate _),
    "q37_stratified_sample" -> (Analytics.q37StratifiedSample _),
    "txt_bm25" -> ((s: SparkSession, d: String) => TextAnalysis.txtBm25(s, d)),
    "txt_gopher" -> (TextAnalysis.txtGopher _),
    "q38_interval_join" -> (Analytics.q38IntervalJoin _),
    "q39_checksum" -> (Analytics.q39Checksum _),
    "dd_semdedup" -> ((s: SparkSession, d: String) => Dedup.ddSemdedup(s, d)),
    "dd_hot_spans" -> ((s: SparkSession, d: String) => Dedup.ddHotSpans(s, d)),
    "txt_unigram_score" -> (TextAnalysis.txtUnigramScore _),
    "pipe_pack_sequences" -> ((s: SparkSession, d: String) => CorpusPipeline.pipePackSequences(s, d)),
    "q40_lag_features" -> (Analytics.q40LagFeatures _),
    "q41_column_stats" -> (Analytics.q41ColumnStats _),
    "q42_salted_join" -> (Analytics.q42SaltedJoin _),
    "q43_funnel" -> (Analytics.q43Funnel _),
    "txt_inverted_index" -> (TextAnalysis.txtInvertedIndex _),
    "txt_oov_rate" -> ((s: SparkSession, d: String) => TextAnalysis.txtOovRate(s, d)),
    "pipe_chunk_docs" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeChunkDocs(s, d)),
    "q44_argmax" -> (Analytics.q44Argmax _),
    "q45_sliding_distinct" -> (Analytics.q45SlidingDistinct _),
    "dd_fuzzy_match" -> ((s: SparkSession, d: String) => Dedup.ddFuzzyMatch(s, d)),
    "mm_embed_stub" -> ((s: SparkSession, d: String) => Multimodal.mmEmbedStub(s, d)),
    "q46_gap_fill" -> (Analytics.q46GapFill _),
    "q47_cume_dist" -> (Analytics.q47CumeDist _),
    "q49_rolling_median" -> (Analytics.q49RollingMedian _),
    "q56_markov" -> (Analytics.q56Markov _),
    "q50_dq_audit" -> (Analytics.q50DqAudit _),
    "q51_scd2" -> (Analytics.q51Scd2 _),
    "q55_copurchase" -> ((s: SparkSession, d: String) => Analytics.q55Copurchase(s, d)),
    "q52_range_band" -> (Analytics.q52RangeBandJoin _),
    "txt_tokenize_ids" -> (TextAnalysis.txtTokenizeIds _),
    "pipe_mix_corpus" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeMixCorpus(s, d)),
    "q57_pagerank" -> ((s: SparkSession, d: String) => Analytics.q57Pagerank(s, d)),
    "q59_retention" -> (Analytics.q59Retention _),
    "q61_streaks" -> (Analytics.q61Streaks _),
    "q63_topk_per_group" -> ((s: SparkSession, d: String) => Analytics.q63TopkPerGroup(s, d)),
    "q58_triangles" -> ((s: SparkSession, d: String) => Analytics.q58Triangles(s, d)),
    "q62_ab_test" -> (Analytics.q62AbTest _),
    "sim_matryoshka" -> ((s: SparkSession, d: String) => Similarity.simMatryoshka(s, d)),
    "q64_interval_merge" -> (Analytics.q64IntervalMerge _),
    "q65_debounce" -> (Analytics.q65Debounce _),
    "q66_gini" -> (Analytics.q66Gini _),
    "q67_abc_class" -> (Analytics.q67AbcClass _),
    "q68_benford" -> (Analytics.q68Benford _),
    "dd_containment" -> ((s: SparkSession, d: String) => Dedup.ddContainment(s, d)),
    "txt_readability" -> (TextAnalysis.txtReadability _),
    "txt_kn_counts" -> ((s: SparkSession, d: String) => TextAnalysis.txtKnCounts(s, d)),
    "pipe_span_corruption" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeSpanCorruption(s, d)),
    "q69_chi2" -> (Analytics.q69Chi2 _),
    "pipe_sft_render" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeSftRender(s, d)),
    "dd_minhash_sigs" -> (Dedup.ddMinhashSigs _),
    "q71_share_of_parent" -> (Analytics.q71ShareOfParent _),
    "q72_yoy" -> (Analytics.q72YoY _),
    "dd_incremental" -> ((s: SparkSession, d: String) => Dedup.ddIncremental(s, d)),
    // the 100 TB configurations, oracle-exercised (not just spec'd):
    // the skew-capped LSH run (cap replicated exactly in the oracle) and
    // the sign-projection-refined cosine run (hyperplanes exported into
    // the oracle SQL as literals from the same fixed seed)
    "dd_minhash_lsh_capped" ->
      ((s: SparkSession, d: String) => Dedup.ddMinhashLsh(s, d, bucketCap = Some(8))),
    "dd_embed_cos_lsh" ->
      ((s: SparkSession, d: String) => Dedup.ddEmbedCos(s, d, lshBits = 4)),
    // the lake flow end-to-end: upsert history signatures to a fresh
    // parquet table, then dedup the new batch against the TABLE — the
    // result must equal dd_incremental (same oracle), proving the
    // persisted-signature path loses nothing vs recomputing history
    "dd_incremental_lake" -> ((s: SparkSession, d: String) => {
      val lake = java.nio.file.Files
        .createTempDirectory("graft_siglake").toString + "/sigs"
      Dedup.sigLakeUpsert(s, d, lake, maxDocId = 400L)
      Dedup.ddIncrementalFromLake(s, d, lake)
    }),
    "q73_reservoir" -> ((s: SparkSession, d: String) => Analytics.q73Reservoir(s, d)),
    "pipe_quality_report" -> (CorpusPipeline.pipeQualityReport _),
    "q74_regression" -> (Analytics.q74Regression _),
    "q75_wma" -> (Analytics.q75Wma _),
    "q100_ema" -> (Analytics.q100Ema _),
    "q102_mode" -> (Analytics.q102Mode _),
    "q103_spearman" -> (Analytics.q103Spearman _),
    "q104_weighted_median" -> (Analytics.q104WeightedMedian _),
    "q105_histogram" -> ((s: SparkSession, d: String) => Analytics.q105Histogram(s, d)),
    "q106_response_time" -> (Analytics.q106ResponseTime _),
    "q108_ks_test" -> (Analytics.q108KsTest _),
    "q111_runs_test" -> (Analytics.q111RunsTest _),
    "q112_mann_whitney" -> (Analytics.q112MannWhitney _),
    "txt_langid_confusion" -> (TextAnalysis.txtLangidConfusion _),
    "mm_chunk_media" -> ((s: SparkSession, d: String) => Multimodal.mmChunkMedia(s, d)),
    "sim_pq_codes" -> (Similarity.simPqCodes _),
    "pipe_dataset_card" -> (CorpusPipeline.pipeDatasetCard _),
    "q114_topk_ties" -> ((s: SparkSession, d: String) => Analytics.q114TopkTies(s, d)),
    "q116_quintile_transition" -> (Analytics.q116QuintileTransition _),
    "dd_bloom_prefilter" -> ((s: SparkSession, d: String) => Dedup.ddBloomPrefilter(s, d)),
    "txt_code_detect" -> (TextAnalysis.txtCodeDetect _),
    "dd_lsh_tuning_curve" -> (Dedup.ddLshTuningCurve _),
    "pipe_epoch_shuffle" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeEpochShuffle(s, d)),
    "mm_phash_dup" -> ((s: SparkSession, d: String) => Multimodal.mmPhashDup(s, d)),
    "mm_phash_dup_wide" -> ((s: SparkSession, d: String) => Multimodal.mmPhashDupWide(s, d)),
    "q76_gini_impurity" -> (Analytics.q76GiniImpurity _),
    "q77_hhi" -> (Analytics.q77Hhi _),
    "q79_bollinger" -> (Analytics.q79Bollinger _),
    "q80_dow_profile" -> (Analytics.q80DowProfile _),
    "q83_winsorize" -> (Analytics.q83Winsorize _),
    "dd_cluster_sizes" -> (Dedup.ddClusterSizes _),
    "sim_range_search" -> ((s: SparkSession, d: String) => Similarity.simRangeSearch(s, d)),
    "mm_exact_dup" -> (Multimodal.mmExactDup _),
    "txt_ttr" -> (TextAnalysis.txtTtr _),
    "pipe_interleave" -> (CorpusPipeline.pipeInterleave _),
    "q84_cusum" -> (Analytics.q84Cusum _),
    "q85_autocorr" -> (Analytics.q85Autocorr _),
    "q86_skyline" -> (Analytics.q86Skyline _),
    "txt_hapax" -> (TextAnalysis.txtHapax _),
    "pipe_curriculum" -> (CorpusPipeline.pipeCurriculum _),
    "sim_knn_graph" -> ((s: SparkSession, d: String) => Similarity.simKnnGraph(s, d)),
    "sim_nsw_topk" -> ((s: SparkSession, d: String) => Similarity.simNswTopk(s, d)),
    "sim_nsw_recall" -> ((s: SparkSession, d: String) => Similarity.simNswRecall(s, d)),
    "dd_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.ddSimhashPairs(s, d)),
    "q87_median_gap" -> (Analytics.q87MedianGap _),
    "txt_repetition" -> (TextAnalysis.txtRepetition _),
    "dd_jaccard_est" -> (Dedup.ddJaccardEst _),
    "q88_rfm" -> (Analytics.q88Rfm _),
    "pipe_pack_stats" -> ((s: SparkSession, d: String) => CorpusPipeline.pipePackStats(s, d)),
    "q89_cohort_ltv" -> (Analytics.q89CohortLtv _),
    "q90_attribution" -> (Analytics.q90Attribution _),
    "dd_dup_rate_by_source" -> (Dedup.ddDupRateBySource _),
    "sim_recall_report" -> (Similarity.simRecallReport _),
    "q91_forecast_naive" -> (Analytics.q91ForecastNaive _),
    "q92_outlier_mad" -> (Analytics.q92OutlierMad _),
    "pipe_token_budget" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeTokenBudget(s, d)),
    "dd_lsh_recall" -> (Dedup.ddLshRecall _),
    "txt_bpe_pairs" -> ((s: SparkSession, d: String) => TextAnalysis.txtBpePairs(s, d)),
    "txt_bpe_merges" -> ((s: SparkSession, d: String) => TextAnalysis.txtBpeMerges(s, d)),
    "txt_bpe_encode" -> ((s: SparkSession, d: String) => TextAnalysis.txtBpeEncode(s, d)),
    "q93_time_range_frame" -> (Analytics.q93TimeRangeFrame _),
    "q94_typed_avg" -> (Analytics.q94TypedAvg _),
    "q95_sql_front_door" -> (Analytics.q95SqlFrontDoor _),
    "q96_session_window" -> (Analytics.q96SessionWindow _),
    "q97_asof_operator" -> (Analytics.q97AsofOperator _),
    "pipe_e2e_corpus" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeE2eCorpus(s, d)),
    "q98_kmv_distinct" -> ((s: SparkSession, d: String) => Analytics.q98KmvDistinct(s, d)),
    "q99_decile_lift" -> (Analytics.q99DecileLift _),
    "dd_near_keepers" -> (Dedup.ddNearKeepers _),
    "pipe_split" -> (CorpusPipeline.pipeSplit _),
    "txt_novelty" -> (TextAnalysis.txtNovelty _),
    "q101_peak_hour" -> (Analytics.q101PeakHour _),
    "mm_kind_profile" -> (Multimodal.mmKindProfile _),
    "dd_shingle_df_profile" -> (Dedup.ddShingleDfProfile _),
    "pipe_length_buckets" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeLengthBuckets(s, d)),
    "q117_kendall" -> (Analytics.q117Kendall _),
    "q118_mann_kendall" -> (Analytics.q118MannKendall _),
    "q119_cramers_v" -> (Analytics.q119CramersV _),
    "q120_hodges_lehmann" -> (Analytics.q120HodgesLehmann _),
    "txt_simpson" -> (TextAnalysis.txtSimpson _),
    "txt_perplexity" -> (TextAnalysis.txtPerplexity _),
    "txt_kl_divergence" -> (TextAnalysis.txtKlDivergence _),
    "txt_entropy_filter" -> ((s: SparkSession, d: String) => TextAnalysis.txtEntropyFilter(s, d)),
    "txt_doc_perplexity" -> ((s: SparkSession, d: String) => TextAnalysis.txtDocPerplexity(s, d)),
    "txt_js_divergence" -> (TextAnalysis.txtJsDivergence _),
    "txt_cond_entropy" -> (TextAnalysis.txtCondEntropy _),
    "txt_doc_kn_perplexity" -> ((s: SparkSession, d: String) => TextAnalysis.txtDocKnPerplexity(s, d)),
    "txt_cond_entropy3" -> (TextAnalysis.txtCondEntropy3 _),
    "txt_doc_kn3_perplexity" -> ((s: SparkSession, d: String) => TextAnalysis.txtDocKn3Perplexity(s, d)),
    "txt_dsir_weights" -> ((s: SparkSession, d: String) => TextAnalysis.txtDsirWeights(s, d)),
    "txt_dsir_bigram" -> ((s: SparkSession, d: String) => TextAnalysis.txtDsirBigram(s, d)),
    "pipe_dsir_topk" -> ((s: SparkSession, d: String) => TextAnalysis.pipeDsirTopk(s, d)),
    "dd_semantic_decontaminate" -> ((s: SparkSession, d: String) => Dedup.ddSemanticDecontaminate(s, d)),
    "pipe_quality_funnel" -> (CorpusPipeline.pipeQualityFunnel _),
    "pipe_quality_verdict" -> (CorpusPipeline.pipeQualityVerdict _),
    "txt_langid_kappa" -> (TextAnalysis.txtLangidKappa _),
    "txt_burstiness" -> ((s: SparkSession, d: String) => TextAnalysis.txtBurstiness(s, d)),
    "pipe_temp_sampling" -> (CorpusPipeline.pipeTempSampling _),
    "q121_kaplan_meier" -> (Analytics.q121KaplanMeier _),
    "txt_vocab_growth" -> ((s: SparkSession, d: String) => TextAnalysis.txtVocabGrowth(s, d)),
    "sim_pq_adc" -> ((s: SparkSession, d: String) => Similarity.simPqAdc(s, d)),
    "sim_ivfpq" -> ((s: SparkSession, d: String) => Similarity.simIvfpq(s, d)),
    "sim_ivfpq_recall" -> ((s: SparkSession, d: String) => Similarity.simIvfpqRecall(s, d)),
    "sim_ivfpq_probe_curve" -> ((s: SparkSession, d: String) => Similarity.simIvfpqProbeCurve(s, d)),
    "q122_correlogram" -> (Analytics.q122Correlogram _),
    "sim_pq_recall" -> ((s: SparkSession, d: String) => Similarity.simPqRecall(s, d)),
    "txt_collocations" -> ((s: SparkSession, d: String) => TextAnalysis.txtCollocations(s, d)),
    "txt_vocab_overlap" -> (TextAnalysis.txtVocabOverlap _),
    "txt_chao1" -> (TextAnalysis.txtChao1 _),
    "txt_good_turing" -> ((s: SparkSession, d: String) => TextAnalysis.txtGoodTuring(s, d)),
    "q123_assortativity" -> (Analytics.q123Assortativity _),
    "q124_degree_hist" -> (Analytics.q124DegreeHist _),
    "q126_bfs_hops" -> ((s: SparkSession, d: String) => Analytics.q126BfsHops(s, d)),
    "q125_lorenz" -> (Analytics.q125Lorenz _),
    "q127_markov_accuracy" -> (Analytics.q127MarkovAccuracy _),
    "q128_atkinson" -> (Analytics.q128Atkinson _),
    "pipe_weighted_sample" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeWeightedSample(s, d)),
    "mm_tile_layout" -> ((s: SparkSession, d: String) => Multimodal.mmTileLayout(s, d)),
    "txt_rank_fusion" -> ((s: SparkSession, d: String) => TextAnalysis.txtRankFusion(s, d)),
    "q129_eta_squared" -> (Analytics.q129EtaSquared _),
    "txt_tv_distance" -> (TextAnalysis.txtTvDistance _),
    "pipe_k_anonymity" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeKAnonymity(s, d)),
    "sim_inertia" -> (Similarity.simInertia _),
    "dd_cross_source_matrix" -> (Dedup.ddCrossSourceMatrix _),
    "txt_ngram_coverage" -> (TextAnalysis.txtNgramCoverage _),
    "q130_link_prediction" -> ((s: SparkSession, d: String) => Analytics.q130LinkPrediction(s, d)),
    "sim_hamming_topk" -> ((s: SparkSession, d: String) => Similarity.simHammingTopk(s, d)),
    "pipe_l_diversity" -> (CorpusPipeline.pipeLDiversity _),
    "sim_silhouette" -> (Similarity.simSilhouette _),
    "q131_changepoint" -> ((s: SparkSession, d: String) => Analytics.q131Changepoint(s, d)),
    "mm_aspect_buckets" -> (Multimodal.mmAspectBuckets _),
    "q132_wilcoxon" -> (Analytics.q132Wilcoxon _),
    "q133_auc" -> (Analytics.q133Auc _),
    "q135_var_ratio" -> (Analytics.q135VarRatio _),
    "q134_cvm" -> (Analytics.q134Cvm _),
    "q136_holt" -> (Analytics.q136Holt _),
    "q137_theil_sen" -> (Analytics.q137TheilSen _),
    "txt_zipf" -> ((s: SparkSession, d: String) => TextAnalysis.txtZipf(s, d)),
    "q139_kcore" -> ((s: SparkSession, d: String) => Analytics.q139Kcore(s, d)),
    "txt_pr_curve" -> ((s: SparkSession, d: String) => TextAnalysis.txtPrCurve(s, d)),
    "pipe_rlhf_pairs" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeRlhfPairs(s, d)),
    "pipe_contrastive_batches" -> (CorpusPipeline.pipeContrastiveBatches _),
    "q138_control_chart" -> (Analytics.q138ControlChart _),
    "q140_modularity" -> (Analytics.q140Modularity _),
    "q141_haar" -> (Analytics.q141Haar _),
    "q142_ccf" -> (Analytics.q142Ccf _),
    "q143_mcnemar" -> (Analytics.q143Mcnemar _),
    "q144_odds_ratio" -> (Analytics.q144OddsRatio _),
    "q145_logrank" -> (Analytics.q145Logrank _),
    "sim_hubness" -> ((s: SparkSession, d: String) => Similarity.simHubness(s, d)),
    "sim_covariance" -> (Similarity.simCovariance _),
    "txt_sentence_stats" -> (TextAnalysis.txtSentenceStats _),
    "dd_quality_keepers" -> (Dedup.ddQualityKeepers _),
    "dd_dup_spans" -> ((s: SparkSession, d: String) => Dedup.ddDupSpans(s, d)),
    "q146_levene" -> (Analytics.q146Levene _),
    "q147_open_orders" -> (Analytics.q147OpenOrders _),
    "q148_qq_decile" -> (Analytics.q148QqDecile _),
    "q149_seq_patterns" -> ((s: SparkSession, d: String) => Analytics.q149SeqPatterns(s, d)),
    "q150_seasonal_dow" -> (Analytics.q150SeasonalDow _),
    "txt_kn_prob" -> ((s: SparkSession, d: String) => TextAnalysis.txtKnProb(s, d)),
    "sim_power_iteration" -> (Similarity.simPowerIteration _),
    "q151_hurst_inputs" -> (Analytics.q151HurstInputs _),
    "q152_friedman" -> (Analytics.q152Friedman _),
    "dd_soft_weights" -> (Dedup.ddSoftWeights _),
    "sim_centroid_shift" -> (Similarity.simCentroidShift _),
    "q153_cochran_q" -> (Analytics.q153CochranQ _),
    "txt_doc_keywords" -> ((s: SparkSession, d: String) => TextAnalysis.txtDocKeywords(s, d)),
    "q154_grubbs_inputs" -> (Analytics.q154GrubbsInputs _),
    "dd_lsh_precision" -> (Dedup.ddLshPrecision _),
    "sim_norm2_hist" -> ((s: SparkSession, d: String) => Similarity.simNorm2Hist(s, d)),
    "sim_maxsim" -> ((s: SparkSession, d: String) => Similarity.simMaxsim(s, d)),
    "sim_maxsim_ragged" -> ((s: SparkSession, d: String) => Similarity.simMaxsimRagged(s, d)),
    "sim_mmr" -> ((s: SparkSession, d: String) => Similarity.simMmr(s, d)),
    "q164_kendall_w" -> (Analytics.q164KendallW _),
    "q166_page_hinkley" -> (Analytics.q166PageHinkley _),
    "q167_ansari_bradley" -> (Analytics.q167AnsariBradley _),
    "q168_lpa_step" -> ((s: SparkSession, d: String) => Analytics.q168LpaStep(s, d)),
    "q168_lpa4" -> ((s: SparkSession, d: String) => Analytics.q168LpaStep(s, d, iters = 4)),
    "mm_silence_trim" -> ((s: SparkSession, d: String) => Multimodal.mmSilenceTrim(s, d)),
    "txt_rake" -> ((s: SparkSession, d: String) => TextAnalysis.txtRake(s, d)),
    "txt_rake_lang" -> ((s: SparkSession, d: String) => TextAnalysis.txtRakeLang(s, d)),
    "txt_textrank" -> ((s: SparkSession, d: String) => TextAnalysis.txtTextrank(s, d)),
    "q165_mood_median" -> (Analytics.q165MoodMedian _),
    "pipe_t_closeness" -> ((s: SparkSession, d: String) => CorpusPipeline.pipeTCloseness(s, d)),
    "mm_scene_cut" -> ((s: SparkSession, d: String) => Multimodal.mmSceneCut(s, d)),
    "q155_binary_seg" -> (Analytics.q155BinarySeg _),
    "txt_fertility" -> (TextAnalysis.txtFertility _),
    "sim_ivf_probe_curve" -> ((s: SparkSession, d: String) => Similarity.simIvfProbeCurve(s, d)),
    "q156_mk_seasonal" -> (Analytics.q156MkSeasonal _),
    "txt_lid_trigram" -> ((s: SparkSession, d: String) => TextAnalysis.txtLidTrigram(s, d)),
    "dd_dup_mass_report" -> (Dedup.ddDupMassReport _),
    "q157_two_way_anova" -> (Analytics.q157TwoWayAnova _),
    "pipe_code_mix" -> (CorpusPipeline.pipeCodeMixReport _),
    "q158_cuped" -> (Analytics.q158Cuped _),
    "pipe_boilerplate_exposure" -> (CorpusPipeline.pipeBoilerplateExposure _),
    "q159_did_cells" -> (Analytics.q159DidCells _),
    "sim_pq_residual" -> (Similarity.simPqResidual _),
    "txt_mattr" -> ((s: SparkSession, d: String) => TextAnalysis.txtMattr(s, d)),
    "dd_oph_sigs" -> (Dedup.ddOphSigs _),
    "q182_adf_inputs" -> (Analytics.q182AdfInputs _),
    "q184_brier_cells" -> (Analytics.q184BrierCells _),
    "q183_pacf" -> (Analytics.q183Pacf _),
    "q185_nelson_aalen" -> (Analytics.q185NelsonAalen _),
    "q186_mase" -> (Analytics.q186Mase _),
    "q187_harmonic" -> ((s: SparkSession, d: String) => Analytics.q187Harmonic(s, d)),
    "sim_ari" -> (Similarity.simAri _),
    "txt_mtld" -> (TextAnalysis.txtMtld _),
    "sim_calinski" -> (Similarity.simCalinski _),
    "sim_cluster_purity" -> (Similarity.simClusterPurity _),
    "sim_triplets" -> (Similarity.simTriplets _),
    "sim_dbscan_cores" -> ((s: SparkSession, d: String) => Similarity.simDbscanCores(s, d)),
    "sim_dbscan_cores_capped" ->
      ((s: SparkSession, d: String) => Similarity.simDbscanCoresCapped(s, d)),
    "q190_pettitt" -> (Analytics.q190Pettitt _),
    "sim_spherical_step" -> (Similarity.simSphericalStep _),
    "txt_sichel" -> (TextAnalysis.txtSichel _),
    "txt_honore" -> (TextAnalysis.txtHonore _),
    "q188_cohens_d" -> (Analytics.q188CohensD _),
    "q189_gehan" -> (Analytics.q189Gehan _),
    "sim_rp_tree" -> (Similarity.simRpTree _),
    "sim_rp_recall" -> (Similarity.simRpRecall _),
    "q191_jarque_bera" -> (Analytics.q191JarqueBera _),
    "q192_clustering_coeff" -> ((s: SparkSession, d: String) => Analytics.q192ClusteringCoeff(s, d)),
    "q193_cox_stuart" -> (Analytics.q193CoxStuart _),
    "q194_welch_t" -> (Analytics.q194WelchT _),
    "sim_knn_accuracy" -> ((s: SparkSession, d: String) => Similarity.simKnnAccuracy(s, d)),
    "dd_oph_lsh" -> (Dedup.ddOphLsh _),
    "sim_davies_bouldin" -> (Similarity.simDaviesBouldin _),
    "q195_block_maxima" -> (Analytics.q195BlockMaxima _),
    "q196_cvar" -> (Analytics.q196Cvar _),
    "q197_partial_corr" -> (Analytics.q197PartialCorr _),
    "q198_cronbach_alpha" -> (Analytics.q198CronbachAlpha _),
    "q199_cooks_distance" -> (Analytics.q199CooksDistance _),
    "q200_rich_club" -> (Analytics.q200RichClub _),
    "txt_herdan" -> (TextAnalysis.txtHerdan _),
    "sim_xie_beni" -> (Similarity.simXieBeni _),
    "q201_adamic_adar" -> ((s: SparkSession, d: String) => Analytics.q201AdamicAdar(s, d)),
    "q202_bowker" -> (Analytics.q202Bowker _),
    "q203_dixon_q" -> (Analytics.q203DixonQ _),
    "q204_kendall_tau_b" -> (Analytics.q204KendallTauB _),
    "txt_guiraud" -> (TextAnalysis.txtGuiraud _),
    "dd_oph_incremental" -> ((s: SparkSession, d: String) => Dedup.ddOphIncremental(s, d)),
    "q205_anderson_darling" -> (Analytics.q205AndersonDarling _),
    "q206_quade" -> (Analytics.q206Quade _),
    "q207_theil_index" -> (Analytics.q207TheilIndex _),
    "q208_dispersion" -> (Analytics.q208Dispersion _),
    "txt_dugast" -> (TextAnalysis.txtDugast _),
    "sim_kmeans_bic" -> (Similarity.simKmeansBic _),
    "sim_hnsw_topk" -> ((s: SparkSession, d: String) => Similarity.simHnswTopk(s, d)),
    "sim_hnsw_recall" -> ((s: SparkSession, d: String) => Similarity.simHnswRecall(s, d)),
    "q209_brunner_munzel" -> (Analytics.q209BrunnerMunzel _),
    "txt_summer" -> (TextAnalysis.txtSummer _),
    "sim_hopkins" -> ((s: SparkSession, d: String) => Similarity.simHopkins(s, d)),
  )

  /** DuckDB-dialect oracle SQL per query key; same aliases, same ORDER BY.
    * Numeric parity: decimal-exact aggregation, double only at the end
    * (see Analytics scaladoc). Keys absent here get a rows-only check. */
  // shared by dd_incremental and dd_incremental_lake: the lake variant
  // persists history signatures to parquet first but must yield the
  // exact same candidate pairs
  private val incrementalDedupOracle: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
      |), sh AS (
      | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
      | FROM toks WHERE len(t) >= 3
      |), sig AS (
      | SELECT doc_id, list_transform(range(0, 8), i ->
      |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
      | FROM sh
      |), bands AS (
      | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
      | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
      |)
      |SELECT n.doc_id AS doc_new, h.doc_id AS doc_old
      |FROM bands n JOIN bands h ON n.bh = h.bh AND n.b = h.b
      |WHERE n.doc_id >= 400 AND h.doc_id < 400
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Oracle for the MMR diverse top-k: the greedy is unrolled into k
    * plain CTE stages (pick argmax, fold the pick's sims into every
    * survivor's running max) — no recursion, no window in a recursive
    * term. All sims are micro-floored once in `s`/`pr`, so every stage
    * after is exact integer arithmetic identical to the operator's. */
  private def mmrOracle(poolK: Int, k: Int): String = {
    def d64(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double)))"
    def nrm(a: String) = s"sqrt(${d64(a, a)})"
    val head =
      s"""WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
         |s AS (
         | SELECT q.qid, e.vec_id, e.embedding,
         |  cast(floor(1000000 * (${d64("qe", "e.embedding")} / (${nrm("qe")} * ${nrm("e.embedding")}))) as bigint) rel_micro
         | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
         |), pool AS (
         | SELECT qid, vec_id, embedding, rel_micro FROM (
         |  SELECT s.*, row_number() OVER (PARTITION BY qid ORDER BY rel_micro DESC, vec_id) rn FROM s
         | ) t WHERE rn <= $poolK
         |), pr AS (
         | SELECT a.qid, a.vec_id ca, b.vec_id cb,
         |  cast(floor(1000000 * (${d64("a.embedding", "b.embedding")} / (${nrm("a.embedding")} * ${nrm("b.embedding")}))) as bigint) psim
         | FROM pool a JOIN pool b ON a.qid = b.qid AND a.vec_id <> b.vec_id
         |), r0 AS (SELECT qid, vec_id, rel_micro FROM pool),
         |p1 AS (
         | SELECT qid, 1 AS step, vec_id, rel_micro, cast(NULL as bigint) msim FROM (
         |  SELECT r0.*, row_number() OVER (PARTITION BY qid ORDER BY rel_micro DESC, vec_id) rn FROM r0
         | ) t WHERE rn = 1
         |)""".stripMargin
    val stages = (2 to k).map { i =>
      val rDef =
        if (i == 2)
          """r1 AS (
            | SELECT r.qid, r.vec_id, r.rel_micro, pr.psim AS msim
            | FROM r0 r JOIN p1 ON p1.qid = r.qid AND r.vec_id <> p1.vec_id
            | JOIN pr ON pr.qid = r.qid AND pr.ca = r.vec_id AND pr.cb = p1.vec_id
            |)""".stripMargin
        else
          s"""r${i - 1} AS (
             | SELECT r.qid, r.vec_id, r.rel_micro, greatest(r.msim, pr.psim) AS msim
             | FROM r${i - 2} r JOIN p${i - 1} ON p${i - 1}.qid = r.qid AND r.vec_id <> p${i - 1}.vec_id
             | JOIN pr ON pr.qid = r.qid AND pr.ca = r.vec_id AND pr.cb = p${i - 1}.vec_id
             |)""".stripMargin
      val pDef =
        s"""p$i AS (
           | SELECT qid, $i AS step, vec_id, rel_micro, msim FROM (
           |  SELECT r${i - 1}.*, row_number() OVER (PARTITION BY qid ORDER BY rel_micro - msim DESC, vec_id) rn FROM r${i - 1}
           | ) t WHERE rn = 1
           |)""".stripMargin
      rDef + ",\n" + pDef
    }.mkString(",\n")
    val unions = (1 to k).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")
    head + ",\n" + stages + "\n" +
      """SELECT qid AS query_id, cast(step as bigint) AS step, vec_id, rel_micro,
        | msim AS max_sim_micro, rel_micro - coalesce(msim, 0) AS mmr_micro
        |FROM (""".stripMargin + unions +
      ") u ORDER BY query_id, step"
  }

  /** Oracle for the lshBits-refined embedding near-dup: the hyperplanes
    * are regenerated here from the SAME fixed seed the operator uses
    * (scala.util.Random(0x5eed), 128 gaussians per plane, first 64 used
    * at the testdata dimension) and exported as double literals —
    * Double.toString round-trips bit-exactly through DuckDB's parser,
    * and the dot product is the same left-to-right IEEE fold, so the
    * sign (and therefore the cell id) is identical in both engines. */
  private def embedCosLshOracle(lshBits: Int): String = {
    val rnd = new scala.util.Random(0x5eed)
    val cell = (0 until lshBits).map { i =>
      val plane = Seq.fill(128)(rnd.nextGaussian()).take(64)
      val dot = plane.zipWithIndex.map { case (v, j) =>
        s"cast(embedding[${j + 1}] as double) * ($v)"
      }.mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH c AS (
       | SELECT vec_id, label, embedding, $cell AS cell FROM embeddings
       |), s AS (
       | SELECT a.vec_id va, b.vec_id vb,
       |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double))) /
       |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
       |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(b.embedding[i] as double) * cast(b.embedding[i] as double))))) cosim
       | FROM c a JOIN c b ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
       |)
       |SELECT va AS vec_a, vb AS vec_b, round(cosim, 6) AS score
       |FROM s WHERE cosim >= 0.3 ORDER BY 1, 2""".stripMargin
  }

  /** Shared CTE prefix of the RP-tree oracles: the three md5-derived
    * split planes inlined as double literals from
    * [[graft.operators.Similarity.rpPlane]] (single source of truth;
    * Double.toString round-trips bit-exactly through DuckDB's
    * parser), each level's lower median replayed as a row_number
    * window with the operator's (proj, vec_id) order and
    * (cnt + 1) // 2 rank, and the child id arithmetic verbatim. */
  private def rpLeafCtes: String = {
    def dot(p: Int): String = Similarity.rpPlane(p).zipWithIndex.map {
      case (v, j) => s"cast(embedding[${j + 1}] as double) * ($v)"
    }.mkString(" + ")
    s"""WITH p AS (
       | SELECT vec_id, embedding,
       |  (${dot(0)}) proj0, (${dot(1)}) proj1, (${dot(2)}) proj2
       | FROM embeddings
       |), m0 AS (
       | SELECT proj0 thr FROM (
       |  SELECT proj0, row_number() OVER (ORDER BY proj0, vec_id) rn, count(*) OVER () cnt FROM p
       | ) WHERE rn = (cnt + 1) // 2
       |), n1 AS (
       | SELECT p.*, CASE WHEN proj0 > (SELECT thr FROM m0) THEN 1 ELSE 0 END nd1 FROM p
       |), m1 AS (
       | SELECT nd1, proj1 thr FROM (
       |  SELECT nd1, proj1, row_number() OVER (PARTITION BY nd1 ORDER BY proj1, vec_id) rn,
       |   count(*) OVER (PARTITION BY nd1) cnt FROM n1
       | ) WHERE rn = (cnt + 1) // 2
       |), n2 AS (
       | SELECT n1.*, nd1 * 2 + CASE WHEN proj1 > m1.thr THEN 1 ELSE 0 END nd2
       | FROM n1 JOIN m1 USING (nd1)
       |), m2 AS (
       | SELECT nd2, proj2 thr FROM (
       |  SELECT nd2, proj2, row_number() OVER (PARTITION BY nd2 ORDER BY proj2, vec_id) rn,
       |   count(*) OVER (PARTITION BY nd2) cnt FROM n2
       | ) WHERE rn = (cnt + 1) // 2
       |), lf AS (
       | SELECT n2.vec_id, n2.embedding, nd2 * 2 + CASE WHEN proj2 > m2.thr THEN 1 ELSE 0 END leaf
       | FROM n2 JOIN m2 USING (nd2)
       |)""".stripMargin
  }

  /** Oracle for the sub-cell-blocked DBSCAN census: the "dbs:" sign
    * planes inlined as literals (Double.toString round-trips
    * bit-exactly), projections as the same left-to-right + chain the
    * Spark fold runs, cell arithmetic and the ε-census replicated
    * verbatim from the uncapped oracle. */
  private def dbscanCappedOracle: String = {
    def dot(p: Int): String = Similarity.dbsPlane(p).zipWithIndex.map {
      case (v, j) => s"cast(embedding[${j + 1}] as double) * ($v)"
    }.mkString(" + ")
    s"""WITH c AS (
       | SELECT vec_id, embedding,
       |  label * 4 + (CASE WHEN (${dot(0)}) > 0 THEN 2 ELSE 0 END)
       |            + (CASE WHEN (${dot(1)}) > 0 THEN 1 ELSE 0 END) cell
       | FROM embeddings
       |), p AS (
       | SELECT a.vec_id va, a.cell,
       |  sum(CASE WHEN list_sum(list_transform(range(1, 65),
       |    i -> (cast(a.embedding[i] as double) - cast(b.embedding[i] as double)) * (cast(a.embedding[i] as double) - cast(b.embedding[i] as double)))) <= 1.5
       |   THEN 1 ELSE 0 END) n_neighbors
       | FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       | GROUP BY 1, 2
       |)
       |SELECT va AS vec_id, cast(cell as bigint) AS cell,
       | cast(n_neighbors as bigint) AS n_neighbors,
       | n_neighbors >= 2 AS is_core
       |FROM p ORDER BY vec_id""".stripMargin
  }

  private def rpTreeOracle: String =
    rpLeafCtes +
      """, s AS (
        | SELECT q.vec_id qid, c.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(q.embedding[i] as double) * cast(q.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(c.embedding[i] as double) * cast(c.embedding[i] as double))))) cosim
        | FROM lf q JOIN lf c ON q.leaf = c.leaf AND c.vec_id <> q.vec_id
        | WHERE q.vec_id < 5
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin

  private def rpRecallOracle: String =
    rpLeafCtes +
      """, s AS (
        | SELECT q.vec_id qid, c.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(q.embedding[i] as double) * cast(q.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(c.embedding[i] as double) * cast(c.embedding[i] as double))))) cosim
        | FROM lf q JOIN lf c ON q.leaf = c.leaf AND c.vec_id <> q.vec_id
        | WHERE q.vec_id < 5
        |), r AS (
        | SELECT qid query_id, vec_id,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |), approx AS (SELECT query_id, vec_id FROM r WHERE rnk <= 10),
        |q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |es AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |), er AS (
        | SELECT qid query_id, vec_id,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM es
        |), exact AS (SELECT query_id, vec_id FROM er WHERE rnk <= 10)
        |SELECT e.query_id, count(*) AS k,
        | cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hit,
        | sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS recall_at_k
        |FROM exact e LEFT JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared CTE prefix of the BPE oracles: the word-frequency table
    * (alphabetic types, char-wrapped segs) and 3 unrolled training
    * rounds — pair count (pcN) → argmax merge (mN, freq DESC then
    * (a,b) lexical) → merge application (sN, one literal replace whose
    * left-to-right non-overlap IS greedy BPE order). */
  private val BpeOracleCtes: String = {
    def round(prev: String, n: Int) =
      s""", pc$n AS (
         | SELECT p.a a, p.b b, cast(sum(cnt) as bigint) freq FROM (
         |  SELECT cnt, unnest(list_transform(range(1, len(sy)),
         |    i -> struct_pack(a := sy[i], b := sy[i+1]))) p
         |  FROM (SELECT cnt, string_split(trim(seg, '()'), ')(') sy FROM $prev)
         | ) GROUP BY 1, 2
         |), m$n AS (SELECT a, b, freq FROM pc$n ORDER BY freq DESC, a, b LIMIT 1),
         |s$n AS (
         | SELECT w, cnt, replace(seg,
         |   '(' || (SELECT a FROM m$n) || ')(' || (SELECT b FROM m$n) || ')',
         |   '(' || (SELECT a FROM m$n) || (SELECT b FROM m$n) || ')') seg FROM $prev
         |)""".stripMargin
    """WITH toks AS (
      | SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents
      |), words AS MATERIALIZED (
      | SELECT w, cast(count(*) as bigint) cnt, regexp_replace(w, '(.)', '(\1)', 'g') seg
      | FROM toks WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
      | GROUP BY w
      |)""".stripMargin +
      round("words", 1) + round("s1", 2) + round("s2", 3)
  }

  /** Oracle for the NSW graph-ANN search: the knn graph (k=3, the
    * sim_knn_graph formulation), per-label min-vec_id entry points,
    * then the operator's unrolled traversal — seed scoring → beam-8,
    * two expand/re-score/re-prune hops, final top-5 — as plain CTE
    * stages with the same (cosim DESC, vec_id) total order at every
    * pruning. */
  private def nswOracle(beam: Int, k: Int, graphK: Int): String =
    nswOraclePrefix(beam, graphK) +
      s"""
         |SELECT qid AS query_id, cast(rn as bigint) AS rank, vec_id, round(cosim, 6) AS score
         |FROM (
         | SELECT qid, vec_id, cosim,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM b3
         |) WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  /** The NSW recall readout: the traversal CTEs plus the brute-force
    * exact top-k, joined per query (the sim_recall_report final). */
  private def nswRecallOracle(beam: Int, k: Int, graphK: Int): String = {
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double))) /
         |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($a[i] as double)))) *
         |   sqrt(list_sum(list_transform(range(1, 65), i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin
    nswOraclePrefix(beam, graphK) +
      s""", nswk AS (
         | SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM b3
         | ) WHERE rn <= $k
         |), es AS (
         | SELECT q.qid, e.vec_id, ${cos("q.qe", "e.embedding")} cosim
         | FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
         |), exact AS (
         | SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM es
         | ) WHERE rnk <= $k
         |)
         |SELECT x.qid AS query_id, count(*) AS k,
         | cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hit,
         | sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS recall_at_k
         |FROM exact x LEFT JOIN nswk a ON x.qid = a.qid AND x.vec_id = a.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private def nswOraclePrefix(beam: Int, graphK: Int): String = {
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double))) /
         |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($a[i] as double)))) *
         |   sqrt(list_sum(list_transform(range(1, 65), i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin
    def hop(prev: String, xi: String, sci: String, bi: String) =
      s""", $xi AS (
         | SELECT DISTINCT qid, vec_id FROM (
         |  SELECT b.qid, g.dst_id vec_id FROM $prev b JOIN g ON g.src_id = b.vec_id
         |  WHERE g.dst_id <> b.qid
         |  UNION ALL SELECT qid, vec_id FROM $prev
         | )
         |), $sci AS (
         | SELECT x.qid, x.vec_id, ${cos("q.qe", "e.embedding")} cosim
         | FROM $xi x JOIN e ON e.vec_id = x.vec_id JOIN q ON q.qid = x.qid
         |), $bi AS (
         | SELECT qid, vec_id, cosim FROM (
         |  SELECT qid, vec_id, cosim,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM $sci
         | ) WHERE rn <= $beam
         |)""".stripMargin
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |q AS (SELECT vec_id qid, embedding qe FROM e WHERE vec_id < 5),
       |s AS (
       | SELECT a.vec_id src_id, b.vec_id dst_id, ${cos("a.embedding", "b.embedding")} cosim
       | FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
       |), g AS (
       | SELECT src_id, dst_id FROM (
       |  SELECT src_id, dst_id,
       |   row_number() OVER (PARTITION BY src_id ORDER BY cosim DESC, dst_id) rnk FROM s
       | ) WHERE rnk <= $graphK
       |), entries AS (
       | SELECT vec_id FROM (
       |  SELECT vec_id, row_number() OVER (PARTITION BY label ORDER BY vec_id) rn FROM e
       | ) WHERE rn = 1
       |), sc0 AS (
       | SELECT q.qid, e.vec_id, ${cos("q.qe", "e.embedding")} cosim
       | FROM q CROSS JOIN entries en JOIN e ON e.vec_id = en.vec_id
       | WHERE en.vec_id <> q.qid
       |), b0 AS (
       | SELECT qid, vec_id, cosim FROM (
       |  SELECT qid, vec_id, cosim,
       |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM sc0
       | ) WHERE rn <= $beam
       |)${hop("b0", "x1", "sc1", "b1")}${hop("b1", "x2", "sc2", "b2")}${hop("b2", "x3", "sc3", "b3")}""".stripMargin
  }

  /** Oracle CTEs for the HNSW hierarchical search: layer-1 member
    * carve (md5 nibble), both layers' k-NN graphs, the l1Beam
    * smallest-member entry set, the coarse layer-1 descent (beam
    * l1Beam × l1 hops over g1), then the layer-0 beam search (beam ×
    * 2 hops over g) seeded by the layer-1 survivors — the operator's
    * unrolled traversal with the same (cosim DESC, vec_id) total
    * order at every pruning. */
  private def hnswOraclePrefix(beam: Int, graphK: Int, l1Beam: Int): String = {
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double))) /
         |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($a[i] as double)))) *
         |   sqrt(list_sum(list_transform(range(1, 65), i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin
    def hop(prev: String, graph: String, b: Int, xi: String, sci: String, bi: String) =
      s""", $xi AS (
         | SELECT DISTINCT qid, vec_id FROM (
         |  SELECT bb.qid, g2.dst_id vec_id FROM $prev bb JOIN $graph g2 ON g2.src_id = bb.vec_id
         |  WHERE g2.dst_id <> bb.qid
         |  UNION ALL SELECT qid, vec_id FROM $prev
         | )
         |), $sci AS (
         | SELECT x.qid, x.vec_id, ${cos("q.qe", "e.embedding")} cosim
         | FROM $xi x JOIN e ON e.vec_id = x.vec_id JOIN q ON q.qid = x.qid
         |), $bi AS (
         | SELECT qid, vec_id, cosim FROM (
         |  SELECT qid, vec_id, cosim,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM $sci
         | ) WHERE rn <= $b
         |)""".stripMargin
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |q AS (SELECT vec_id qid, embedding qe FROM e WHERE vec_id < 5),
       |m AS (SELECT * FROM e
       | WHERE substring(md5('hnsw:' || cast(vec_id as varchar)), 1, 1) = '0'),
       |s1 AS (
       | SELECT a.vec_id src_id, b.vec_id dst_id, ${cos("a.embedding", "b.embedding")} cosim
       | FROM m a JOIN m b ON a.label = b.label AND a.vec_id <> b.vec_id
       |), g1 AS (
       | SELECT src_id, dst_id FROM (
       |  SELECT src_id, dst_id,
       |   row_number() OVER (PARTITION BY src_id ORDER BY cosim DESC, dst_id) rnk FROM s1
       | ) WHERE rnk <= $graphK
       |), s AS (
       | SELECT a.vec_id src_id, b.vec_id dst_id, ${cos("a.embedding", "b.embedding")} cosim
       | FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
       |), g AS (
       | SELECT src_id, dst_id FROM (
       |  SELECT src_id, dst_id,
       |   row_number() OVER (PARTITION BY src_id ORDER BY cosim DESC, dst_id) rnk FROM s
       | ) WHERE rnk <= $graphK
       |), entries AS (
       | SELECT vec_id FROM m ORDER BY vec_id LIMIT $l1Beam
       |), sc0 AS (
       | SELECT q.qid, e.vec_id, ${cos("q.qe", "e.embedding")} cosim
       | FROM q CROSS JOIN entries en JOIN e ON e.vec_id = en.vec_id
       | WHERE en.vec_id <> q.qid
       |), b0 AS (
       | SELECT qid, vec_id, cosim FROM (
       |  SELECT qid, vec_id, cosim,
       |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM sc0
       | ) WHERE rn <= $l1Beam
       |)${hop("b0", "g1", l1Beam, "h1", "hs1", "hb1")}${hop("hb1", "g1", l1Beam, "h2", "hs2", "hb2")}${
         hop("hb2", "g", beam, "h3", "hs3", "hb3")}${hop("hb3", "g", beam, "h4", "hs4", "hb4")}${
         hop("hb4", "g", beam, "h5", "hs5", "hb5")}""".stripMargin
  }

  private def hnswOracle(beam: Int, k: Int, graphK: Int, l1Beam: Int): String =
    hnswOraclePrefix(beam, graphK, l1Beam) +
      s"""
         |SELECT qid AS query_id, cast(rn as bigint) AS rank, vec_id, round(cosim, 6) AS score
         |FROM (
         | SELECT qid, vec_id, cosim,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM hb5
         |) WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  private def hnswRecallOracle(beam: Int, k: Int, graphK: Int, l1Beam: Int): String = {
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double))) /
         |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($a[i] as double)))) *
         |   sqrt(list_sum(list_transform(range(1, 65), i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin
    hnswOraclePrefix(beam, graphK, l1Beam) +
      s""", hnswk AS (
         | SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn FROM hb5
         | ) WHERE rn <= $k
         |), es AS (
         | SELECT q.qid, e.vec_id, ${cos("q.qe", "e.embedding")} cosim
         | FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
         |), exact AS (
         | SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM es
         | ) WHERE rnk <= $k
         |)
         |SELECT x.qid AS query_id, count(*) AS k,
         | cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hit,
         | sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS recall_at_k
         |FROM exact x LEFT JOIN hnswk a ON x.qid = a.qid AND x.vec_id = a.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Oracle for the IVF probe-count tuning curve: one shared
    * centroid/exact-top-k WITH, then per-probe candidate/hit blocks
    * generated for the same nprobe values the operator sweeps. */
  private def ivfProbeOracle(probes: Seq[Int]): String = {
    val cos = (a: String, b: String) =>
      s"""list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($b[i] as double))) /
         |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast($a[i] as double) * cast($a[i] as double)))) *
         |   sqrt(list_sum(list_transform(range(1, 65), i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin
    val perProbe = probes.map { p =>
      s""", s$p AS (
         | SELECT q.qid, e.vec_id, ${cos("qe", "e.embedding")} cosim
         | FROM q JOIN cellrank cr ON cr.qid = q.qid AND cr.rn <= $p
         | JOIN embeddings e ON e.label = cr.label
         | WHERE e.vec_id <> q.qid
         |), a$p AS (
         | SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk
         |  FROM s$p) WHERE rnk <= 10
         |)""".stripMargin
    }.mkString("\n")
    val rows = probes.map { p =>
      s"""SELECT * FROM (
         | SELECT cast($p as bigint) AS nprobe,
         |  (SELECT cast(count(*) as bigint) FROM s$p) AS n_candidates,
         |  (SELECT cast(count(*) as bigint) FROM exact) AS n_exact,
         |  (SELECT cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint)
         |   FROM exact e LEFT JOIN a$p a ON e.query_id = a.qid AND e.vec_id = a.vec_id) AS n_hits
         |)""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH dims AS (SELECT unnest(range(1, 65)) i),
       |cent AS (
       | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
       | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
       |), centv AS (SELECT label, list(c ORDER BY i) cv FROM cent GROUP BY 1),
       |q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
       |cellscore AS (
       | SELECT q.qid, cv.label,
       |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cv.cv[i])) /
       |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
       |   sqrt(list_sum(list_transform(range(1, 65), i -> cv.cv[i] * cv.cv[i])))) cs
       | FROM q CROSS JOIN centv cv
       |), cellrank AS (
       | SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label) rn
       | FROM cellscore
       |), es AS (
       | SELECT q.qid, e.vec_id, ${cos("qe", "e.embedding")} cosim
       | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
       |), exact AS (
       | SELECT qid query_id, vec_id FROM (
       |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk
       |  FROM es) WHERE rnk <= 10
       |)
       |$perProbe
       |SELECT nprobe, n_candidates, n_exact, n_hits,
       | n_hits * 1000000 // n_exact AS recall_micro
       |FROM ($rows) ORDER BY nprobe""".stripMargin
  }

  /** DuckDB twin of the fixed-point log2 digit recurrence
    * (org.apache.spark.sql.graft.Log2Fixed): the `lgit`/`lg` CTE pair,
    * consumed by every entropy-family oracle. The caller supplies a
    * `lgvals(x)` CTE of (already shift-reduced) arguments and joins
    * `lg` on x. ONE copy — a recurrence change edits one string.
    * (Pre-stripped so it composes inside stripMargin oracle strings.) */
  /** Shared perceptual-hash pair SQL (SimHash60 over payload hex
    * grams, family cap, 10-bit banding) — consumed verbatim by the
    * mm_phash_dup oracle and wrapped by mm_phash_hamming_hist, so the
    * two can never drift. */
  private val MmPhashDupSql: String =
    """WITH ph AS (
        |WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(
        |   regexp_replace(hex(cast(text as blob)), '(.{8})', '\1 ', 'g'), ' '),
        |   x -> x <> '')) t
        | FROM documents
        |), h AS (
        | SELECT doc_id, list_sum(list_transform(range(1, 16), i ->
        |   cast((strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1) as bigint)
        |   * cast(power(16, 15 - i) as bigint))) hv
        | FROM tok
        |), votes AS (
        | SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        | FROM h CROSS JOIN (SELECT unnest(range(0, 60)) j) GROUP BY 1, 2
        |)
        |SELECT doc_id, cast(sum(CASE WHEN v > 0 THEN cast(1 as bigint) << j ELSE 0 END) as bigint) AS ph
        |FROM votes GROUP BY 1
        |), famed AS (
        | SELECT ph.* FROM ph
        | JOIN (SELECT ph, count(*) fam_n FROM ph GROUP BY 1) f USING (ph)
        | WHERE f.fam_n <= 100
        |), bands AS (
        | SELECT doc_id, ph, bb.b, (ph >> (10 * bb.b)) & 1023 bh
        | FROM famed CROSS JOIN (SELECT unnest(range(0, 6)) b) bb
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        | cast(bit_count(xor(a.ph, b2.ph)) as bigint) AS hamming
        |FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.ph, b2.ph)) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin

  private val LgCte: String =
    """lgit AS (
      | SELECT x, cast(length(bin(cast(x as bigint))) - 1 as bigint) m,
      |  (cast(x as bigint) * 1048576) // (cast(1 as bigint) << (length(bin(cast(x as bigint))) - 1)) r,
      |  cast(0 as bigint) acc, 0 AS i
      | FROM lgvals
      | UNION ALL
      | SELECT x, m,
      |  CASE WHEN (r*r) // 1048576 >= 2097152 THEN ((r*r) // 1048576) // 2 ELSE (r*r) // 1048576 END,
      |  acc * 2 + CASE WHEN (r*r) // 1048576 >= 2097152 THEN 1 ELSE 0 END, i + 1
      | FROM lgit WHERE i < 20
      |), lg AS (
      | SELECT x, m * 1048576 + acc AS lg FROM lgit WHERE i = 20
      |)""".stripMargin

  /** Shared per-doc UNIGRAM entropy/perplexity CTE pipeline
    * (tokenize → doc-term counts → reference counts/totals → shift-
    * reduced lg arguments): consumed by the pipe_quality_verdict and
    * pipe_quality_funnel oracles. ONE copy, like [[LgCte]] — a formula
    * fix edits one string; the Spark side reuses the component
    * operators verbatim so only the oracle side could ever drift.
    * Caller appends its own lgvals (args from rs/ts/cs/gs), then
    * [[LgCte]], then [[UnigramScoreCtes]]. */
  private val UnigramDocCtes: String =
    """t AS (
      | SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
      | FROM documents
      |), dc AS MATERIALIZED (
      | SELECT doc_id, lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2, 3
      |), rc AS (
      | SELECT lang, term, cast(sum(c) as bigint) cr FROM dc GROUP BY 1, 2
      |), rs AS (
      | SELECT lang, term, cr, greatest(0, length(bin(cr + 1)) - 43) sh,
      |  (cr + 1) // (cast(1 as bigint) << greatest(0, length(bin(cr + 1)) - 43)) arg
      | FROM rc
      |), tot AS (
      | SELECT lang, cast(count(*) as bigint) v_l, cast(sum(cr) as bigint) n_l
      | FROM rc GROUP BY 1
      |), ts AS (
      | SELECT lang, v_l, n_l, greatest(0, length(bin(n_l + v_l)) - 43) sh,
      |  (n_l + v_l) // (cast(1 as bigint) << greatest(0, length(bin(n_l + v_l)) - 43)) arg
      | FROM tot
      |), cs AS (
      | SELECT doc_id, c, greatest(0, length(bin(c)) - 43) sh,
      |  (c) // (cast(1 as bigint) << greatest(0, length(bin(c)) - 43)) arg
      | FROM dc
      |), g AS (
      | SELECT doc_id, lang, cast(sum(c) as bigint) n_tokens FROM dc GROUP BY 1, 2
      |), gs AS (
      | SELECT doc_id, lang, n_tokens, greatest(0, length(bin(n_tokens)) - 43) sh,
      |  (n_tokens) // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) arg
      | FROM g
      |)""".stripMargin

  /** The per-doc unigram SCORE CTEs over [[UnigramDocCtes]] + lg:
    * h = (doc_id, lang, n_tokens, entropy_micro, ppl_micro). */
  private val UnigramScoreCtes: String =
    """sc_ent AS (
      | SELECT cs.doc_id, sum(cast(cs.c as hugeint) * (l.lg + cs.sh * 1048576)) sclg
      | FROM cs JOIN lg l ON l.x = cs.arg GROUP BY 1
      |), sc_ppl AS (
      | SELECT dc.doc_id, sum(cast(dc.c as hugeint) * (l.lg + rs.sh * 1048576)) sclg
      | FROM dc JOIN rs ON rs.lang = dc.lang AND rs.term = dc.term
      | JOIN lg l ON l.x = rs.arg GROUP BY 1
      |), h AS (
      | SELECT gs.doc_id, gs.lang, gs.n_tokens,
      |  cast((cast(gs.n_tokens as hugeint) * (lgn.lg + gs.sh * 1048576) - e.sclg) * 1000000
      |    // (cast(gs.n_tokens as hugeint) * 1048576) as bigint) entropy_micro,
      |  cast((cast(gs.n_tokens as hugeint) * (lt.lg + ts.sh * 1048576) - p.sclg) * 1000000
      |    // (cast(gs.n_tokens as hugeint) * 1048576) as bigint) ppl_micro
      | FROM gs
      | JOIN lg lgn ON lgn.x = gs.arg
      | JOIN ts ON ts.lang = gs.lang
      | JOIN lg lt ON lt.x = ts.arg
      | JOIN sc_ent e ON e.doc_id = gs.doc_id
      | JOIN sc_ppl p ON p.doc_id = gs.doc_id
      |)""".stripMargin

  /** Shared per-doc KN-BIGRAM LM CTE pipeline (bigramize → doc-bigram
    * counts → per-lang KN stats → shift-reduced lg arguments):
    * consumed by the txt_doc_kn_perplexity and pipe_quality_funnel
    * oracles. Caller appends lgvals (args an/ac/ab from ls), [[LgCte]],
    * then [[KnBitsCte]]. */
  private val KnBigramCtes: String =
    """toks AS (
      | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') tl FROM documents
      |), bi AS (
      | SELECT doc_id, lang, unnest(list_transform(range(1, len(tl)), i -> struct_pack(w1 := tl[i], w2 := tl[i+1]))) b
      | FROM toks WHERE len(tl) >= 2
      |), bx AS (SELECT doc_id, lang, b.w1 w1, b.w2 w2 FROM bi),
      |db AS MATERIALIZED (
      | SELECT doc_id, lang, w1, w2, cast(count(*) as bigint) c_d FROM bx GROUP BY 1, 2, 3, 4
      |), counts AS MATERIALIZED (
      | SELECT lang, w1, w2, cast(sum(c_d) as bigint) c FROM db GROUP BY 1, 2, 3
      |), prefix AS (
      | SELECT lang, w1, cast(sum(c) as bigint) cw1, cast(count(*) as bigint) n_follow
      | FROM counts GROUP BY 1, 2
      |), contin AS (
      | SELECT lang, w2, cast(count(*) as bigint) n_precede FROM counts GROUP BY 1, 2
      |), btot AS (SELECT lang, cast(count(*) as bigint) b_types FROM counts GROUP BY 1),
      |lm AS MATERIALIZED (
      | SELECT c.lang, c.w1, c.w2,
      |  cast(4 * c.c - 3 as bigint) * b.b_types + 3 * p.n_follow * k.n_precede p_num,
      |  p.cw1, b.b_types
      | FROM counts c
      | JOIN prefix p ON p.lang = c.lang AND p.w1 = c.w1
      | JOIN contin k ON k.lang = c.lang AND k.w2 = c.w2
      | JOIN btot b ON b.lang = c.lang
      |), ls AS MATERIALIZED (
      | SELECT lang, w1, w2,
      |  greatest(0, length(bin(p_num)) - 43) shn,
      |  p_num // (cast(1 as bigint) << greatest(0, length(bin(p_num)) - 43)) an,
      |  greatest(0, length(bin(cw1)) - 43) shc,
      |  cw1 // (cast(1 as bigint) << greatest(0, length(bin(cw1)) - 43)) ac,
      |  greatest(0, length(bin(b_types)) - 43) shb,
      |  b_types // (cast(1 as bigint) << greatest(0, length(bin(b_types)) - 43)) ab
      | FROM lm
      |)""".stripMargin

  /** The quality tier's min-doc-length threshold — sourced from the
    * operator side so the gate and the oracles share ONE definition. */
  private def MinTok: Int = operators.CorpusPipeline.MinDocTokens

  /** Per-bigram KN surprisal over [[KnBigramCtes]] + lg:
    * bw = (lang, w1, w2, bits_w) with the DECOMPOSED denominator
    * 2·2²⁰ + lg(c(w₁)) + lg(B) − lg(p_num). */
  private val KnBitsCte: String =
    """bw AS (
      | SELECT ls.lang, ls.w1, ls.w2,
      |  2097152 + (lc.lg + ls.shc * 1048576) + (lb.lg + ls.shb * 1048576)
      |   - (lpn.lg + ls.shn * 1048576) bits_w
      | FROM ls
      | JOIN lg lpn ON lpn.x = ls.an
      | JOIN lg lc ON lc.x = ls.ac
      | JOIN lg lb ON lb.x = ls.ab
      |)""".stripMargin

  /** Shared DSIR unigram CTE pipeline (tokenize → doc/raw/target LM
    * counts → shift-reduced lg args → [[LgCte]] → per-doc weight):
    * ends at m = (doc_id, lang, n_tokens, w_num, w_micro). ONE copy,
    * consumed by the txt_dsir_weights and pipe_dsir_topk oracles. */
  private val DsirCtes: String =
    """t AS (
      | SELECT doc_id, lang, source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
      | FROM documents
      |), dc AS MATERIALIZED (
      | SELECT doc_id, lang, term, cast(count(*) as bigint) c,
      |  cast(coalesce(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END), 0) as bigint) c_t
      | FROM t GROUP BY 1, 2, 3
      |), rc AS (
      | SELECT lang, term, cast(sum(c) as bigint) cr, cast(sum(c_t) as bigint) ct
      | FROM dc GROUP BY 1, 2
      |), rs AS (
      | SELECT lang, term, cr, ct,
      |  greatest(0, length(bin(cr + 1)) - 43) shr,
      |  (cr + 1) // (cast(1 as bigint) << greatest(0, length(bin(cr + 1)) - 43)) ar,
      |  greatest(0, length(bin(ct + 1)) - 43) sht,
      |  (ct + 1) // (cast(1 as bigint) << greatest(0, length(bin(ct + 1)) - 43)) atv
      | FROM rc
      |), tot AS (
      | SELECT lang, cast(count(*) as bigint) v_l,
      |  cast(sum(cr) as bigint) n_r, cast(sum(ct) as bigint) n_t
      | FROM rc GROUP BY 1
      |), ts AS (
      | SELECT lang, v_l, n_r, n_t,
      |  greatest(0, length(bin(n_r + v_l)) - 43) shr,
      |  (n_r + v_l) // (cast(1 as bigint) << greatest(0, length(bin(n_r + v_l)) - 43)) ar,
      |  greatest(0, length(bin(n_t + v_l)) - 43) sht,
      |  (n_t + v_l) // (cast(1 as bigint) << greatest(0, length(bin(n_t + v_l)) - 43)) atv
      | FROM tot
      |), lgvals(x) AS (
      | SELECT DISTINCT x FROM (SELECT ar AS x FROM rs UNION ALL SELECT atv FROM rs
      |  UNION ALL SELECT ar FROM ts UNION ALL SELECT atv FROM ts)
      |), """.stripMargin + LgCte + """, d AS (
      | SELECT dc.doc_id, dc.lang, cast(sum(dc.c) as bigint) n_tokens,
      |  sum(cast(dc.c as hugeint)
      |    * ((lt.lg + rs.sht * 1048576) - (lr.lg + rs.shr * 1048576))) sdiff
      | FROM dc JOIN rs ON rs.lang = dc.lang AND rs.term = dc.term
      | JOIN lg lr ON lr.x = rs.ar
      | JOIN lg lt ON lt.x = rs.atv
      | GROUP BY 1, 2
      |), w AS (
      | SELECT d.doc_id, d.lang, n_tokens,
      |  cast(sdiff + cast(n_tokens as hugeint)
      |    * ((lr2.lg + ts.shr * 1048576) - (lt2.lg + ts.sht * 1048576)) as bigint) w_num
      | FROM d JOIN ts ON ts.lang = d.lang
      | JOIN lg lr2 ON lr2.x = ts.ar
      | JOIN lg lt2 ON lt2.x = ts.atv
      |), m AS (
      | SELECT doc_id, lang, n_tokens, w_num,
      |  cast((CASE WHEN w_num < 0 THEN -1 ELSE 1 END)
      |    * (cast(abs(w_num) as hugeint) * 1000000
      |       // (cast(n_tokens as hugeint) * 1048576)) as bigint) w_micro
      | FROM w
      |)""".stripMargin

  /** Shared per-doc KN-TRIGRAM LM CTE pipeline (trigramize → doc-
    * trigram counts → per-lang two-level KN stats → shift-reduced lg
    * arguments) — the trigram twin of [[KnBigramCtes]]. Continuation
    * counts at every level come from the trigram-TYPE table (rows of
    * counts3 are distinct (w1,w2,w3), so count(*) per (w2,w3) IS
    * N1+(.,w2,w3)). Caller appends lgvals (args an/ac/am/ab from ls3),
    * [[LgCte]], then [[Kn3BitsCte]]. DuckDB's int64 arithmetic errors
    * loudly on p_num overflow — the same fail-loud ceiling the Spark
    * side guards with raise_error. */
  private val Kn3TrigramCtes: String =
    """toks AS (
      | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') tl FROM documents
      |), tri AS (
      | SELECT doc_id, lang, unnest(list_transform(range(1, len(tl) - 1), i -> struct_pack(w1 := tl[i], w2 := tl[i+1], w3 := tl[i+2]))) b
      | FROM toks WHERE len(tl) >= 3
      |), tx AS (SELECT doc_id, lang, b.w1 w1, b.w2 w2, b.w3 w3 FROM tri),
      |dt AS MATERIALIZED (
      | SELECT doc_id, lang, w1, w2, w3, cast(count(*) as bigint) c_d FROM tx GROUP BY 1, 2, 3, 4, 5
      |), counts3 AS MATERIALIZED (
      | SELECT lang, w1, w2, w3, cast(sum(c_d) as bigint) c FROM dt GROUP BY 1, 2, 3, 4
      |), p12 AS (
      | SELECT lang, w1, w2, cast(sum(c) as bigint) cw12, cast(count(*) as bigint) n1f12
      | FROM counts3 GROUP BY 1, 2, 3
      |), c23 AS MATERIALIZED (
      | SELECT lang, w2, w3, cast(count(*) as bigint) c2p FROM counts3 GROUP BY 1, 2, 3
      |), m2 AS (
      | SELECT lang, w2, cast(sum(c2p) as bigint) nmid2, cast(count(*) as bigint) nf2p
      | FROM c23 GROUP BY 1, 2
      |), c3 AS (
      | SELECT lang, w3, cast(count(*) as bigint) n1p3 FROM c23 GROUP BY 1, 2
      |), b1 AS (SELECT lang, cast(count(*) as bigint) b_pairs FROM c23 GROUP BY 1),
      |lm3 AS MATERIALIZED (
      | SELECT c.lang, c.w1, c.w2, c.w3,
      |  (4 * c.c - 3) * 4 * m.nmid2 * b.b_pairs
      |   + 3 * p.n1f12 * ((4 * k.c2p - 3) * b.b_pairs + 3 * m.nf2p * t.n1p3) p_num,
      |  p.cw12, m.nmid2, b.b_pairs
      | FROM counts3 c
      | JOIN p12 p ON p.lang = c.lang AND p.w1 = c.w1 AND p.w2 = c.w2
      | JOIN c23 k ON k.lang = c.lang AND k.w2 = c.w2 AND k.w3 = c.w3
      | JOIN m2 m ON m.lang = c.lang AND m.w2 = c.w2
      | JOIN c3 t ON t.lang = c.lang AND t.w3 = c.w3
      | JOIN b1 b ON b.lang = c.lang
      |), ls3 AS MATERIALIZED (
      | SELECT lang, w1, w2, w3,
      |  greatest(0, length(bin(p_num)) - 43) shn,
      |  p_num // (cast(1 as bigint) << greatest(0, length(bin(p_num)) - 43)) an,
      |  greatest(0, length(bin(cw12)) - 43) shc,
      |  cw12 // (cast(1 as bigint) << greatest(0, length(bin(cw12)) - 43)) ac,
      |  greatest(0, length(bin(nmid2)) - 43) shm,
      |  nmid2 // (cast(1 as bigint) << greatest(0, length(bin(nmid2)) - 43)) am,
      |  greatest(0, length(bin(b_pairs)) - 43) shb,
      |  b_pairs // (cast(1 as bigint) << greatest(0, length(bin(b_pairs)) - 43)) ab
      | FROM lm3
      |)""".stripMargin

  /** Per-trigram KN surprisal over [[Kn3TrigramCtes]] + lg:
    * bw3 = (lang, w1, w2, w3, bits_w) with the DECOMPOSED denominator
    * 4·2²⁰ + lg(c(w₁w₂)) + lg(N₁₊(·w₂·)) + lg(B) − lg(p_num). */
  private val Kn3BitsCte: String =
    """bw3 AS (
      | SELECT ls3.lang, ls3.w1, ls3.w2, ls3.w3,
      |  4194304 + (lc.lg + ls3.shc * 1048576) + (lmm.lg + ls3.shm * 1048576)
      |   + (lb.lg + ls3.shb * 1048576) - (lpn.lg + ls3.shn * 1048576) bits_w
      | FROM ls3
      | JOIN lg lpn ON lpn.x = ls3.an
      | JOIN lg lc ON lc.x = ls3.ac
      | JOIN lg lmm ON lmm.x = ls3.am
      | JOIN lg lb ON lb.x = ls3.ab
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS sum_disc_price,
        | cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(18,6))) as double) AS sum_charge,
        | round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 6) AS avg_qty,
        | round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double) / count(*), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_topk_orders" ->
      """SELECT l_orderkey,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,6)) - cast(l_discount as decimal(18,6)))) as double) AS revenue,
        | count(*) AS n_items
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q4_filter_range" ->
      """SELECT
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(18,6))) as double) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
        |  AND l_shipdate < timestamp '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q5_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as bigint) AS rn,
        | cast(sum(cast(o_totalprice as decimal(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS run_total
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q6_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_semi_anti" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q8_rollup" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
        | coalesce(o_orderpriority, 'ALL') AS orderpriority,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q9_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q10_repeat_buyers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "q11_pivot_events" ->
      """SELECT cast(ts as date) AS day,
        | cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS click,
        | cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) as bigint) AS error,
        | cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS purchase,
        | cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) as bigint) AS signup,
        | cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_json_props" ->
      """SELECT cast(json_extract_string(props, '$.k') as bigint) % 10 AS k_bucket,
        | count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_asof_join" ->
      """SELECT e.event_id, e.user_id,
        | max(o.o_orderdate) AS last_order_ts,
        | count(o.o_orderkey) AS n_prior_orders
        |FROM events e
        |LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q14_sessionize" ->
      """WITH x AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |       ELSE 0 END AS new_sess
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), y AS (
        | SELECT user_id, ts_us,
        |  cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
        | FROM x
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q16_full_outer" ->
      """WITH cn AS (SELECT c_nationkey, count(*) n_cust FROM customer GROUP BY 1),
        |sn AS (SELECT s_nationkey, count(*) n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q17_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
        | coalesce(o_orderstatus, 'ALL') AS orderstatus,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY 1, 2""".stripMargin,
    "q19_string_ops" ->
      """SELECT p_partkey, upper(p_brand) AS u_brand,
        | substring(p_name, 1, 10) AS name10,
        | cast(length(p_name) as bigint) AS n_chars,
        | replace(p_type, ' ', '_') AS type_slug
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q20_filtered_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        | cast(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) as bigint) AS n_big
        |FROM orders GROUP BY 1 HAVING count(*) > 10 ORDER BY 1""".stripMargin,
    "q21_ntile" ->
      """SELECT o_orderpriority, bucket, count(*) AS n,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM (
        | SELECT o_orderpriority, o_totalprice,
        |  cast(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) as bigint) AS bucket
        | FROM orders
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q22_correlated_subq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (
        | SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*)
        | FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q23_time_rollup" ->
      """SELECT coalesce(yr, -1) AS yr, coalesce(qtr, -1) AS qtr,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM (SELECT cast(year(o_orderdate) as bigint) yr,
        |             cast(quarter(o_orderdate) as bigint) qtr, o_totalprice FROM orders)
        |GROUP BY ROLLUP(yr, qtr) ORDER BY 1, 2""".stripMargin,
    "q24_collect_arrays" ->
      """SELECT o_custkey, cast(len(ks) as bigint) AS n,
        | ks[1] AS first_key, ks[-1] AS last_key
        |FROM (SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) ks FROM orders GROUP BY 1)
        |ORDER BY o_custkey""".stripMargin,
    "q25_null_semantics" ->
      """SELECT count(*) AS n_rows,
        | count(nullif(event_type, 'error')) AS n_non_error,
        | cast(sum(cast(nullif(value, value) as decimal(18,2))) as double) AS sum_all_null,
        | count(distinct nullif(event_type, 'error')) AS n_distinct_non_error,
        | max(nullif(event_type, 'view')) AS max_et
        |FROM events""".stripMargin,
    "q26_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        | coalesce(o_orderpriority, 'ALL') AS orderpriority,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        |ORDER BY 1, 2""".stripMargin,
    "q27_range_frame" ->
      """SELECT o_custkey, round(max(rev30), 4) AS max_rev30, count(*) AS n
        |FROM (
        | SELECT o_custkey,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY od
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) as double) rev30
        | FROM (SELECT o_custkey, o_totalprice,
        |        epoch_us(o_orderdate) // 86400000000 AS od FROM orders)
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_window_nav" ->
      """SELECT o_custkey, max(first_key) AS first_key, max(last_key) AS last_key,
        | max(second_key) AS second_key
        |FROM (
        | SELECT o_custkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_stats" ->
      """SELECT o_orderpriority, n,
        | round(s1 / n, 4) AS mean_price,
        | round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS stddev_price
        |FROM (
        | SELECT o_orderpriority, count(*) n,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) s1,
        |  cast(sum(cast(o_totalprice * o_totalprice as decimal(30,4))) as double) s2
        | FROM orders GROUP BY 1
        |) ORDER BY 1""".stripMargin,
    "q30_anomaly" ->
      """WITH stats AS (
        | SELECT event_type, count(*) n,
        |  cast(sum(cast(value as decimal(18,2))) as double) s1,
        |  cast(sum(cast(value * value as decimal(30,4))) as double) s2
        | FROM events GROUP BY 1
        |), ms AS (
        | SELECT event_type, s1 / n AS mean_v,
        |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd_v FROM stats
        |)
        |SELECT e.event_id, e.event_type, e.value,
        | round((e.value - ms.mean_v) / ms.sd_v, 6) AS z
        |FROM events e JOIN ms ON e.event_type = ms.event_type
        |WHERE abs((e.value - ms.mean_v) / ms.sd_v) > 3
        |ORDER BY e.event_id""".stripMargin,
    "q31_sample" ->
      """SELECT count(*) AS n_sampled,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |WHERE substring(md5(cast(o_orderkey as varchar)), 1, 1) IN ('0', '1')""".stripMargin,
    "txt_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean,
        | md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS clean_md5,
        | cast(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) as bigint) AS n_clean_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sim_kmeans_step" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label, dist,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |)
        |SELECT vec_id, label, new_label, round(dist, 6) AS dist
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "odns_typing" ->
      """SELECT
        | count(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f')) AS n_ts_parsed,
        | max(epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f'))) AS max_ts_us,
        | count(try_cast(event_type as double)) AS n_bad_numeric,
        | count(try_cast(cast(value as varchar) as double)) AS n_good_numeric
        |FROM events""".stripMargin,
    "odns_scan_date" ->
      """SELECT regexp_extract('tcp_scan_' || cast(cast(ts as date) as varchar) || '.csv.gz', '\d{4}-\d{2}-\d{2}') AS scan_date,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_minhash_lsh" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |)
        |SELECT a.doc_id doc_a, b.doc_id doc_b
        |FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dd_ngram_jaccard" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (
        | SELECT doc_id, unnest(shingles) s FROM sh
        |), sizes AS (
        | SELECT doc_id, count(*) n FROM rows_ GROUP BY 1
        |), hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |), inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |)
        |SELECT da AS doc_a, db AS doc_b,
        | round(cast(ninter as double) / (sa.n + sb.n - ninter), 6) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        |WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |ORDER BY 1, 2""".stripMargin,
    "dd_components" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |)
        |SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    // the capped components config: shingles with df > 100 are dropped
    // on BOTH sides before the pair join (doc sizes stay PRE-cap, as in
    // the engine) — the cap is replicated exactly, so this row is a
    // strict oracle on the guarded input path itself
    "dd_components_capped" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |)
        |SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    // edit-distance verify tier: levenshtein over the SAME jaccard-
    // gated candidate pair set (both engines' levenshtein is the
    // classic unit-cost edit distance — exact integers)
    "dd_edit_distance" ->
      """WITH toks AS (
        | SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |)
        |SELECT da AS doc_a, db AS doc_b,
        | cast(length(ta.text) as bigint) AS len_a,
        | cast(length(tb.text) as bigint) AS len_b,
        | cast(levenshtein(ta.text, tb.text) as bigint) AS dist,
        | cast(levenshtein(ta.text, tb.text) as bigint) * 1000000
        |   // greatest(length(ta.text), length(tb.text)) AS dist_micro
        |FROM pairs JOIN toks ta ON ta.doc_id = da JOIN toks tb ON tb.doc_id = db
        |ORDER BY doc_a, doc_b""".stripMargin,
    // leakage-free split: the cluster hash uses the same 40-bit md5
    // device as pipe_split, applied to the component label
    "pipe_cluster_split" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |),
        |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |cl AS (
        | SELECT d.doc_id, d.lang, coalesce(c.component, d.doc_id) AS cluster
        | FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |), u AS (
        | SELECT doc_id, lang, cluster,
        |  list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5(cast(cluster as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) AS uval
        | FROM cl
        |)
        |SELECT doc_id, lang, cluster,
        | CASE WHEN (uval * 100) // 1099511627776 < 90 THEN 'train'
        |      WHEN (uval * 100) // 1099511627776 < 95 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin,
    // hard negatives: cross-label top-k by cosine, same arithmetic as
    // sim_topk_bruteforce with the label filter added
    "sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id qid, label qlabel, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, e.vec_id, e.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.label <> q.qlabel
        |), r AS (
        | SELECT qid query_id, vec_id, label, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id,
        | cast(label as bigint) AS neg_label, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,
    // IVF-probed hard negatives: top-2 FOREIGN cells per query (cells
    // are label blocks, so cross-label commutes with cell pruning)
    "sim_hard_negatives_ivf" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (
        | SELECT label, list(c ORDER BY i) cv FROM cent GROUP BY 1
        |), q AS (SELECT vec_id qid, label qlabel, embedding qe FROM embeddings WHERE vec_id < 5),
        |cellscore AS (
        | SELECT q.qid, cv.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cv.cv[i])) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cv.cv[i] * cv.cv[i])))) cs
        | FROM q CROSS JOIN centv cv WHERE cv.label <> q.qlabel
        |), cells AS (
        | SELECT qid, label FROM (
        |  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label) rn FROM cellscore
        | ) WHERE rn <= 2
        |), s AS (
        | SELECT q.qid, e.vec_id, e.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q JOIN cells ON cells.qid = q.qid JOIN embeddings e ON e.label = cells.label
        |), r AS (
        | SELECT qid query_id, vec_id, label, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id,
        | cast(label as bigint) AS neg_label, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,
    // PSI drift per source vs the corpus reference over 32-token
    // length buckets; add-one smoothing, shared fixed-point lg device
    "pipe_source_drift" ->
      ("""WITH RECURSIVE tk AS (
        | SELECT source, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), d AS (
        | SELECT source, cast(((len(t) - 1) // 32 + 1) * 32 as bigint) bucket
        | FROM tk WHERE len(t) > 0
        |), cell AS (SELECT source, bucket, cast(count(*) as bigint) c FROM d GROUP BY 1, 2),
        |ref AS (SELECT bucket, cast(sum(c) as bigint) r FROM cell GROUP BY 1),
        |stot AS (SELECT source, cast(sum(c) as bigint) n_s FROM cell GROUP BY 1),
        |gtot AS (SELECT cast(sum(r) as bigint) n_tot, cast(count(*) as bigint) b_buckets FROM ref),
        |grid AS (
        | SELECT s.source, s.n_s, rf.bucket, rf.r, coalesce(cl.c, 0) c, g.n_tot, g.b_buckets
        | FROM stot s CROSS JOIN ref rf
        | LEFT JOIN cell cl ON cl.source = s.source AND cl.bucket = rf.bucket
        | CROSS JOIN gtot g
        |), args AS (
        | SELECT *,
        |  greatest(0, length(bin(c + 1)) - 43) s_c,
        |  (c + 1) // (cast(1 as bigint) << greatest(0, length(bin(c + 1)) - 43)) x_c,
        |  greatest(0, length(bin(r + 1)) - 43) s_r,
        |  (r + 1) // (cast(1 as bigint) << greatest(0, length(bin(r + 1)) - 43)) x_r,
        |  greatest(0, length(bin(n_s + b_buckets)) - 43) s_s,
        |  (n_s + b_buckets) // (cast(1 as bigint) << greatest(0, length(bin(n_s + b_buckets)) - 43)) x_s,
        |  greatest(0, length(bin(n_tot + b_buckets)) - 43) s_t,
        |  (n_tot + b_buckets) // (cast(1 as bigint) << greatest(0, length(bin(n_tot + b_buckets)) - 43)) x_t
        | FROM grid
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT x_c AS x FROM args UNION ALL SELECT x_r FROM args
        |  UNION ALL SELECT x_s FROM args UNION ALL SELECT x_t FROM args)
        |), """ + LgCte + """, terms AS (
        | SELECT a.source, a.n_s, a.n_tot, a.b_buckets,
        |  (cast(a.c + 1 as hugeint) * (a.n_tot + a.b_buckets)
        |   - cast(a.r + 1 as hugeint) * (a.n_s + a.b_buckets)) diff,
        |  ((lc.lg + a.s_c * 1048576) + (lt.lg + a.s_t * 1048576)
        |   - (lr.lg + a.s_r * 1048576) - (ls.lg + a.s_s * 1048576)) lgdiff
        | FROM args a JOIN lg lc ON lc.x = a.x_c JOIN lg lr ON lr.x = a.x_r
        |  JOIN lg ls ON ls.x = a.x_s JOIN lg lt ON lt.x = a.x_t
        |), agg AS (
        | SELECT source, n_s, n_tot, b_buckets, sum(diff * lgdiff) num
        | FROM terms GROUP BY 1, 2, 3, 4
        |)
        |SELECT source, n_s, n_tot, b_buckets, cast(num as varchar) AS psi_num,
        | cast((CASE WHEN num < 0 THEN -1 ELSE 1 END) * (abs(num) * 1000000
        |   // (cast(n_s + b_buckets as hugeint) * (n_tot + b_buckets) * 1048576)) as bigint) AS psi_micro
        |FROM agg ORDER BY source""").stripMargin,
    // Kruskal-Wallis: doubled midrank sums keep tied .5 ranks integral
    "q160_kruskal_wallis" ->
      """WITH v AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents, o_orderpriority
        | FROM orders
        |), d AS (SELECT cents, o_orderpriority, cast(count(*) as bigint) a FROM v GROUP BY 1, 2),
        |t AS (SELECT cents, cast(sum(a) as bigint) all_n FROM d GROUP BY 1),
        |c AS (
        | SELECT cents, all_n, cast(coalesce(sum(all_n) OVER (ORDER BY cents
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) c_lt
        | FROM t
        |),
        |ties AS (
        | SELECT cast(sum(all_n) as bigint) n_total,
        |  sum(cast(all_n as hugeint) * all_n * all_n - all_n) tie_sum
        | FROM t
        |),
        |g AS (
        | SELECT d.o_orderpriority, cast(sum(d.a) as bigint) n_g,
        |  sum(cast(d.a as hugeint) * (2 * c.c_lt + c.all_n + 1)) rs2
        | FROM d JOIN c ON d.cents = c.cents GROUP BY 1
        |)
        |SELECT g.o_orderpriority, n_g, cast(rs2 as varchar) AS rank_sum2,
        | n_total, cast(tie_sum as varchar) AS tie_sum
        |FROM g CROSS JOIN ties ORDER BY 1""".stripMargin,
    // Jonckheere-Terpstra: doubled per-pair Mann-Whitney counts along
    // the 1-URGENT -> 5-LOW priority order
    "q161_jonckheere" ->
      """WITH v AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents,
        |  substring(o_orderpriority, 1, 1) g
        | FROM orders
        |), d AS (SELECT cents, g, cast(count(*) as bigint) a FROM v GROUP BY 1, 2),
        |p AS (
        | SELECT cents,
        |  sum(CASE WHEN g = '1' THEN a ELSE 0 END) a1,
        |  sum(CASE WHEN g = '2' THEN a ELSE 0 END) a2,
        |  sum(CASE WHEN g = '3' THEN a ELSE 0 END) a3,
        |  sum(CASE WHEN g = '4' THEN a ELSE 0 END) a4,
        |  sum(CASE WHEN g = '5' THEN a ELSE 0 END) a5
        | FROM d GROUP BY 1
        |), c AS (
        | SELECT cents, a1, a2, a3, a4, a5,
        |  coalesce(sum(a1) OVER w, 0) c1, coalesce(sum(a2) OVER w, 0) c2,
        |  coalesce(sum(a3) OVER w, 0) c3, coalesce(sum(a4) OVER w, 0) c4,
        |  coalesce(sum(a5) OVER w, 0) c5
        | FROM p WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), u AS (
        | SELECT cents, '1' g, a1 a, c1 c FROM c UNION ALL
        | SELECT cents, '2', a2, c2 FROM c UNION ALL
        | SELECT cents, '3', a3, c3 FROM c UNION ALL
        | SELECT cents, '4', a4, c4 FROM c UNION ALL
        | SELECT cents, '5', a5, c5 FROM c
        |), tot AS (SELECT g, cast(sum(a) as bigint) n FROM u GROUP BY 1),
        |jt AS (
        | SELECT lo.g g_lo, hi.g g_hi,
        |  sum(2 * cast(hi.a as hugeint) * lo.c + cast(lo.a as hugeint) * hi.a) u2
        | FROM u lo JOIN u hi ON lo.cents = hi.cents AND lo.g < hi.g
        | GROUP BY 1, 2
        |)
        |SELECT g_lo, g_hi, tl.n AS n_lo, th.n AS n_hi, cast(u2 as varchar) AS u2
        |FROM jt JOIN tot tl ON tl.g = g_lo JOIN tot th ON th.g = g_hi
        |ORDER BY g_lo, g_hi""".stripMargin,
    // leakage audit: near-dup pairs straddling splits, doc-hash vs
    // cluster-hash (the latter is 0 by construction - gated, not assumed)
    "pipe_split_leakage" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS MATERIALIZED (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |),
        |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |keyed AS (
        | SELECT d.doc_id,
        |  d.doc_id AS k_doc, coalesce(c.component, d.doc_id) AS k_clu
        | FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |),
        |splits AS (
        | SELECT doc_id,
        |  (list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef', substring(md5(cast(k_doc as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) * 100) // 1099511627776 AS b_doc,
        |  (list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef', substring(md5(cast(k_clu as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) * 100) // 1099511627776 AS b_clu
        | FROM keyed
        |),
        |named AS (
        | SELECT doc_id,
        |  CASE WHEN b_doc < 90 THEN 'train' WHEN b_doc < 95 THEN 'val' ELSE 'test' END s_doc,
        |  CASE WHEN b_clu < 90 THEN 'train' WHEN b_clu < 95 THEN 'val' ELSE 'test' END s_clu
        | FROM splits
        |),
        |j AS (
        | SELECT p.da, p.db, a.s_doc sa_doc, b.s_doc sb_doc, a.s_clu sa_clu, b.s_clu sb_clu
        | FROM pairs p JOIN named a ON a.doc_id = p.da JOIN named b ON b.doc_id = p.db
        |)
        |SELECT 'cluster_hash' AS strategy, cast(count(*) as bigint) n_pairs,
        | cast(sum(CASE WHEN sa_clu <> sb_clu THEN 1 ELSE 0 END) as bigint) n_cross_split
        |FROM j
        |UNION ALL
        |SELECT 'doc_hash', cast(count(*) as bigint),
        | cast(sum(CASE WHEN sa_doc <> sb_doc THEN 1 ELSE 0 END) as bigint)
        |FROM j
        |ORDER BY strategy""".stripMargin,
    "txt_top_terms" ->
      """WITH tok AS (
        | SELECT lang, doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), tf AS (SELECT lang, term, count(*) tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) df FROM tok GROUP BY 1),
        |nd AS (SELECT count(*) n FROM documents),
        |scored AS (
        | SELECT lang, tf.term, tf, df,
        |  cast(tf as double) * (SELECT n FROM nd) / df AS score
        | FROM tf JOIN df ON tf.term = df.term
        |)
        |SELECT lang, cast(rnk as bigint) AS rank, term, tf, df, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) rnk FROM scored)
        |WHERE rnk <= 5 ORDER BY lang, rank""".stripMargin,
    "dd_simhash" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) t FROM documents
        |), h AS (
        | SELECT doc_id, list_sum(list_transform(range(1, 16), i ->
        |   cast((strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1) as bigint)
        |   * cast(power(16, 15 - i) as bigint))) hv
        | FROM tok
        |), votes AS (
        | SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        | FROM h CROSS JOIN (SELECT unnest(range(0, 60)) j) GROUP BY 1, 2
        |)
        |SELECT doc_id, cast(sum(CASE WHEN v > 0 THEN cast(1 as bigint) << j ELSE 0 END) as bigint) AS simhash
        |FROM votes GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "dd_embed_cos" ->
      """WITH s AS (
        | SELECT a.vec_id va, b.vec_id vb,
        |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(b.embedding[i] as double) * cast(b.embedding[i] as double))))) cosim
        | FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |)
        |SELECT va AS vec_a, vb AS vec_b, round(cosim, 6) AS score
        |FROM s WHERE cosim >= 0.3 ORDER BY 1, 2""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "sim_ivf_ann" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (
        | SELECT label, list(c ORDER BY i) cv FROM cent GROUP BY 1
        |), q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |cellscore AS (
        | SELECT q.qid, cv.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cv.cv[i])) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cv.cv[i] * cv.cv[i])))) cs
        | FROM q CROSS JOIN centv cv
        |), cells AS (
        | SELECT qid, label FROM (
        |  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label) rn FROM cellscore
        | ) WHERE rn <= 2
        |), s AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q JOIN cells ON cells.qid = q.qid JOIN embeddings e ON e.label = cells.label
        | WHERE e.vec_id <> q.qid
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "sim_lsh_ann" ->
      """WITH planes AS (
        | SELECT p, list_transform(range(1, 65), d ->
        |   cast(list_sum(list_transform(range(1, 9), i ->
        |     cast((strpos('0123456789abcdef', substring(md5(cast(p as varchar) || ':' || cast(d as varchar)), i, 1)) - 1) as bigint)
        |     * cast(power(16, 8 - i) as bigint))) as double) / 4294967295.0 - 0.5) w
        | FROM (SELECT unnest(range(0, 6)) p)
        |), b AS (
        | SELECT e.vec_id, e.embedding,
        |  cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), d -> cast(e.embedding[d] as double) * pl.w[d])) > 0
        |       THEN cast(1 as bigint) << pl.p ELSE 0 END) as bigint) bucket
        | FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2
        |), q AS (SELECT vec_id qid, embedding qe, bucket FROM b WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, e2.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e2.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e2.embedding[i] as double) * cast(e2.embedding[i] as double))))) cosim
        | FROM q JOIN b e2 ON e2.bucket = q.bucket AND e2.vec_id <> q.qid
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "sim_lsh_multiprobe" ->
      """WITH planes AS (
        | SELECT p, list_transform(range(1, 65), d ->
        |   cast(list_sum(list_transform(range(1, 9), i ->
        |     cast((strpos('0123456789abcdef', substring(md5(cast(p as varchar) || ':' || cast(d as varchar)), i, 1)) - 1) as bigint)
        |     * cast(power(16, 8 - i) as bigint))) as double) / 4294967295.0 - 0.5) w
        | FROM (SELECT unnest(range(0, 6)) p)
        |), b AS (
        | SELECT e.vec_id, e.embedding,
        |  cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), d -> cast(e.embedding[d] as double) * pl.w[d])) > 0
        |       THEN cast(1 as bigint) << pl.p ELSE 0 END) as bigint) bucket
        | FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2
        |), q AS (
        | SELECT vec_id qid, embedding qe,
        |  unnest(list_distinct(list_prepend(bucket, list_transform(range(0, 6), p -> xor(bucket, cast(1 as bigint) << p))))) probe
        | FROM b WHERE vec_id < 5
        |), s AS (
        | SELECT DISTINCT q.qid, e2.vec_id, q.qe, e2.embedding
        | FROM q JOIN b e2 ON e2.bucket = q.probe AND e2.vec_id <> q.qid
        |), sc AS (
        | SELECT qid, vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(embedding[i] as double) * cast(embedding[i] as double))))) cosim
        | FROM s
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM sc
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "txt_quality" ->
      """WITH t AS (
        | SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |)
        |SELECT doc_id,
        | cast(len(toks) as bigint) AS n_tokens,
        | cast(length(text) as bigint) AS n_chars_measured,
        | cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) as double) / length(text) AS punct_ratio,
        | cast(len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as double) / len(toks) AS stopword_ratio,
        | 0.4 * least(cast(1 as double), cast(len(toks) as bigint) / 20.0)
        |     + 0.3 * (1 - cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) as double) / length(text))
        |     + 0.3 * (1 - cast(len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as double) / len(toks)) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,
    "txt_langid" ->
      """WITH t AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), s AS (
        | SELECT doc_id,
        |  cast(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) as bigint) s_de,
        |  cast(len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as bigint) s_en,
        |  cast(len(list_filter(toks, x -> x IN ('el', 'la', 'de', 'que', 'y', 'los'))) as bigint) s_es,
        |  cast(len(list_filter(toks, x -> x IN ('le', 'les', 'et', 'des', 'un', 'une'))) as bigint) s_fr
        | FROM t
        |)
        |SELECT doc_id, s_de, s_en, s_es, s_fr,
        | CASE WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
        |      WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
        |      WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "txt_tokens" ->
      """SELECT doc_id,
        | cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) AS n_ws_tokens,
        | cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) as bigint) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_fingerprint" ->
      """WITH t AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) shingles
        | FROM t WHERE len(toks) >= 3
        |)
        |SELECT doc_id, cast(len(shingles) as bigint) AS n_shingles,
        | list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS fingerprint
        |FROM sh ORDER BY doc_id""".stripMargin,
    "mm_decode_stub" ->
      """SELECT doc_id,
        | cast(octet_length(cast(text as blob)) as int) AS n_bytes,
        | cast(64 + octet_length(cast(text as blob)) % 577 as int) AS width,
        | cast(64 + (octet_length(cast(text as blob)) * 31) % 421 as int) AS height,
        | cast(1 + (ascii(substring(text, 1, 1)) & 127) % 8 as int) AS n_frames,
        | CASE WHEN octet_length(cast(text as blob)) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, n_frames, frame_idx, frame_idx * 40 AS frame_ts_ms
        |FROM (
        | SELECT doc_id,
        |  cast(1 + octet_length(cast(text as blob)) % 8 as bigint) AS n_frames,
        |  unnest(range(0, 1 + octet_length(cast(text as blob)) % 8, 3)) AS frame_idx
        | FROM documents
        |) ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        | cast(octet_length(cast(text as blob)) as bigint) AS n_bytes,
        | md5(text) AS payload_md5,
        | substring(hex(cast(text as blob)), 1, 16) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_latest_per_key" ->
      """SELECT user_id, event_id, ts AS last_ts, event_type, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        | FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q33_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY custkey""".stripMargin,
    "q34_date_arith" ->
      """SELECT cast(year(o_orderdate) as bigint) AS y,
        | cast(month(o_orderdate) as bigint) AS m,
        | count(*) AS n_lines,
        | cast(sum(date_diff('day', cast(o_orderdate as date), cast(l_shipdate as date))) as double) / count(*) AS avg_latency_days,
        | max(cast(date_diff('day', cast(o_orderdate as date), cast(l_shipdate as date)) as bigint)) AS max_latency_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q35_regex_extract" ->
      """SELECT doc_id,
        | cast(len(regexp_extract_all(text, '\bs[a-z]+')) as bigint) AS n_s_words,
        | regexp_extract(text, '\b(s[a-z]+)', 1) AS first_s_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_bigrams" ->
      """WITH toks AS (
        | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), bg AS (
        | SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) bigram
        | FROM toks WHERE len(t) >= 2
        |), cnt AS (SELECT lang, bigram, count(*) n FROM bg GROUP BY 1, 2)
        |SELECT lang, cast(rnk as bigint) AS rank, bigram, n
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) rnk FROM cnt)
        |WHERE rnk <= 5 ORDER BY lang, rank""".stripMargin,
    "txt_vocab" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), stats AS (
        | SELECT term, count(*) tf, count(DISTINCT doc_id) df FROM tok GROUP BY 1
        |)
        |SELECT cast(row_number() OVER (ORDER BY tf DESC, term) as bigint) AS token_id,
        | term, tf, df
        |FROM stats ORDER BY token_id""".stripMargin,
    "txt_len_hist" ->
      """SELECT cast(floor(length(text) / 50) * 50 as bigint) AS bucket,
        | count(*) AS n_docs,
        | cast(sum(cast(length(text) as bigint)) as double) / count(*) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_pii_mask" ->
      """WITH s AS (
        | SELECT doc_id,
        |  'contact user' || cast(doc_id as varchar) || '@example.com at 10.0.' ||
        |  cast(doc_id % 256 as varchar) || '.7 ' || text AS s
        | FROM documents
        |)
        |SELECT doc_id,
        | regexp_replace(regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS masked,
        | cast(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint) AS n_emails,
        | cast(len(regexp_extract_all(s, '([0-9]{1,3}\.){3}[0-9]{1,3}')) as bigint) AS n_ips
        |FROM s ORDER BY doc_id""".stripMargin,
    "sim_quantize" ->
      """WITH m AS (
        | SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, v -> abs(cast(v as double)))) mx
        | FROM embeddings
        |)
        |SELECT vec_id, round(mx, 6) AS scale,
        | array_to_string(
        |  CASE WHEN mx = 0.0 THEN list_transform(embedding, v -> '0')
        |       ELSE list_transform(embedding, v -> cast(cast(floor(cast(v as double) * 127 / mx + 0.5) as int) as varchar))
        |  END, ',') AS qvec
        |FROM m ORDER BY vec_id""".stripMargin,
    "sim_centroid_dist" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (
        | SELECT label, list(c ORDER BY i) cv FROM cent GROUP BY 1
        |)
        |SELECT a.label label_a, b.label label_b,
        | round(list_sum(list_transform(range(1, 65), i -> a.cv[i] * b.cv[i])) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> a.cv[i] * a.cv[i]))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> b.cv[i] * b.cv[i])))), 6) AS cosine
        |FROM centv a JOIN centv b ON a.label < b.label
        |ORDER BY 1, 2""".stripMargin,
    "pipe_clean_corpus" ->
      """WITH c AS (
        | SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) clean
        | FROM documents
        |), t AS (
        | SELECT doc_id, clean,
        |  cast(len(list_filter(string_split(clean, ' '), x -> x <> '')) as bigint) n_tokens
        | FROM c
        |), d AS (
        | SELECT doc_id, md5(clean) clean_md5, n_tokens,
        |  row_number() OVER (PARTITION BY md5(clean) ORDER BY doc_id) rn,
        |  count(*) OVER (PARTITION BY md5(clean)) n_dups
        | FROM t WHERE n_tokens >= 10
        |)
        |SELECT doc_id, clean_md5, n_tokens, n_dups FROM d WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "dd_keepers" ->
      """SELECT doc_id, content_hash, n_dups FROM (
        | SELECT doc_id, md5(text) content_hash,
        |  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn,
        |  count(*) OVER (PARTITION BY md5(text)) n_dups
        | FROM documents
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dd_decontaminate" ->
      """WITH toks AS (
        | SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), g AS (
        | SELECT doc_id, source,
        |  unnest(list_distinct(list_transform(range(1, len(t) - 3), i -> list_aggregate(t[i:i+4], 'string_agg', ' ')))) ng
        | FROM toks WHERE len(t) >= 5
        |), bench AS (SELECT DISTINCT ng FROM g WHERE source = 'src0')
        |SELECT g.doc_id, count(DISTINCT g.ng) AS n_shared
        |FROM g JOIN bench USING (ng) WHERE g.source <> 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_stratified_sample" ->
      """WITH s AS (
        | SELECT source, doc_id,
        |  CASE WHEN cast(substring(source, 4) as int) % 2 = 0 THEN 64 ELSE 192 END thr,
        |  (strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar)), 1, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar)), 2, 1)) - 1) hx
        | FROM documents
        |)
        |SELECT source, cast(max(thr) as double) / 256 AS target_rate,
        | count(*) AS n_total,
        | cast(sum(CASE WHEN hx < thr THEN 1 ELSE 0 END) as bigint) AS n_sampled,
        | cast(sum(CASE WHEN hx < thr THEN 1 ELSE 0 END) as double) / count(*) AS achieved_rate,
        | min(CASE WHEN hx < thr THEN doc_id END) AS min_kept,
        | max(CASE WHEN hx < thr THEN doc_id END) AS max_kept
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    "txt_bm25" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), g AS (
        | SELECT count(*) n_docs,
        |  cast(sum(cast(len(t) as decimal(18,2))) as double) / count(*) avgdl,
        |  sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) df_join,
        |  sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) df_hash,
        |  sum(CASE WHEN list_contains(t, 'scan') THEN 1 ELSE 0 END) df_scan
        | FROM toks
        |), s AS (
        | SELECT doc_id, cast(len(t) as bigint) dl,
        |  cast(len(list_filter(t, x -> x = 'join')) as bigint) tf_join,
        |  cast(len(list_filter(t, x -> x = 'hash')) as bigint) tf_hash,
        |  cast(len(list_filter(t, x -> x = 'scan')) as bigint) tf_scan,
        |  avgdl, n_docs, df_join, df_hash, df_scan
        | FROM toks CROSS JOIN g
        |), sc AS (
        | SELECT doc_id, dl, tf_join, tf_hash, tf_scan,
        |  ((cast(n_docs - df_join as double) + 0.5) / (cast(df_join as double) + 0.5)) * (cast(tf_join as double) * 2.2) / (cast(tf_join as double) + 1.2 * (0.25 + 0.75 * (cast(dl as double) / avgdl)))
        | + ((cast(n_docs - df_hash as double) + 0.5) / (cast(df_hash as double) + 0.5)) * (cast(tf_hash as double) * 2.2) / (cast(tf_hash as double) + 1.2 * (0.25 + 0.75 * (cast(dl as double) / avgdl)))
        | + ((cast(n_docs - df_scan as double) + 0.5) / (cast(df_scan as double) + 0.5)) * (cast(tf_scan as double) * 2.2) / (cast(tf_scan as double) + 1.2 * (0.25 + 0.75 * (cast(dl as double) / avgdl))) score
        | FROM s
        |)
        |SELECT cast(row_number() OVER (ORDER BY score DESC, doc_id) as bigint) AS rank,
        | doc_id, dl, tf_join, tf_hash, tf_scan, score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "txt_gopher" ->
      """WITH t AS (
        | SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), bg AS (
        | SELECT doc_id, text, toks,
        |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) g
        | FROM t
        |), s AS (
        | SELECT doc_id,
        |  cast(len(toks) as bigint) n_tokens,
        |  cast(len(toks) - len(list_distinct(toks)) as double) / len(toks) dup_word_frac,
        |  CASE WHEN len(toks) < 2 THEN cast(0.0 as double) ELSE
        |   cast(list_max(list_transform(list_distinct(g), b -> len(list_filter(g, x -> x = b)))) as double) / (len(toks) - 1) END top_bigram_frac,
        |  cast(list_sum(list_transform(toks, x -> length(x))) as double) / len(toks) mean_word_len,
        |  cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) as double) / len(toks) symbol_ratio
        | FROM bg
        |)
        |SELECT doc_id, n_tokens, dup_word_frac, top_bigram_frac, mean_word_len, symbol_ratio,
        | (n_tokens >= 10 AND n_tokens <= 1000 AND dup_word_frac <= 0.6 AND top_bigram_frac <= 0.2
        |  AND mean_word_len >= 2 AND mean_word_len <= 12) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q38_interval_join" ->
      """SELECT a.event_id AS anchor_id,
        | count(e.event_id) AS n_events,
        | cast(sum(cast(e.value as decimal(18,2))) as double) AS sum_value
        |FROM events a
        |JOIN events e ON e.user_id = a.user_id
        | AND e.ts > a.ts AND e.ts <= a.ts + INTERVAL 7 DAY
        |WHERE a.event_type = 'signup'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_checksum" ->
      """WITH r AS (
        | SELECT l_returnflag,
        |  md5(concat_ws('|', cast(l_orderkey as varchar), cast(l_linenumber as varchar),
        |    cast(l_partkey as varchar), cast(l_suppkey as varchar),
        |    l_returnflag, l_linestatus)) h
        | FROM lineitem
        |), v AS (
        | SELECT l_returnflag,
        |  cast(list_sum(list_transform(range(1, 9),
        |    i -> cast(strpos('0123456789abcdef', substring(h, i, 1)) - 1 as bigint)
        |         * cast(power(16, 8 - i) as bigint))) as bigint) hv
        | FROM r
        |)
        |SELECT l_returnflag, count(*) AS n_rows,
        | cast(cast(sum(hv) as hugeint) % 2305843009213693951 AS bigint) AS checksum
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_semdedup" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.embedding, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, embedding, clabel,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), asg AS (SELECT vec_id, embedding, clabel FROM best WHERE rn = 1),
        |p AS (
        | SELECT a.vec_id va, b.vec_id vb,
        |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(b.embedding[i] as double) * cast(b.embedding[i] as double))))) cosim
        | FROM asg a JOIN asg b ON a.clabel = b.clabel AND a.vec_id < b.vec_id
        |)
        |SELECT vb AS dropped, min(va) AS keeper, count(*) AS n_near,
        | round(max(cosim), 6) AS max_sim
        |FROM p WHERE cosim >= 0.35 GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_hot_spans" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), g AS (
        | SELECT doc_id,
        |  unnest(list_distinct(list_transform(range(1, len(t) - 1), i -> list_aggregate(t[i:i+2], 'string_agg', ' ')))) span
        | FROM toks WHERE len(t) >= 3
        |)
        |SELECT span, count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
        |ORDER BY n_docs DESC, span LIMIT 50""".stripMargin,
    "txt_unigram_score" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), vocab AS (SELECT term, count(*) tf FROM toks GROUP BY 1),
        |total AS (SELECT sum(tf) corpus_total FROM vocab)
        |SELECT t.doc_id, count(*) AS dl, cast(sum(v.tf) as bigint) AS sum_tf,
        | round(cast(sum(v.tf) as double) /
        |   (cast(count(*) as double) * cast(max(total.corpus_total) as double)), 12) AS score
        |FROM toks t JOIN vocab v USING (term) CROSS JOIN total
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_pack_sequences" ->
      """WITH d AS (
        | SELECT lang, doc_id,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) dl
        | FROM documents
        |), o AS (
        | SELECT lang, doc_id, dl,
        |  cast(coalesce(sum(dl) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) start_off
        | FROM d WHERE dl > 0
        |)
        |SELECT lang, doc_id, dl, start_off,
        | start_off // 128 AS pack_first,
        | (start_off + dl - 1) // 128 AS pack_last,
        | (start_off // 128) <> ((start_off + dl - 1) // 128) AS spans_boundary
        |FROM o ORDER BY lang, doc_id""".stripMargin,
    "q40_lag_features" ->
      """SELECT event_id, user_id,
        | cast(cast(value as decimal(18,2)) as double) AS value,
        | cast(lag(cast(value as decimal(18,2))) OVER w as double) AS prev_value,
        | date_diff('second', lag(ts) OVER w, ts) AS gap_s,
        | cast(sum(cast(value as decimal(18,2))) OVER w3 as double)
        |   / count(*) OVER w3 AS avg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        | w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q41_column_stats" ->
      """WITH a AS (
        | SELECT count(*) n,
        |  cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) as bigint) null_ok,
        |  count(DISTINCT l_orderkey) ndv_ok,
        |  cast(min(l_orderkey) as varchar) min_ok, cast(max(l_orderkey) as varchar) max_ok,
        |  cast(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) as bigint) null_pk,
        |  count(DISTINCT l_partkey) ndv_pk,
        |  cast(min(l_partkey) as varchar) min_pk, cast(max(l_partkey) as varchar) max_pk,
        |  cast(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) as bigint) null_rf,
        |  count(DISTINCT l_returnflag) ndv_rf,
        |  min(l_returnflag) min_rf, max(l_returnflag) max_rf,
        |  cast(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) as bigint) null_ls,
        |  count(DISTINCT l_linestatus) ndv_ls,
        |  min(l_linestatus) min_ls, max(l_linestatus) max_ls
        | FROM lineitem)
        |SELECT 'l_orderkey' AS "column", n AS n_rows, null_ok AS n_null,
        |       ndv_ok AS ndv, min_ok AS min_s, max_ok AS max_s FROM a
        |UNION ALL SELECT 'l_partkey', n, null_pk, ndv_pk, min_pk, max_pk FROM a
        |UNION ALL SELECT 'l_returnflag', n, null_rf, ndv_rf, min_rf, max_rf FROM a
        |UNION ALL SELECT 'l_linestatus', n, null_ls, ndv_ls, min_ls, max_ls FROM a
        |ORDER BY "column"""".stripMargin,
    "q42_salted_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        | cast(sum(cast(l_extendedprice as decimal(18,2))
        |          * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) t_signup FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) t_click FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.t_signup GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) t_purchase FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t_click GROUP BY 1)
        |SELECT t1.user_id, t_signup, t_click, t_purchase,
        | 1 + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        |        LEFT JOIN t3 ON t1.user_id = t3.user_id
        |ORDER BY t1.user_id""".stripMargin,
    "txt_inverted_index" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) term
        | FROM documents
        |)
        |SELECT term, count(*) AS df,
        | array_to_string(list_transform((list_sort(list(doc_id)))[1:20],
        |   x -> cast(x as varchar)), ',') AS postings
        |FROM toks GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin,
    "txt_oov_rate" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), vocab AS (
        | SELECT term FROM (SELECT term, count(*) tf FROM toks GROUP BY 1) WHERE tf >= 5
        |)
        |SELECT t.doc_id, count(*) AS dl,
        | cast(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) as bigint) AS n_oov,
        | round(cast(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) as double)
        |   / cast(count(*) as double), 12) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.term = v.term
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_chunk_docs" ->
      """WITH d AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
        | FROM documents
        |), e AS (
        | SELECT doc_id, cast(len(toks) as bigint) dl, toks,
        |  unnest(range(0, cast(len(toks) as bigint), 48)) start_tok
        | FROM d WHERE len(toks) > 0
        |)
        |SELECT doc_id, start_tok // 48 AS chunk_idx, start_tok,
        | cast(least(64, dl - start_tok) as bigint) AS n_toks,
        | list_aggregate(toks[cast(start_tok + 1 as int):cast(least(start_tok + 64, dl) as int)],
        |   'string_agg', ' ') AS chunk_text
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    "q44_argmax" ->
      """WITH j AS (
        | SELECT n_name, c_name, c_acctbal, c_custkey,
        |  row_number() OVER (PARTITION BY n_name
        |    ORDER BY c_acctbal DESC, c_custkey DESC) rn,
        |  count(*) OVER (PARTITION BY n_name) n_customers,
        |  max(c_acctbal) OVER (PARTITION BY n_name) max_bal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT n_name, cast(n_customers as bigint) AS n_customers,
        | max_bal, c_name AS top_customer
        |FROM j WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "q45_sliding_distinct" ->
      """WITH days AS (SELECT DISTINCT cast(ts as date) AS d_day FROM events)
        |SELECT d.d_day AS "day", count(DISTINCT e.user_id) AS u7
        |FROM days d JOIN events e
        |  ON cast(e.ts as date) BETWEEN d.d_day - 6 AND d.d_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_fuzzy_match" ->
      """SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        | a.p_name AS name_a, b.p_name AS name_b,
        | cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        | AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY a.p_brand, key_a, key_b""".stripMargin,
    "mm_embed_stub" ->
      """WITH q AS (
        | SELECT doc_id, md5(text) pmd5 FROM documents WHERE doc_id < 5
        |), qe AS (
        | SELECT doc_id, list_transform(range(0, 64), j ->
        |   cast(strpos('0123456789abcdef',
        |     substring(md5(pmd5 || ':' || cast(j // 32 as varchar)), (j % 32) + 1, 1)) - 1
        |    as double) / 15.0) qv
        | FROM q
        |), scored AS (
        | SELECT qe.doc_id, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> qv[i] * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i ->
        |     cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM qe CROSS JOIN embeddings e
        |), r AS (
        | SELECT doc_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cosim DESC, vec_id) rank
        | FROM scored
        |)
        |SELECT doc_id, cast(rank as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q46_gap_fill" ->
      """WITH e AS (
        | SELECT user_id, cast(ts as date) AS "day", event_type, ts, event_id FROM events
        |), ranked AS (
        | SELECT user_id, "day", event_type,
        |  row_number() OVER (PARTITION BY user_id, "day"
        |    ORDER BY ts DESC, event_id DESC) rn,
        |  count(*) OVER (PARTITION BY user_id, "day") n
        | FROM e
        |), daily AS (
        | SELECT user_id, "day", n, event_type AS last_type FROM ranked WHERE rn = 1
        |), grid AS (
        | SELECT user_id, unnest(generate_series(d0, d1, interval 1 day))::date AS "day"
        | FROM (SELECT user_id, min("day") d0, max("day") d1 FROM e GROUP BY 1)
        |)
        |SELECT g.user_id, g."day",
        | coalesce(d.n, 0) AS n_events,
        | last_value(d.last_type IGNORE NULLS) OVER (
        |   PARTITION BY g.user_id ORDER BY g."day"
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_type
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g."day" = d."day"
        |ORDER BY g.user_id, g."day"""".stripMargin,
    "q47_cume_dist" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q49_rolling_median" ->
      """WITH d AS (
        | SELECT s_nationkey, cast(l_shipdate as date) AS "day",
        |  cast(sum(cast(l_extendedprice as decimal(18,2)) * 100) as bigint) AS rev_cents
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | GROUP BY 1, 2
        |)
        |SELECT s_nationkey, "day", rev_cents,
        | quantile_cont(rev_cents, 0.5) OVER (
        |   PARTITION BY s_nationkey ORDER BY "day"
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7_cents
        |FROM d ORDER BY s_nationkey, "day"""".stripMargin,
    "q56_markov" ->
      """WITH t AS (
        | SELECT user_id, event_type AS from_state,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        | FROM events
        |), c AS (
        | SELECT from_state, to_state, count(*) AS n FROM t
        | WHERE to_state IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_state, to_state, n,
        | n / sum(n) OVER (PARTITION BY from_state) AS p
        |FROM c ORDER BY from_state, to_state""".stripMargin,
    "q50_dq_audit" ->
      """SELECT 'row_count' AS "check", 'lineitem' AS subject, count(*) AS value FROM lineitem
        |UNION ALL SELECT 'row_count', 'orders', count(*) FROM orders
        |UNION ALL SELECT 'pk_duplicates', 'part', count(*) FROM
        | (SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL SELECT 'fk_orphans', 'lineitem->orders', count(*) FROM lineitem l
        | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL SELECT 'null_count', 'customer.c_mktsegment',
        | cast(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) as bigint) FROM customer
        |UNION ALL SELECT 'domain_violations', 'customer.c_acctbal<0',
        | cast(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) as bigint) FROM customer
        |UNION ALL SELECT 'distinct_keys', 'orders.o_orderkey',
        | count(DISTINCT o_orderkey) FROM orders
        |ORDER BY "check", subject""".stripMargin,
    "q51_scd2" ->
      """WITH s AS (
        | SELECT user_id, event_type AS state, ts, event_id,
        |  lag(event_type) OVER w AS prev_state
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), chg AS (
        | SELECT user_id, state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        | FROM s WHERE prev_state IS NULL OR prev_state <> state
        |)
        |SELECT user_id, state, valid_from, valid_to,
        | CASE WHEN valid_from <= timestamp '2024-01-15 00:00:00'
        |   AND (valid_to IS NULL OR valid_to > timestamp '2024-01-15 00:00:00')
        |  THEN 1 ELSE 0 END AS is_snapshot
        |FROM chg ORDER BY user_id, valid_from""".stripMargin,
    "q55_copurchase" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
        | count(*) AS n_orders
        |FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
        | AND a.l_partkey < b2.l_partkey
        |GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 50""".stripMargin,
    "q52_range_band" ->
      """WITH tiers(tier, lo, hi) AS (VALUES ('low', 0, 15), ('mid', 15, 35), ('high', 35, 51))
        |SELECT tier, count(*) AS n_lines,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS revenue
        |FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_tokenize_ids" ->
      """WITH t0 AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') tl
        | FROM documents
        |), tp AS (
        | SELECT doc_id, unnest(range(1, len(tl) + 1)) AS pos, tl FROM t0
        |), tx AS (
        | SELECT doc_id, pos, tl[pos] AS term FROM tp
        |), tf AS (
        | SELECT term, count(*) tf, count(DISTINCT doc_id) df FROM tx GROUP BY 1
        |), v AS (
        | SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS token_id FROM tf
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        | array_to_string(list(cast(token_id as varchar) ORDER BY pos), ',') AS ids
        |FROM tx JOIN v USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "pipe_mix_corpus" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        |u AS (
        | SELECT doc_id, d.lang, n_lang,
        |  list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5(cast(doc_id as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) AS uval
        | FROM documents d JOIN c ON d.lang = c.lang
        |)
        |SELECT doc_id, lang FROM u
        |WHERE cast(uval as decimal(38,0)) * cast(n_lang as decimal(38,0))
        |    < cast(100 as decimal(38,0)) * cast(1099511627776 as decimal(38,0))
        |ORDER BY doc_id""".stripMargin,
    "q57_pagerank" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |edges AS MATERIALIZED (SELECT a AS src, b2 AS dst FROM pairs
        |          UNION ALL SELECT b2, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
        |pr0 AS (SELECT src AS node, 1.0::double AS pr FROM deg),
        |pr1 AS (SELECT dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr / deg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr0 ON ed.src = pr0.node GROUP BY dst),
        |pr2 AS (SELECT dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr / deg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr1 ON ed.src = pr1.node GROUP BY dst),
        |pr3 AS (SELECT dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr / deg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr2 ON ed.src = pr2.node GROUP BY dst)
        |SELECT node, pr FROM pr3 ORDER BY pr DESC, node LIMIT 25""".stripMargin,
    "q59_retention" ->
      """WITH e AS (SELECT user_id, cast(ts as date) AS "day" FROM events),
        |f AS (SELECT user_id, date_trunc('week', min("day")) AS cohort_week FROM e GROUP BY 1),
        |sz AS (SELECT cohort_week, count(DISTINCT user_id) AS n_cohort FROM f GROUP BY 1),
        |act AS (
        | SELECT DISTINCT e.user_id, f.cohort_week,
        |  cast((date_trunc('week', e."day") - f.cohort_week) // 7 as bigint) AS week_offset
        | FROM e JOIN f ON e.user_id = f.user_id
        |), r AS (
        | SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
        | FROM act GROUP BY 1, 2
        |)
        |SELECT r.cohort_week, r.week_offset, r.n_active, sz.n_cohort,
        | r.n_active / sz.n_cohort AS retention
        |FROM r JOIN sz ON r.cohort_week = sz.cohort_week
        |ORDER BY r.cohort_week, r.week_offset""".stripMargin,
    "q61_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, cast(ts as date) AS "day" FROM events),
        |i AS (
        | SELECT user_id, "day",
        |  ("day" - DATE '1970-01-01')
        |   - row_number() OVER (PARTITION BY user_id ORDER BY "day") AS island
        | FROM d
        |), runs AS (
        | SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2
        |)
        |SELECT user_id, max(len) AS longest_streak,
        | cast(sum(len) as bigint) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q63_topk_per_group" ->
      """WITH r AS (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders
        |)
        |SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q58_triangles" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |deg AS (
        | SELECT n, count(*) AS d FROM (
        |  SELECT a AS n FROM pairs UNION ALL SELECT b2 FROM pairs) GROUP BY 1
        |),
        |tri AS (
        | SELECT count(*) AS t
        | FROM pairs ab JOIN pairs bc ON ab.b2 = bc.a
        |  JOIN pairs ac ON ac.a = ab.a AND ac.b2 = bc.b2
        |),
        |wed AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg)
        |SELECT 'clustering_coeff' AS metric, 3.0 * t / w AS value FROM tri, wed
        |UNION ALL SELECT 'n_edges', cast(count(*) as double) FROM pairs
        |UNION ALL SELECT 'n_triangles', cast(t as double) FROM tri
        |UNION ALL SELECT 'n_wedges', cast(w as double) FROM wed
        |ORDER BY metric""".stripMargin,
    "q62_ab_test" ->
      """WITH u AS (
        | SELECT user_id,
        |  CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |       THEN 1 ELSE 0 END AS converted
        | FROM events GROUP BY 1
        |), arms AS (
        | SELECT cast(user_id % 2 as int) AS arm, count(*) AS n_users,
        |  sum(converted) AS n_conv
        | FROM u GROUP BY 1
        |)
        |SELECT
        | cast(sum(CASE WHEN arm = 0 THEN n_users END) as bigint) AS n0,
        | cast(sum(CASE WHEN arm = 0 THEN n_conv END) as bigint) AS c0,
        | cast(sum(CASE WHEN arm = 1 THEN n_users END) as bigint) AS n1,
        | cast(sum(CASE WHEN arm = 1 THEN n_conv END) as bigint) AS c1,
        | sum(CASE WHEN arm = 0 THEN n_conv END) / sum(CASE WHEN arm = 0 THEN n_users END) AS p0,
        | sum(CASE WHEN arm = 1 THEN n_conv END) / sum(CASE WHEN arm = 1 THEN n_users END) AS p1,
        | (sum(CASE WHEN arm = 0 THEN n_conv END) / sum(CASE WHEN arm = 0 THEN n_users END)
        |   - sum(CASE WHEN arm = 1 THEN n_conv END) / sum(CASE WHEN arm = 1 THEN n_users END))
        |  / sqrt((sum(n_conv) / sum(n_users)) * (1.0 - sum(n_conv) / sum(n_users))
        |     * (1.0 / sum(CASE WHEN arm = 0 THEN n_users END)
        |        + 1.0 / sum(CASE WHEN arm = 1 THEN n_users END)) ) AS z
        |FROM arms""".stripMargin,
    "sim_matryoshka" ->
      """WITH e AS (
        | SELECT vec_id, label,
        |  list_sum(list_transform(embedding, v -> cast(v as double) * cast(v as double))) AS e2_full,
        |  list_sum(list_transform(embedding[1:16], v -> cast(v as double) * cast(v as double))) AS e2_head
        | FROM embeddings
        |)
        |SELECT vec_id, label,
        | round(e2_head / e2_full, 6) AS energy_kept,
        | round(sqrt(e2_head / e2_full), 6) AS cos_trunc
        |FROM e WHERE e2_full > 0 ORDER BY vec_id""".stripMargin,
    "q64_interval_merge" ->
      """WITH s AS (
        | SELECT user_id, event_id, ts AS start_ts,
        |  ts + INTERVAL 5 MINUTE AS end_ts
        | FROM events
        |), m AS (
        | SELECT *, max(end_ts) OVER (PARTITION BY user_id ORDER BY start_ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_end_before
        | FROM s
        |), f AS (
        | SELECT *, CASE WHEN max_end_before IS NULL OR start_ts > max_end_before
        |   THEN 1 ELSE 0 END AS new_island FROM m
        |), g AS (
        | SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY start_ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM f
        |)
        |SELECT user_id, cast(island as bigint) AS island,
        | min(start_ts) AS span_start, max(end_ts) AS span_end,
        | count(*) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY user_id, island""".stripMargin,
    "q65_debounce" ->
      """WITH l AS (
        | SELECT user_id, event_type, ts,
        |  lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts
        | FROM events
        |)
        |SELECT user_id, event_type, count(*) AS n_kept
        |FROM l
        |WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 30000000
        |GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,
    "q66_gini" ->
      """WITH x AS (
        | SELECT c_nationkey,
        |  cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint) AS cents,
        |  c_custkey,
        |  cast(row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint), c_custkey) as bigint) AS i
        | FROM customer
        |), g AS (
        | SELECT c_nationkey, count(*) AS n,
        |  cast(sum(cents) as bigint) AS sx, cast(sum(i * cents) as bigint) AS six
        | FROM x GROUP BY 1
        |)
        |SELECT c_nationkey, n,
        | round((six * 2 - (n + 1) * sx) / (n * sx), 6) AS gini
        |FROM g WHERE sx <> 0 ORDER BY c_nationkey""".stripMargin,
    "q67_abc_class" ->
      """WITH p AS (
        | SELECT l_partkey,
        |  cast(sum(cast(l_extendedprice as decimal(18,2)) * 100) as bigint) AS rev_cents
        | FROM lineitem GROUP BY 1
        |), c AS (
        | SELECT l_partkey, rev_cents,
        |  cast(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_cents,
        |  cast(sum(rev_cents) OVER () as bigint) AS total_cents
        | FROM p
        |)
        |SELECT l_partkey, rev_cents,
        | round(cum_cents / total_cents, 6) AS cum_share,
        | CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
        |      WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
        |      ELSE 'C' END AS abc
        |FROM c ORDER BY rev_cents DESC, l_partkey LIMIT 100""".stripMargin,
    "q68_benford" ->
      """WITH bf(digit, benford_p) AS (VALUES (1, 0.30103), (2, 0.176091),
        | (3, 0.124939), (4, 0.09691), (5, 0.079181), (6, 0.066947),
        | (7, 0.057992), (8, 0.051153), (9, 0.045757)),
        |obs AS (
        | SELECT cast(substring(cast(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as varchar), 1, 1) as int) AS digit,
        |  count(*) AS n
        | FROM orders GROUP BY 1
        |), t AS (SELECT cast(sum(n) as bigint) AS t FROM obs)
        |SELECT digit, n, n / t AS observed_p,
        | cast(benford_p as double) AS benford_p,
        | abs(n / t - benford_p) AS abs_dev
        |FROM obs JOIN bf USING (digit), t
        |ORDER BY digit""".stripMargin,
    "dd_containment" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (
        | SELECT doc_id, unnest(shingles) s FROM sh
        |), sizes AS (
        | SELECT doc_id, count(*) n FROM rows_ GROUP BY 1
        |), hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |), inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |)
        |SELECT da AS doc_a, db AS doc_b,
        | round(cast(ninter as double) / least(sa.n, sb.n), 6) AS containment
        |FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        |WHERE ninter * 2 >= least(sa.n, sb.n)
        |ORDER BY 1, 2""".stripMargin,
    "txt_readability" ->
      """WITH d AS (
        | SELECT doc_id,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) AS n_words,
        |  cast(greatest(len(regexp_extract_all(text, '[.!?]')), 1) as bigint) AS n_sents,
        |  cast(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) as bigint) AS n_vgroups
        | FROM documents
        |)
        |SELECT doc_id, n_words, n_sents, n_vgroups,
        | 206.835 - 1.015 * (n_words / n_sents)
        |   - 84.6 * (n_vgroups / n_words) AS flesch
        |FROM d WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    "txt_kn_counts" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), bi AS (
        | SELECT unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        | FROM toks WHERE len(t) >= 2
        |), bx AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bi),
        |counts AS (SELECT w1, w2, count(*) AS n_bigram FROM bx GROUP BY 1, 2),
        |prefix AS (SELECT w1, cast(sum(n_bigram) as bigint) AS n_prefix FROM counts GROUP BY 1),
        |contin AS (SELECT w2, count(*) AS n_continuation FROM counts GROUP BY 1)
        |SELECT c.w1 AS w1, c.w2 AS w2, c.n_bigram, p.n_prefix, k.n_continuation
        |FROM counts c JOIN prefix p ON c.w1 = p.w1 JOIN contin k ON c.w2 = k.w2
        |ORDER BY c.n_bigram DESC, c.w1, c.w2 LIMIT 100""".stripMargin,
    "pipe_span_corruption" ->
      """WITH d AS (
        | SELECT doc_id,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) AS dl,
        |  list_sum(list_transform(range(1, 7), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5(cast(doc_id as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((6 - i) * 4)))) % 10 AS phase
        | FROM documents
        |), s AS (
        | SELECT doc_id, dl, phase,
        |  unnest(range(cast(phase as bigint), cast(dl as bigint), cast(10 as bigint))) AS start_tok
        | FROM d WHERE dl >= 10
        |), e AS (
        | SELECT doc_id, start_tok, dl,
        |  cast(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1 as bigint) AS span_id
        | FROM s
        |)
        |SELECT doc_id, span_id, start_tok,
        | least(3, dl - start_tok) AS span_len,
        | 32000 + span_id AS sentinel_id
        |FROM e ORDER BY doc_id, span_id""".stripMargin,
    "q69_chi2" ->
      """WITH obs AS (
        | SELECT event_type, cast(user_id % 2 as int) AS segment, count(*) AS n
        | FROM events GROUP BY 1, 2
        |), r AS (SELECT event_type, cast(sum(n) as bigint) AS row_n FROM obs GROUP BY 1),
        |c AS (SELECT segment, cast(sum(n) as bigint) AS col_n FROM obs GROUP BY 1),
        |t AS (SELECT cast(sum(n) as bigint) AS total_n FROM obs)
        |SELECT obs.event_type, obs.segment, obs.n,
        | round(r.row_n * c.col_n / t.total_n, 6) AS expected,
        | round((obs.n - r.row_n * c.col_n / t.total_n)
        |   * (obs.n - r.row_n * c.col_n / t.total_n)
        |   / (r.row_n * c.col_n / t.total_n), 6) AS chi2_term
        |FROM obs JOIN r ON obs.event_type = r.event_type
        | JOIN c ON obs.segment = c.segment, t
        |ORDER BY obs.event_type, obs.segment""".stripMargin,
    "pipe_sft_render" ->
      """WITH d AS (
        | SELECT doc_id,
        |  '<|system|>You are a helpful assistant.<|user|>' ||
        |  'Summarize the following ' || lang || ' document from ' || source || ':' ||
        |  '<|assistant|>' AS header, text
        | FROM documents
        |)
        |SELECT doc_id,
        | substring(header || text, 1, 600) AS rendered,
        | cast(len(header) as bigint) AS loss_start_char,
        | cast(len(substring(header || text, 1, 600)) as bigint) AS n_chars,
        | CASE WHEN len(substring(header || text, 1, 600)) < len(header || text)
        |  THEN 1 ELSE 0 END AS clipped
        |FROM d ORDER BY doc_id""".stripMargin,
    "dd_minhash_sigs" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |)
        |SELECT doc_id,
        | cast(len(list_distinct(shingles)) as bigint) AS n_shingles,
        | array_to_string(list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')), ',') AS signature
        |FROM sh ORDER BY doc_id""".stripMargin,
    "q71_share_of_parent" ->
      """WITH n AS (
        | SELECT r_name, n_name,
        |  cast(sum(cast(o_totalprice as decimal(18,2)) * 100) as bigint) AS nation_cents
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | GROUP BY 1, 2
        |), r AS (SELECT r_name, cast(sum(nation_cents) as bigint) AS region_cents FROM n GROUP BY 1)
        |SELECT n.r_name, n.n_name,
        | cast(nation_cents as double) / 100 AS nation_revenue,
        | round(nation_cents / region_cents, 6) AS share_of_region
        |FROM n JOIN r ON n.r_name = r.r_name
        |ORDER BY n.r_name, n.n_name""".stripMargin,
    "q72_yoy" ->
      """WITH m AS (
        | SELECT cast(year(o_orderdate) as int) AS yr, cast(month(o_orderdate) as int) AS mo,
        |  cast(sum(cast(o_totalprice as decimal(18,2)) * 100) as bigint) AS rev_cents
        | FROM orders GROUP BY 1, 2
        |), l AS (
        | SELECT yr, mo, rev_cents,
        |  lag(rev_cents) OVER (PARTITION BY mo ORDER BY yr) AS prev_cents,
        |  lag(yr) OVER (PARTITION BY mo ORDER BY yr) AS prev_yr
        | FROM m
        |)
        |SELECT yr, mo, rev_cents,
        | round((rev_cents - CASE WHEN prev_yr = yr - 1 THEN prev_cents END)
        |  / CASE WHEN prev_yr = yr - 1 THEN prev_cents END, 6) AS yoy_growth
        |FROM l ORDER BY yr, mo""".stripMargin,
    "dd_incremental" -> incrementalDedupOracle,
    // CDC: base-31 window-8 polynomial per position, boundary at
    // h % 64 = 0; duplicate-chunk rollup (copies >= 2)
    "dd_cdc_chunks" -> {
      val pows = Array.iterate(1L, 8)(_ * 31L)
      val h = (0 until 8)
        .map(j => s"cast(ascii(substring(text, i - $j, 1)) as bigint) * ${pows(j)}")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, text, cast(length(text) as int) n FROM documents),
         |b AS (
         | SELECT doc_id, text, n,
         |  list_filter(list_transform(range(8, greatest(n, 8)), i ->
         |    CASE WHEN ($h) % 64 = 0 THEN i ELSE -1 END), x -> x <> -1) bnds
         | FROM d
         |), a AS (
         | SELECT doc_id, text, [0] || bnds || [n] AS allb FROM b
         |), k AS (
         | SELECT doc_id, text, allb, unnest(range(1, len(allb))) kk FROM a
         |), c AS (
         | SELECT doc_id,
         |  md5(substring(text, cast(allb[kk] + 1 as int), cast(allb[kk + 1] - allb[kk] as int))) chunk_md5,
         |  cast(allb[kk + 1] - allb[kk] as bigint) chunk_len
         | FROM k
         |)
         |SELECT chunk_md5, min(chunk_len) AS chunk_len,
         | cast(count(*) as bigint) AS n_copies,
         | cast(count(DISTINCT doc_id) as bigint) AS n_docs,
         | min(doc_id) AS keeper_doc
         |FROM c GROUP BY 1 HAVING count(*) >= 2 ORDER BY chunk_md5""".stripMargin
    },

    // Byte-level containment off the CDC chunk index: distinct chunk
    // hashes per doc, hot-chunk df-100 cap (the default-ON guard,
    // replicated here), pair kept iff 2*inter >= min set size
    "dd_chunk_containment" -> {
      val pows = Array.iterate(1L, 8)(_ * 31L)
      val h = (0 until 8)
        .map(j => s"cast(ascii(substring(text, i - $j, 1)) as bigint) * ${pows(j)}")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, text, cast(length(text) as int) n FROM documents),
         |b AS (
         | SELECT doc_id, text, n,
         |  list_filter(list_transform(range(8, greatest(n, 8)), i ->
         |    CASE WHEN ($h) % 64 = 0 THEN i ELSE -1 END), x -> x <> -1) bnds
         | FROM d
         |), a AS (
         | SELECT doc_id, text, [0] || bnds || [n] AS allb FROM b
         |), k AS (
         | SELECT doc_id, text, allb, unnest(range(1, len(allb))) kk FROM a
         |), c AS (
         | SELECT DISTINCT doc_id,
         |  md5(substring(text, cast(allb[kk] + 1 as int), cast(allb[kk + 1] - allb[kk] as int))) s
         | FROM k
         |), sz AS (
         | SELECT doc_id, cast(count(*) as bigint) n FROM c GROUP BY 1
         |), df AS (
         | SELECT s, count(*) df FROM c GROUP BY 1
         |), keep AS (
         | SELECT c.doc_id, c.s FROM c JOIN df USING (s) WHERE df <= 100
         |), pairs AS (
         | SELECT a2.doc_id da, b2.doc_id db, cast(count(*) as bigint) ninter
         | FROM keep a2 JOIN keep b2 ON a2.s = b2.s AND a2.doc_id < b2.doc_id
         | GROUP BY 1, 2
         |)
         |SELECT p.da doc_a, p.db doc_b, sa.n n_chunks_a, sb.n n_chunks_b, ninter,
         | ninter * 1000000 // least(sa.n, sb.n) containment_micro
         |FROM pairs p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
         |WHERE ninter * 2 >= least(sa.n, sb.n)
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // CDC ingest savings: same chunk CTEs, history = distinct hashes of
    // ids < 400, per-new-doc hit/byte rollup
    "dd_cdc_ingest" -> {
      val pows = Array.iterate(1L, 8)(_ * 31L)
      val h = (0 until 8)
        .map(j => s"cast(ascii(substring(text, i - $j, 1)) as bigint) * ${pows(j)}")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, text, cast(length(text) as int) n FROM documents),
         |b AS (
         | SELECT doc_id, text, n,
         |  list_filter(list_transform(range(8, greatest(n, 8)), i ->
         |    CASE WHEN ($h) % 64 = 0 THEN i ELSE -1 END), x -> x <> -1) bnds
         | FROM d
         |), a AS (
         | SELECT doc_id, text, [0] || bnds || [n] AS allb FROM b
         |), k AS (
         | SELECT doc_id, text, allb, unnest(range(1, len(allb))) kk FROM a
         |), c AS (
         | SELECT doc_id,
         |  md5(substring(text, cast(allb[kk] + 1 as int), cast(allb[kk + 1] - allb[kk] as int))) chunk_md5,
         |  cast(allb[kk + 1] - allb[kk] as bigint) chunk_len
         | FROM k
         |), hist AS (SELECT DISTINCT chunk_md5 FROM c WHERE doc_id < 400),
         |nw AS (
         | SELECT c.doc_id, c.chunk_len,
         |  CASE WHEN hist.chunk_md5 IS NULL THEN 0 ELSE 1 END hit
         | FROM c LEFT JOIN hist USING (chunk_md5) WHERE c.doc_id >= 400
         |)
         |SELECT doc_id, cast(count(*) as bigint) AS n_chunks,
         | cast(sum(hit) as bigint) AS n_hit,
         | cast(sum(chunk_len) as bigint) AS bytes_total,
         | cast(sum(CASE WHEN hit = 1 THEN chunk_len ELSE 0 END) as bigint) AS bytes_saved,
         | cast(sum(CASE WHEN hit = 1 THEN chunk_len ELSE 0 END) * 1000000 // sum(chunk_len) as bigint) AS saved_micro
         |FROM nw GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // runs up-and-down: sign changes over the nonzero daily deltas
    "q169_runs_up_down" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), s0 AS (
        | SELECT o_orderpriority, "day",
        |  cents - lag(cents) OVER (PARTITION BY o_orderpriority ORDER BY "day") d
        | FROM daily
        |), s1 AS (
        | SELECT o_orderpriority, "day",
        |  CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0 END s
        | FROM s0 WHERE d IS NOT NULL
        |), nz AS (
        | SELECT o_orderpriority, s,
        |  lag(s) OVER (PARTITION BY o_orderpriority ORDER BY "day") prev_s
        | FROM s1 WHERE s <> 0
        |), agg AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) m,
        |  cast(sum(CASE WHEN prev_s IS NOT NULL AND prev_s <> s THEN 1 ELSE 0 END) as bigint) n_changes
        | FROM nz GROUP BY 1
        |), z AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_zero
        | FROM s1 WHERE s = 0 GROUP BY 1
        |)
        |SELECT a.o_orderpriority, a.m, coalesce(z.n_zero, 0) AS n_zero,
        | cast(a.n_changes + 1 as bigint) AS n_runs,
        | cast(2 * (a.m + 1) - 1 as bigint) AS mean3,
        | cast(16 * (a.m + 1) - 29 as bigint) AS var90
        |FROM agg a LEFT JOIN z USING (o_orderpriority) ORDER BY 1""".stripMargin,

    // Mantel-Haenszel: per-year 2x2 cells + micro-floored ad/n, bc/n
    "q170_mantel_haenszel" ->
      """WITH g AS (
        | SELECT cast(year(cast(o_orderdate as date)) as bigint) yr,
        |  cast(sum(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) a,
        |  cast(sum(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) as bigint) b,
        |  cast(sum(CASE WHEN o_orderpriority = '5-LOW' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) c,
        |  cast(sum(CASE WHEN o_orderpriority = '5-LOW' AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) as bigint) d
        | FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        | GROUP BY 1
        |)
        |SELECT yr, a, b, c, d, a + b + c + d AS n,
        | cast(cast(a as hugeint) * d * 1000000 // (a + b + c + d) as bigint) AS ad_micro,
        | cast(cast(b as hugeint) * c * 1000000 // (a + b + c + d) as bigint) AS bc_micro
        |FROM g ORDER BY yr""".stripMargin,

    // inverse-frequency class weights (sklearn 'balanced' convention)
    "pipe_class_weights" ->
      """WITH g AS (SELECT lang, cast(count(*) as bigint) n_docs FROM documents GROUP BY 1),
        |t AS (SELECT cast(sum(n_docs) as bigint) n_total, cast(count(*) as bigint) k FROM g)
        |SELECT lang, n_docs, n_total,
        | cast(n_docs * 1000000 // n_total as bigint) AS share_micro,
        | cast(n_total * 1000000 // (k * n_docs) as bigint) AS weight_micro
        |FROM g CROSS JOIN t ORDER BY lang""".stripMargin,

    // per-doc verdict rollup of the incremental candidates: same band
    // CTEs, then the Levenshtein verify tier and a min() per new doc
    "dd_edit_gate" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), p AS (
        | SELECT n.doc_id doc_new, h.doc_id doc_old
        | FROM bands n JOIN bands h ON n.bh = h.bh AND n.b = h.b
        | WHERE n.doc_id >= 400 AND h.doc_id < 400
        | GROUP BY 1, 2
        |), v AS (
        | SELECT d.doc_id doc_new, d.lang, p.doc_old,
        |  cast(levenshtein(d.text, t.text) as bigint) * 1000000
        |   // greatest(length(d.text), length(t.text)) dist_micro
        | FROM documents d
        | LEFT JOIN p ON p.doc_new = d.doc_id
        | LEFT JOIN documents t ON t.doc_id = p.doc_old
        | WHERE d.doc_id >= 400
        |)
        |SELECT doc_new, lang, cast(count(DISTINCT doc_old) as bigint) AS n_cand,
        | min(dist_micro) AS best_micro,
        | coalesce(min(dist_micro) <= 400000, false) AS is_dup
        |FROM v GROUP BY 1, 2 ORDER BY doc_new""".stripMargin,
    // the lake flow materializes history signatures to parquet first,
    // but the PAIRS it yields are identical to the recompute path
    "dd_incremental_lake" -> incrementalDedupOracle,
    // the skew-capped LSH config: buckets larger than 8 are dropped
    // WHOLE on both sides — the cap is replicated exactly, so this row
    // is a strict oracle on the guarded code path itself
    "dd_minhash_lsh_capped" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), bsz AS (
        | SELECT b, bh, count(*) n FROM bands GROUP BY 1, 2
        |)
        |SELECT a.doc_id doc_a, b.doc_id doc_b
        |FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        |JOIN bsz s ON s.b = a.b AND s.bh = a.bh
        |WHERE s.n <= 8
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dd_embed_cos_lsh" -> embedCosLshOracle(4),
    "q73_reservoir" ->
      """WITH h AS (
        | SELECT user_id, event_id, event_type,
        |  md5(cast(user_id as varchar) || ':' || cast(event_id as varchar)) AS hh
        | FROM events
        |), r AS (
        | SELECT user_id, event_id, event_type,
        |  cast(row_number() OVER (PARTITION BY user_id ORDER BY hh, event_id) as bigint) AS rn
        | FROM h
        |)
        |SELECT user_id, rn, event_id, event_type
        |FROM r WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin,
    "pipe_quality_report" ->
      """WITH t AS (
        | SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), bg AS (
        | SELECT doc_id, text, toks,
        |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) g
        | FROM t
        |), s AS (
        | SELECT doc_id,
        |  cast(len(toks) as bigint) n_tokens,
        |  cast(len(toks) - len(list_distinct(toks)) as double) / len(toks) dup_word_frac,
        |  CASE WHEN len(toks) < 2 THEN cast(0.0 as double) ELSE
        |   cast(list_max(list_transform(list_distinct(g), b -> len(list_filter(g, x -> x = b)))) as double) / (len(toks) - 1) END top_bigram_frac,
        |  cast(list_sum(list_transform(toks, x -> length(x))) as double) / len(toks) mean_word_len
        | FROM bg
        |), k AS (
        | SELECT *,
        |  (n_tokens >= 10 AND n_tokens <= 1000 AND dup_word_frac <= 0.6 AND top_bigram_frac <= 0.2
        |   AND mean_word_len >= 2 AND mean_word_len <= 12) AS keep
        | FROM s
        |)
        |SELECT 'docs_total' AS gate, count(*) AS n FROM k
        |UNION ALL SELECT 'fail_length', cast(sum(CASE WHEN n_tokens < 10 OR n_tokens > 1000 THEN 1 ELSE 0 END) as bigint) FROM k
        |UNION ALL SELECT 'fail_dup_words', cast(sum(CASE WHEN dup_word_frac > 0.6 THEN 1 ELSE 0 END) as bigint) FROM k
        |UNION ALL SELECT 'fail_top_bigram', cast(sum(CASE WHEN top_bigram_frac > 0.2 THEN 1 ELSE 0 END) as bigint) FROM k
        |UNION ALL SELECT 'fail_word_len', cast(sum(CASE WHEN mean_word_len < 2 OR mean_word_len > 12 THEN 1 ELSE 0 END) as bigint) FROM k
        |UNION ALL SELECT 'kept', cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) as bigint) FROM k
        |ORDER BY gate""".stripMargin,
    "q74_regression" ->
      """WITH s AS (
        | SELECT l_returnflag, count(*) AS n,
        |  cast(sum(cast(l_quantity as decimal(18,2))) as double) sx,
        |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) sy,
        |  cast(sum(cast(l_quantity as decimal(18,2)) * cast(l_extendedprice as decimal(18,2))) as double) sxy,
        |  cast(sum(cast(l_quantity as decimal(18,2)) * cast(l_quantity as decimal(18,2))) as double) sxx,
        |  cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_extendedprice as decimal(18,2))) as double) syy
        | FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, n,
        | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        | round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS intercept,
        | round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q75_wma" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), lagged AS (
        | SELECT o_orderpriority, "day", cents,
        |  cents * 7 + lag(cents, 1) OVER w * 6 + lag(cents, 2) OVER w * 5 +
        |  lag(cents, 3) OVER w * 4 + lag(cents, 4) OVER w * 3 +
        |  lag(cents, 5) OVER w * 2 + lag(cents, 6) OVER w * 1 AS wsum
        | FROM daily WINDOW w AS (PARTITION BY o_orderpriority ORDER BY "day")
        |)
        |SELECT o_orderpriority, "day", cents, round(wsum / 28.0, 6) AS wma7
        |FROM lagged WHERE wsum IS NOT NULL
        |ORDER BY o_orderpriority, "day"""".stripMargin,
    "q100_ema" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), lagged AS (
        | SELECT o_orderpriority, "day", cents,
        |  cents * 16384 + lag(cents, 1) OVER w * 12288 + lag(cents, 2) OVER w * 9216 +
        |  lag(cents, 3) OVER w * 6912 + lag(cents, 4) OVER w * 5184 +
        |  lag(cents, 5) OVER w * 3888 + lag(cents, 6) OVER w * 2916 +
        |  lag(cents, 7) OVER w * 2187 AS wsum
        | FROM daily WINDOW w AS (PARTITION BY o_orderpriority ORDER BY "day")
        |)
        |SELECT o_orderpriority, "day", cents,
        | cast((wsum // 58975) * 1000 + ((wsum % 58975) * 1000) // 58975 as bigint) AS ema8_milli
        |FROM lagged WHERE wsum IS NOT NULL
        |ORDER BY o_orderpriority, "day"""".stripMargin,
    "q102_mode" ->
      """WITH c AS (
        | SELECT user_id, event_type, count(*) c FROM events GROUP BY 1, 2
        |), r AS (
        | SELECT user_id, event_type, c,
        |  row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) rn,
        |  max(c) OVER (PARTITION BY user_id) mc
        | FROM c
        |)
        |SELECT user_id, event_type AS mode_type, cast(mc as bigint) AS n_mode
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q103_spearman" ->
      """WITH r AS (
        | SELECT l_returnflag,
        |  cast(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) as bigint) rq,
        |  cast(rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) as bigint) rp
        | FROM lineitem
        |), a AS (
        | SELECT l_returnflag, count(*) n,
        |  sum(cast((rq - rp) * (rq - rp) as hugeint)) s2
        | FROM r GROUP BY 1
        |)
        |SELECT l_returnflag, n,
        | cast(s2 as varchar) AS sum_d2,
        | cast(cast(n as hugeint) * n * n - n - 6 * s2 as varchar) AS rho_num,
        | cast(cast(n as hugeint) * n * n - n as varchar) AS rho_den
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q104_weighted_median" ->
      """WITH v AS (
        | SELECT l_returnflag,
        |  cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) cents,
        |  cast(sum(cast(l_quantity as bigint)) as bigint) w
        | FROM lineitem GROUP BY 1, 2
        |), c AS (
        | SELECT l_returnflag, cents, w,
        |  cast(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) as bigint) cw,
        |  cast(sum(w) OVER (PARTITION BY l_returnflag) as bigint) tw
        | FROM v
        |)
        |SELECT l_returnflag, max(tw) AS total_weight, min(cents) AS wmedian_cents
        |FROM c WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin,
    "q105_histogram" ->
      """WITH c AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents FROM orders
        |), b AS (
        | SELECT min(cents) lo, max(cents) hi FROM c
        |)
        |SELECT cast(((cents - lo) * 20) // (hi - lo + 1) as bigint) AS bucket,
        | count(*) AS n_orders, min(cents) AS min_cents, max(cents) AS max_cents
        |FROM c CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q106_response_time" ->
      """WITH fc AS (
        | SELECT user_id, min(epoch_us(ts)) first_click_us
        | FROM events WHERE event_type = 'click' GROUP BY 1
        |)
        |SELECT e.user_id,
        | cast(min(first_click_us) as bigint) AS first_click_us,
        | cast(min(epoch_us(ts)) as bigint) AS first_purchase_us,
        | cast(min(epoch_us(ts)) - min(first_click_us) as bigint) AS gap_us
        |FROM events e JOIN fc ON e.user_id = fc.user_id
        |WHERE e.event_type = 'purchase' AND epoch_us(ts) >= first_click_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q108_ks_test" ->
      """WITH s AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents,
        |  cast(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) as bigint) a1,
        |  cast(sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END) as bigint) a2
        | FROM orders GROUP BY 1
        |), c AS (
        | SELECT cast(sum(a1) OVER (ORDER BY cents) as bigint) c1,
        |  cast(sum(a2) OVER (ORDER BY cents) as bigint) c2
        | FROM s
        |), t AS (
        | SELECT cast(sum(a1) as bigint) n1, cast(sum(a2) as bigint) n2 FROM s
        |)
        |SELECT max(n1) AS n1, max(n2) AS n2,
        | cast(max(abs(cast(c1 as hugeint) * n2 - cast(c2 as hugeint) * n1)) as varchar) AS ks_num,
        | cast(cast(max(n1) as hugeint) * max(n2) as varchar) AS ks_den
        |FROM c CROSS JOIN t""".stripMargin,
    "pipe_epoch_shuffle" ->
      """WITH d AS (
        | SELECT doc_id, unnest([0, 1]) AS epoch FROM documents
        |), k AS (
        | SELECT epoch, doc_id,
        |  md5(cast(epoch as varchar) || ':' || cast(doc_id as varchar)) skey
        | FROM d
        |), s AS (
        | SELECT epoch, doc_id, skey,
        |  cast(list_sum(list_transform(range(1, 9), i ->
        |    cast((strpos('0123456789abcdef', substring(skey, i, 1)) - 1) as bigint)
        |    * (cast(1 as bigint) << ((8 - i) * 4)))) % 8 as bigint) shard
        | FROM k
        |)
        |SELECT cast(epoch as bigint) AS epoch, shard, doc_id,
        | cast(row_number() OVER (PARTITION BY epoch, shard ORDER BY skey, doc_id) as bigint) AS slot
        |FROM s ORDER BY epoch, shard, slot""".stripMargin,
    "mm_phash_dup" -> MmPhashDupSql,
    // the threshold-tuning diagnostic: pair counts per Hamming tier off
    // the same pair set (oracle wraps the shared phash SQL verbatim)
    "mm_phash_hamming_hist" ->
      (s"SELECT hamming, cast(count(*) as bigint) AS n_pairs FROM (\n$MmPhashDupSql\n" +
        ") GROUP BY 1 ORDER BY 1"),
    "mm_phash_dup_wide" ->
      """WITH ph AS (
        |WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(
        |   regexp_replace(hex(cast(text as blob)), '(.{8})', '\1 ', 'g'), ' '),
        |   x -> x <> '')) t
        | FROM documents
        |), hw AS (
        | SELECT doc_id,
        |  list_sum(list_transform(range(1, 17), i ->
        |    cast((strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1) as hugeint)
        |    * cast(power(16, 16 - i) as hugeint))) hv1,
        |  list_sum(list_transform(range(17, 33), i ->
        |    cast((strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1) as hugeint)
        |    * cast(power(16, 32 - i) as hugeint))) hv2
        | FROM tok
        |), votes AS (
        | SELECT doc_id, w.wi, b.j,
        |  sum(CASE WHEN ((CASE WHEN w.wi = 1 THEN hv1 ELSE hv2 END) >> b.j) & 1 = 1
        |      THEN 1 ELSE -1 END) v
        | FROM hw
        | CROSS JOIN (SELECT unnest(range(0, 64)) j) b
        | CROSS JOIN (SELECT unnest([1, 2]) wi) w
        | GROUP BY 1, 2, 3
        |), phu AS (
        | SELECT doc_id,
        |  sum(CASE WHEN wi = 1 AND v > 0 THEN cast(power(2, j) as hugeint)
        |      ELSE cast(0 as hugeint) END) u1,
        |  sum(CASE WHEN wi = 2 AND v > 0 THEN cast(power(2, j) as hugeint)
        |      ELSE cast(0 as hugeint) END) u2
        | FROM votes GROUP BY 1
        |)
        |SELECT doc_id, u1, u2,
        | cast(u1 - CASE WHEN u1 >= cast(power(2, 63) as hugeint)
        |   THEN cast(power(2, 64) as hugeint) ELSE 0 END as bigint) w1s,
        | cast(u2 - CASE WHEN u2 >= cast(power(2, 63) as hugeint)
        |   THEN cast(power(2, 64) as hugeint) ELSE 0 END as bigint) w2s
        |FROM phu
        |), famed AS (
        | SELECT ph.* FROM ph
        | JOIN (SELECT u1, u2, count(*) fam_n FROM ph GROUP BY 1, 2) f USING (u1, u2)
        | WHERE f.fam_n <= 100
        |), bands AS (
        | SELECT doc_id, w1s, w2s, bb.b,
        |  CASE WHEN bb.b % 3 = 0 THEN (CASE WHEN bb.b < 3 THEN u1 ELSE u2 END) & 4194303
        |       WHEN bb.b % 3 = 1 THEN ((CASE WHEN bb.b < 3 THEN u1 ELSE u2 END) >> 22) & 2097151
        |       ELSE ((CASE WHEN bb.b < 3 THEN u1 ELSE u2 END) >> 43) & 2097151 END bh
        | FROM famed CROSS JOIN (SELECT unnest(range(0, 6)) b) bb
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        | cast(bit_count(xor(a.w1s, b2.w1s)) + bit_count(xor(a.w2s, b2.w2s)) as bigint) AS hamming
        |FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.w1s, b2.w1s)) + bit_count(xor(a.w2s, b2.w2s)) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q111_runs_test" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(sum(cents) as bigint) total, count(*) n_days
        | FROM daily GROUP BY 1
        |), flags AS (
        | SELECT d.o_orderpriority, "day", n_days,
        |  CASE WHEN cents * n_days > total THEN 1 ELSE 0 END AS above
        | FROM daily d JOIN tot t ON d.o_orderpriority = t.o_orderpriority
        |), b AS (
        | SELECT o_orderpriority, n_days, above,
        |  CASE WHEN lag(above) OVER w IS NULL THEN 1
        |       WHEN lag(above) OVER w <> above THEN 1 ELSE 0 END AS boundary
        | FROM flags WINDOW w AS (PARTITION BY o_orderpriority ORDER BY "day")
        |)
        |SELECT o_orderpriority, max(n_days) AS n_days,
        | cast(sum(above) as bigint) AS n_above,
        | cast(sum(boundary) as bigint) AS n_runs
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q112_mann_whitney" ->
      """WITH s AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents,
        |  cast(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) as bigint) a1,
        |  cast(sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END) as bigint) a2
        | FROM orders GROUP BY 1
        |), c AS (
        | SELECT a1, a2,
        |  cast(coalesce(sum(a1 + a2) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) c_lt
        | FROM s
        |), agg AS (
        | SELECT cast(sum(a1) as bigint) n1, cast(sum(a2) as bigint) n2,
        |  sum(cast(a1 as hugeint) * (1 + c_lt)) rank_sum_a
        | FROM c
        |)
        |SELECT n1, n2, cast(rank_sum_a as varchar) AS rank_sum_a,
        | cast(rank_sum_a - (CASE WHEN n1 % 2 = 0
        |   THEN cast(n1 // 2 as hugeint) * (n1 + 1)
        |   ELSE cast((n1 + 1) // 2 as hugeint) * n1 END) as varchar) AS u_a
        |FROM agg""".stripMargin,
    "txt_langid_confusion" ->
      """WITH t AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), s AS (
        | SELECT doc_id, lang,
        |  cast(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) as bigint) s_de,
        |  cast(len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as bigint) s_en,
        |  cast(len(list_filter(toks, x -> x IN ('el', 'la', 'de', 'que', 'y', 'los'))) as bigint) s_es,
        |  cast(len(list_filter(toks, x -> x IN ('le', 'les', 'et', 'des', 'un', 'une'))) as bigint) s_fr
        | FROM t
        |), p AS (
        | SELECT lang,
        |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
        |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
        | FROM s
        |)
        |SELECT lang, pred_lang, count(*) AS n_docs
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mm_chunk_media" ->
      """WITH d AS (
        | SELECT doc_id, hex(cast(text as blob)) hx,
        |  cast(octet_length(cast(text as blob)) as bigint) n_bytes
        | FROM documents WHERE octet_length(cast(text as blob)) > 0
        |), g AS (
        | SELECT doc_id, hx, n_bytes, unnest(range(0, n_bytes, 96)) AS sb FROM d
        |)
        |SELECT doc_id,
        | cast(sb // 96 as bigint) AS chunk_idx,
        | cast(sb as bigint) AS start_byte,
        | cast(least(96, n_bytes - sb) as bigint) AS chunk_len,
        | md5(substring(hx, cast(sb * 2 + 1 as bigint), 192)) AS chunk_md5
        |FROM g ORDER BY doc_id, chunk_idx""".stripMargin,
    "sim_pq_codes" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, (i - 1) // 8 AS sub, i,
        |  cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2, 3
        |), centv AS (
        | SELECT label clabel, sub, list(c ORDER BY i) cv FROM cent GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, s.sub, embedding
        | FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, sv.sub, clabel,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (cast(embedding[sv.sub * 8 + j] as double) - cv[j]) * (cast(embedding[sv.sub * 8 + j] as double) - cv[j]))) dist
        | FROM sv JOIN centv ON sv.sub = centv.sub
        |), best AS (
        | SELECT vec_id, sub, clabel,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) rn FROM d
        |)
        |SELECT vec_id, cast(sub as bigint) AS sub, cast(clabel as bigint) AS code
        |FROM best WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin,
    "pipe_dataset_card" ->
      """WITH base AS (
        | SELECT lang,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) n_tokens,
        |  count(*) OVER (PARTITION BY md5(text)) n_copies
        | FROM documents
        |), pl AS (
        | SELECT lang, count(*) n_docs,
        |  cast(sum(n_tokens) as bigint) total_tokens,
        |  cast(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) as bigint) n_dup_docs
        | FROM base GROUP BY 1
        |), t AS (SELECT cast(sum(total_tokens) as bigint) grand_tokens FROM pl)
        |SELECT lang, n_docs, total_tokens, n_dup_docs,
        | cast((total_tokens * 1000000) // grand_tokens as bigint) AS token_share_micro,
        | cast((total_tokens * 1000000) // n_docs as bigint) AS avg_tokens_micro,
        | cast((n_dup_docs * 1000000) // n_docs as bigint) AS dup_rate_micro
        |FROM pl CROSS JOIN t ORDER BY lang""".stripMargin,
    "q114_topk_ties" ->
      """WITH c AS (
        | SELECT o_orderpriority, o_orderkey,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders
        |), r AS (
        | SELECT o_orderpriority, o_orderkey, cents,
        |  cast(rank() OVER (PARTITION BY o_orderpriority ORDER BY cents DESC) as bigint) rnk
        | FROM c
        |)
        |SELECT o_orderpriority, rnk, cents, o_orderkey
        |FROM r WHERE rnk <= 3 ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
    "q116_quintile_transition" ->
      """WITH rev AS (
        | SELECT o_custkey, year(o_orderdate) yr,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) rev
        | FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1, 2
        |), b AS (
        | SELECT yr, quantile_cont(rev, [0.2, 0.4, 0.6, 0.8]) qb FROM rev GROUP BY 1
        |), s AS (
        | SELECT o_custkey, rev.yr,
        |  cast(1 + len(list_filter(qb, v -> rev > v)) as bigint) q
        | FROM rev JOIN b ON rev.yr = b.yr
        |)
        |SELECT p.q AS q_prev, c.q AS q_cur, count(*) AS n_customers
        |FROM s p JOIN s c ON p.o_custkey = c.o_custkey AND p.yr = 1996 AND c.yr = 1997
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dd_bloom_prefilter" ->
      """WITH probes AS (
        | SELECT doc_id, text, unnest(range(0, 3)) i FROM documents
        |), pos AS (
        | SELECT doc_id,
        |  cast(list_sum(list_transform(range(1, 9), j ->
        |    cast((strpos('0123456789abcdef', substring(md5(cast(i as varchar) || ':' || text), j, 1)) - 1) as bigint)
        |    * (cast(1 as bigint) << ((8 - j) * 4)))) % 4096 as bigint) pos,
        |  doc_id >= 400 AS is_new
        | FROM probes
        |), hist AS (SELECT DISTINCT pos FROM pos WHERE NOT is_new),
        |probe AS (
        | SELECT p.doc_id, sum(CASE WHEN h.pos IS NOT NULL THEN 1 ELSE 0 END) n_hit
        | FROM pos p LEFT JOIN hist h ON p.pos = h.pos
        | WHERE p.is_new GROUP BY 1
        |)
        |SELECT doc_id, cast(n_hit as bigint) AS n_hit, n_hit = 3 AS maybe_dup
        |FROM probe ORDER BY doc_id""".stripMargin,
    "dd_lsh_tuning_curve" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), cfg AS (SELECT * FROM (VALUES (2, 4), (4, 2), (8, 1)) c(nb, r)),
        |bands AS (
        | SELECT doc_id, nb, r, b,
        |  md5(list_aggregate(m[b*r+1 : b*r+r], 'string_agg', '') || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN cfg CROSS JOIN (SELECT unnest(range(0, 8)) b) bs
        | WHERE b < nb
        |), pairs AS (
        | SELECT DISTINCT a.nb AS nb, a.r AS r, a.doc_id da, b2.doc_id db
        | FROM bands a JOIN bands b2
        |  ON a.nb = b2.nb AND a.r = b2.r AND a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id
        |)
        |SELECT cast(c.nb as bigint) AS n_bands, cast(c.r as bigint) AS rows_per_band,
        | cast(coalesce(p.n, 0) as bigint) AS n_candidate_pairs
        |FROM cfg c LEFT JOIN (SELECT nb, r, count(*) n FROM pairs GROUP BY 1, 2) p
        | ON c.nb = p.nb AND c.r = p.r
        |ORDER BY 1""".stripMargin,
    "txt_code_detect" ->
      """WITH s AS (
        | SELECT doc_id,
        |  cast(len(regexp_extract_all(text, '[{}\[\]()]')) as bigint) n_brackets,
        |  cast(len(regexp_extract_all(text, ';')) as bigint) n_semicolons,
        |  cast(len(regexp_extract_all(text, '[=<>!]=|=')) as bigint) n_assign,
        |  cast(len(regexp_extract_all(text, '[a-z]+_[a-z]+')) as bigint) n_snake,
        |  cast(length(text) as bigint) n_chars
        | FROM documents
        |)
        |SELECT doc_id, n_brackets, n_semicolons, n_assign, n_snake, n_chars,
        | n_chars > 0 AND
        | (CASE WHEN n_brackets * 40 >= n_chars THEN 1 ELSE 0 END +
        |  CASE WHEN n_semicolons * 100 >= n_chars THEN 1 ELSE 0 END +
        |  CASE WHEN n_assign * 60 >= n_chars THEN 1 ELSE 0 END +
        |  CASE WHEN n_snake * 80 >= n_chars THEN 1 ELSE 0 END) >= 2 AS is_code
        |FROM s ORDER BY doc_id""".stripMargin,
    "q76_gini_impurity" ->
      """WITH c AS (
        | SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
        |), a AS (
        | SELECT user_id, cast(sum(c) as bigint) n_events, count(*) n_types,
        |  cast(sum(c * c) as bigint) sc2
        | FROM c GROUP BY 1
        |)
        |SELECT user_id, n_events, n_types,
        | (n_events * n_events - sc2) / cast(n_events * n_events as double) AS impurity
        |FROM a ORDER BY user_id""".stripMargin,
    "q77_hhi" ->
      """WITH rev AS (
        | SELECT c_nationkey, c_custkey, sum(cast(o_totalprice as decimal(18,2))) AS rev
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
        |), nat AS (
        | SELECT c_nationkey, sum(rev) AS nrev, count(*) AS n_customers FROM rev GROUP BY 1
        |)
        |SELECT r.c_nationkey, n_customers,
        | round(cast(sum(cast(round((cast(rev as double) / cast(nrev as double)) * (cast(rev as double) / cast(nrev as double)), 12) as decimal(20,12))) as double) * 10000, 6) AS hhi
        |FROM rev r JOIN nat n ON r.c_nationkey = n.c_nationkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q79_bollinger" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), win AS (
        | SELECT o_orderpriority, "day", cents,
        |  row_number() OVER wn AS rn,
        |  sum(cents) OVER w AS s1,
        |  sum(cast(cents as decimal(19,0)) * cents) OVER w AS s2
        | FROM daily
        | WINDOW wn AS (PARTITION BY o_orderpriority ORDER BY "day"),
        |  w AS (PARTITION BY o_orderpriority ORDER BY "day" ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT o_orderpriority, "day", cents,
        | round(s1 / 20.0 / 100.0, 6) AS ma20,
        | round((s1 / 20.0 + 2.0 * sqrt((20.0 * cast(s2 as double) - cast(s1 as double) * cast(s1 as double)) / 380.0)) / 100.0, 6) AS upper,
        | round((s1 / 20.0 - 2.0 * sqrt((20.0 * cast(s2 as double) - cast(s1 as double) * cast(s1 as double)) / 380.0)) / 100.0, 6) AS lower
        |FROM win WHERE rn >= 20 ORDER BY o_orderpriority, "day"""".stripMargin,
    "q80_dow_profile" ->
      """WITH daily AS (
        | SELECT c_nationkey, cast(o_orderdate as date) AS "day",
        |  sum(cast(o_totalprice as decimal(18,2))) AS rev
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
        |)
        |SELECT c_nationkey, cast(dayofweek("day") as bigint) AS dow,
        | count(*) AS n_days,
        | round(cast(sum(rev) as double) / count(*), 6) AS avg_daily_rev
        |FROM daily GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q83_winsorize" ->
      """WITH pct AS (
        | SELECT c_nationkey, quantile_cont(c_acctbal, 0.05) AS p05,
        |  quantile_cont(c_acctbal, 0.95) AS p95
        | FROM customer GROUP BY 1
        |)
        |SELECT c.c_nationkey, count(*) AS n,
        | cast(sum(cast(round(least(greatest(c_acctbal, p05), p95), 6) as decimal(24,6))) as double) / count(*) AS winsorized_mean
        |FROM customer c JOIN pct ON c.c_nationkey = pct.c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_cluster_sizes" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |),
        |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |csz AS (SELECT component, count(*) sz FROM comp GROUP BY 1)
        |SELECT cast(sz as bigint) AS cluster_size, count(*) AS n_clusters
        |FROM csz GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_range_search" ->
      """WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |)
        |SELECT qid AS query_id, vec_id, round(cosim, 6) AS score
        |FROM s WHERE cosim >= 0.25 ORDER BY query_id, vec_id""".stripMargin,
    "mm_exact_dup" ->
      """SELECT md5(text) AS payload_md5, count(*) AS n_copies,
        | min(doc_id) AS keeper,
        | max(cast(octet_length(cast(text as blob)) as bigint)) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_ttr" ->
      """WITH t AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |)
        |SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
        | cast(len(list_distinct(toks)) as bigint) AS n_types,
        | len(list_distinct(toks)) / cast(len(toks) as double) AS ttr
        |FROM t WHERE len(toks) > 0 ORDER BY doc_id""".stripMargin,
    "pipe_interleave" ->
      """WITH s AS (
        | SELECT source, cast(row_number() OVER (ORDER BY source) as bigint) - 1 AS src_idx
        | FROM (SELECT DISTINCT source FROM documents)
        |), ns AS (SELECT count(*) AS n FROM s),
        |r AS (
        | SELECT doc_id, source,
        |  cast(row_number() OVER (PARTITION BY source ORDER BY doc_id) as bigint) AS rank_in_source
        | FROM documents
        |)
        |SELECT (r.rank_in_source - 1) * (SELECT n FROM ns) + s.src_idx + 1 AS position,
        | r.source, r.rank_in_source, r.doc_id
        |FROM r JOIN s ON r.source = s.source
        |ORDER BY position""".stripMargin,
    "q84_cusum" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(sum(cents) as bigint) AS s, count(*) AS n
        | FROM daily GROUP BY 1
        |), cum AS (
        | SELECT d.o_orderpriority, d."day", t.n, t.s,
        |  cast(sum(cents) OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") as bigint) AS p,
        |  cast(row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") as bigint) AS i
        | FROM daily d JOIN tot t ON d.o_orderpriority = t.o_orderpriority
        |), dev AS (
        | SELECT o_orderpriority, "day", n, n * p - i * s AS dev FROM cum
        |), pick AS (
        | SELECT o_orderpriority, "day", n, abs(dev) AS adev,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY abs(dev) DESC, "day" DESC) AS rn
        | FROM dev
        |)
        |SELECT o_orderpriority, n AS n_days, "day" AS peak_day,
        | round(cast(adev as double) / cast(n as double) / 100.0, 6) AS peak_cum_dev
        |FROM pick WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,
    "q85_autocorr" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) AS cents
        | FROM orders GROUP BY 1, 2
        |), pairs AS (
        | SELECT o_orderpriority, cents,
        |  lead(cents) OVER (PARTITION BY o_orderpriority ORDER BY "day") AS nxt
        | FROM daily
        |), s AS (
        | SELECT o_orderpriority, count(*) AS n_pairs,
        |  cast(sum(cents) as double) sx, cast(sum(nxt) as double) sy,
        |  cast(sum(cast(cents as decimal(19,0)) * nxt) as double) sxy,
        |  cast(sum(cast(cents as decimal(19,0)) * cents) as double) sxx,
        |  cast(sum(cast(nxt as decimal(19,0)) * nxt) as double) syy
        | FROM pairs WHERE nxt IS NOT NULL GROUP BY 1
        |)
        |SELECT o_orderpriority, n_pairs,
        | round((n_pairs * sxy - sx * sy) /
        |  sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 6) AS autocorr_lag1
        |FROM s ORDER BY o_orderpriority""".stripMargin,
    "q86_skyline" ->
      """WITH cnt AS (
        | SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
        |), j AS (
        | SELECT c_nationkey, c_custkey, c_acctbal,
        |  coalesce(n_orders, 0) AS n_orders
        | FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
        |), m AS (
        | SELECT *, max(n_orders) OVER (PARTITION BY c_nationkey
        |   ORDER BY c_acctbal DESC, c_custkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        | FROM j
        |)
        |SELECT c_nationkey, c_custkey, c_acctbal, n_orders
        |FROM m WHERE prev_max IS NULL OR n_orders > prev_max
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "txt_hapax" ->
      """WITH tok AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        | FROM documents
        |), c AS (
        | SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_vocab,
        | cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) as bigint) AS n_hapax,
        | sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / cast(count(*) as double) AS hapax_rate
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_curriculum" ->
      """WITH t AS (
        | SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') toks
        | FROM documents
        |), s AS (
        | SELECT doc_id, source, cast(len(toks) as bigint) AS n_tokens,
        |  round(list_sum(list_transform(toks, x -> length(x))) / cast(len(toks) as double), 6) AS score
        | FROM t WHERE len(toks) > 0
        |)
        |SELECT doc_id, source, n_tokens, score,
        | cast(ntile(4) OVER (PARTITION BY source ORDER BY score, doc_id) as bigint) AS stage
        |FROM s ORDER BY doc_id""".stripMargin,
    "sim_knn_graph" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |s AS (
        | SELECT a.vec_id src_id, b.vec_id dst_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(b.embedding[i] as double) * cast(b.embedding[i] as double))))) cosim
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
        |), r AS (
        | SELECT src_id, dst_id, cosim,
        |  row_number() OVER (PARTITION BY src_id ORDER BY cosim DESC, dst_id) rnk
        | FROM s
        |)
        |SELECT src_id, cast(rnk as bigint) AS rank, dst_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 3 ORDER BY src_id, rank""".stripMargin,
    "sim_nsw_topk" -> nswOracle(16, 5, 5),
    "sim_nsw_recall" -> nswRecallOracle(16, 5, 5),
    "sim_hnsw_topk" -> hnswOracle(16, 5, 5, 4),
    "sim_hnsw_recall" -> hnswRecallOracle(16, 5, 5, 4),
    "dd_simhash_pairs" ->
      """WITH sim AS (
        |WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) t FROM documents
        |), h AS (
        | SELECT doc_id, list_sum(list_transform(range(1, 16), i ->
        |   cast((strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1) as bigint)
        |   * cast(power(16, 15 - i) as bigint))) hv
        | FROM tok
        |), votes AS (
        | SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) v
        | FROM h CROSS JOIN (SELECT unnest(range(0, 60)) j) GROUP BY 1, 2
        |)
        |SELECT doc_id, cast(sum(CASE WHEN v > 0 THEN cast(1 as bigint) << j ELSE 0 END) as bigint) AS simhash
        |FROM votes GROUP BY 1
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | cast(bit_count(xor(a.simhash, b.simhash)) as bigint) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q87_median_gap" ->
      """WITH o AS (
        | SELECT o_custkey, cast(o_orderdate as date) AS "day", o_orderkey FROM orders
        |), g AS (
        | SELECT o_custkey,
        |  datediff('day', lag("day") OVER (PARTITION BY o_custkey ORDER BY "day", o_orderkey), "day") AS gap
        | FROM o
        |)
        |SELECT o_custkey, count(*) AS n_gaps,
        | quantile_cont(gap, 0.5) AS median_gap_days,
        | cast(max(gap) as bigint) AS max_gap_days
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_repetition" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), g AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) grams
        | FROM toks WHERE len(t) >= 4
        |)
        |SELECT doc_id, cast(len(grams) as bigint) AS n_grams,
        | cast(len(list_distinct(grams)) as bigint) AS n_distinct,
        | (len(grams) - len(list_distinct(grams))) / cast(len(grams) as double) AS repetition
        |FROM g WHERE len(grams) > 0 ORDER BY doc_id""".stripMargin,
    "dd_jaccard_est" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), pairs AS (
        | SELECT a.doc_id doc_a, b.doc_id doc_b
        | FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        | GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b,
        | cast(list_sum(list_transform(range(1, 9), i -> CASE WHEN sa.m[i] = sb.m[i] THEN 1 ELSE 0 END)) as bigint) AS n_match,
        | round(list_sum(list_transform(range(1, 9), i -> CASE WHEN sa.m[i] = sb.m[i] THEN 1 ELSE 0 END)) / 8.0, 6) AS jaccard_est
        |FROM pairs p JOIN sig sa ON sa.doc_id = p.doc_a JOIN sig sb ON sb.doc_id = p.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q88_rfm" ->
      """WITH base AS (
        | SELECT o_custkey,
        |  datediff('day', max(cast(o_orderdate as date)),
        |    (SELECT max(cast(o_orderdate as date)) FROM orders)) AS recency,
        |  count(*) AS frequency,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS monetary
        | FROM orders GROUP BY 1
        |), b AS (
        | SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) rb,
        |  quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) fb,
        |  quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) mb
        | FROM base
        |)
        |SELECT o_custkey, cast(recency as bigint) AS recency, frequency, monetary,
        | cast(1 + list_sum(list_transform(rb, v -> CASE WHEN recency > v THEN 1 ELSE 0 END)) as bigint) AS r_score,
        | cast(1 + list_sum(list_transform(fb, v -> CASE WHEN frequency > v THEN 1 ELSE 0 END)) as bigint) AS f_score,
        | cast(1 + list_sum(list_transform(mb, v -> CASE WHEN monetary > v THEN 1 ELSE 0 END)) as bigint) AS m_score
        |FROM base CROSS JOIN b ORDER BY o_custkey""".stripMargin,
    "pipe_pack_stats" ->
      """WITH d AS (
        | SELECT lang, doc_id,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) dl
        | FROM documents
        |), o AS (
        | SELECT lang, doc_id, dl,
        |  cast(coalesce(sum(dl) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) start_off
        | FROM d WHERE dl > 0
        |), p AS (
        | SELECT lang, dl,
        |  (start_off // 128) <> ((start_off + dl - 1) // 128) AS spans_boundary,
        |  (start_off + dl - 1) // 128 AS pack_last
        | FROM o
        |)
        |SELECT lang, count(*) AS n_docs,
        | cast(sum(dl) as bigint) AS total_tokens,
        | cast(max(pack_last) + 1 as bigint) AS n_bins,
        | cast(sum(CASE WHEN spans_boundary THEN 1 ELSE 0 END) as bigint) AS n_spanning,
        | sum(dl) / cast((max(pack_last) + 1) * 128 as double) AS fill_ratio
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q89_cohort_ltv" ->
      """WITH e AS (
        | SELECT user_id, cast(ts as date) AS "day",
        |  CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS rev
        | FROM events
        |), f AS (
        | SELECT user_id, date_trunc('week', min("day")) AS cohort_week FROM e GROUP BY 1
        |), wk AS (
        | SELECT f.cohort_week,
        |  cast((date_trunc('week', e."day") - f.cohort_week) // 7 as bigint) AS week_offset,
        |  sum(cast(rev as decimal(18,2))) AS wrev
        | FROM e JOIN f ON e.user_id = f.user_id
        | GROUP BY 1, 2
        |)
        |SELECT cohort_week, week_offset,
        | cast(wrev as double) AS week_rev,
        | cast(sum(wrev) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS cum_rev
        |FROM wk ORDER BY cohort_week, week_offset""".stripMargin,
    "q90_attribution" ->
      """WITH p AS (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events
        |), c AS (
        | SELECT prev_type AS touch_type, count(*) AS n_purchases
        | FROM p WHERE event_type = 'purchase' AND prev_type IS NOT NULL
        | GROUP BY 1
        |), t AS (SELECT sum(n_purchases) AS t FROM c)
        |SELECT touch_type, n_purchases,
        | n_purchases / cast(t as double) AS credit_share
        |FROM c CROSS JOIN t ORDER BY touch_type""".stripMargin,
    "dd_dup_rate_by_source" ->
      """WITH h AS (
        | SELECT doc_id, source, md5(text) AS h FROM documents
        |), dup AS (
        | SELECT h FROM h GROUP BY h HAVING count(*) > 1
        |)
        |SELECT source, count(*) AS n_docs,
        | cast(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_dup_docs,
        | sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS dup_rate
        |FROM h LEFT JOIN dup ON h.h = dup.h
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_recall_report" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (
        | SELECT label, list(c ORDER BY i) cv FROM cent GROUP BY 1
        |), q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |cellscore AS (
        | SELECT q.qid, cv.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cv.cv[i])) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cv.cv[i] * cv.cv[i])))) cs
        | FROM q CROSS JOIN centv cv
        |), cells AS (
        | SELECT qid, label FROM (
        |  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label) rn FROM cellscore
        | ) WHERE rn <= 2
        |), s AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q JOIN cells ON cells.qid = q.qid JOIN embeddings e ON e.label = cells.label
        | WHERE e.vec_id <> q.qid
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |),
        |approx AS (SELECT query_id, vec_id FROM r WHERE rnk <= 10),
        |es AS (
        | SELECT q.qid, e.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |), er AS (
        | SELECT qid query_id, vec_id,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM es
        |), exact AS (SELECT query_id, vec_id FROM er WHERE rnk <= 10)
        |SELECT e.query_id, count(*) AS k,
        | cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hit,
        | sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS recall_at_k
        |FROM exact e LEFT JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q91_forecast_naive" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) AS cents
        | FROM orders GROUP BY 1, 2
        |), p AS (
        | SELECT o_orderpriority, cents,
        |  lag(cents, 7) OVER (PARTITION BY o_orderpriority ORDER BY "day") AS pred
        | FROM daily
        |)
        |SELECT o_orderpriority, count(*) AS n_scored,
        | round(cast(sum(abs(cents - pred)) as double) / count(*) / 100.0, 6) AS mae_dollars,
        | round(cast(sum(cast(round(abs(cents - pred) / cast(cents as double), 12) as decimal(24,12))) as double) / count(*), 6) AS mape
        |FROM p WHERE pred IS NOT NULL AND cents > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q92_outlier_mad" ->
      """WITH med AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
        |), mad AS (
        | SELECT e.event_type, quantile_cont(abs(value - med), 0.5) AS mad, any_value(med) AS med
        | FROM events e JOIN med ON e.event_type = med.event_type GROUP BY 1
        |)
        |SELECT e.event_type, event_id, value,
        | round((value - mad.med) / (1.4826 * mad.mad), 6) AS robust_z
        |FROM events e JOIN mad ON e.event_type = mad.event_type
        |WHERE mad.mad > 0 AND abs(value - mad.med) > 3.0 * 1.4826 * mad.mad
        |ORDER BY e.event_type, event_id""".stripMargin,
    "pipe_token_budget" ->
      """WITH t AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), s AS (
        | SELECT doc_id, lang, cast(len(toks) as bigint) AS n_tokens,
        |  round(list_sum(list_transform(toks, x -> length(x))) / cast(len(toks) as double), 6) AS score
        | FROM t WHERE len(toks) > 0
        |), c AS (
        | SELECT *, cast(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS taken_before
        | FROM s
        |)
        |SELECT lang, doc_id, n_tokens, score, taken_before
        |FROM c WHERE taken_before < 5000
        |ORDER BY lang, taken_before""".stripMargin,
    "dd_lsh_recall" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), shd AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (
        | SELECT doc_id, unnest(shingles) s FROM shd
        |), sizes AS (
        | SELECT doc_id, count(*) n FROM rows_ GROUP BY 1
        |), hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |), inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |), exact AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |), shr AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM shr
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), cand AS (
        | SELECT a.doc_id ca, b.doc_id cb
        | FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        | GROUP BY 1, 2
        |)
        |SELECT count(*) AS n_exact_pairs,
        | cast(sum(CASE WHEN ca IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_caught,
        | sum(CASE WHEN ca IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) as double) AS recall
        |FROM exact LEFT JOIN cand ON da = ca AND db = cb""".stripMargin,
    "txt_bpe_pairs" ->
      """WITH w AS (
        | SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents
        |), p AS (
        | SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, i, 2))) AS pair
        | FROM w WHERE length(w) >= 2
        |), c AS (
        | SELECT pair, count(*) AS freq FROM p GROUP BY 1
        |), r AS (
        | SELECT pair, freq, row_number() OVER (ORDER BY freq DESC, pair) rn FROM c
        |)
        |SELECT pair, freq FROM r WHERE rn <= 20
        |ORDER BY freq DESC, pair""".stripMargin,

    // BPE training, 3 unrolled merge rounds as CTE stages; segs ride as
    // '(s1)(s2)...' strings so applying a merge is one literal replace
    // whose left-to-right non-overlap IS greedy BPE order; argmax
    // tie-break = freq DESC, (a,b) lexical in both engines
    "txt_bpe_merges" -> (BpeOracleCtes +
      """
        |SELECT cast(1 as bigint) AS round, a AS left_sym, b AS right_sym,
        |  a || b AS merged, freq FROM m1
        |UNION ALL SELECT cast(2 as bigint), a, b, a || b, freq FROM m2
        |UNION ALL SELECT cast(3 as bigint), a, b, a || b, freq FROM m3
        |ORDER BY round""".stripMargin),

    // BPE apply: the same 3 training rounds, read out as the
    // corpus-weighted segmentation compression over the final segs
    "txt_bpe_encode" -> (BpeOracleCtes +
      """
        |SELECT cast(sum(cnt) as bigint) AS n_tokens,
        | cast(count(*) as bigint) AS n_types,
        | cast(sum(cnt * length(w)) as bigint) AS n_sym_before,
        | cast(sum(cnt * len(string_split(trim(seg, '()'), ')('))) as bigint) AS n_sym_after,
        | cast(sum(CASE WHEN len(string_split(trim(seg, '()'), ')(')) < length(w)
        |   THEN 1 ELSE 0 END) as bigint) AS n_types_shortened,
        | cast(cast(sum(cnt * len(string_split(trim(seg, '()'), ')('))) as hugeint)
        |   * 1000000 // sum(cnt * length(w)) as bigint) AS compression_micro
        |FROM s3""".stripMargin),
    "q93_time_range_frame" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority, "day", cents,
        | cast(sum(cents) OVER (PARTITION BY o_orderpriority
        |   ORDER BY ("day" - DATE '1970-01-01')
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) as bigint) AS trail7_cents
        |FROM daily ORDER BY o_orderpriority, "day"""".stripMargin,
    "q94_typed_avg" ->
      """SELECT o_orderpriority,
        | cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) as double) / count(*) / 100.0 AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_sql_front_door" ->
      """SELECT r_name AS region, n_name AS nation,
        | count(*) AS n_orders,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region, nation""".stripMargin,
    "q96_session_window" ->
      """WITH e AS (
        | SELECT user_id, ts,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        > INTERVAL 30 MINUTE OR
        |       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |  THEN 1 ELSE 0 END AS is_new
        | FROM events
        |), s AS (
        | SELECT user_id, ts,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM e
        |)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL 30 MINUTE AS session_end,
        | count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q97_asof_operator" ->
      """WITH ranked AS (
        | SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |  row_number() OVER (PARTITION BY e.event_id
        |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
        | FROM events e JOIN orders o
        |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |)
        |SELECT e.event_id, e.user_id,
        | r.o_orderkey AS last_order_key, r.o_orderdate AS last_order_ts
        |FROM events e LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
        |ORDER BY e.event_id""".stripMargin,
    "pipe_e2e_corpus" ->
      """WITH c AS (
        | SELECT doc_id, lang,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        | FROM documents
        |), t AS (
        | SELECT doc_id, lang, clean,
        |  cast(len(list_filter(string_split(clean, ' '), x -> x <> '')) as bigint) AS dl
        | FROM c
        |), g AS (
        | SELECT doc_id, lang, dl, md5(clean) AS h,
        |  row_number() OVER (PARTITION BY md5(clean) ORDER BY doc_id) AS rn
        | FROM t WHERE dl >= 10
        |), kept AS (
        | SELECT doc_id, lang, dl FROM g WHERE rn = 1
        |), packed AS (
        | SELECT lang, dl,
        |  cast(coalesce(sum(dl) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start_off
        | FROM kept
        |), p AS (
        | SELECT lang, dl, (start_off + dl - 1) // 128 AS pack_last FROM packed
        |)
        |SELECT lang, count(*) AS n_docs_kept,
        | cast(sum(dl) as bigint) AS total_tokens,
        | cast(max(pack_last) + 1 as bigint) AS n_bins,
        | sum(dl) / cast((max(pack_last) + 1) * 128 as double) AS fill_ratio
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q98_kmv_distinct" ->
      """WITH h AS (
        | SELECT DISTINCT event_type, md5(cast(user_id as varchar)) AS h FROM events
        |), r AS (
        | SELECT event_type, h,
        |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS nd
        | FROM h
        |), kth AS (
        | SELECT event_type, nd,
        |  cast(list_sum(list_transform(range(1, 16), i ->
        |    cast(strpos('0123456789abcdef', h[i]) - 1 as bigint)
        |      * (cast(1 as bigint) << (4 * (15 - i))))) as bigint) AS v
        | FROM r WHERE rn = 64
        |), ex AS (
        | SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
        |), est AS (
        | SELECT r.event_type,
        |  CASE WHEN max(r.nd) < 64 THEN cast(max(r.nd) as double)
        |       ELSE 63.0 / (cast(max(kth.v) as double) / 1152921504606846976.0) END AS est_distinct
        | FROM r LEFT JOIN kth ON r.event_type = kth.event_type
        | GROUP BY 1
        |)
        |SELECT ex.event_type, ex.n_exact, est.est_distinct
        |FROM ex JOIN est ON ex.event_type = est.event_type
        |ORDER BY ex.event_type""".stripMargin,
    "q99_decile_lift" ->
      """WITH spend AS (
        | SELECT o_custkey, sum(cast(o_totalprice as decimal(18,2))) AS rev,
        |  count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revd
        | FROM orders GROUP BY 1
        |), b AS (
        | SELECT quantile_cont(revd, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS b FROM spend
        |), bucketed AS (
        | SELECT s.*, cast(10 - list_sum(list_transform(b.b, v -> CASE WHEN revd > v THEN 1 ELSE 0 END)) as bigint) AS decile
        | FROM spend s CROSS JOIN b
        |), d AS (
        | SELECT decile, count(*) AS n_customers, sum(rev) AS drev FROM bucketed GROUP BY 1
        |), t AS (SELECT sum(drev) AS trev, sum(n_customers) AS tn FROM d),
        |c AS (
        | SELECT decile, n_customers, drev,
        |  sum(drev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
        |  sum(n_customers) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        | FROM d
        |)
        |SELECT decile, n_customers,
        | cast(drev as double) AS decile_rev,
        | round(cast(cum_rev as double) / cast(trev as double), 6) AS cum_rev_share,
        | round((cast(cum_rev as double) / cast(trev as double)) /
        |   (cast(cum_n as double) / cast(tn as double)), 6) AS lift
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,
    "dd_near_keepers" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |),
        |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
        |WHERE x.doc_id IS NULL
        |ORDER BY d.doc_id""".stripMargin,
    "pipe_split" ->
      """WITH u AS (
        | SELECT doc_id, lang,
        |  list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5(cast(doc_id as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) AS uval
        | FROM documents
        |), b AS (
        | SELECT doc_id, lang,
        |  cast((uval * 100) // 1099511627776 as bigint) AS bucket
        | FROM u
        |)
        |SELECT doc_id, lang,
        | CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "txt_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
        | FROM toks WHERE len(t) >= 3
        |), f AS (
        | SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1
        |)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        | cast(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) as bigint) AS n_novel,
        | sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) / cast(count(*) as double) AS novelty
        |FROM sh JOIN f ON sh.s = f.s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q101_peak_hour" ->
      """WITH h AS (
        | SELECT event_type, cast(extract(hour FROM ts) as bigint) AS hod, count(*) AS n
        | FROM events GROUP BY 1, 2
        |), t AS (SELECT event_type, sum(n) AS tot FROM h GROUP BY 1),
        |r AS (
        | SELECT h.event_type, hod, n, tot,
        |  row_number() OVER (PARTITION BY h.event_type ORDER BY n DESC, hod) AS rn
        | FROM h JOIN t ON h.event_type = t.event_type
        |)
        |SELECT event_type, hod AS peak_hour, n AS n_peak,
        | n / cast(tot as double) AS peak_share
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "mm_kind_profile" ->
      """WITH m AS (
        | SELECT doc_id, cast(octet_length(cast(text as blob)) as bigint) AS n FROM documents
        |), k AS (
        | SELECT doc_id, n,
        |  CASE WHEN n % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  cast(64 + n % 577 as bigint) AS w,
        |  cast(64 + (n * 31) % 421 as bigint) AS h
        | FROM m
        |)
        |SELECT kind, count(*) AS n_media,
        | cast(sum(n) as bigint) AS total_bytes,
        | sum(w) / cast(count(*) as double) AS avg_w,
        | sum(h) / cast(count(*) as double) AS avg_h
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_shingle_df_profile" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
        | FROM toks WHERE len(t) >= 3
        |), f AS (
        | SELECT s, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1
        |)
        |SELECT df, count(*) AS n_shingles
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipe_length_buckets" ->
      """WITH t AS (
        | SELECT doc_id,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) AS n_tokens
        | FROM documents
        |), b AS (
        | SELECT doc_id, n_tokens, (((n_tokens - 1) // 32) + 1) * 32 AS bucket_len
        | FROM t WHERE n_tokens > 0
        |)
        |SELECT cast(bucket_len as bigint) AS bucket_len, count(*) AS n_docs,
        | cast(sum(n_tokens) as bigint) AS total_tokens,
        | cast(count(*) * bucket_len - sum(n_tokens) as bigint) AS pad_waste,
        | (count(*) * bucket_len - sum(n_tokens)) / cast(count(*) * bucket_len as double) AS waste_frac
        |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin,
    "q117_kendall" ->
      """WITH cells AS (
        | SELECT l_returnflag, cast(l_quantity as bigint) x,
        |  cast(cast(l_discount as decimal(4,2)) * 100 as bigint) y, count(*) c
        | FROM lineitem GROUP BY 1, 2, 3
        |), pc AS (
        | SELECT a.l_returnflag,
        |  sum(CASE WHEN a.x < b.x AND a.y < b.y THEN cast(a.c as hugeint) * b.c END) concordant,
        |  sum(CASE WHEN a.x < b.x AND a.y > b.y THEN cast(a.c as hugeint) * b.c END) discordant,
        |  sum(CASE WHEN a.x = b.x AND a.y < b.y THEN cast(a.c as hugeint) * b.c END) tied_x_only,
        |  sum(CASE WHEN a.y = b.y AND a.x < b.x THEN cast(a.c as hugeint) * b.c END) tied_y_only
        | FROM cells a JOIN cells b ON a.l_returnflag = b.l_returnflag
        | GROUP BY 1
        |), diag AS (
        | SELECT l_returnflag, cast(sum(c) as bigint) n,
        |  sum(cast((c * (c - 1)) // 2 as hugeint)) tied_both
        | FROM cells GROUP BY 1
        |)
        |SELECT d.l_returnflag, d.n,
        | cast(concordant as varchar) AS concordant,
        | cast(discordant as varchar) AS discordant,
        | cast(tied_x_only as varchar) AS tied_x_only,
        | cast(tied_y_only as varchar) AS tied_y_only,
        | cast(tied_both as varchar) AS tied_both,
        | cast(concordant - discordant as varchar) AS tau_num
        |FROM diag d JOIN pc ON d.l_returnflag = pc.l_returnflag
        |ORDER BY d.l_returnflag""".stripMargin,
    "q118_mann_kendall" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), s AS (
        | SELECT a.o_orderpriority,
        |  cast(sum(CASE WHEN b.cents > a.cents THEN 1 WHEN b.cents < a.cents THEN -1 ELSE 0 END) as bigint) s_stat
        | FROM daily a JOIN daily b
        |  ON a.o_orderpriority = b.o_orderpriority AND a."day" < b."day"
        | GROUP BY 1
        |), tg AS (
        | SELECT o_orderpriority, cents, count(*) tt FROM daily GROUP BY 1, 2
        |), ties AS (
        | SELECT o_orderpriority, cast(sum(tt) as bigint) n_days,
        |  cast(sum(tt * (tt - 1) * (2 * tt + 5)) as bigint) tie_term
        | FROM tg GROUP BY 1
        |)
        |SELECT ties.o_orderpriority, n_days, s_stat,
        | n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18_num
        |FROM ties JOIN s ON ties.o_orderpriority = s.o_orderpriority
        |ORDER BY 1""".stripMargin,
    "q119_cramers_v" ->
      """WITH obs AS (
        | SELECT event_type, cast(user_id % 2 as int) segment, count(*) n
        | FROM events GROUP BY 1, 2
        |), rt AS (SELECT event_type, cast(sum(n) as bigint) row_n FROM obs GROUP BY 1),
        |ct AS (SELECT segment, cast(sum(n) as bigint) col_n FROM obs GROUP BY 1),
        |tot AS (SELECT cast(sum(n) as bigint) total_n FROM obs),
        |dims AS (
        | SELECT cast(count(distinct event_type) as bigint) n_rows_dim,
        |  cast(count(distinct segment) as bigint) n_cols_dim
        | FROM obs
        |), terms AS (
        | SELECT o.event_type, o.segment,
        |  cast(cast(o.n as decimal(38,0)) * total_n - cast(row_n as decimal(38,0)) * col_n as double) diff_d,
        |  cast(total_n as double) * row_n * col_n den
        | FROM obs o JOIN rt USING (event_type) JOIN ct USING (segment) CROSS JOIN tot
        |), cum AS (
        | SELECT sum(diff_d * diff_d / den)
        |   OVER (ORDER BY event_type, segment
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) chi2_cum,
        |  row_number() OVER (ORDER BY event_type, segment) rn,
        |  count(*) OVER () n_cells
        | FROM terms
        |)
        |SELECT total_n AS n, n_rows_dim, n_cols_dim, chi2_cum AS chi2,
        | sqrt(chi2_cum / (total_n * (least(n_rows_dim, n_cols_dim) - 1))) AS cramers_v
        |FROM cum, tot, dims WHERE rn = n_cells""".stripMargin,
    // Theil-Sen: lower median of pairwise daily-revenue slopes,
    // sign-split micro quotients (truncation-toward-zero in BOTH
    // engines); the engine's bucketed two-pass median is internal -
    // the oracle takes the order statistic directly
    "q171_theil_sen" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents,
        |  date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) AS d
        | FROM orders GROUP BY 1, 2, 4
        |), pairs AS (
        | SELECT a.o_orderpriority,
        |  (CASE WHEN b.cents < a.cents THEN -1 ELSE 1 END)
        |   * (abs(b.cents - a.cents) * 1000000 // (b.d - a.d)) sl
        | FROM daily a JOIN daily b
        |  ON a.o_orderpriority = b.o_orderpriority AND a.d < b.d
        |), v AS (
        | SELECT o_orderpriority, sl, count(*) w FROM pairs GROUP BY 1, 2
        |), c AS (
        | SELECT o_orderpriority, sl, w,
        |  cast(sum(w) OVER (PARTITION BY o_orderpriority ORDER BY sl) as bigint) cw,
        |  cast(sum(w) OVER (PARTITION BY o_orderpriority) as bigint) m
        | FROM v
        |)
        |SELECT o_orderpriority, cast(max(m) as bigint) AS n_pairs,
        | cast(min(sl) as bigint) AS ts_slope_micro
        |FROM c WHERE cw * 2 >= m GROUP BY 1 ORDER BY 1""".stripMargin,

    // Median + MAD + 3-MAD outlier census, all exact integers via the
    // doubled-median device applied twice; outlier test is the integer
    // cross-multiplication 2*dev2 > 3*mad4
    "q172_mad_outliers" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), r1 AS (
        | SELECT o_orderpriority, cents,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents, "day") rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) n
        | FROM daily
        |), med AS (
        | SELECT o_orderpriority,
        |  cast(CASE WHEN count(*) = 1 THEN sum(cents) * 2 ELSE sum(cents) END as bigint) med2,
        |  cast(max(n) as bigint) n_days
        | FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1
        |), dev AS (
        | SELECT d.o_orderpriority, d."day", abs(2 * d.cents - med2) dev2, med2, n_days
        | FROM daily d JOIN med USING (o_orderpriority)
        |), r2 AS (
        | SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY dev2, "day") rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) n
        | FROM dev
        |), mad AS (
        | SELECT o_orderpriority,
        |  cast(CASE WHEN count(*) = 1 THEN sum(dev2) * 2 ELSE sum(dev2) END as bigint) mad4
        | FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1
        |)
        |SELECT dev.o_orderpriority, cast(max(n_days) as bigint) AS n_days,
        | cast(max(med2) as bigint) AS med2_cents, cast(max(mad4) as bigint) AS mad4_cents,
        | cast(sum(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) as bigint) AS n_outliers
        |FROM dev JOIN mad USING (o_orderpriority) GROUP BY 1 ORDER BY 1""".stripMargin,

    // Theil's U: three entropy numerators off one contingency table on
    // the shared fixed-point-log2 recurrence; I clamped at 0 (floored
    // logs can push near-independence a few ulps negative)
    "txt_theil_u" ->
      ("""WITH RECURSIVE j AS (
        | SELECT lang, source, cast(count(*) as bigint) c FROM documents GROUP BY 1, 2
        |), mx AS (SELECT lang, cast(sum(c) as bigint) c FROM j GROUP BY 1),
        |my AS (SELECT source, cast(sum(c) as bigint) c FROM j GROUP BY 1),
        |tot AS (SELECT cast(sum(c) as bigint) n FROM j),
        |rawargs AS (
        | SELECT c x FROM j UNION ALL SELECT c FROM mx
        | UNION ALL SELECT c FROM my UNION ALL SELECT n FROM tot
        |), shargs AS (
        | SELECT DISTINCT x, greatest(0, length(bin(x)) - 43) sh,
        |  x // (cast(1 as bigint) << greatest(0, length(bin(x)) - 43)) arg
        | FROM rawargs
        |), lgvals(x) AS (SELECT DISTINCT arg FROM shargs),
        |""" + LgCte + """, lgx AS (
        | SELECT s.x, l.lg + s.sh * 1048576 lg FROM shargs s JOIN lg l ON l.x = s.arg
        |), hx AS (
        | SELECT cast((SELECT cast(t.n as hugeint) * lgx.lg FROM tot t JOIN lgx ON lgx.x = t.n)
        |  - (SELECT sum(cast(m.c as hugeint) * lgx.lg) FROM mx m JOIN lgx ON lgx.x = m.c) as bigint) h
        |), hy AS (
        | SELECT cast((SELECT cast(t.n as hugeint) * lgx.lg FROM tot t JOIN lgx ON lgx.x = t.n)
        |  - (SELECT sum(cast(m.c as hugeint) * lgx.lg) FROM my m JOIN lgx ON lgx.x = m.c) as bigint) h
        |), hxy AS (
        | SELECT cast((SELECT cast(t.n as hugeint) * lgx.lg FROM tot t JOIN lgx ON lgx.x = t.n)
        |  - (SELECT sum(cast(m.c as hugeint) * lgx.lg) FROM j m JOIN lgx ON lgx.x = m.c) as bigint) h
        |)
        |SELECT (SELECT n FROM tot) AS n_docs, hx.h AS h_lang_num, hy.h AS h_source_num,
        | hxy.h AS h_joint_num,
        | cast(greatest(0, hx.h + hy.h - hxy.h) as bigint) AS i_num,
        | CASE WHEN hx.h > 0 THEN cast(cast(greatest(0, hx.h + hy.h - hxy.h) as hugeint) * 1000000 // hx.h as bigint) END AS u_lang_micro,
        | CASE WHEN hy.h > 0 THEN cast(cast(greatest(0, hx.h + hy.h - hxy.h) as hugeint) * 1000000 // hy.h as bigint) END AS u_source_micro
        |FROM hx, hy, hxy""").stripMargin,

    // Durbin-Watson: n-scaled residuals e = n*x - S keep everything
    // integral; DW ratio is invariant to the shared n^2 factor
    "q173_durbin_watson" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(sum(cents) as bigint) s_cents
        | FROM daily GROUP BY 1
        |), ser AS (
        | SELECT d.o_orderpriority, t.n_days, t.n_days * d.cents - t.s_cents e,
        |  lag(t.n_days * d.cents - t.s_cents) OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") prev
        | FROM daily d JOIN tot t USING (o_orderpriority)
        |)
        |SELECT o_orderpriority, cast(max(n_days) as bigint) AS n_days,
        | cast(sum(CASE WHEN prev IS NOT NULL THEN cast(e - prev as hugeint) * (e - prev) END) as varchar) AS dw_num,
        | cast(sum(cast(e as hugeint) * e) as varchar) AS dw_den,
        | cast(CASE WHEN sum(cast(e as hugeint) * e) > 0 THEN
        |  sum(CASE WHEN prev IS NOT NULL THEN cast(e - prev as hugeint) * (e - prev) END)
        |   * 1000000 // sum(cast(e as hugeint) * e) END as bigint) AS dw_micro
        |FROM ser GROUP BY 1 ORDER BY 1""".stripMargin,

    // Turning points: strict local extrema only (equal neighbors break
    // no turn); expectation/variance emitted as integer numerators
    "q174_turning_points" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), ser AS (
        | SELECT o_orderpriority, cents,
        |  lag(cents) OVER w prev, lead(cents) OVER w nxt
        | FROM daily WINDOW w AS (PARTITION BY o_orderpriority ORDER BY "day")
        |)
        |SELECT o_orderpriority, cast(count(*) as bigint) AS n_days,
        | cast(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL AND
        |  ((cents > prev AND cents > nxt) OR (cents < prev AND cents < nxt))
        |  THEN 1 ELSE 0 END) as bigint) AS tp_count,
        | cast(2 * (count(*) - 2) as bigint) AS exp_num3,
        | cast(16 * count(*) - 29 as bigint) AS var_num90
        |FROM ser GROUP BY 1 ORDER BY 1""".stripMargin,

    // Bartels rank von Neumann: doubled midranks (q160 device); den
    // expanded off exact sums: sum(2R)^2 - 2(n+1)*sum(2R) + n(n+1)^2
    "q175_bartels_rank" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), dv AS (
        | SELECT o_orderpriority, cents, cast(count(*) as bigint) t FROM daily GROUP BY 1, 2
        |), rk AS (
        | SELECT o_orderpriority, cents,
        |  2 * cast(coalesce(sum(t) OVER (PARTITION BY o_orderpriority ORDER BY cents
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) + t + 1 r2
        | FROM dv
        |), ser AS (
        | SELECT d.o_orderpriority, rk.r2,
        |  lead(rk.r2) OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") r2nxt
        | FROM daily d JOIN rk ON d.o_orderpriority = rk.o_orderpriority AND d.cents = rk.cents
        |)
        |SELECT o_orderpriority, cast(count(*) as bigint) AS n_days,
        | cast(sum(CASE WHEN r2nxt IS NOT NULL THEN cast(r2 - r2nxt as hugeint) * (r2 - r2nxt) END) as varchar) AS rvn_num,
        | cast(sum(cast(r2 as hugeint) * r2)
        |   - 2 * (count(*) + 1) * cast(sum(r2) as hugeint)
        |   + cast(count(*) as hugeint) * (count(*) + 1) * (count(*) + 1) as varchar) AS rvn_den,
        | cast(sum(r2) as bigint) AS rank_sum2
        |FROM ser GROUP BY 1 ORDER BY 1""".stripMargin,

    // Goodman-Kruskal gamma / Somers' D: cell-pair products over the
    // priority x price-band contingency table; sign-split micros
    "q178_gamma_somers" ->
      """WITH cells AS (
        | SELECT cast(substring(o_orderpriority, 1, 1) as bigint) x,
        |  least(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) // 5000000, 9) y,
        |  cast(count(*) as bigint) a
        | FROM orders GROUP BY 1, 2
        |), p AS (
        | SELECT a.x xa, a.y ya, a.a na, b.x xb, b.y yb, b.a nb
        | FROM cells a CROSS JOIN cells b
        | WHERE a.x < b.x OR (a.x = b.x AND a.y < b.y)
        |), agg AS (
        | SELECT
        |  cast(sum(CASE WHEN xa < xb AND ya < yb THEN na * nb ELSE 0 END) as bigint) c_pairs,
        |  cast(sum(CASE WHEN xa < xb AND ya > yb THEN na * nb ELSE 0 END) as bigint) d_pairs,
        |  cast(sum(CASE WHEN xa = xb AND ya <> yb THEN na * nb ELSE 0 END) as bigint) tx_pairs,
        |  cast(sum(CASE WHEN xa < xb AND ya = yb THEN na * nb ELSE 0 END) as bigint) ty_pairs
        | FROM p
        |)
        |SELECT (SELECT cast(sum(a) as bigint) FROM cells) AS n,
        | c_pairs, d_pairs, tx_pairs, ty_pairs,
        | cast(CASE WHEN c_pairs >= d_pairs
        |  THEN cast(c_pairs - d_pairs as hugeint) * 1000000 // (c_pairs + d_pairs)
        |  ELSE -(cast(d_pairs - c_pairs as hugeint) * 1000000 // (c_pairs + d_pairs)) END as bigint) AS gamma_micro,
        | cast(CASE WHEN c_pairs >= d_pairs
        |  THEN cast(c_pairs - d_pairs as hugeint) * 1000000 // (c_pairs + d_pairs + ty_pairs)
        |  ELSE -(cast(d_pairs - c_pairs as hugeint) * 1000000 // (c_pairs + d_pairs + ty_pairs)) END as bigint) AS somers_d_micro
        |FROM agg""".stripMargin,

    // Cliff's delta: distinct-value cumulative pairing, sign-split micro
    "q179_cliffs_delta" ->
      """WITH d AS (
        | SELECT cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'b' ELSE 'r' END g
        | FROM orders JOIN customer ON o_custkey = c_custkey
        |), cells AS (
        | SELECT cents,
        |  cast(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) as bigint) ab,
        |  cast(sum(CASE WHEN g = 'r' THEN 1 ELSE 0 END) as bigint) ar
        | FROM d GROUP BY 1
        |), cum AS (
        | SELECT cents, ab, ar,
        |  cast(coalesce(sum(ar) OVER (ORDER BY cents
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) cr_lt
        | FROM cells
        |), tot AS (SELECT cast(sum(ab) as bigint) n_b, cast(sum(ar) as bigint) n_r FROM cells),
        |agg AS (
        | SELECT max(t.n_b) n_b, max(t.n_r) n_r,
        |  cast(sum(ab * cr_lt) as bigint) n_gt,
        |  cast(sum(ab * (t.n_r - cr_lt - ar)) as bigint) n_lt,
        |  cast(sum(ab * ar) as bigint) n_eq
        | FROM cum CROSS JOIN tot t
        |)
        |SELECT n_b, n_r, n_gt, n_lt, n_eq,
        | cast(CASE WHEN n_gt >= n_lt
        |  THEN cast(n_gt - n_lt as hugeint) * 1000000 // (cast(n_b as hugeint) * n_r)
        |  ELSE -(cast(n_lt - n_gt as hugeint) * 1000000 // (cast(n_b as hugeint) * n_r)) END as bigint) AS delta_micro
        |FROM agg""".stripMargin,

    // Ljung-Box inputs: lag-1..7 autocovariance numerators over the
    // n-scaled residuals beside the lag-0 denominator
    "q180_ljung_box" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(sum(cents) as bigint) s_cents
        | FROM daily GROUP BY 1
        |), res AS (
        | SELECT d.o_orderpriority, t.n_days, t.n_days * d.cents - t.s_cents e,
        |  row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") rn
        | FROM daily d JOIN tot t USING (o_orderpriority)
        |), den AS (
        | SELECT o_orderpriority, max(n_days) n_days,
        |  sum(cast(e as hugeint) * e) den
        | FROM res GROUP BY 1
        |), lagged AS (
        | SELECT a.o_orderpriority, l.lag, a.e, b.e e2
        | FROM res a CROSS JOIN (SELECT unnest(range(1, 8)) lag) l
        | JOIN res b ON b.o_orderpriority = a.o_orderpriority AND b.rn = a.rn - l.lag
        |), num AS (
        | SELECT o_orderpriority, lag, cast(count(*) as bigint) n_pairs,
        |  sum(cast(e as hugeint) * e2) num
        | FROM lagged GROUP BY 1, 2
        |)
        |SELECT num.o_orderpriority, cast(num.lag as bigint) AS lag, n_pairs,
        | den.n_days, cast(num.num as varchar) AS rho_num, cast(den.den as varchar) AS rho_den
        |FROM num JOIN den USING (o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,

    // paired sign test: direction counts incl. explicit zeros
    "q181_sign_test" ->
      """WITH y AS (
        | SELECT o_custkey,
        |  sum(CASE WHEN year(o_orderdate) = 1995 THEN cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) END) c95,
        |  sum(CASE WHEN year(o_orderdate) = 1996 THEN cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) END) c96
        | FROM orders WHERE o_orderdate < date '1997-01-01' GROUP BY 1
        |)
        |SELECT c_mktsegment AS seg, cast(count(*) as bigint) AS n_pairs,
        | cast(sum(CASE WHEN c96 > c95 THEN 1 ELSE 0 END) as bigint) AS n_pos,
        | cast(sum(CASE WHEN c96 < c95 THEN 1 ELSE 0 END) as bigint) AS n_neg,
        | cast(sum(CASE WHEN c96 = c95 THEN 1 ELSE 0 END) as bigint) AS n_zero
        |FROM y JOIN customer ON o_custkey = c_custkey
        |WHERE c95 IS NOT NULL AND c96 IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // IVF imbalance factor: k*sum(n_c^2)/n^2 in exact integers
    "sim_ivf_imbalance" ->
      """WITH c AS (SELECT label, cast(count(*) as bigint) nc FROM embeddings GROUP BY 1)
        |SELECT cast(count(*) as bigint) AS k, cast(sum(nc) as bigint) AS n,
        | cast(min(nc) as bigint) AS min_cell, cast(max(nc) as bigint) AS max_cell,
        | cast(sum(nc * nc) as bigint) AS sum_sq,
        | cast(cast(count(*) as hugeint) * sum(nc * nc) * 1000000
        |  // (cast(sum(nc) as hugeint) * sum(nc)) as bigint) AS imbalance_micro
        |FROM c""".stripMargin,

    // k-means|| oversampling round: exact cross-multiplied selection
    // test u*phi < ell*d2*2^40 over md5 40-bit coins
    "sim_kmeanspar_step" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, clabel cell, cast(round(dist, 6) as decimal(38,6)) d2r,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), sel AS (SELECT vec_id, cell, d2r FROM best WHERE rn = 1),
        |phi AS (SELECT sum(d2r) phi FROM sel),
        |coin AS (
        | SELECT vec_id, cell, d2r,
        |  list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5('kmpp:' || cast(vec_id as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) u40
        | FROM sel
        |)
        |SELECT vec_id, cell, cast(d2r as double) AS d2
        |FROM coin, phi WHERE u40 * phi < 20 * d2r * 1099511627776
        |ORDER BY vec_id""".stripMargin,

    // binary-quantized two-stage retrieval: Hamming top-20 candidates
    // over the sign words, exact cosine re-rank to top-5
    "sim_bq_rerank" ->
      """WITH dims AS (SELECT unnest(range(0, 64)) i),
        |codes AS (
        | SELECT vec_id,
        |  cast(sum(CASE WHEN i < 32 AND embedding[i + 1] > 0 THEN 1::BIGINT << i ELSE 0 END) as bigint) AS w1,
        |  cast(sum(CASE WHEN i >= 32 AND embedding[i + 1] > 0 THEN 1::BIGINT << (i - 32) ELSE 0 END) as bigint) AS w2
        | FROM embeddings CROSS JOIN dims GROUP BY 1
        |),
        |probes AS (SELECT vec_id AS qid, w1 AS qw1, w2 AS qw2 FROM codes WHERE vec_id < 5),
        |hscored AS (
        | SELECT qid, vec_id,
        |  cast(bit_count(xor(qw1, w1)) + bit_count(xor(qw2, w2)) as bigint) AS hamming
        | FROM probes CROSS JOIN codes WHERE vec_id <> qid
        |),
        |cand AS (
        | SELECT qid, vec_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY hamming, vec_id) rnk
        |  FROM hscored) WHERE rnk <= 20
        |),
        |q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT c.qid, c.vec_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(q.qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(q.qe[i] as double) * cast(q.qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM cand c JOIN q ON q.qid = c.qid JOIN embeddings e ON e.vec_id = c.vec_id
        |), r AS (
        | SELECT qid query_id, vec_id, cosim,
        |  row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, round(cosim, 6) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // b-bit minwise (b=1): sketch byte = parity of each per-perm min's
    // last hex char; estimator numerator 2m-8 stays integer
    "dd_bbit_minhash" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), cand AS (
        | SELECT a.doc_id doc_a, b.doc_id doc_b
        | FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        | GROUP BY 1, 2
        |), bits AS (
        | SELECT doc_id, cast(list_sum(list_transform(range(0, 8), i ->
        |   CASE WHEN strpos('13579bdf', substring(m[i+1], 32, 1)) > 0
        |    THEN (cast(1 as bigint) << i) ELSE 0 END)) as bigint) sketch
        | FROM sig
        |)
        |SELECT c.doc_a, c.doc_b,
        | cast(8 - bit_count(xor(ba.sketch, bb.sketch)) as bigint) AS m_bits,
        | cast(2 * (8 - bit_count(xor(ba.sketch, bb.sketch))) - 8 as bigint) AS rho_num8
        |FROM cand c JOIN bits ba ON ba.doc_id = c.doc_a JOIN bits bb ON bb.doc_id = c.doc_b
        |ORDER BY 1, 2""".stripMargin,

    // HITS: integer half-iterations a1=indegree, h1, a2 over the
    // distinct customer->part edge list; top-20 authorities
    "q177_hits" ->
      """WITH e AS (
        | SELECT DISTINCT o.o_custkey c, l.l_partkey p
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |), a1 AS (SELECT p, cast(count(*) as bigint) a1 FROM e GROUP BY 1),
        |h1 AS (SELECT e.c, cast(sum(a1.a1) as bigint) h1 FROM e JOIN a1 USING (p) GROUP BY 1),
        |a2 AS (SELECT e.p, cast(sum(h1.h1) as bigint) a2 FROM e JOIN h1 USING (c) GROUP BY 1)
        |SELECT a2.p AS l_partkey, a1.a1 AS a1, a2.a2 AS a2
        |FROM a2 JOIN a1 USING (p)
        |ORDER BY a2 DESC, l_partkey LIMIT 20""".stripMargin,

    // KPSS: partial sums of the n-scaled residuals; only the exact
    // decimal sufficient statistics are emitted (eta*1e6 can pass 38
    // digits at 100x, so the float ratio stays downstream)
    "q176_kpss" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(sum(cents) as bigint) s_cents
        | FROM daily GROUP BY 1
        |), ser AS (
        | SELECT d.o_orderpriority, t.n_days,
        |  t.n_days * d.cents - t.s_cents e,
        |  sum(t.n_days * d.cents - t.s_cents) OVER (PARTITION BY d.o_orderpriority ORDER BY d."day"
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) p
        | FROM daily d JOIN tot t USING (o_orderpriority)
        |)
        |SELECT o_orderpriority, cast(max(n_days) as bigint) AS n_days,
        | cast(sum(cast(p as hugeint) * p) as varchar) AS eta_num,
        | cast(sum(cast(e as hugeint) * e) as varchar) AS s2_num
        |FROM ser GROUP BY 1 ORDER BY 1""".stripMargin,

    "q120_hodges_lehmann" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), pairs AS (
        | SELECT a.o_orderpriority, a.cents + b.cents wsum2
        | FROM daily a JOIN daily b
        |  ON a.o_orderpriority = b.o_orderpriority AND a."day" < b."day"
        |), v AS (
        | SELECT o_orderpriority, wsum2, count(*) w FROM pairs GROUP BY 1, 2
        |), c AS (
        | SELECT o_orderpriority, wsum2, w,
        |  cast(sum(w) OVER (PARTITION BY o_orderpriority ORDER BY wsum2) as bigint) cw,
        |  cast(sum(w) OVER (PARTITION BY o_orderpriority) as bigint) m
        | FROM v
        |)
        |SELECT o_orderpriority, cast(max(m) as bigint) AS n_pairs,
        | cast(min(wsum2) as bigint) AS hl2_cents
        |FROM c WHERE cw * 2 >= m GROUP BY 1 ORDER BY 1""".stripMargin,
    // fixed-point log2 (scale 2^20) as a recursive integer digit
    // recurrence — the DuckDB twin of the native Log2Fixed expression;
    // identical int64 ops step for step, so entropy statistics gate
    // exactly (see MathExpressions.scala)
    "txt_perplexity" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS MATERIALIZED (
        | SELECT lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2
        |), cs AS (
        | SELECT lang, c, greatest(0, length(bin(c)) - 43) sh,
        |  (c) // (cast(1 as bigint) << greatest(0, length(bin(c)) - 43)) arg
        | FROM c
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) n_types, cast(sum(c) as bigint) n_tokens
        | FROM c GROUP BY 1
        |), gs AS (
        | SELECT lang, n_types, n_tokens, greatest(0, length(bin(n_tokens)) - 43) sh,
        |  (n_tokens) // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) arg
        | FROM g
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM cs UNION ALL SELECT arg FROM gs)
        |), """ + LgCte + """, sc AS (
        | SELECT cs.lang, sum(cast(cs.c as hugeint) * (l.lg + cs.sh * 1048576)) sclg
        | FROM cs JOIN lg l ON l.x = cs.arg GROUP BY 1
        |)
        |SELECT gs.lang, n_types, n_tokens,
        | cast(cast(n_tokens as hugeint) * (ln.lg + gs.sh * 1048576) - sclg as bigint) AS h_num,
        | cast((cast(n_tokens as hugeint) * (ln.lg + gs.sh * 1048576) - sclg) * 1000000
        |   // (cast(n_tokens as hugeint) * 1048576) as bigint) AS bits_per_token_micro
        |FROM gs JOIN lg ln ON ln.x = gs.arg JOIN sc ON sc.lang = gs.lang
        |ORDER BY gs.lang""").stripMargin,
    "txt_entropy_filter" ->
      ("""WITH RECURSIVE t AS (
        | SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS MATERIALIZED (
        | SELECT doc_id, lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2, 3
        |), cs AS (
        | SELECT doc_id, c, greatest(0, length(bin(c)) - 43) sh,
        |  (c) // (cast(1 as bigint) << greatest(0, length(bin(c)) - 43)) arg
        | FROM c
        |), g AS (
        | SELECT doc_id, lang, cast(count(*) as bigint) n_types, cast(sum(c) as bigint) n_tokens
        | FROM c GROUP BY 1, 2
        |), gs AS (
        | SELECT doc_id, lang, n_types, n_tokens, greatest(0, length(bin(n_tokens)) - 43) sh,
        |  (n_tokens) // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) arg
        | FROM g
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM cs UNION ALL SELECT arg FROM gs)
        |), """ + LgCte + """, sc AS (
        | SELECT cs.doc_id, sum(cast(cs.c as hugeint) * (l.lg + cs.sh * 1048576)) sclg
        | FROM cs JOIN lg l ON l.x = cs.arg GROUP BY 1
        |), h AS (
        | SELECT gs.doc_id, gs.lang, n_types, n_tokens,
        |  cast(cast(n_tokens as hugeint) * (ln.lg + gs.sh * 1048576) - sclg as bigint) h_num,
        |  cast((cast(n_tokens as hugeint) * (ln.lg + gs.sh * 1048576) - sclg) * 1000000
        |    // (cast(n_tokens as hugeint) * 1048576) as bigint) bits_per_token_micro
        | FROM gs JOIN lg ln ON ln.x = gs.arg JOIN sc ON sc.doc_id = gs.doc_id
        |)
        |SELECT doc_id, lang, n_types, n_tokens, h_num, bits_per_token_micro,
        | bits_per_token_micro < 3500000 AS low_entropy
        |FROM h ORDER BY doc_id""").stripMargin,
    "txt_dsir_weights" ->
      ("WITH RECURSIVE " + DsirCtes + s"""
        |SELECT doc_id, lang, n_tokens, w_num, w_micro,
        | w_micro > ${operators.TextAnalysis.DsirMinMicro} AS selected
        |FROM m ORDER BY doc_id""".stripMargin),
    "pipe_dsir_topk" ->
      ("WITH RECURSIVE " + DsirCtes + s""", r AS (
        | SELECT lang, doc_id, n_tokens, w_micro,
        |  row_number() OVER (PARTITION BY lang ORDER BY w_micro DESC, doc_id) rk
        | FROM m
        |)
        |SELECT lang, cast(rk as bigint) AS sel_rank, doc_id, n_tokens, w_micro
        |FROM r WHERE rk <= ${operators.TextAnalysis.DsirTopK}
        |ORDER BY lang, sel_rank""".stripMargin),
    "txt_dsir_bigram" ->
      ("""WITH RECURSIVE t AS (
        | SELECT doc_id, lang, source, list_filter(string_split(text, ' '), x -> x <> '') tl
        | FROM documents
        |), bx AS (
        | SELECT doc_id, lang, source,
        |  unnest(list_transform(range(1, len(tl)), i -> tl[i] || ' ' || tl[i+1])) bg
        | FROM t WHERE len(tl) >= 2
        |), dc AS MATERIALIZED (
        | SELECT doc_id, lang, bg, cast(count(*) as bigint) c,
        |  cast(coalesce(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END), 0) as bigint) c_t
        | FROM bx GROUP BY 1, 2, 3
        |), rc AS (
        | SELECT lang, bg, cast(sum(c) as bigint) cr, cast(sum(c_t) as bigint) ct
        | FROM dc GROUP BY 1, 2
        |), rs AS (
        | SELECT lang, bg, cr, ct,
        |  greatest(0, length(bin(cr + 1)) - 43) shr,
        |  (cr + 1) // (cast(1 as bigint) << greatest(0, length(bin(cr + 1)) - 43)) ar,
        |  greatest(0, length(bin(ct + 1)) - 43) sht,
        |  (ct + 1) // (cast(1 as bigint) << greatest(0, length(bin(ct + 1)) - 43)) atv
        | FROM rc
        |), tot AS (
        | SELECT lang, cast(count(*) as bigint) b_l,
        |  cast(sum(cr) as bigint) n_r, cast(sum(ct) as bigint) n_t
        | FROM rc GROUP BY 1
        |), ts AS (
        | SELECT lang, b_l, n_r, n_t,
        |  greatest(0, length(bin(n_r + b_l)) - 43) shr,
        |  (n_r + b_l) // (cast(1 as bigint) << greatest(0, length(bin(n_r + b_l)) - 43)) ar,
        |  greatest(0, length(bin(n_t + b_l)) - 43) sht,
        |  (n_t + b_l) // (cast(1 as bigint) << greatest(0, length(bin(n_t + b_l)) - 43)) atv
        | FROM tot
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT ar AS x FROM rs UNION ALL SELECT atv FROM rs
        |  UNION ALL SELECT ar FROM ts UNION ALL SELECT atv FROM ts)
        |), """ + LgCte + s""", d AS (
        | SELECT dc.doc_id, dc.lang, cast(sum(dc.c) as bigint) n_bigrams,
        |  sum(cast(dc.c as hugeint)
        |    * ((lt.lg + rs.sht * 1048576) - (lr.lg + rs.shr * 1048576))) sdiff
        | FROM dc JOIN rs ON rs.lang = dc.lang AND rs.bg = dc.bg
        | JOIN lg lr ON lr.x = rs.ar
        | JOIN lg lt ON lt.x = rs.atv
        | GROUP BY 1, 2
        |), w AS (
        | SELECT d.doc_id, d.lang, n_bigrams,
        |  cast(sdiff + cast(n_bigrams as hugeint)
        |    * ((lr2.lg + ts.shr * 1048576) - (lt2.lg + ts.sht * 1048576)) as bigint) w_num
        | FROM d JOIN ts ON ts.lang = d.lang
        | JOIN lg lr2 ON lr2.x = ts.ar
        | JOIN lg lt2 ON lt2.x = ts.atv
        |)
        |SELECT doc_id, lang, n_bigrams, w_num,
        | cast((CASE WHEN w_num < 0 THEN -1 ELSE 1 END)
        |   * (cast(abs(w_num) as hugeint) * 1000000
        |      // (cast(n_bigrams as hugeint) * 1048576)) as bigint) AS w_micro,
        | cast((CASE WHEN w_num < 0 THEN -1 ELSE 1 END)
        |   * (cast(abs(w_num) as hugeint) * 1000000
        |      // (cast(n_bigrams as hugeint) * 1048576)) as bigint)
        |  > ${operators.TextAnalysis.Dsir2MinMicro} AS selected
        |FROM w ORDER BY doc_id""").stripMargin,
    "txt_doc_perplexity" ->
      ("""WITH RECURSIVE t AS (
        | SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), dc AS MATERIALIZED (
        | SELECT doc_id, lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2, 3
        |), rc AS (
        | SELECT lang, term, cast(sum(c) as bigint) cr FROM dc GROUP BY 1, 2
        |), rs AS (
        | SELECT lang, term, cr, greatest(0, length(bin(cr + 1)) - 43) sh,
        |  (cr + 1) // (cast(1 as bigint) << greatest(0, length(bin(cr + 1)) - 43)) arg
        | FROM rc
        |), tot AS (
        | SELECT lang, cast(count(*) as bigint) v_l, cast(sum(cr) as bigint) n_l
        | FROM rc GROUP BY 1
        |), ts AS (
        | SELECT lang, v_l, n_l, greatest(0, length(bin(n_l + v_l)) - 43) sh,
        |  (n_l + v_l) // (cast(1 as bigint) << greatest(0, length(bin(n_l + v_l)) - 43)) arg
        | FROM tot
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM rs UNION ALL SELECT arg FROM ts)
        |), """ + LgCte + """, d AS (
        | SELECT dc.doc_id, dc.lang, cast(sum(dc.c) as bigint) n_tokens,
        |  sum(cast(dc.c as hugeint) * (l.lg + rs.sh * 1048576)) sclg
        | FROM dc JOIN rs ON rs.lang = dc.lang AND rs.term = dc.term
        | JOIN lg l ON l.x = rs.arg
        | GROUP BY 1, 2
        |), h AS (
        | SELECT d.doc_id, d.lang, n_tokens,
        |  cast(cast(n_tokens as hugeint) * (ln.lg + ts.sh * 1048576) - sclg as bigint) ppl_num,
        |  cast((cast(n_tokens as hugeint) * (ln.lg + ts.sh * 1048576) - sclg) * 1000000
        |    // (cast(n_tokens as hugeint) * 1048576) as bigint) bits_micro
        | FROM d JOIN ts ON ts.lang = d.lang JOIN lg ln ON ln.x = ts.arg
        |)
        |SELECT doc_id, lang, n_tokens, ppl_num, bits_micro,
        | bits_micro > 5000000 AS high_perplexity
        |FROM h ORDER BY doc_id""").stripMargin,
    "txt_js_divergence" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS MATERIALIZED (
        | SELECT lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2
        |), tot AS (
        | SELECT lang, cast(sum(c) as bigint) n_tok FROM c GROUP BY 1
        |), vg AS (SELECT cast(count(DISTINCT term) as bigint) v_glob FROM c),
        |pairs AS (
        | SELECT a.lang la, b.lang lb, a.n_tok n_a, b.n_tok n_b, v_glob,
        |  a.n_tok + v_glob d_a, b.n_tok + v_glob d_b
        | FROM tot a JOIN tot b ON a.lang < b.lang CROSS JOIN vg
        |), terms AS (SELECT DISTINCT term FROM c),
        |u AS (
        | SELECT p.la, p.lb, p.d_a, p.d_b,
        |  coalesce(ca.c, 0) ca, coalesce(cb.c, 0) cb,
        |  (coalesce(ca.c, 0) + 1) * p.d_b + (coalesce(cb.c, 0) + 1) * p.d_a s_w
        | FROM pairs p CROSS JOIN terms tm
        | LEFT JOIN c ca ON ca.lang = p.la AND ca.term = tm.term
        | LEFT JOIN c cb ON cb.lang = p.lb AND cb.term = tm.term
        | WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0
        |), u2 AS (
        | SELECT *, greatest(0, length(bin(s_w)) - 43) ss,
        |  s_w // (cast(1 as bigint) << greatest(0, length(bin(s_w)) - 43)) sarg,
        |  greatest(0, length(bin(ca + 1)) - 43) sca,
        |  (ca + 1) // (cast(1 as bigint) << greatest(0, length(bin(ca + 1)) - 43)) caa,
        |  greatest(0, length(bin(cb + 1)) - 43) scb,
        |  (cb + 1) // (cast(1 as bigint) << greatest(0, length(bin(cb + 1)) - 43)) cba
        | FROM u
        |), pd AS (
        | SELECT la, lb, n_a, n_b, v_glob, d_a, d_b,
        |  greatest(0, length(bin(d_a)) - 43) sa, d_a // (cast(1 as bigint) << greatest(0, length(bin(d_a)) - 43)) daa,
        |  greatest(0, length(bin(d_b)) - 43) sb, d_b // (cast(1 as bigint) << greatest(0, length(bin(d_b)) - 43)) dba,
        |  greatest(0, length(bin(d_a + d_b)) - 43) sab, (d_a + d_b) // (cast(1 as bigint) << greatest(0, length(bin(d_a + d_b)) - 43)) daba
        | FROM pairs
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (
        |  SELECT caa AS x FROM u2 UNION ALL SELECT cba FROM u2
        |  UNION ALL SELECT sarg FROM u2
        |  UNION ALL SELECT daa FROM pd UNION ALL SELECT dba FROM pd
        |  UNION ALL SELECT daba FROM pd)
        |), """ + LgCte + """, s AS (
        | SELECT u2.la, u2.lb, cast(count(*) as bigint) n_union,
        |  sum(cast(u2.ca + 1 as hugeint) * (1048576 + (lca.lg + u2.sca * 1048576) + (lgb.lg + pd.sb * 1048576) - (ls.lg + u2.ss * 1048576))) ja,
        |  sum(cast(u2.cb + 1 as hugeint) * (1048576 + (lcb.lg + u2.scb * 1048576) + (lga.lg + pd.sa * 1048576) - (ls.lg + u2.ss * 1048576))) jb
        | FROM u2
        | JOIN pd ON pd.la = u2.la AND pd.lb = u2.lb
        | JOIN lg lca ON lca.x = u2.caa
        | JOIN lg lcb ON lcb.x = u2.cba
        | JOIN lg ls ON ls.x = u2.sarg
        | JOIN lg lga ON lga.x = pd.daa
        | JOIN lg lgb ON lgb.x = pd.dba
        | GROUP BY 1, 2
        |), k AS (
        | SELECT s.la, s.lb, pd.n_a, pd.n_b, pd.v_glob, s.n_union, pd.d_a, pd.d_b,
        |  cast(ja + cast(pd.v_glob - s.n_union as hugeint)
        |    * (1048576 + (lgb.lg + pd.sb * 1048576) - (lab.lg + pd.sab * 1048576)) as bigint) js_a_num,
        |  cast(jb + cast(pd.v_glob - s.n_union as hugeint)
        |    * (1048576 + (lga.lg + pd.sa * 1048576) - (lab.lg + pd.sab * 1048576)) as bigint) js_b_num
        | FROM s JOIN pd ON pd.la = s.la AND pd.lb = s.lb
        | JOIN lg lga ON lga.x = pd.daa
        | JOIN lg lgb ON lgb.x = pd.dba
        | JOIN lg lab ON lab.x = pd.daba
        |)
        |SELECT la AS lang_a, lb AS lang_b, n_a, n_b, v_glob, n_union,
        | js_a_num, js_b_num,
        | cast((CASE WHEN cast(js_a_num as hugeint) * d_b + cast(js_b_num as hugeint) * d_a < 0 THEN -1 ELSE 1 END)
        |  * (abs(cast(js_a_num as hugeint) * d_b + cast(js_b_num as hugeint) * d_a) * 1000000
        |     // (cast(2 as hugeint) * d_a * d_b * 1048576)) as bigint) AS js_micro
        |FROM k ORDER BY lang_a, lang_b""").stripMargin,
    "txt_cond_entropy" ->
      ("""WITH RECURSIVE toks AS (
        | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), bi AS (
        | SELECT lang, unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i+1]))) b
        | FROM toks WHERE len(t) >= 2
        |), bx AS (SELECT lang, b.w1 w1, b.w2 w2 FROM bi),
        |counts AS MATERIALIZED (
        | SELECT lang, w1, w2, cast(count(*) as bigint) c FROM bx GROUP BY 1, 2, 3
        |), pre AS MATERIALIZED (
        | SELECT lang, w1, cast(sum(c) as bigint) cw1 FROM counts GROUP BY 1, 2
        |), cs AS (
        | SELECT lang, c, greatest(0, length(bin(c)) - 43) sh,
        |  c // (cast(1 as bigint) << greatest(0, length(bin(c)) - 43)) arg
        | FROM counts
        |), ps AS (
        | SELECT lang, cw1, greatest(0, length(bin(cw1)) - 43) sh,
        |  cw1 // (cast(1 as bigint) << greatest(0, length(bin(cw1)) - 43)) arg
        | FROM pre
        |), tot AS (
        | SELECT lang, cast(count(*) as bigint) n_bigram_types, cast(sum(c) as bigint) n_bigrams
        | FROM counts GROUP BY 1
        |), npx AS (SELECT lang, cast(count(*) as bigint) n_prefix_types FROM pre GROUP BY 1),
        |ts AS (
        | SELECT lang, n_bigram_types, n_bigrams, greatest(0, length(bin(n_bigrams)) - 43) sh,
        |  n_bigrams // (cast(1 as bigint) << greatest(0, length(bin(n_bigrams)) - 43)) arg
        | FROM tot
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM cs UNION ALL SELECT arg FROM ps
        |  UNION ALL SELECT arg FROM ts)
        |), """ + LgCte + """, sbg AS (
        | SELECT cs.lang, sum(cast(cs.c as hugeint) * (l.lg + cs.sh * 1048576)) s
        | FROM cs JOIN lg l ON l.x = cs.arg GROUP BY 1
        |), spre AS (
        | SELECT ps.lang, sum(cast(ps.cw1 as hugeint) * (l.lg + ps.sh * 1048576)) s
        | FROM ps JOIN lg l ON l.x = ps.arg GROUP BY 1
        |), h AS (
        | SELECT ts.lang, ts.n_bigrams, ts.n_bigram_types, npx.n_prefix_types,
        |  cast(cast(ts.n_bigrams as hugeint) * (l.lg + ts.sh * 1048576) - sbg.s as bigint) h_joint_num,
        |  cast(spre.s - sbg.s as bigint) h_cond_num,
        |  cast((cast(ts.n_bigrams as hugeint) * (l.lg + ts.sh * 1048576) - sbg.s) * 1000000
        |    // (cast(ts.n_bigrams as hugeint) * 1048576) as bigint) joint_bits_micro,
        |  cast((spre.s - sbg.s) * 1000000
        |    // (cast(ts.n_bigrams as hugeint) * 1048576) as bigint) cond_bits_micro
        | FROM ts JOIN lg l ON l.x = ts.arg
        | JOIN npx ON npx.lang = ts.lang
        | JOIN sbg ON sbg.lang = ts.lang JOIN spre ON spre.lang = ts.lang
        |)
        |SELECT lang, n_bigrams, n_bigram_types, n_prefix_types, h_joint_num,
        | h_cond_num, joint_bits_micro, cond_bits_micro
        |FROM h ORDER BY lang""").stripMargin,
    "txt_doc_kn_perplexity" ->
      ("WITH RECURSIVE " + KnBigramCtes + """, lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT an AS x FROM ls UNION ALL SELECT ac FROM ls
        |  UNION ALL SELECT ab FROM ls)
        |), """ + LgCte + ", " + KnBitsCte + """, agg AS (
        | SELECT db.doc_id, db.lang, cast(sum(c_d) as bigint) n_bigrams,
        |  sum(cast(c_d as hugeint) * bw.bits_w) sb
        | FROM db JOIN bw ON bw.lang = db.lang AND bw.w1 = db.w1 AND bw.w2 = db.w2
        | GROUP BY 1, 2
        |), r AS (
        | SELECT doc_id, lang, n_bigrams, cast(sb as bigint) kn_bits_num,
        |  cast((CASE WHEN sb < 0 THEN -1 ELSE 1 END)
        |   * (abs(sb) * 1000000 // (cast(n_bigrams as hugeint) * 1048576)) as bigint) bits_micro
        | FROM agg
        |)
        |SELECT doc_id, lang, n_bigrams, kn_bits_num, bits_micro,
        | bits_micro > 5000000 AS high_perplexity
        |FROM r ORDER BY doc_id""").stripMargin,
    "txt_cond_entropy3" ->
      ("""WITH RECURSIVE toks AS (
        | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), tri AS (
        | SELECT lang, unnest(list_transform(range(1, len(t) - 1), i -> struct_pack(w1 := t[i], w2 := t[i+1], w3 := t[i+2]))) b
        | FROM toks WHERE len(t) >= 3
        |), tx AS (SELECT lang, b.w1 w1, b.w2 w2, b.w3 w3 FROM tri),
        |counts AS MATERIALIZED (
        | SELECT lang, w1, w2, w3, cast(count(*) as bigint) c FROM tx GROUP BY 1, 2, 3, 4
        |), pre AS MATERIALIZED (
        | SELECT lang, w1, w2, cast(sum(c) as bigint) cw12 FROM counts GROUP BY 1, 2, 3
        |), cs AS (
        | SELECT lang, c, greatest(0, length(bin(c)) - 43) sh,
        |  c // (cast(1 as bigint) << greatest(0, length(bin(c)) - 43)) arg
        | FROM counts
        |), ps AS (
        | SELECT lang, cw12, greatest(0, length(bin(cw12)) - 43) sh,
        |  cw12 // (cast(1 as bigint) << greatest(0, length(bin(cw12)) - 43)) arg
        | FROM pre
        |), tot AS (
        | SELECT lang, cast(count(*) as bigint) n_trigram_types, cast(sum(c) as bigint) n_trigrams
        | FROM counts GROUP BY 1
        |), npx AS (SELECT lang, cast(count(*) as bigint) n_prefix_types FROM pre GROUP BY 1),
        |ts AS (
        | SELECT lang, n_trigram_types, n_trigrams, greatest(0, length(bin(n_trigrams)) - 43) sh,
        |  n_trigrams // (cast(1 as bigint) << greatest(0, length(bin(n_trigrams)) - 43)) arg
        | FROM tot
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM cs UNION ALL SELECT arg FROM ps
        |  UNION ALL SELECT arg FROM ts)
        |), """ + LgCte + """, stg AS (
        | SELECT cs.lang, sum(cast(cs.c as hugeint) * (l.lg + cs.sh * 1048576)) s
        | FROM cs JOIN lg l ON l.x = cs.arg GROUP BY 1
        |), spre AS (
        | SELECT ps.lang, sum(cast(ps.cw12 as hugeint) * (l.lg + ps.sh * 1048576)) s
        | FROM ps JOIN lg l ON l.x = ps.arg GROUP BY 1
        |), h AS (
        | SELECT ts.lang, ts.n_trigrams, ts.n_trigram_types, npx.n_prefix_types,
        |  cast(cast(ts.n_trigrams as hugeint) * (l.lg + ts.sh * 1048576) - stg.s as bigint) h_joint_num,
        |  cast(spre.s - stg.s as bigint) h_cond_num,
        |  cast((cast(ts.n_trigrams as hugeint) * (l.lg + ts.sh * 1048576) - stg.s) * 1000000
        |    // (cast(ts.n_trigrams as hugeint) * 1048576) as bigint) joint_bits_micro,
        |  cast((spre.s - stg.s) * 1000000
        |    // (cast(ts.n_trigrams as hugeint) * 1048576) as bigint) cond_bits_micro
        | FROM ts JOIN lg l ON l.x = ts.arg
        | JOIN npx ON npx.lang = ts.lang
        | JOIN stg ON stg.lang = ts.lang JOIN spre ON spre.lang = ts.lang
        |)
        |SELECT lang, n_trigrams, n_trigram_types, n_prefix_types, h_joint_num,
        | h_cond_num, joint_bits_micro, cond_bits_micro
        |FROM h ORDER BY lang""").stripMargin,
    "txt_doc_kn3_perplexity" ->
      ("WITH RECURSIVE " + Kn3TrigramCtes + """, lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT an AS x FROM ls3 UNION ALL SELECT ac FROM ls3
        |  UNION ALL SELECT am FROM ls3 UNION ALL SELECT ab FROM ls3)
        |), """ + LgCte + ", " + Kn3BitsCte + """, agg AS (
        | SELECT dt.doc_id, dt.lang, cast(sum(c_d) as bigint) n_trigrams,
        |  sum(cast(c_d as hugeint) * bw3.bits_w) sb
        | FROM dt JOIN bw3 ON bw3.lang = dt.lang AND bw3.w1 = dt.w1
        |  AND bw3.w2 = dt.w2 AND bw3.w3 = dt.w3
        | GROUP BY 1, 2
        |), r AS (
        | SELECT doc_id, lang, n_trigrams, cast(sb as bigint) kn3_bits_num,
        |  cast((CASE WHEN sb < 0 THEN -1 ELSE 1 END)
        |   * (abs(sb) * 1000000 // (cast(n_trigrams as hugeint) * 1048576)) as bigint) bits_micro
        | FROM agg
        |)
        |SELECT doc_id, lang, n_trigrams, kn3_bits_num, bits_micro,
        | bits_micro > 4000000 AS high_perplexity
        |FROM r ORDER BY doc_id""").stripMargin,
    "pipe_quality_verdict" ->
      ("WITH RECURSIVE " + UnigramDocCtes + """, lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM rs UNION ALL SELECT arg FROM ts
        |  UNION ALL SELECT arg FROM cs UNION ALL SELECT arg FROM gs)
        |), """ + LgCte + ", " + UnigramScoreCtes + s""", v AS (
        | SELECT d.doc_id, h.lang, d.source, d.n_chars, h.n_tokens,
        |  h.entropy_micro, h.ppl_micro,
        |  d.n_chars * 1000000 // h.n_tokens chars_per_token_micro,
        |  cast(CASE WHEN h.entropy_micro < 3500000 THEN 1 ELSE 0 END
        |   + CASE WHEN h.ppl_micro > 5000000 THEN 2 ELSE 0 END
        |   + CASE WHEN h.n_tokens < ${operators.CorpusPipeline.MinDocTokens} THEN 4 ELSE 0 END
        |   + CASE WHEN d.n_chars * 1000000 // h.n_tokens < 4800000
        |          OR d.n_chars * 1000000 // h.n_tokens > 5800000 THEN 8 ELSE 0 END as bigint) reason_mask
        | FROM documents d JOIN h ON h.doc_id = d.doc_id
        |)
        |SELECT doc_id, lang, source, n_chars, n_tokens, entropy_micro,
        | ppl_micro, chars_per_token_micro, reason_mask,
        | reason_mask = 0 AS keep
        |FROM v ORDER BY doc_id""").stripMargin,
    "dd_semantic_decontaminate" ->
      """WITH b AS (
        | SELECT vec_id bid, label, embedding be FROM embeddings WHERE vec_id % 17 = 0
        |), c AS (
        | SELECT vec_id, label, embedding ce FROM embeddings WHERE vec_id % 17 <> 0
        |), s AS (
        | SELECT c.vec_id, b.bid,
        |  list_sum(list_transform(range(1, 65), i -> cast(ce[i] as double) * cast(be[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(ce[i] as double) * cast(ce[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(be[i] as double) * cast(be[i] as double))))) cosim
        | FROM c JOIN b ON c.label = b.label
        |), f AS (SELECT * FROM s WHERE cosim >= 0.30),
        |g AS (
        | SELECT vec_id, cast(count(*) as bigint) n_bench_hits, round(max(cosim), 6) max_sim
        | FROM f GROUP BY 1
        |), r AS (
        | SELECT vec_id, bid, row_number() OVER (PARTITION BY vec_id ORDER BY cosim DESC, bid) rnk
        | FROM f
        |)
        |SELECT g.vec_id, g.n_bench_hits, r.bid AS nearest_bench, g.max_sim
        |FROM g JOIN r ON r.vec_id = g.vec_id AND r.rnk = 1
        |ORDER BY g.vec_id""".stripMargin,
    "pipe_quality_funnel" ->
      ("WITH RECURSIVE " + UnigramDocCtes + ", " + KnBigramCtes + """, lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT arg AS x FROM rs UNION ALL SELECT arg FROM ts
        |  UNION ALL SELECT arg FROM cs UNION ALL SELECT arg FROM gs
        |  UNION ALL SELECT an FROM ls UNION ALL SELECT ac FROM ls
        |  UNION ALL SELECT ab FROM ls)
        |), """ + LgCte + ", " + UnigramScoreCtes + ", " + KnBitsCte + s""", knagg AS (
        | SELECT db.doc_id, cast(sum(c_d) as bigint) n_bigrams,
        |  sum(cast(c_d as hugeint) * bw.bits_w) sb
        | FROM db JOIN bw ON bw.lang = db.lang AND bw.w1 = db.w1 AND bw.w2 = db.w2
        | GROUP BY 1
        |), knr AS (
        | SELECT doc_id,
        |  cast((CASE WHEN sb < 0 THEN -1 ELSE 1 END)
        |   * (abs(sb) * 1000000 // (cast(n_bigrams as hugeint) * 1048576)) as bigint) bits_micro
        | FROM knagg
        |), flags AS (
        | SELECT d.doc_id,
        |  coalesce(h.n_tokens, 0) n_tokens,
        |  coalesce(h.entropy_micro < 3500000, false) low_entropy,
        |  coalesce(h.ppl_micro > 5000000, false) high_uni_ppl,
        |  coalesce(knr.bits_micro > 5000000, false) high_kn_ppl
        | FROM documents d
        | LEFT JOIN h ON h.doc_id = d.doc_id
        | LEFT JOIN knr ON knr.doc_id = d.doc_id
        |), a AS (
        | SELECT cast(count(*) as bigint) n_docs,
        |  cast(sum(CASE WHEN n_tokens < $MinTok THEN 1 ELSE 0 END) as bigint) fail_len,
        |  cast(sum(CASE WHEN low_entropy THEN 1 ELSE 0 END) as bigint) fail_ent,
        |  cast(sum(CASE WHEN high_uni_ppl THEN 1 ELSE 0 END) as bigint) fail_uni,
        |  cast(sum(CASE WHEN high_kn_ppl THEN 1 ELSE 0 END) as bigint) fail_kn,
        |  cast(sum(CASE WHEN n_tokens >= $MinTok THEN 1 ELSE 0 END) as bigint) s1,
        |  cast(sum(CASE WHEN n_tokens >= $MinTok AND NOT low_entropy THEN 1 ELSE 0 END) as bigint) s2,
        |  cast(sum(CASE WHEN n_tokens >= $MinTok AND NOT low_entropy AND NOT high_uni_ppl THEN 1 ELSE 0 END) as bigint) s3,
        |  cast(sum(CASE WHEN n_tokens >= $MinTok AND NOT low_entropy AND NOT high_uni_ppl AND NOT high_kn_ppl THEN 1 ELSE 0 END) as bigint) s4
        | FROM flags
        |)
        |SELECT stage, n FROM (
        | SELECT 'docs_total' stage, n_docs n FROM a
        | UNION ALL SELECT 'fail_length', fail_len FROM a
        | UNION ALL SELECT 'fail_low_entropy', fail_ent FROM a
        | UNION ALL SELECT 'fail_unigram_ppl', fail_uni FROM a
        | UNION ALL SELECT 'fail_kn_ppl', fail_kn FROM a
        | UNION ALL SELECT 'pass_length', s1 FROM a
        | UNION ALL SELECT 'pass_entropy', s2 FROM a
        | UNION ALL SELECT 'pass_unigram_ppl', s3 FROM a
        | UNION ALL SELECT 'kept', s4 FROM a
        |) ORDER BY stage""").stripMargin,
    "txt_kl_divergence" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS MATERIALIZED (
        | SELECT lang, term, cast(count(*) as bigint) c FROM t GROUP BY 1, 2
        |), tot AS (
        | SELECT lang, cast(sum(c) as bigint) n_tok FROM c GROUP BY 1
        |), vg AS (SELECT cast(count(DISTINCT term) as bigint) v_glob FROM c),
        |pairs AS (
        | SELECT a.lang la, b.lang lb, a.n_tok n_a, b.n_tok n_b, v_glob
        | FROM tot a JOIN tot b ON a.lang < b.lang CROSS JOIN vg
        |), ps AS (
        | SELECT la, lb, n_a, n_b, v_glob,
        |  greatest(0, length(bin(n_a + v_glob)) - 43) sa,
        |  (n_a + v_glob) // (cast(1 as bigint) << greatest(0, length(bin(n_a + v_glob)) - 43)) daa,
        |  greatest(0, length(bin(n_b + v_glob)) - 43) sb,
        |  (n_b + v_glob) // (cast(1 as bigint) << greatest(0, length(bin(n_b + v_glob)) - 43)) dba
        | FROM pairs
        |), terms AS (SELECT DISTINCT term FROM c),
        |u AS (
        | SELECT p.la, p.lb, tm.term,
        |  coalesce(ca.c, 0) ca, coalesce(cb.c, 0) cb
        | FROM pairs p CROSS JOIN terms tm
        | LEFT JOIN c ca ON ca.lang = p.la AND ca.term = tm.term
        | LEFT JOIN c cb ON cb.lang = p.lb AND cb.term = tm.term
        |), u2 AS MATERIALIZED (
        | SELECT la, lb, ca, cb,
        |  greatest(0, length(bin(ca + 1)) - 43) sca,
        |  (ca + 1) // (cast(1 as bigint) << greatest(0, length(bin(ca + 1)) - 43)) caa,
        |  greatest(0, length(bin(cb + 1)) - 43) scb,
        |  (cb + 1) // (cast(1 as bigint) << greatest(0, length(bin(cb + 1)) - 43)) cba
        | FROM u
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT caa AS x FROM u2 UNION ALL SELECT cba FROM u2
        |  UNION ALL SELECT daa FROM ps UNION ALL SELECT dba FROM ps)
        |), """ + LgCte + """, s AS (
        | SELECT la, lb,
        |  cast(sum(CASE WHEN ca > 0 OR cb > 0 THEN 1 ELSE 0 END) as bigint) n_union,
        |  sum(cast(ca + 1 as hugeint) * ((la1.lg + sca * 1048576) - (lb1.lg + scb * 1048576))) sab,
        |  sum(cast(cb + 1 as hugeint) * ((lb1.lg + scb * 1048576) - (la1.lg + sca * 1048576))) sba
        | FROM u2 JOIN lg la1 ON la1.x = caa JOIN lg lb1 ON lb1.x = cba
        | GROUP BY 1, 2
        |), k AS (
        | SELECT s.la, s.lb, p.n_a, p.n_b, p.v_glob, s.n_union,
        |  cast(sab + cast(p.n_a + p.v_glob as hugeint)
        |    * ((lgb.lg + p.sb * 1048576) - (lga.lg + p.sa * 1048576)) as bigint) kl_ab_num,
        |  cast(sba + cast(p.n_b + p.v_glob as hugeint)
        |    * ((lga.lg + p.sa * 1048576) - (lgb.lg + p.sb * 1048576)) as bigint) kl_ba_num
        | FROM s JOIN ps p ON p.la = s.la AND p.lb = s.lb
        | JOIN lg lga ON lga.x = p.daa
        | JOIN lg lgb ON lgb.x = p.dba
        |)
        |SELECT la AS lang_a, lb AS lang_b, n_a, n_b, v_glob, n_union,
        | kl_ab_num, kl_ba_num,
        | cast((CASE WHEN kl_ab_num < 0 THEN -1 ELSE 1 END)
        |   * (cast(abs(kl_ab_num) as hugeint) * 1000000
        |      // (cast(n_a + v_glob as hugeint) * 1048576)) as bigint) AS kl_ab_micro,
        | cast((CASE WHEN kl_ba_num < 0 THEN -1 ELSE 1 END)
        |   * (cast(abs(kl_ba_num) as hugeint) * 1000000
        |      // (cast(n_b + v_glob as hugeint) * 1048576)) as bigint) AS kl_ba_micro
        |FROM k ORDER BY lang_a, lang_b""").stripMargin,
    // Page's L over the Friedman doubled rank sums, with the
    // permutation-null mean b*(k+1)*k(k+1)/2 riding along
    "q163_page_trend" ->
      """WITH weekly AS (
        | SELECT o_orderpriority,
        |  date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) // 7 AS wk,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), complete AS (
        | SELECT wk FROM weekly GROUP BY wk HAVING count(*) = 5
        |), wv AS (SELECT w.* FROM weekly w JOIN complete USING (wk)),
        |ranks AS (
        | SELECT a.o_orderpriority, a.wk,
        |  cast(sum(CASE WHEN b.cents < a.cents THEN 2 ELSE 0 END)
        |   + sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 as bigint) r2
        | FROM wv a JOIN wv b ON a.wk = b.wk
        | GROUP BY 1, 2
        |), f AS (
        | SELECT o_orderpriority,
        |  cast(substring(o_orderpriority, 1, 1) as bigint) AS prio_idx,
        |  count(*) AS n_blocks, cast(sum(r2) as bigint) AS sum_r2
        | FROM ranks GROUP BY 1
        |)
        |SELECT count(*) AS k, cast(max(n_blocks) as bigint) AS n_blocks,
        | cast(sum(cast(prio_idx as hugeint) * sum_r2) as varchar) AS l2,
        | cast(max(n_blocks) * (count(*) + 1) * (count(*) * (count(*) + 1) // 2) as bigint)
        |  AS l2_null_mean
        |FROM f""".stripMargin,
    // Cochran-Armitage: exact centered trend terms across the ordered
    // priority groups, binary outcome = fulfilled status
    "q162_cochran_armitage" ->
      """WITH g AS (
        | SELECT o_orderpriority, cast(substring(o_orderpriority, 1, 1) as bigint) w,
        |  cast(count(*) as bigint) n_g,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) n1_g
        | FROM orders GROUP BY 1, 2
        |), t AS (
        | SELECT cast(sum(n_g) as bigint) n_total, cast(sum(n1_g) as bigint) n1_total FROM g
        |)
        |SELECT o_orderpriority, w, n_g, n1_g, n_total, n1_total,
        | cast(cast(w as hugeint) * (cast(n1_g as hugeint) * n_total
        |   - cast(n_g as hugeint) * n1_total) as varchar) AS t_term
        |FROM g CROSS JOIN t ORDER BY w""".stripMargin,
    // frame energy: byte values as samples over 8-byte frames; ascii()
    // agrees byte-for-byte on the ASCII corpus in both engines
    "mm_frame_energy" ->
      """WITH d AS (
        | SELECT doc_id, text, cast(length(text) as bigint) n_bytes FROM documents
        |), f AS (
        | SELECT doc_id, n_bytes, text, unnest(range(0, (n_bytes - 1) // 8 + 1)) frame_idx
        | FROM d
        |)
        |SELECT doc_id, cast(frame_idx as bigint) AS frame_idx,
        | cast(least(8, n_bytes - frame_idx * 8) as bigint) AS frame_len,
        | cast(list_sum(list_transform(range(1, cast(least(8, n_bytes - frame_idx * 8) as int) + 1),
        |   i -> ascii(substring(text, cast(frame_idx * 8 as int) + i, 1)))) as bigint) AS energy
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "txt_yule_k" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS (
        | SELECT lang, term, count(*) c FROM t GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_types, cast(sum(c) as bigint) AS n_tokens,
        | cast(sum(cast(c as hugeint) * c) - sum(c) as varchar) AS k_num,
        | cast((sum(cast(c as hugeint) * c) - sum(c)) * 10000 * 1000000
        |   // (cast(sum(c) as hugeint) * sum(c)) as bigint) AS k_micro
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_simpson" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS (
        | SELECT lang, term, count(*) c FROM t GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_types, cast(sum(c) as bigint) AS n_tokens,
        | cast(sum(cast(c as hugeint) * (c - 1)) as varchar) AS simpson_num,
        | cast(cast(sum(c) as hugeint) * (sum(c) - 1) as varchar) AS simpson_den
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_langid_kappa" ->
      """WITH t AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), s AS (
        | SELECT doc_id, lang,
        |  cast(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) as bigint) s_de,
        |  cast(len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as bigint) s_en,
        |  cast(len(list_filter(toks, x -> x IN ('el', 'la', 'de', 'que', 'y', 'los'))) as bigint) s_es,
        |  cast(len(list_filter(toks, x -> x IN ('le', 'les', 'et', 'des', 'un', 'une'))) as bigint) s_fr
        | FROM t
        |), p AS (
        | SELECT lang,
        |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
        |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
        | FROM s
        |), conf AS (
        | SELECT lang, pred_lang, count(*) n_docs FROM p GROUP BY 1, 2
        |), rt AS (SELECT lang, cast(sum(n_docs) as bigint) row_n FROM conf GROUP BY 1),
        |ct AS (SELECT pred_lang, cast(sum(n_docs) as bigint) col_n FROM conf GROUP BY 1),
        |pr AS (
        | SELECT cast(sum(cast(row_n as hugeint) * col_n) as decimal(38,0)) chance_prod
        | FROM rt JOIN ct ON rt.lang = ct.pred_lang
        |), ag AS (
        | SELECT cast(sum(n_docs) as bigint) n,
        |  cast(sum(CASE WHEN lang = pred_lang THEN n_docs ELSE 0 END) as bigint) agree
        | FROM conf
        |)
        |SELECT n, agree, cast(chance_prod as bigint) AS chance_prod,
        | cast(cast(agree as hugeint) * n - cast(chance_prod as hugeint) as bigint) AS kappa_num,
        | cast(cast(n as hugeint) * n - cast(chance_prod as hugeint) as bigint) AS kappa_den
        |FROM ag, pr""".stripMargin,
    "txt_burstiness" ->
      """WITH t AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), pd AS (
        | SELECT term, doc_id, count(*) c FROM t GROUP BY 1, 2
        |), st AS (
        | SELECT term, count(*) n_docs_with, cast(sum(c) as bigint) sum_c,
        |  cast(sum(cast(c as hugeint) * c) as decimal(38,0)) sum_c2
        | FROM pd GROUP BY 1
        |), nd AS (SELECT count(*) n_docs FROM documents),
        |r AS (
        | SELECT *, cast(row_number() OVER (ORDER BY sum_c DESC, term) as bigint) "rank" FROM st
        |)
        |SELECT "rank", term, n_docs_with, sum_c,
        | cast(sum_c2 as bigint) AS sum_c2,
        | cast(cast(n_docs as hugeint) * cast(sum_c2 as hugeint)
        |   - cast(sum_c as hugeint) * sum_c as bigint) AS vmr_num,
        | cast(cast(n_docs as hugeint) * sum_c as bigint) AS vmr_den
        |FROM r, nd WHERE "rank" <= 20 ORDER BY "rank"""".stripMargin,
    "pipe_temp_sampling" ->
      """WITH c AS (SELECT lang, count(*) n_docs FROM documents GROUP BY 1),
        |cum AS (
        | SELECT lang, n_docs, sqrt(cast(n_docs as double)) sq,
        |  sum(sqrt(cast(n_docs as double)))
        |   OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s_cum
        | FROM c
        |), tot AS (
        | SELECT cast(sum(n_docs) as bigint) n_total, max(s_cum) sq_total FROM cum
        |)
        |SELECT lang, n_docs,
        | n_docs / cast(n_total as double) AS base_share,
        | sq / sq_total AS temp_weight
        |FROM cum, tot ORDER BY lang""".stripMargin,
    "q121_kaplan_meier" ->
      """WITH pc AS (
        | SELECT o_custkey, min(cast(o_orderdate as date)) first_day,
        |  max(cast(o_orderdate as date)) last_day
        | FROM orders GROUP BY 1
        |), co AS (
        | SELECT cast(max(cast(o_orderdate as date)) - INTERVAL 56 DAY as date) AS cutoff FROM orders
        |), byt AS (
        | SELECT date_diff('day', first_day, last_day) // 7 AS t,
        |  cast(sum(CASE WHEN last_day <= cutoff THEN 1 ELSE 0 END) as bigint) d,
        |  cast(sum(CASE WHEN last_day <= cutoff THEN 0 ELSE 1 END) as bigint) cns,
        |  count(*) m
        | FROM pc, co GROUP BY 1
        |), risk AS (
        | SELECT t, d, cns,
        |  cast((SELECT sum(m) FROM byt)
        |   - coalesce(sum(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   as bigint) n_at_risk
        | FROM byt
        |), steps AS (
        | SELECT t AS t_weeks, n_at_risk, d, cns FROM risk WHERE d > 0
        |), fs AS (
        | SELECT list(struct_pack(t := t_weeks, f := (n_at_risk - d) / n_at_risk)
        |   ORDER BY t_weeks) fl
        | FROM steps
        |)
        |SELECT t_weeks, n_at_risk, d AS n_events, cns AS n_censored,
        | list_reduce(
        |   list_prepend(cast(1.0 as double),
        |     list_transform(list_filter(fl, x -> x.t <= t_weeks), x -> x.f)),
        |   (acc, x) -> acc * x) AS survival
        |FROM steps, fs ORDER BY t_weeks""".stripMargin,
    "txt_vocab_growth" ->
      """WITH ids AS (SELECT min(doc_id) lo, max(doc_id) hi FROM documents),
        |db AS (SELECT ((doc_id - lo) * 10) // (hi - lo + 1) b FROM documents, ids),
        |dc AS (SELECT b, count(*) docs FROM db GROUP BY 1),
        |t AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), fd AS (SELECT term, min(doc_id) fdoc FROM t GROUP BY 1),
        |tb AS (SELECT ((fdoc - lo) * 10) // (hi - lo + 1) b FROM fd, ids),
        |tc AS (SELECT b, count(*) new_terms FROM tb GROUP BY 1),
        |j AS (
        | SELECT coalesce(dc.b, tc.b) b, coalesce(docs, 0) docs,
        |  coalesce(new_terms, 0) new_terms
        | FROM dc FULL OUTER JOIN tc ON dc.b = tc.b
        |)
        |SELECT cast(b as bigint) AS bucket,
        | cast(sum(docs) OVER w as bigint) AS docs_cum,
        | cast(new_terms as bigint) AS new_terms,
        | cast(sum(new_terms) OVER w as bigint) AS vocab_cum
        |FROM j
        |WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,
    // IVF-PQ composite, residual-encoded: coarse cell probe (top-2
    // cells by exact L2), candidates ADC-scored from residual codes
    // with a per-(query, cell) residual lookup - the FAISS IndexIVFPQ
    // serving shape. All emitted folds order-pinned.
    "sim_ivfpq" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cellcent AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), cellv AS (
        | SELECT label, list(c ORDER BY i) cellv FROM cellcent GROUP BY 1
        |), resid AS (
        | SELECT vec_id, e.label,
        |  list_transform(range(1, 65), i -> cast(embedding[i] as double) - cellv[i]) r
        | FROM embeddings e JOIN cellv ON e.label = cellv.label
        |), cbdim AS (
        | SELECT vec_id % 16 g, i,
        |  list_reduce(list_prepend(cast(0 as double), list(r[i] ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM resid CROSS JOIN dims GROUP BY g, i
        |), cb AS (
        | SELECT g, (i - 1) // 8 AS sub, list(c ORDER BY i) cv FROM cbdim GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, label, s.sub, r
        | FROM resid CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, label, sv.sub, g,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (r[sv.sub * 8 + j] - cv[j]) * (r[sv.sub * 8 + j] - cv[j]))) dist
        | FROM sv JOIN cb ON sv.sub = cb.sub
        |), best AS (
        | SELECT vec_id, label, sub, g,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, g) rn FROM d
        |), codes AS (
        | SELECT vec_id, label, sub, g AS code FROM best WHERE rn = 1
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), qcell AS (
        | SELECT q_id, q_emb, label, cellv,
        |  list_sum(list_transform(range(1, 65), i ->
        |    (cast(q_emb[i] as double) - cellv[i]) * (cast(q_emb[i] as double) - cellv[i]))) qdist
        | FROM q CROSS JOIN cellv
        |), probes AS (
        | SELECT q_id, label,
        |  list_transform(range(1, 65), i -> cast(q_emb[i] as double) - cellv[i]) qr
        | FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY qdist, label) rn
        |       FROM qcell) p WHERE rn <= 2
        |), terms AS (
        | SELECT q_id, c.vec_id, c.label, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (qr[c.sub * 8 + j] - cv[j]) * (qr[c.sub * 8 + j] - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c
        | JOIN probes ON c.label = probes.label
        | JOIN cb ON c.sub = cb.sub AND c.code = cb.g
        |), adc AS (
        | SELECT q_id, vec_id, label,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY q_id, vec_id, label
        |), r AS (
        | SELECT q_id, vec_id, cast(label as bigint) cell, adc_dist,
        |  cast(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) as bigint) "rank"
        | FROM adc WHERE vec_id <> q_id
        |)
        |SELECT q_id, "rank", vec_id, cell, adc_dist
        |FROM r WHERE "rank" <= 5 ORDER BY q_id, "rank"""".stripMargin,

    // IVFPQ recall@k: exact L2 top-5 overlapped with the composed
    // IVF-PQ answer - coarse-probe misses + quantization misorderings
    // in one audit
    "sim_ivfpq_recall" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cellcent AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), cellv AS (
        | SELECT label, list(c ORDER BY i) cellv FROM cellcent GROUP BY 1
        |), resid AS (
        | SELECT vec_id, e.label,
        |  list_transform(range(1, 65), i -> cast(embedding[i] as double) - cellv[i]) r
        | FROM embeddings e JOIN cellv ON e.label = cellv.label
        |), cbdim AS (
        | SELECT vec_id % 16 g, i,
        |  list_reduce(list_prepend(cast(0 as double), list(r[i] ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM resid CROSS JOIN dims GROUP BY g, i
        |), cb AS (
        | SELECT g, (i - 1) // 8 AS sub, list(c ORDER BY i) cv FROM cbdim GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, label, s.sub, r
        | FROM resid CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, label, sv.sub, g,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (r[sv.sub * 8 + j] - cv[j]) * (r[sv.sub * 8 + j] - cv[j]))) dist
        | FROM sv JOIN cb ON sv.sub = cb.sub
        |), best AS (
        | SELECT vec_id, label, sub, g,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, g) rn FROM d
        |), codes AS (
        | SELECT vec_id, label, sub, g AS code FROM best WHERE rn = 1
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), qcell AS (
        | SELECT q_id, q_emb, label, cellv,
        |  list_sum(list_transform(range(1, 65), i ->
        |    (cast(q_emb[i] as double) - cellv[i]) * (cast(q_emb[i] as double) - cellv[i]))) qdist
        | FROM q CROSS JOIN cellv
        |), probes AS (
        | SELECT q_id, label,
        |  list_transform(range(1, 65), i -> cast(q_emb[i] as double) - cellv[i]) qr
        | FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY qdist, label) rn
        |       FROM qcell) p WHERE rn <= 2
        |), terms AS (
        | SELECT q_id, c.vec_id, c.label, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (qr[c.sub * 8 + j] - cv[j]) * (qr[c.sub * 8 + j] - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c
        | JOIN probes ON c.label = probes.label
        | JOIN cb ON c.sub = cb.sub AND c.code = cb.g
        |), adc AS (
        | SELECT q_id, vec_id, label,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY q_id, vec_id, label
        |), r AS (
        | SELECT q_id, vec_id, cast(label as bigint) cell, adc_dist,
        |  cast(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) as bigint) "rank"
        | FROM adc WHERE vec_id <> q_id
        |), hits AS (
        | SELECT q_id, vec_id FROM r WHERE "rank" <= 5
        |), ex AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 65), j ->
        |    (cast(q_emb[j] as double) - cast(e.embedding[j] as double))
        |    * (cast(q_emb[j] as double) - cast(e.embedding[j] as double)))),
        |   (acc, x) -> acc + x) dist
        | FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
        |), ext AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id,
        |   row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) rk FROM ex
        | ) WHERE rk <= 5
        |)
        |SELECT ext.q_id, count(*) AS n_exact,
        | cast(sum(CASE WHEN hits.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_overlap,
        | string_agg(cast(ext.vec_id as varchar), ',' ORDER BY ext.vec_id) AS exact_ids
        |FROM ext LEFT JOIN hits ON ext.q_id = hits.q_id AND ext.vec_id = hits.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // IVFPQ recall-vs-nprobe tuning curve: candidates/recall per probe
    // depth 1..4, probe sets nested so recall is monotone
    "sim_ivfpq_probe_curve" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cellcent AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), cellv AS (
        | SELECT label, list(c ORDER BY i) cellv FROM cellcent GROUP BY 1
        |), resid AS (
        | SELECT vec_id, e.label,
        |  list_transform(range(1, 65), i -> cast(embedding[i] as double) - cellv[i]) r
        | FROM embeddings e JOIN cellv ON e.label = cellv.label
        |), cbdim AS (
        | SELECT vec_id % 16 g, i,
        |  list_reduce(list_prepend(cast(0 as double), list(r[i] ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM resid CROSS JOIN dims GROUP BY g, i
        |), cb AS (
        | SELECT g, (i - 1) // 8 AS sub, list(c ORDER BY i) cv FROM cbdim GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, label, s.sub, r
        | FROM resid CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, label, sv.sub, g,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (r[sv.sub * 8 + j] - cv[j]) * (r[sv.sub * 8 + j] - cv[j]))) dist
        | FROM sv JOIN cb ON sv.sub = cb.sub
        |), best AS (
        | SELECT vec_id, label, sub, g,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, g) rn FROM d
        |), codes AS (
        | SELECT vec_id, label, sub, g AS code FROM best WHERE rn = 1
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), qcell AS (
        | SELECT q_id, q_emb, label, cellv,
        |  list_sum(list_transform(range(1, 65), i ->
        |    (cast(q_emb[i] as double) - cellv[i]) * (cast(q_emb[i] as double) - cellv[i]))) qdist
        | FROM q CROSS JOIN cellv
        |), pp AS (SELECT unnest(range(1, 5)) p
        |), probes AS (
        | SELECT pp.p, q_id, rq.label,
        |  list_transform(range(1, 65), i -> cast(q_emb[i] as double) - cellv[i]) qr
        | FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY qdist, label) rn
        |       FROM qcell) rq CROSS JOIN pp WHERE rn <= pp.p
        |), terms AS (
        | SELECT probes.p, q_id, c.vec_id, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (qr[c.sub * 8 + j] - cv[j]) * (qr[c.sub * 8 + j] - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c
        | JOIN probes ON c.label = probes.label
        | JOIN cb ON c.sub = cb.sub AND c.code = cb.g
        |), adc AS (
        | SELECT p, q_id, vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY 1, 2, 3
        |), r AS (
        | SELECT p, q_id, vec_id, adc_dist,
        |  row_number() OVER (PARTITION BY p, q_id ORDER BY adc_dist, vec_id) rk
        | FROM adc WHERE vec_id <> q_id
        |), cand AS (
        | SELECT p, cast(count(*) as bigint) n_candidates FROM r GROUP BY 1
        |), hits AS (
        | SELECT p, q_id, vec_id FROM r WHERE rk <= 5
        |), ex AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 65), j ->
        |    (cast(q_emb[j] as double) - cast(e.embedding[j] as double))
        |    * (cast(q_emb[j] as double) - cast(e.embedding[j] as double)))),
        |   (acc, x) -> acc + x) dist
        | FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
        |), ext AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id,
        |   row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) rk FROM ex
        | ) WHERE rk <= 5
        |)
        |SELECT cast(pp.p as bigint) AS nprobe, cand.n_candidates,
        | cast(count(*) as bigint) AS n_exact,
        | cast(sum(CASE WHEN hits.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hits,
        | cast(sum(CASE WHEN hits.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // count(*) as bigint) AS recall_micro
        |FROM ext CROSS JOIN pp
        |LEFT JOIN hits ON hits.p = pp.p AND ext.q_id = hits.q_id AND ext.vec_id = hits.vec_id
        |JOIN cand ON cand.p = pp.p
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "sim_pq_adc" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, (i - 1) // 8 AS sub, i,
        |  cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2, 3
        |), centv AS (
        | SELECT label clabel, sub, list(c ORDER BY i) cv FROM cent GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, s.sub, embedding
        | FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, sv.sub, clabel,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (cast(embedding[sv.sub * 8 + j] as double) - cv[j]) * (cast(embedding[sv.sub * 8 + j] as double) - cv[j]))) dist
        | FROM sv JOIN centv ON sv.sub = centv.sub
        |), best AS (
        | SELECT vec_id, sub, clabel,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) rn FROM d
        |), codes AS (
        | SELECT vec_id, sub, clabel AS code FROM best WHERE rn = 1
        |), centf AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), centvf AS (
        | SELECT label clabel, (i - 1) // 8 AS sub, list(c ORDER BY i) cv
        | FROM centf GROUP BY 1, 2
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), terms AS (
        | SELECT q_id, c.vec_id, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (cast(q_emb[c.sub * 8 + j] as double) - cv[j])
        |    * (cast(q_emb[c.sub * 8 + j] as double) - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c JOIN centvf ON c.sub = centvf.sub AND c.code = centvf.clabel
        | CROSS JOIN q
        |), adc AS (
        | SELECT q_id, vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY q_id, vec_id
        |), r AS (
        | SELECT q_id, vec_id, adc_dist,
        |  cast(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) as bigint) "rank"
        | FROM adc WHERE vec_id <> q_id
        |)
        |SELECT q_id, "rank", vec_id, adc_dist
        |FROM r WHERE "rank" <= 5 ORDER BY q_id, "rank"""".stripMargin,
    // two-stage retrieval: the ADC chain proposes 20 candidates per
    // query, the exact order-pinned L2 re-rank emits the top 5
    "sim_pq_rerank" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, (i - 1) // 8 AS sub, i,
        |  cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2, 3
        |), centv AS (
        | SELECT label clabel, sub, list(c ORDER BY i) cv FROM cent GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, s.sub, embedding
        | FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, sv.sub, clabel,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (cast(embedding[sv.sub * 8 + j] as double) - cv[j]) * (cast(embedding[sv.sub * 8 + j] as double) - cv[j]))) dist
        | FROM sv JOIN centv ON sv.sub = centv.sub
        |), best AS (
        | SELECT vec_id, sub, clabel,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) rn FROM d
        |), codes AS (
        | SELECT vec_id, sub, clabel AS code FROM best WHERE rn = 1
        |), centf AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), centvf AS (
        | SELECT label clabel, (i - 1) // 8 AS sub, list(c ORDER BY i) cv
        | FROM centf GROUP BY 1, 2
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), terms AS (
        | SELECT q_id, c.vec_id, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (cast(q_emb[c.sub * 8 + j] as double) - cv[j])
        |    * (cast(q_emb[c.sub * 8 + j] as double) - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c JOIN centvf ON c.sub = centvf.sub AND c.code = centvf.clabel
        | CROSS JOIN q
        |), adc AS (
        | SELECT q_id, vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY q_id, vec_id
        |), cand AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id,
        |   row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) rk
        |  FROM adc WHERE vec_id <> q_id
        | ) WHERE rk <= 20
        |), ex AS (
        | SELECT c.q_id, c.vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 65), j ->
        |    (cast(q_emb[j] as double) - cast(e.embedding[j] as double))
        |    * (cast(q_emb[j] as double) - cast(e.embedding[j] as double)))),
        |   (acc, x) -> acc + x) dist
        | FROM cand c JOIN q ON q.q_id = c.q_id JOIN embeddings e ON e.vec_id = c.vec_id
        |), rr AS (
        | SELECT q_id, vec_id, dist,
        |  cast(row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) as bigint) "rank"
        | FROM ex
        |)
        |SELECT q_id, "rank", vec_id, dist FROM rr WHERE "rank" <= 5 ORDER BY q_id, "rank"""".stripMargin,
    "q122_correlogram" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), rn AS (
        | SELECT o_orderpriority, cents,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY "day") rn
        | FROM daily
        |), l AS (SELECT unnest(range(1, 8)) lag),
        |p AS (
        | SELECT a.o_orderpriority, l.lag, a.cents x, b.cents y
        | FROM rn a CROSS JOIN l
        | JOIN rn b ON b.o_orderpriority = a.o_orderpriority AND b.rn = a.rn - l.lag
        |)
        |SELECT o_orderpriority, cast(lag as bigint) AS lag, count(*) AS n,
        | cast(sum(cast(x as hugeint)) as bigint) AS sum_x,
        | cast(sum(cast(y as hugeint)) as bigint) AS sum_y,
        | cast(sum(cast(x as hugeint) * y) as varchar) AS sum_xy,
        | cast(sum(cast(x as hugeint) * x) as varchar) AS sum_x2,
        | cast(sum(cast(y as hugeint) * y) as varchar) AS sum_y2
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_pq_recall" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, (i - 1) // 8 AS sub, i,
        |  cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2, 3
        |), centv AS (
        | SELECT label clabel, sub, list(c ORDER BY i) cv FROM cent GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, s.sub, embedding
        | FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, sv.sub, clabel,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (cast(embedding[sv.sub * 8 + j] as double) - cv[j]) * (cast(embedding[sv.sub * 8 + j] as double) - cv[j]))) dist
        | FROM sv JOIN centv ON sv.sub = centv.sub
        |), best AS (
        | SELECT vec_id, sub, clabel,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) rn FROM d
        |), codes AS (
        | SELECT vec_id, sub, clabel AS code FROM best WHERE rn = 1
        |), centf AS (
        | SELECT label, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY label, i
        |), centvf AS (
        | SELECT label clabel, (i - 1) // 8 AS sub, list(c ORDER BY i) cv
        | FROM centf GROUP BY 1, 2
        |), q AS (
        | SELECT vec_id q_id, embedding q_emb FROM embeddings WHERE vec_id < 3
        |), terms AS (
        | SELECT q_id, c.vec_id, c.sub,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (cast(q_emb[c.sub * 8 + j] as double) - cv[j])
        |    * (cast(q_emb[c.sub * 8 + j] as double) - cv[j]))),
        |   (acc, x) -> acc + x) term
        | FROM codes c JOIN centvf ON c.sub = centvf.sub AND c.code = centvf.clabel
        | CROSS JOIN q
        |), adc AS (
        | SELECT q_id, vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list(term ORDER BY sub)),
        |   (acc, x) -> acc + x) adc_dist
        | FROM terms GROUP BY q_id, vec_id
        |), r AS (
        | SELECT q_id, vec_id, adc_dist,
        |  row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) rk
        | FROM adc WHERE vec_id <> q_id
        |), hits AS (
        | SELECT q_id, vec_id FROM r WHERE rk <= 5
        |), ex AS (
        | SELECT q_id, e.vec_id,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 65), j ->
        |    (cast(q_emb[j] as double) - cast(e.embedding[j] as double))
        |    * (cast(q_emb[j] as double) - cast(e.embedding[j] as double)))),
        |   (acc, x) -> acc + x) dist
        | FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q_id
        |), ext AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id,
        |   row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) rk FROM ex
        | ) WHERE rk <= 5
        |)
        |SELECT ext.q_id, count(*) AS n_exact,
        | cast(sum(CASE WHEN hits.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_overlap,
        | string_agg(cast(ext.vec_id as varchar), ',' ORDER BY ext.vec_id) AS exact_ids
        |FROM ext LEFT JOIN hits ON ext.q_id = hits.q_id AND ext.vec_id = hits.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_collocations" ->
      """WITH t AS (
        | SELECT list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), uni AS (SELECT unnest(toks) term FROM t),
        |uc AS (SELECT term, count(*) n_term FROM uni GROUP BY 1),
        |bg AS (
        | SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) bigram
        | FROM t WHERE len(toks) >= 2
        |), bc AS (SELECT bigram, count(*) n_xy FROM bg GROUP BY 1 HAVING count(*) >= 5),
        |tot AS (
        | SELECT (SELECT cast(sum(n_term) as bigint) FROM uc) n_tokens,
        |  (SELECT count(*) FROM bg) n_bigrams
        |), s AS (
        | SELECT bigram, n_xy, ux.n_term n_x, uy.n_term n_y,
        |  cast(cast(n_xy as hugeint) * n_tokens * n_tokens as varchar) lift_num,
        |  cast(cast(n_bigrams as hugeint) * ux.n_term * uy.n_term as varchar) lift_den
        | FROM bc
        | JOIN uc ux ON ux.term = string_split(bigram, ' ')[1]
        | JOIN uc uy ON uy.term = string_split(bigram, ' ')[2]
        | CROSS JOIN tot
        |), r AS (
        | SELECT *, cast(lift_num as double) / cast(lift_den as double) lift FROM s
        |), rk AS (
        | SELECT *, cast(row_number() OVER (ORDER BY lift DESC, bigram) as bigint) "rank" FROM r
        |)
        |SELECT "rank", bigram, n_xy, n_x, n_y, lift_num, lift_den, lift
        |FROM rk WHERE "rank" <= 20 ORDER BY "rank"""".stripMargin,

    "txt_vocab_overlap" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), v AS (SELECT DISTINCT lang, term FROM t),
        |s AS (SELECT lang, count(*) n FROM v GROUP BY 1),
        |i AS (
        | SELECT a.lang la, b.lang lb, count(*) n_inter
        | FROM v a JOIN v b ON a.term = b.term AND a.lang < b.lang GROUP BY 1, 2
        |)
        |SELECT sa.lang AS lang_a, sb.lang AS lang_b, sa.n AS n_a, sb.n AS n_b,
        | coalesce(i.n_inter, 0) AS n_inter,
        | sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union,
        | cast(coalesce(i.n_inter, 0) as double)
        |   / (sa.n + sb.n - coalesce(i.n_inter, 0)) AS jaccard
        |FROM s sa JOIN s sb ON sa.lang < sb.lang
        |LEFT JOIN i ON i.la = sa.lang AND i.lb = sb.lang
        |ORDER BY lang_a, lang_b""".stripMargin,

    "txt_chao1" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), tc AS (SELECT lang, term, count(*) c FROM t GROUP BY 1, 2),
        |s AS (
        | SELECT lang, count(*) n_types, cast(sum(c) as bigint) n_tokens,
        |  cast(count(*) FILTER (WHERE c = 1) as bigint) f1,
        |  cast(count(*) FILTER (WHERE c = 2) as bigint) f2
        | FROM tc GROUP BY 1
        |)
        |SELECT lang, n_types, n_tokens, f1, f2,
        | cast(cast(f1 as hugeint) * (f1 - 1) as bigint) AS chao_num,
        | 2 * (f2 + 1) AS chao_den,
        | n_types + cast(cast(f1 as hugeint) * (f1 - 1) as double) / (2 * (f2 + 1)) AS chao1
        |FROM s ORDER BY lang""".stripMargin,

    "txt_good_turing" ->
      """WITH tk AS (
        | SELECT list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), t AS (
        | SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) term
        | FROM tk WHERE len(toks) >= 2
        |), tc AS (SELECT term, count(*) r FROM t GROUP BY 1),
        |ff AS (SELECT r, count(*) n_r FROM tc WHERE r <= 11 GROUP BY 1)
        |SELECT a.r, a.n_r, (a.r + 1) * coalesce(b.n_r, 0) AS gt_num,
        | a.n_r AS gt_den,
        | cast((a.r + 1) * coalesce(b.n_r, 0) as double) / a.n_r AS r_star
        |FROM ff a LEFT JOIN ff b ON a.r + 1 = b.r
        |WHERE a.r <= 10 ORDER BY a.r""".stripMargin,

    "q123_assortativity" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |edges AS MATERIALIZED (SELECT a AS src, b2 AS dst FROM pairs
        |          UNION ALL SELECT b2, a FROM pairs),
        |deg AS (SELECT src AS n, count(*) AS d FROM edges GROUP BY 1),
        |s AS (
        | SELECT cast(count(*) as bigint) m_edges,
        |  sum(cast(dx.d as hugeint)) sx,
        |  sum(cast(dx.d as hugeint) * dy.d) sxy,
        |  sum(cast(dx.d as hugeint) * dx.d) sx2
        | FROM edges e JOIN deg dx ON e.src = dx.n JOIN deg dy ON e.dst = dy.n
        |)
        |SELECT m_edges,
        | cast(sx as bigint) AS sum_x,
        | cast(sxy as bigint) AS sum_xy,
        | cast(sx2 as bigint) AS sum_x2,
        | cast(m_edges * sxy - sx * sx as varchar) AS assort_num,
        | cast(m_edges * sx2 - sx * sx as varchar) AS assort_den,
        | cast(m_edges * sxy - sx * sx as double)
        |   / cast(m_edges * sx2 - sx * sx as double) AS assortativity
        |FROM s""".stripMargin,

    "q124_degree_hist" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |deg AS (
        | SELECT n, count(*) AS deg FROM (
        |  SELECT a AS n FROM pairs UNION ALL SELECT b2 FROM pairs) GROUP BY 1
        |)
        |SELECT deg, count(*) AS n_nodes FROM deg GROUP BY 1 ORDER BY deg""".stripMargin,

    "q126_bfs_hops" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |edges AS MATERIALIZED (SELECT a AS src, b2 AS dst FROM pairs
        |          UNION ALL SELECT b2, a FROM pairs),
        |deg AS (SELECT src AS n, count(*) AS d FROM edges GROUP BY 1),
        |hub AS (SELECT n FROM deg ORDER BY d DESC, n LIMIT 1),
        |f1 AS (SELECT DISTINCT dst AS n FROM edges JOIN hub ON edges.src = hub.n
        |       WHERE dst NOT IN (SELECT n FROM hub)),
        |v1 AS (SELECT n FROM hub UNION ALL SELECT n FROM f1),
        |f2 AS (SELECT DISTINCT dst AS n FROM edges JOIN f1 ON edges.src = f1.n
        |       WHERE dst NOT IN (SELECT n FROM v1)),
        |v2 AS (SELECT n FROM v1 UNION ALL SELECT n FROM f2),
        |f3 AS (SELECT DISTINCT dst AS n FROM edges JOIN f2 ON edges.src = f2.n
        |       WHERE dst NOT IN (SELECT n FROM v2))
        |SELECT cast(0 as bigint) AS hops, count(*) AS n_nodes FROM hub
        |UNION ALL SELECT 1, count(*) FROM f1
        |UNION ALL SELECT 2, count(*) FROM f2
        |UNION ALL SELECT 3, count(*) FROM f3
        |ORDER BY hops""".stripMargin,

    "q125_lorenz" ->
      """WITH spend AS (
        | SELECT o_custkey,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as double) AS cd
        | FROM orders GROUP BY 1
        |), b AS (
        | SELECT quantile_cont(cd, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS b FROM spend
        |), bucketed AS (
        | SELECT s.*, cast(1 + list_sum(list_transform(b.b, v -> CASE WHEN cd > v THEN 1 ELSE 0 END)) as bigint) AS decile
        | FROM spend s CROSS JOIN b
        |), d AS (
        | SELECT decile, count(*) AS n_customers,
        |  cast(sum(cast(cents as hugeint)) as bigint) AS dcents
        | FROM bucketed GROUP BY 1
        |), t AS (SELECT cast(sum(cast(dcents as hugeint)) as bigint) AS tcents FROM d),
        |c AS (
        | SELECT decile, n_customers, dcents,
        |  cast(sum(cast(dcents as hugeint)) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_cents
        | FROM d
        |)
        |SELECT decile, n_customers, dcents AS decile_cents, cum_cents,
        | cast(cum_cents as double) / cast(tcents as double) AS cum_share
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,

    "q127_markov_accuracy" ->
      """WITH p AS (
        | SELECT event_type AS from_state,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        | FROM events
        |), pp AS (SELECT * FROM p WHERE to_state IS NOT NULL),
        |c AS (SELECT from_state, to_state, count(*) AS n FROM pp GROUP BY 1, 2),
        |pr AS (
        | SELECT from_state, to_state AS predicted
        | FROM (SELECT *, row_number() OVER (PARTITION BY from_state ORDER BY n DESC, to_state) rn FROM c)
        | WHERE rn = 1
        |)
        |SELECT pp.from_state, predicted,
        | count(*) AS n_transitions,
        | cast(sum(CASE WHEN pp.to_state = predicted THEN 1 ELSE 0 END) as bigint) AS n_correct,
        | sum(CASE WHEN pp.to_state = predicted THEN 1 ELSE 0 END) / count(*) AS accuracy
        |FROM pp JOIN pr ON pp.from_state = pr.from_state
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q128_atkinson" ->
      """WITH spend AS (
        | SELECT o_custkey,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1
        |), j AS (
        | SELECT n_name, cents FROM spend
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |), s AS (
        | SELECT n_name, cast(count(*) as bigint) AS n,
        |  sum(cast(cents as hugeint)) AS sc,
        |  sum(1000000000000 // cents) AS s1h
        | FROM j GROUP BY 1
        |)
        |SELECT n_name, n,
        | cast(sc as bigint) AS sum_cents,
        | cast(s1h as bigint) AS s1,
        | cast(cast(n as hugeint) * n * 1000000000000 as varchar) AS atk_num,
        | cast(s1h * sc as varchar) AS atk_den,
        | 1.0 - cast(cast(n as hugeint) * n * 1000000000000 as double)
        |   / cast(s1h * sc as double) AS atkinson2
        |FROM s ORDER BY n_name""".stripMargin,

    "pipe_weighted_sample" ->
      """WITH u AS (
        | SELECT source, doc_id, n_chars,
        |  list_sum(list_transform(range(1, 11), i ->
        |   cast((strpos('0123456789abcdef',
        |     substring(md5(cast(doc_id as varchar)), i, 1)) - 1) as bigint)
        |   * (cast(1 as bigint) << ((10 - i) * 4)))) AS uval
        | FROM documents
        |), p AS (
        | SELECT source, doc_id, n_chars,
        |  cast(uval // greatest(n_chars, 1) as bigint) AS priority
        | FROM u
        |), r AS (
        | SELECT *, cast(row_number() OVER (
        |   PARTITION BY source ORDER BY priority, doc_id) as bigint) AS "rank"
        | FROM p
        |)
        |SELECT source, "rank", doc_id, n_chars, priority
        |FROM r WHERE "rank" <= 10 ORDER BY source, "rank"""".stripMargin,

    "mm_tile_layout" ->
      """WITH m AS (
        | SELECT doc_id, cast(octet_length(cast(text as blob)) as bigint) AS n FROM documents
        |), im AS (
        | SELECT doc_id, cast(64 + n % 577 as bigint) AS w,
        |  cast(64 + (n * 31) % 421 as bigint) AS h
        | FROM m WHERE n % 2 = 0
        |), g AS (
        | SELECT doc_id, w, h,
        |  cast((w + 127) // 128 as bigint) AS tx_n,
        |  cast((h + 127) // 128 as bigint) AS ty_n
        | FROM im
        |), t AS (
        | SELECT doc_id, w, h, tx_n, ty_n, unnest(range(0, tx_n * ty_n)) AS tile_id
        | FROM g
        |)
        |SELECT doc_id, cast(tile_id as bigint) AS tile_id,
        | cast((tile_id % tx_n) * 128 as bigint) AS x0,
        | cast((tile_id // tx_n) * 128 as bigint) AS y0,
        | cast(least(128, w - (tile_id % tx_n) * 128) as bigint) AS tile_w,
        | cast(least(128, h - (tile_id // tx_n) * 128) as bigint) AS tile_h
        |FROM t ORDER BY doc_id, tile_id""".stripMargin,

    "txt_rank_fusion" ->
      """WITH d AS (
        | SELECT lang, doc_id, n_chars,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) AS n_tokens
        | FROM documents
        |), ra AS (
        | SELECT lang, doc_id, r AS rank_chars FROM (
        |  SELECT lang, doc_id, cast(row_number() OVER (
        |    PARTITION BY lang ORDER BY n_chars DESC, doc_id) as bigint) r FROM d)
        | WHERE r <= 20
        |), rb AS (
        | SELECT lang, doc_id, r AS rank_tokens FROM (
        |  SELECT lang, doc_id, cast(row_number() OVER (
        |    PARTITION BY lang ORDER BY n_tokens DESC, doc_id) as bigint) r FROM d)
        | WHERE r <= 20
        |), f AS (
        | SELECT coalesce(ra.lang, rb.lang) AS lang,
        |  coalesce(ra.doc_id, rb.doc_id) AS doc_id, rank_chars, rank_tokens,
        |  cast(coalesce(1000000000000 // (60 + rank_chars), 0)
        |   + coalesce(1000000000000 // (60 + rank_tokens), 0) as bigint) AS rrf_score
        | FROM ra FULL JOIN rb ON ra.lang = rb.lang AND ra.doc_id = rb.doc_id
        |), rk AS (
        | SELECT *, cast(row_number() OVER (
        |   PARTITION BY lang ORDER BY rrf_score DESC, doc_id) as bigint) AS "rank"
        | FROM f
        |)
        |SELECT lang, "rank", doc_id, rank_chars, rank_tokens, rrf_score
        |FROM rk WHERE "rank" <= 10 ORDER BY lang, "rank"""".stripMargin,

    "q129_eta_squared" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1
        |), tot AS (
        | SELECT cast(count(*) as bigint) AS n_days,
        |  sum(cast(cents as hugeint)) AS s,
        |  sum(cast(cents as hugeint) * cents) AS sxx
        | FROM daily
        |), dw AS (
        | SELECT cast(date_diff('day', DATE '1970-01-01', day) % 7 as bigint) AS dow,
        |  cast(count(*) as bigint) AS n_d, sum(cast(cents as hugeint)) AS s_d
        | FROM daily GROUP BY 1
        |), t AS (
        | SELECT dow, cast(s_d as double) * cast(s_d as double) / n_d AS term FROM dw
        |), c AS (
        | SELECT dow, sum(term) OVER (ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t
        |), tb AS (
        | SELECT max_by(cum, dow) AS t_between, cast(count(*) as bigint) AS n_groups FROM c
        |)
        |SELECT n_days, cast(s as bigint) AS sum_cents,
        | cast(sxx as varchar) AS sum_sq, n_groups, t_between,
        | (cast(n_days as double) * t_between - cast(s as double) * cast(s as double))
        |  / (cast(n_days as double) * cast(sxx as double) - cast(s as double) * cast(s as double)) AS eta_squared
        |FROM tot CROSS JOIN tb""".stripMargin,

    "txt_tv_distance" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), c AS (SELECT lang, term, count(*) c FROM t GROUP BY 1, 2),
        |tt AS (SELECT lang, cast(sum(c) as bigint) n_tok FROM c GROUP BY 1),
        |bo AS (
        | SELECT a.lang la, b.lang lb,
        |  sum(abs(cast(a.c as hugeint) * tb.n_tok - cast(b.c as hugeint) * ta.n_tok)) sum_abs,
        |  cast(sum(a.c) as bigint) ca_both, cast(sum(b.c) as bigint) cb_both
        | FROM c a JOIN c b ON a.term = b.term AND a.lang < b.lang
        | JOIN tt ta ON ta.lang = a.lang JOIN tt tb ON tb.lang = b.lang
        | GROUP BY 1, 2
        |)
        |SELECT sa.lang AS lang_a, sb.lang AS lang_b,
        | sa.n_tok AS n_a, sb.n_tok AS n_b,
        | cast(coalesce(sum_abs, 0)
        |  + cast(sb.n_tok as hugeint) * (sa.n_tok - coalesce(ca_both, 0))
        |  + cast(sa.n_tok as hugeint) * (sb.n_tok - coalesce(cb_both, 0)) as varchar) AS tv_num,
        | cast(2 * cast(sa.n_tok as hugeint) * sb.n_tok as varchar) AS tv_den,
        | cast(cast(coalesce(sum_abs, 0)
        |  + cast(sb.n_tok as hugeint) * (sa.n_tok - coalesce(ca_both, 0))
        |  + cast(sa.n_tok as hugeint) * (sb.n_tok - coalesce(cb_both, 0)) as decimal(38,0)) as double)
        |  / cast(cast(2 * cast(sa.n_tok as hugeint) * sb.n_tok as decimal(38,0)) as double) AS tv
        |FROM tt sa JOIN tt sb ON sa.lang < sb.lang
        |LEFT JOIN bo ON bo.la = sa.lang AND bo.lb = sb.lang
        |ORDER BY lang_a, lang_b""".stripMargin,

    "pipe_k_anonymity" ->
      """WITH q AS (
        | SELECT lang, source, n_chars // 100 AS len_bucket, count(*) AS class_size
        | FROM documents GROUP BY 1, 2, 3
        |)
        |SELECT class_size, count(*) AS n_classes,
        | cast(sum(class_size) as bigint) AS n_docs,
        | class_size < 5 AS at_risk
        |FROM q GROUP BY class_size ORDER BY class_size""".stripMargin,

    "sim_inertia" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label, dist,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), g AS (
        | SELECT new_label, count(*) AS n_vecs,
        |  cast(sum(cast(cast(round(dist, 6) as decimal(18,6)) * 1000000 as bigint)) as bigint) AS inertia_micro,
        |  cast(sum(CASE WHEN label = new_label THEN 1 ELSE 0 END) as bigint) AS n_stable
        | FROM best WHERE rn = 1 GROUP BY 1
        |)
        |SELECT new_label, n_vecs, inertia_micro, n_stable,
        | cast(inertia_micro as double) / 1000000 / n_vecs AS mean_dist
        |FROM g ORDER BY new_label""".stripMargin,

    "dd_cross_source_matrix" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM sh
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), pairs AS (
        | SELECT a.doc_id doc_a, b.doc_id doc_b
        | FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        | GROUP BY 1, 2
        |)
        |SELECT least(da.source, db.source) AS source_a,
        | greatest(da.source, db.source) AS source_b,
        | count(*) AS n_dup_pairs
        |FROM pairs
        |JOIN documents da ON pairs.doc_a = da.doc_id
        |JOIN documents db ON pairs.doc_b = db.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "txt_ngram_coverage" ->
      """WITH tk AS (
        | SELECT list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
        |), bg AS (
        | SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) bigram
        | FROM tk WHERE len(toks) >= 2
        |), c AS (SELECT bigram, count(*) n FROM bg GROUP BY 1),
        |tot AS (SELECT count(*) n_distinct, cast(sum(n) as bigint) total_occ FROM c),
        |r AS (
        | SELECT *, cast(row_number() OVER (ORDER BY n DESC, bigram) as bigint) AS rnk,
        |  cast(sum(n) OVER (ORDER BY n DESC, bigram ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_mass
        | FROM c
        |)
        |SELECT rnk AS k, n_distinct, total_occ, cum_mass AS top_k_mass,
        | cast(cum_mass as double) / total_occ AS coverage
        |FROM r CROSS JOIN tot WHERE rnk IN (10, 50, 100) ORDER BY k""".stripMargin,

    "q130_link_prediction" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |edges AS MATERIALIZED (SELECT a AS src, b2 AS dst FROM pairs
        |          UNION ALL SELECT b2, a FROM pairs),
        |cnb AS (
        | SELECT e1.src AS n1, e2.dst AS n2, cast(count(*) as bigint) AS common_nbrs
        | FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
        | WHERE e1.src < e2.dst GROUP BY 1, 2
        |),
        |cand AS (
        | SELECT * FROM cnb
        | WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.a = cnb.n1 AND pairs.b2 = cnb.n2)
        |),
        |deg AS (SELECT src AS n, cast(count(*) as bigint) AS d FROM edges GROUP BY 1)
        |SELECT n1, n2, common_nbrs,
        | d1.d + d2.d - common_nbrs AS union_deg,
        | cast(common_nbrs as double) / cast(d1.d + d2.d - common_nbrs as double) AS jaccard
        |FROM cand JOIN deg d1 ON cand.n1 = d1.n JOIN deg d2 ON cand.n2 = d2.n
        |ORDER BY common_nbrs DESC, n1, n2 LIMIT 20""".stripMargin,

    "sim_hamming_topk" ->
      """WITH dims AS (SELECT unnest(range(0, 64)) i),
        |codes AS (
        | SELECT vec_id,
        |  cast(sum(CASE WHEN i < 32 AND embedding[i + 1] > 0 THEN 1::BIGINT << i ELSE 0 END) as bigint) AS w1,
        |  cast(sum(CASE WHEN i >= 32 AND embedding[i + 1] > 0 THEN 1::BIGINT << (i - 32) ELSE 0 END) as bigint) AS w2
        | FROM embeddings CROSS JOIN dims GROUP BY 1
        |),
        |probes AS (SELECT vec_id AS qid, w1 AS qw1, w2 AS qw2 FROM codes WHERE vec_id < 5),
        |scored AS (
        | SELECT qid, vec_id,
        |  cast(bit_count(xor(qw1, w1)) + bit_count(xor(qw2, w2)) as bigint) AS hamming
        | FROM probes CROSS JOIN codes WHERE vec_id <> qid
        |),
        |rk AS (
        | SELECT *, cast(row_number() OVER (
        |   PARTITION BY qid ORDER BY hamming, vec_id) as bigint) AS "rank"
        | FROM scored
        |)
        |SELECT qid AS query_id, "rank", vec_id, hamming
        |FROM rk WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    "pipe_l_diversity" ->
      """WITH q AS (
        | SELECT source, n_chars // 100 AS len_bucket,
        |  cast(count(*) as bigint) AS class_size,
        |  cast(count(DISTINCT lang) as bigint) AS l
        | FROM documents GROUP BY 1, 2
        |)
        |SELECT l, count(*) AS n_classes,
        | cast(sum(class_size) as bigint) AS n_docs,
        | l < 2 AS at_risk
        |FROM q GROUP BY l ORDER BY l""".stripMargin,

    "sim_silhouette" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), ab AS (
        | SELECT vec_id, label,
        |  min(CASE WHEN clabel = label THEN dist END) AS a_dist,
        |  min(CASE WHEN clabel <> label THEN dist END) AS b_dist
        | FROM d GROUP BY 1, 2
        |), q AS (
        | SELECT label,
        |  cast(cast(round(a_dist, 6) as decimal(18,6)) * 1000000 as bigint) AS am,
        |  cast(cast(round(b_dist, 6) as decimal(18,6)) * 1000000 as bigint) AS bm
        | FROM ab
        |), s AS (
        | SELECT label, bm > am AS well,
        |  (bm - am + greatest(am, bm)) * 1000000 // greatest(greatest(am, bm), 1) - 1000000 AS s_micro
        | FROM q
        |)
        |SELECT label, count(*) AS n_vecs,
        | cast(sum(s_micro) as bigint) AS s_sum_micro,
        | cast(sum(CASE WHEN well THEN 1 ELSE 0 END) as bigint) AS n_well_placed,
        | cast(cast(sum(s_micro) as bigint) as double) / 1000000.0 / count(*) AS mean_silhouette
        |FROM s GROUP BY label ORDER BY label""".stripMargin,

    "q131_changepoint" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1
        |), tot AS (
        | SELECT cast(count(*) as bigint) AS n_days,
        |  sum(cast(cents as hugeint)) AS total_cents
        | FROM daily
        |), pf AS (
        | SELECT day,
        |  cast(row_number() OVER (ORDER BY day) as bigint) AS k,
        |  sum(cast(cents as hugeint)) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
        | FROM daily
        |)
        |, top AS (
        | SELECT day, k, pfx, abs(n_days * pfx - k * total_cents) AS sc
        | FROM pf CROSS JOIN tot
        | ORDER BY sc DESC, day LIMIT 5
        |)
        |SELECT day, k, cast(pfx as bigint) AS prefix_cents,
        | cast(sc as varchar) AS score
        |FROM top ORDER BY sc DESC, day""".stripMargin,

    "mm_aspect_buckets" ->
      """WITH buckets(bw0, bh0) AS (VALUES
        | (512, 2048), (576, 1664), (704, 1344), (768, 1280), (832, 1152),
        | (896, 1088), (960, 1024), (1024, 1024), (1024, 960), (1088, 896),
        | (1152, 832), (1280, 768), (1344, 704), (1664, 576), (2048, 512)
        |), b2 AS (
        | SELECT cast(bw0 as bigint) bw, cast(bh0 as bigint) bh,
        |  cast(bw0 as bigint) * 1000 // bh0 AS b_ar
        | FROM buckets
        |), imgs AS (
        | SELECT doc_id,
        |  cast(64 * (8 + ((strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar) || ':w'), 1, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar) || ':w'), 2, 1)) - 1)) % 25) as bigint) AS w,
        |  cast(64 * (8 + ((strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar) || ':h'), 1, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar) || ':h'), 2, 1)) - 1)) % 25) as bigint) AS h
        | FROM documents
        |), i2 AS (SELECT doc_id, (w * 1000) // h AS img_ar FROM imgs),
        |a AS (
        | SELECT doc_id, img_ar, bw, bh, b_ar,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY abs(img_ar - b_ar), b_ar, bw) AS rn
        | FROM i2 CROSS JOIN b2
        |)
        |SELECT bw, bh, b_ar, count(*) AS n_images,
        | min(img_ar) AS min_ar, max(img_ar) AS max_ar
        |FROM a WHERE rn = 1 GROUP BY 1, 2, 3 ORDER BY bw, bh""".stripMargin,

    // Wilcoxon: midrank×2 per row is 2·(rank−1) + tie_count + 1 — the
    // oracle computes it with plain windows; the engine computes the
    // identical integer on distinct-value cells (no serial window).
    "q132_wilcoxon" ->
      """WITH y AS (
        | SELECT o_custkey,
        |  sum(CASE WHEN year(o_orderdate) = 1995
        |      THEN cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) END) c95,
        |  sum(CASE WHEN year(o_orderdate) = 1996
        |      THEN cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) END) c96
        | FROM orders WHERE o_orderdate < DATE '1997-01-01'
        | GROUP BY 1
        |), d AS (
        | SELECT c_mktsegment AS seg, c96 - c95 AS diff, abs(c96 - c95) AS adiff
        | FROM y JOIN customer ON o_custkey = c_custkey
        | WHERE c95 IS NOT NULL AND c96 IS NOT NULL AND c95 <> c96
        |), r AS (
        | SELECT seg, diff,
        |  2 * (rank() OVER (PARTITION BY seg ORDER BY adiff) - 1)
        |   + count(*) OVER (PARTITION BY seg, adiff) + 1 AS mr2
        | FROM d
        |)
        |SELECT seg, count(*) AS n,
        | cast(sum(CASE WHEN diff > 0 THEN mr2 ELSE 0 END) as bigint) AS w_plus_x2,
        | cast(count(*) * (count(*) + 1)
        |   - sum(CASE WHEN diff > 0 THEN mr2 ELSE 0 END) as bigint) AS w_minus_x2
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q133_auc" ->
      """WITH b AS (
        | SELECT cast(dayofweek(cast(ts as date)) as bigint) AS dow, value,
        |  (event_type = 'purchase') AS pos
        | FROM events
        |), r AS (
        | SELECT dow, pos,
        |  2 * (rank() OVER (PARTITION BY dow ORDER BY value) - 1)
        |   + count(*) OVER (PARTITION BY dow, value) + 1 AS mr2
        | FROM b
        |), g AS (
        | SELECT dow,
        |  sum(CASE WHEN pos THEN mr2 ELSE 0 END) AS smr2,
        |  sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n1,
        |  sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS n0
        | FROM r GROUP BY 1
        |)
        |SELECT dow, cast(n1 as bigint) AS n_pos, cast(n0 as bigint) AS n_neg,
        | cast(smr2 - n1 * (n1 + 1) as bigint) AS u_x2,
        | cast(smr2 - n1 * (n1 + 1) as double) / (2.0 * n1 * n0) AS auc
        |FROM g ORDER BY 1""".stripMargin,

    "q135_var_ratio" ->
      """WITH o AS (
        | SELECT n_name, o_orderpriority = '1-URGENT' AS is_a,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) AS cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |), g AS (
        | SELECT n_name,
        |  sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
        |  sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) END) AS s_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) END) AS s_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) * cents END) AS q_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) * cents END) AS q_b
        | FROM o GROUP BY 1
        |), s AS (
        | SELECT n_name, cast(n_a as bigint) n_a, cast(n_b as bigint) n_b,
        |  n_a * q_a - s_a * s_a AS ss_a, n_b * q_b - s_b * s_b AS ss_b
        | FROM g WHERE n_a >= 2 AND n_b >= 2
        |)
        |SELECT n_name, n_a, n_b,
        | cast(ss_a as varchar) AS ss_a, cast(ss_b as varchar) AS ss_b,
        | cast(cast(ss_a * n_b * (n_b - 1) as decimal(38,0)) as double)
        |  / cast(cast(ss_b * n_a * (n_a - 1) as decimal(38,0)) as double) AS f_ratio
        |FROM s WHERE ss_b > 0 ORDER BY n_name""".stripMargin,

    // CvM: the oracle's per-row window form (midrank mr2, within-sample
    // row_number i, term (mr2−2i)²) sums to the same integers as the
    // engine's closed-form per-cell reduction — tied elements are
    // interchangeable, so the multiset of indices inside a tie cell is
    // fixed no matter how row_number breaks the tie.
    "q134_cvm" ->
      """WITH o AS (
        | SELECT r_name, o_orderpriority = '1-URGENT' AS is_a,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) AS cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |), r AS (
        | SELECT r_name, is_a,
        |  2 * (rank() OVER (PARTITION BY r_name ORDER BY cents) - 1)
        |   + count(*) OVER (PARTITION BY r_name, cents) + 1 AS mr2,
        |  row_number() OVER (PARTITION BY r_name, is_a ORDER BY cents) AS i
        | FROM o
        |), g AS (
        | SELECT r_name,
        |  sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
        |  sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
        |  sum(CASE WHEN is_a THEN cast(mr2 - 2 * i as hugeint) * (mr2 - 2 * i) END) AS t_a,
        |  sum(CASE WHEN NOT is_a THEN cast(mr2 - 2 * i as hugeint) * (mr2 - 2 * i) END) AS t_b
        | FROM r GROUP BY 1
        |)
        |SELECT r_name, cast(n_a as bigint) AS n_a, cast(n_b as bigint) AS n_b,
        | cast(n_a * t_a + n_b * t_b as varchar) AS u_x4,
        | cast(cast(n_a * t_a + n_b * t_b as decimal(38,0)) as double)
        |   / cast(4 * n_a * n_b * (n_a + n_b) as double)
        |  - cast(4 * n_a * n_b - 1 as double) / cast(6 * (n_a + n_b) as double) AS t_stat
        |FROM g ORDER BY r_name""".stripMargin,

    "q136_holt" -> {
      def kernelSql(ws: Array[Long]): String =
        ws.zipWithIndex.map { case (wt, i) =>
          if (i == 0) s"cast(cents as hugeint) * $wt"
          else s"cast(lag(cents, $i) OVER w as hugeint) * $wt"
        }.mkString("\n        |   + ")
      val n = Analytics.HoltNorm
      s"""WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), l AS (
        | SELECT o_orderpriority, "day", cents,
        |  ${kernelSql(Analytics.HoltW1)} AS s1_num,
        |  ${kernelSql(Analytics.HoltConv)} AS s2_num,
        |  lag(cents, 14) OVER w AS guard
        | FROM daily WINDOW w AS (PARTITION BY o_orderpriority ORDER BY "day")
        |)
        |SELECT o_orderpriority, "day", cents,
        | cast(7 * s1_num * $n - 4 * s2_num as varchar) AS holt_num,
        | cast(((7 * s1_num * $n - 4 * s2_num) + ${Analytics.HoltShift}::hugeint * ${3 * n * n})
        |  * 1000 // ${3 * n * n} - ${1000L * Analytics.HoltShift} as bigint) AS holt_milli
        |FROM l WHERE guard IS NOT NULL
        |ORDER BY o_orderpriority, "day"""".stripMargin
    },

    "q137_theil_sen" ->
      """WITH monthly AS (
        | SELECT n_name,
        |  cast(year(o_orderdate) * 12 + month(o_orderdate) as bigint) AS m,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY 1, 2
        |), p AS (
        | SELECT a.n_name, cast(b.cents - a.cents as double) / (b.m - a.m) AS slope
        | FROM monthly a JOIN monthly b ON a.n_name = b.n_name AND a.m < b.m
        |), r AS (
        | SELECT n_name, slope,
        |  row_number() OVER (PARTITION BY n_name ORDER BY slope) AS rn,
        |  count(*) OVER (PARTITION BY n_name) AS n_pairs
        | FROM p
        |)
        |SELECT n_name, cast(n_pairs as bigint) AS n_pairs, slope AS sen_slope
        |FROM r WHERE rn = (n_pairs + 1) // 2
        |ORDER BY n_name""".stripMargin,

    "txt_zipf" ->
      """WITH tok AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), tf AS (
        | SELECT lang, term, cast(count(*) as bigint) tf FROM tok GROUP BY 1, 2
        |), r AS (
        | SELECT lang, term, tf,
        |  cast(row_number() OVER (PARTITION BY lang ORDER BY tf DESC, term) as bigint) AS "rank"
        | FROM tf
        |)
        |SELECT lang, "rank", term, tf, tf * "rank" AS zipf_c
        |FROM r WHERE "rank" <= 20 ORDER BY lang, "rank"""".stripMargin,

    "q139_kcore" ->
      // Every multiply-referenced CTE is MATERIALIZED and the induce
      // steps are joins, not IN-subqueries: the uncorrelated-IN form
      // made DuckDB recompute the whole e0 pair expansion per round
      // (observed: an 80 GB temp spill at sf0.1). Same result.
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |k1 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) deg FROM (
        |  SELECT a n FROM e0 UNION ALL SELECT b2 FROM e0) GROUP BY 1) WHERE deg >= 3),
        |e1 AS MATERIALIZED (SELECT e0.a, e0.b2 FROM e0
        |  JOIN k1 x ON e0.a = x.n JOIN k1 y ON e0.b2 = y.n),
        |k2 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) deg FROM (
        |  SELECT a n FROM e1 UNION ALL SELECT b2 FROM e1) GROUP BY 1) WHERE deg >= 3),
        |e2 AS MATERIALIZED (SELECT e1.a, e1.b2 FROM e1
        |  JOIN k2 x ON e1.a = x.n JOIN k2 y ON e1.b2 = y.n),
        |k3 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) deg FROM (
        |  SELECT a n FROM e2 UNION ALL SELECT b2 FROM e2) GROUP BY 1) WHERE deg >= 3),
        |e3 AS MATERIALIZED (SELECT e2.a, e2.b2 FROM e2
        |  JOIN k3 x ON e2.a = x.n JOIN k3 y ON e2.b2 = y.n)
        |SELECT * FROM (
        | SELECT cast(1 as bigint) AS round,
        |  (SELECT cast(count(DISTINCT n) as bigint) FROM (SELECT a n FROM e1 UNION ALL SELECT b2 FROM e1)) AS n_nodes,
        |  (SELECT cast(count(*) as bigint) FROM e1) AS n_edges
        | UNION ALL SELECT 2,
        |  (SELECT cast(count(DISTINCT n) as bigint) FROM (SELECT a n FROM e2 UNION ALL SELECT b2 FROM e2)),
        |  (SELECT cast(count(*) as bigint) FROM e2)
        | UNION ALL SELECT 3,
        |  (SELECT cast(count(DISTINCT n) as bigint) FROM (SELECT a n FROM e3 UNION ALL SELECT b2 FROM e3)),
        |  (SELECT cast(count(*) as bigint) FROM e3)
        |) ORDER BY round""".stripMargin,

    "txt_pr_curve" ->
      """WITH s AS (
        | SELECT (lang = 'en') AS is_en,
        |  cast(length(list_filter(string_split(text, ' '),
        |    x -> x IN ('the', 'and', 'of', 'to', 'a', 'is'))) as bigint) AS s_en
        | FROM documents
        |), t AS (SELECT unnest(range(1, 9)) AS thr),
        |g AS (
        | SELECT thr,
        |  sum(CASE WHEN s_en >= thr AND is_en THEN 1 ELSE 0 END) tp,
        |  sum(CASE WHEN s_en >= thr AND NOT is_en THEN 1 ELSE 0 END) fp,
        |  sum(CASE WHEN s_en < thr AND is_en THEN 1 ELSE 0 END) fn,
        |  sum(CASE WHEN s_en < thr AND NOT is_en THEN 1 ELSE 0 END) tn
        | FROM s CROSS JOIN t GROUP BY 1
        |)
        |SELECT cast(thr as bigint) AS t, cast(tp as bigint) AS tp,
        | cast(fp as bigint) AS fp, cast(fn as bigint) AS fn, cast(tn as bigint) AS tn,
        | cast(tp as double) / cast(tp + fp as double) AS "precision",
        | cast(tp as double) / cast(tp + fn as double) AS recall
        |FROM g ORDER BY t""".stripMargin,

    "pipe_rlhf_pairs" ->
      """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
        |best AS (
        | SELECT lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS pair_idx,
        |  doc_id AS chosen_id, n_chars AS chosen_chars FROM d
        |), worst AS (
        | SELECT lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id) AS pair_idx,
        |  doc_id AS rejected_id, n_chars AS rejected_chars FROM d
        |), c AS (SELECT lang, count(*) AS n_docs FROM d GROUP BY 1)
        |SELECT b.lang, cast(b.pair_idx as bigint) AS pair_idx, chosen_id, rejected_id,
        | chosen_chars - rejected_chars AS margin_chars
        |FROM best b JOIN worst w ON b.lang = w.lang AND b.pair_idx = w.pair_idx
        |JOIN c ON b.lang = c.lang
        |WHERE b.pair_idx <= 10 AND b.pair_idx <= n_docs // 2
        |ORDER BY b.lang, pair_idx""".stripMargin,

    "pipe_contrastive_batches" ->
      """WITH r AS (
        | SELECT label, vec_id,
        |  row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1 AS batch_id
        | FROM embeddings
        |), g AS (SELECT batch_id, cast(count(*) as bigint) AS n_slots FROM r GROUP BY 1),
        |t AS (SELECT count(DISTINCT label) AS n_labels FROM embeddings)
        |SELECT cast(batch_id as bigint) AS batch_id, n_slots,
        | n_slots * (n_slots - 1) AS n_neg_pairs,
        | n_slots = n_labels AS is_full
        |FROM g CROSS JOIN t ORDER BY batch_id""".stripMargin,

    "q138_control_chart" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), mr AS (
        | SELECT o_orderpriority,
        |  abs(cents - lag(cents) OVER (PARTITION BY o_orderpriority ORDER BY day)) AS mr
        | FROM daily
        |), f AS (SELECT * FROM mr WHERE mr IS NOT NULL),
        |s AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_mr,
        |  cast(sum(mr) as bigint) sum_mr, cast(max(mr) as bigint) max_mr
        | FROM f GROUP BY 1
        |)
        |SELECT s.o_orderpriority, n_mr, sum_mr, max_mr,
        | (SELECT cast(count(*) as bigint) FROM f
        |  WHERE f.o_orderpriority = s.o_orderpriority
        |   AND cast(mr as hugeint) * 1000 * n_mr > cast(sum_mr as hugeint) * 3267) AS n_ooc
        |FROM s ORDER BY o_orderpriority""".stripMargin,

    "q140_modularity" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |), lab AS MATERIALIZED (
        | SELECT pa.p_brand brand_a, pb.p_brand brand_b
        | FROM e0 JOIN part pa ON e0.a = pa.p_partkey
        |          JOIN part pb ON e0.b2 = pb.p_partkey
        |), m AS (SELECT cast(count(*) as bigint) m_edges FROM lab),
        |dc AS (
        | SELECT brand, cast(count(*) as bigint) deg_sum FROM (
        |  SELECT brand_a brand FROM lab UNION ALL SELECT brand_b FROM lab) GROUP BY 1
        |), ec AS (
        | SELECT brand_a brand, cast(count(*) as bigint) intra_edges
        | FROM lab WHERE brand_a = brand_b GROUP BY 1
        |)
        |SELECT dc.brand, deg_sum, coalesce(intra_edges, 0) AS intra_edges, m_edges,
        | cast(4 * cast(m_edges as hugeint) * coalesce(intra_edges, 0)
        |      - cast(deg_sum as hugeint) * deg_sum as varchar) AS q_term_scaled
        |FROM dc LEFT JOIN ec ON dc.brand = ec.brand CROSS JOIN m
        |ORDER BY dc.brand""".stripMargin,

    "q141_haar" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1
        |), i AS (
        | SELECT cents, row_number() OVER (ORDER BY day) - 1 AS idx FROM daily
        |), l1 AS (
        | SELECT idx // 2 blk, count(*) n_in,
        |  sum(CASE WHEN idx % 2 = 0 THEN cast(cents as hugeint) ELSE -cast(cents as hugeint) END) d
        | FROM i GROUP BY 1
        |), l2 AS (
        | SELECT idx // 4 blk, count(*) n_in,
        |  sum(CASE WHEN (idx // 2) % 2 = 0 THEN cast(cents as hugeint) ELSE -cast(cents as hugeint) END) d
        | FROM i GROUP BY 1
        |), l3 AS (
        | SELECT idx // 8 blk, count(*) n_in,
        |  sum(CASE WHEN (idx // 4) % 2 = 0 THEN cast(cents as hugeint) ELSE -cast(cents as hugeint) END) d
        | FROM i GROUP BY 1
        |)
        |SELECT * FROM (
        | SELECT cast(1 as bigint) AS level, cast(count(*) as bigint) AS n_coeffs,
        |  cast(sum(d * d) as varchar) AS energy, cast(max(abs(d)) as bigint) AS max_abs_d
        | FROM l1 WHERE n_in = 2
        | UNION ALL
        | SELECT 2, cast(count(*) as bigint), cast(sum(d * d) as varchar),
        |  cast(max(abs(d)) as bigint) FROM l2 WHERE n_in = 4
        | UNION ALL
        | SELECT 3, cast(count(*) as bigint), cast(sum(d * d) as varchar),
        |  cast(max(abs(d)) as bigint) FROM l3 WHERE n_in = 8
        |) ORDER BY level""".stripMargin,

    "q142_ccf" ->
      """WITH x AS (
        | SELECT cast(o_orderdate as date) AS dx,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) x
        | FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
        |), y AS (
        | SELECT cast(o_orderdate as date) AS dy,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) y
        | FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1
        |), lags AS (SELECT unnest(range(0, 8)) AS lag),
        |j AS (
        | SELECT lag, x, y FROM x CROSS JOIN lags JOIN y ON dy = dx + to_days(cast(lag as int))
        |), a AS (
        | SELECT lag, cast(count(*) as bigint) n,
        |  sum(cast(x as hugeint)) sx, sum(cast(y as hugeint)) sy,
        |  sum(cast(x as hugeint) * y) sxy,
        |  sum(cast(x as hugeint) * x) sx2, sum(cast(y as hugeint) * y) sy2
        | FROM j GROUP BY 1
        |)
        |SELECT cast(lag as bigint) AS lag, n,
        | cast(sx as bigint) AS sx, cast(sy as bigint) AS sy,
        | cast(n * sxy - sx * sy as varchar) AS corr_num,
        | cast(n * sx2 - sx * sx as varchar) AS varx_num,
        | cast(n * sy2 - sy * sy as varchar) AS vary_num
        |FROM a ORDER BY lag""".stripMargin,

    "q143_mcnemar" ->
      """WITH a95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |a96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |f AS (
        | SELECT c_mktsegment,
        |  CASE WHEN a95.o_custkey IS NOT NULL THEN 1 ELSE 0 END y95,
        |  CASE WHEN a96.o_custkey IS NOT NULL THEN 1 ELSE 0 END y96
        | FROM customer
        | LEFT JOIN a95 ON c_custkey = a95.o_custkey
        | LEFT JOIN a96 ON c_custkey = a96.o_custkey
        |), g AS (
        | SELECT c_mktsegment,
        |  cast(sum(CASE WHEN y95 = 1 AND y96 = 1 THEN 1 ELSE 0 END) as bigint) n_both,
        |  cast(sum(CASE WHEN y95 = 1 AND y96 = 0 THEN 1 ELSE 0 END) as bigint) n_95_only,
        |  cast(sum(CASE WHEN y95 = 0 AND y96 = 1 THEN 1 ELSE 0 END) as bigint) n_96_only,
        |  cast(sum(CASE WHEN y95 = 0 AND y96 = 0 THEN 1 ELSE 0 END) as bigint) n_neither
        | FROM f GROUP BY 1
        |)
        |SELECT c_mktsegment, n_both, n_95_only, n_96_only, n_neither,
        | cast(cast(n_95_only - n_96_only as hugeint) * (n_95_only - n_96_only) as bigint) AS mcnemar_num,
        | n_95_only + n_96_only AS mcnemar_den,
        | CASE WHEN n_95_only + n_96_only = 0 THEN NULL
        |  ELSE cast(cast(n_95_only - n_96_only as hugeint) * (n_95_only - n_96_only) as double)
        |       / cast(n_95_only + n_96_only as double) END AS mcnemar_stat
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "q144_odds_ratio" ->
      """WITH urgent AS (
        | SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |), f AS (
        | SELECT n_name,
        |  CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END expd,
        |  CASE WHEN u.o_custkey IS NOT NULL THEN 1 ELSE 0 END outc
        | FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | LEFT JOIN urgent u ON c_custkey = u.o_custkey
        |), g AS (
        | SELECT n_name,
        |  cast(sum(CASE WHEN expd = 1 AND outc = 1 THEN 1 ELSE 0 END) as bigint) n_eo,
        |  cast(sum(CASE WHEN expd = 1 AND outc = 0 THEN 1 ELSE 0 END) as bigint) n_en,
        |  cast(sum(CASE WHEN expd = 0 AND outc = 1 THEN 1 ELSE 0 END) as bigint) n_uo,
        |  cast(sum(CASE WHEN expd = 0 AND outc = 0 THEN 1 ELSE 0 END) as bigint) n_un
        | FROM f GROUP BY 1
        |)
        |SELECT n_name, n_eo, n_en, n_uo, n_un,
        | cast(cast(n_eo as hugeint) * n_un as bigint) AS or_num,
        | cast(cast(n_en as hugeint) * n_uo as bigint) AS or_den,
        | CASE WHEN n_en = 0 OR n_uo = 0 THEN NULL
        |  ELSE cast(cast(n_eo as hugeint) * n_un as double)
        |       / cast(cast(n_en as hugeint) * n_uo as double) END AS odds_ratio,
        | cast(cast(n_eo as hugeint) * (n_uo + n_un) as bigint) AS rr_num,
        | cast(cast(n_uo as hugeint) * (n_eo + n_en) as bigint) AS rr_den,
        | CASE WHEN n_uo = 0 OR (n_eo + n_en) = 0 THEN NULL
        |  ELSE cast(cast(n_eo as hugeint) * (n_uo + n_un) as double)
        |       / cast(cast(n_uo as hugeint) * (n_eo + n_en) as double) END AS rel_risk
        |FROM g ORDER BY n_name""".stripMargin,

    "q145_logrank" ->
      """WITH pc AS (
        | SELECT o_custkey, min(cast(o_orderdate as date)) first_day,
        |  max(cast(o_orderdate as date)) last_day
        | FROM orders GROUP BY 1
        |), co AS (
        | SELECT cast(max(cast(o_orderdate as date)) - INTERVAL 56 DAY as date) AS cutoff FROM orders
        |), life AS (
        | SELECT date_diff('day', first_day, last_day) // 7 AS t,
        |  CASE WHEN last_day <= cutoff THEN 1 ELSE 0 END AS event,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        | FROM pc JOIN customer ON o_custkey = c_custkey, co
        |), byt AS (
        | SELECT t, count(*) m, cast(sum(g1) as bigint) m1,
        |  cast(sum(event) as bigint) d, cast(sum(event * g1) as bigint) d1
        | FROM life GROUP BY 1
        |), tot AS (
        | SELECT count(*) n_total, cast(sum(g1) as bigint) n1_total FROM life
        |), r AS (
        | SELECT t, d, d1,
        |  cast(n_total - coalesce(sum(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) n_risk,
        |  cast(n1_total - coalesce(sum(m1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) n1_risk
        | FROM byt CROSS JOIN tot
        |), f AS (
        | SELECT t, n_risk, n1_risk, d, d1,
        |  cast(d as double) * n1_risk / n_risk AS e1_term,
        |  CASE WHEN n_risk <= 1 THEN cast(0 as double)
        |   ELSE cast(d as double) * n1_risk / n_risk * (n_risk - n1_risk) / n_risk
        |        * (n_risk - d) / (n_risk - 1) END AS v_term
        | FROM r WHERE d > 0
        |)
        |SELECT t AS t_weeks, n_risk, n1_risk, d AS n_events, d1 AS n_events_g1,
        | sum(cast(d1 as double) - e1_term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o_minus_e_cum,
        | sum(v_term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS var_cum
        |FROM f ORDER BY t_weeks""".stripMargin,

    "sim_hubness" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |s AS (
        | SELECT a.vec_id src_id, b.vec_id dst_id,
        |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(b.embedding[i] as double) * cast(b.embedding[i] as double))))) cosim
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
        |), r AS (
        | SELECT src_id, dst_id,
        |  row_number() OVER (PARTITION BY src_id ORDER BY cosim DESC, dst_id) rnk
        | FROM s
        |), knn AS (SELECT dst_id FROM r WHERE rnk <= 3),
        |indeg AS (
        | SELECT v.vec_id, cast(count(knn.dst_id) as bigint) indeg
        | FROM embeddings v LEFT JOIN knn ON v.vec_id = knn.dst_id GROUP BY 1
        |)
        |SELECT indeg, cast(count(*) as bigint) AS n_nodes
        |FROM indeg GROUP BY 1 ORDER BY indeg""".stripMargin,

    "sim_covariance" ->
      """WITH pairs AS (
        | SELECT i.i AS i, j.j AS j
        | FROM (SELECT unnest(range(0, 64)) i) i, (SELECT unnest(range(0, 64)) j) j
        | WHERE j.j >= i.i
        |), p AS (
        | SELECT i, j,
        |  round(cast(embedding[i + 1] as double) * cast(embedding[j + 1] as double), 6) pr,
        |  round(cast(embedding[i + 1] as double), 6) xi
        | FROM embeddings CROSS JOIN pairs
        |)
        |SELECT cast(i as bigint) AS dim_i, cast(j as bigint) AS dim_j,
        | cast(count(*) as bigint) AS n,
        | cast(sum(cast(cast(pr as decimal(18,6)) * 1000000 as bigint)) as bigint) AS sum_prod_micro,
        | cast(sum(cast(cast(xi as decimal(18,6)) * 1000000 as bigint)) as bigint) AS sum_i_micro
        |FROM p GROUP BY 1, 2 ORDER BY dim_i, dim_j""".stripMargin,

    "txt_sentence_stats" ->
      """WITH s AS (
        | SELECT lang,
        |  cast(length(regexp_split_to_array(text, '[.!?]+')) - 1 as bigint) sent,
        |  cast(length(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) words
        | FROM documents
        |), g AS (
        | SELECT lang, count(*) n_docs, cast(sum(sent) as bigint) n_sentences,
        |  cast(sum(words) as bigint) n_words, cast(max(sent) as bigint) max_sent_per_doc
        | FROM s GROUP BY 1
        |)
        |SELECT lang, n_docs, n_sentences, n_words, max_sent_per_doc,
        | n_sentences * 1000000 // n_docs AS sent_per_doc_micro,
        | CASE WHEN n_sentences = 0 THEN NULL
        |  ELSE n_words * 1000000 // n_sentences END AS words_per_sent_micro
        |FROM g ORDER BY lang""".stripMargin,

    // ExactSubstr spans: duplicated token 10-grams (>=2 occurrences
    // corpus-wide) merged into maximal spans per doc (gap <= n); the
    // lag-NULL first row lands in island 0 in both engines (NULL
    // comparison -> CASE else 0)
    "dd_dup_spans" ->
      """WITH t AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') tl FROM documents
        |), g AS (
        | SELECT doc_id, cast(i as bigint) pos, list_aggr(tl[i:i+9], 'string_agg', ' ') gram
        | FROM t, unnest(range(1, len(tl) - 8)) u(i) WHERE len(tl) >= 10
        |), dupg AS (
        | SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
        |), h AS (
        | SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)
        |), i1 AS (
        | SELECT doc_id, pos,
        |  CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 10
        |   THEN 1 ELSE 0 END ni
        | FROM h
        |), i2 AS (
        | SELECT doc_id, pos,
        |  sum(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) isl
        | FROM i1
        |), sp AS (
        | SELECT doc_id, isl, min(pos) s, max(pos) + 9 e, count(*) ng FROM i2 GROUP BY 1, 2
        |)
        |SELECT doc_id, cast(count(*) as bigint) AS n_spans,
        | cast(sum(e - s + 1) as bigint) AS dup_token_span,
        | cast(max(e - s + 1) as bigint) AS longest_span,
        | cast(sum(ng) as bigint) AS n_dup_grams
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    "dd_quality_keepers" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |), comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |m AS (
        | SELECT component, c.doc_id, n_chars,
        |  row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, c.doc_id) rnk
        | FROM comp c JOIN documents d ON c.doc_id = d.doc_id
        |)
        |SELECT component, cast(count(*) as bigint) AS n_members,
        | cast(sum(n_chars) as bigint) AS total_chars,
        | max(CASE WHEN rnk = 1 THEN doc_id END) AS keeper_id,
        | cast(max(n_chars) as bigint) AS keeper_chars
        |FROM m GROUP BY component ORDER BY component""".stripMargin,

    "q146_levene" ->
      """WITH v AS (
        | SELECT c_mktsegment, cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint) cents
        | FROM customer
        |), bv AS (SELECT c_mktsegment, cents, count(*) w FROM v GROUP BY 1, 2),
        |c AS (
        | SELECT c_mktsegment, cents,
        |  sum(w) OVER (PARTITION BY c_mktsegment ORDER BY cents) cw,
        |  sum(w) OVER (PARTITION BY c_mktsegment) n
        | FROM bv
        |), med AS (
        | SELECT c_mktsegment, min(cents) med_cents FROM c WHERE cw * 2 >= n GROUP BY 1
        |)
        |SELECT v.c_mktsegment, cast(count(*) as bigint) AS n,
        | cast(max(med_cents) as bigint) AS med_cents,
        | cast(sum(abs(cents - med_cents)) as bigint) AS sum_z,
        | cast(sum(cast(abs(cents - med_cents) as hugeint) * abs(cents - med_cents)) as varchar) AS sum_z2
        |FROM v JOIN med USING (c_mktsegment)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q147_open_orders" ->
      """WITH o AS (SELECT cast(o_orderdate as date) sd FROM orders),
        |d AS (
        | SELECT day, cast(sum(delta) as bigint) net FROM (
        |  SELECT sd AS day, 1 AS delta FROM o
        |  UNION ALL
        |  SELECT cast(sd + INTERVAL 30 DAY as date), -1 FROM o
        | ) GROUP BY 1
        |)
        |SELECT day, net,
        | cast(sum(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS n_open
        |FROM d ORDER BY day""".stripMargin,

    "q148_qq_decile" ->
      """WITH b AS (
        | SELECT o_orderpriority grp, cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |), bv AS (SELECT grp, cents, count(*) w FROM b GROUP BY 1, 2),
        |c AS (
        | SELECT grp, cents,
        |  sum(w) OVER (PARTITION BY grp ORDER BY cents) cw,
        |  sum(w) OVER (PARTITION BY grp) n
        | FROM bv
        |), qs AS (SELECT unnest(range(1, 10)) q),
        |s AS (
        | SELECT grp, q, min(cents) qv
        | FROM c CROSS JOIN qs WHERE cw * 10 >= q * n GROUP BY 1, 2
        |)
        |SELECT cast(x.q as bigint) AS q, x.qv AS x_cents, y.qv AS y_cents,
        | y.qv - x.qv AS diff_cents
        |FROM s x JOIN s y ON x.q = y.q AND x.grp = '1-URGENT' AND y.grp = '5-LOW'
        |ORDER BY q""".stripMargin,

    "q149_seq_patterns" ->
      """WITH p AS (
        | SELECT user_id, event_type a,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) b
        | FROM events
        |)
        |SELECT a, b, cast(count(DISTINCT user_id) as bigint) AS support_users,
        | cast(count(*) as bigint) AS n_occurrences
        |FROM p WHERE b IS NOT NULL
        |GROUP BY 1, 2 ORDER BY support_users DESC, a, b LIMIT 20""".stripMargin,

    "q150_seasonal_dow" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1
        |), ma AS (
        | SELECT day, cents,
        |  count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) n7,
        |  cast(sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) as bigint) sum7
        | FROM daily
        |), det AS (
        | SELECT day, cents * 1000 - (sum7 * 1000 // 7) AS det_milli
        | FROM ma WHERE n7 = 7
        |), g AS (
        | SELECT cast(dayofweek(day) as bigint) dow, count(*) n_days,
        |  cast(sum(det_milli) as bigint) sum_det_milli,
        |  cast(max(det_milli) as bigint) max_det_milli
        | FROM det GROUP BY 1
        |)
        |SELECT dow, n_days, sum_det_milli, max_det_milli,
        | (sum_det_milli + 1000000000000 * n_days) // n_days - 1000000000000 AS seasonal_milli
        |FROM g ORDER BY dow""".stripMargin,

    "txt_kn_prob" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), bi AS (
        | SELECT unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        | FROM toks WHERE len(t) >= 2
        |), bx AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bi),
        |counts AS (SELECT w1, w2, count(*) AS c FROM bx GROUP BY 1, 2),
        |prefix AS (
        | SELECT w1, cast(sum(c) as bigint) AS cw1, count(*) AS n_follow FROM counts GROUP BY 1
        |),
        |contin AS (SELECT w2, count(*) AS n_precede FROM counts GROUP BY 1),
        |btot AS (SELECT count(*) AS b_types FROM counts)
        |SELECT c.w1 AS w1, c.w2 AS w2, c.c AS c, p.cw1, p.n_follow, k.n_precede, b_types,
        | cast(cast(4 * c.c - 3 as hugeint) * b_types
        |      + cast(3 as hugeint) * n_follow * n_precede as varchar) AS p_num,
        | cast(cast(4 as hugeint) * cw1 * b_types as varchar) AS p_den
        |FROM counts c JOIN prefix p ON c.w1 = p.w1 JOIN contin k ON c.w2 = k.w2
        |CROSS JOIN btot
        |ORDER BY c.c DESC, c.w1, c.w2 LIMIT 50""".stripMargin,

    "sim_power_iteration" ->
      """WITH pairs AS (
        | SELECT i.i AS i, j.j AS j
        | FROM (SELECT unnest(range(0, 64)) i) i, (SELECT unnest(range(0, 64)) j) j
        | WHERE j.j >= i.i
        |), p AS (
        | SELECT i, j, round(cast(embedding[i + 1] as double) * cast(embedding[j + 1] as double), 6) pr
        | FROM embeddings CROSS JOIN pairs
        |), upper_ AS (
        | SELECT i, j, cast(cast(sum(cast(pr as decimal(30,6))) as decimal(30,6)) as double) g
        | FROM p GROUP BY 1, 2
        |), m AS (
        | SELECT i, j, g FROM upper_
        | UNION ALL
        | SELECT j, i, g FROM upper_ WHERE i <> j
        |), v1 AS (
        | SELECT i AS dim, list_reduce(list_prepend(cast(0 as double),
        |   list(g ORDER BY j)), (acc, x) -> acc + x) AS v1
        | FROM m GROUP BY i
        |), v2 AS (
        | SELECT m.i AS dim, list_reduce(list_prepend(cast(0 as double),
        |   list(m.g * v1.v1 ORDER BY m.j)), (acc, x) -> acc + x) AS v2
        | FROM m JOIN v1 ON m.j = v1.dim GROUP BY m.i
        |), v3 AS (
        | SELECT m.i AS dim, list_reduce(list_prepend(cast(0 as double),
        |   list(m.g * v2.v2 ORDER BY m.j)), (acc, x) -> acc + x) AS v3
        | FROM m JOIN v2 ON m.j = v2.dim GROUP BY m.i
        |)
        |SELECT cast(v1.dim as bigint) AS dim, v1.v1, v2.v2, v3.v3
        |FROM v1 JOIN v2 ON v1.dim = v2.dim JOIN v3 ON v1.dim = v3.dim
        |ORDER BY dim""".stripMargin,

    "q151_hurst_inputs" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, count(*) n, cast(sum(cents) as bigint) s,
        |  sum(cast(cents as hugeint) * cents) sx2
        | FROM daily GROUP BY 1
        |), pre AS (
        | SELECT d.o_orderpriority,
        |  row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY day) k,
        |  sum(cents) OVER (PARTITION BY d.o_orderpriority ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) p,
        |  n, s
        | FROM daily d JOIN tot USING (o_orderpriority)
        |), dev AS (
        | SELECT o_orderpriority,
        |  cast(n as hugeint) * p - cast(k as hugeint) * s AS d
        | FROM pre
        |), r AS (
        | SELECT o_orderpriority, cast(max(d) - min(d) as bigint) r_scaled
        | FROM dev GROUP BY 1
        |)
        |SELECT t.o_orderpriority, cast(n as bigint) AS n_days, s AS sum_cents,
        | r_scaled,
        | cast(cast(n as hugeint) * sx2 - cast(s as hugeint) * s as varchar) AS s2_num
        |FROM tot t JOIN r USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "q152_friedman" ->
      """WITH weekly AS (
        | SELECT o_orderpriority,
        |  date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) // 7 AS wk,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), complete AS (
        | SELECT wk FROM weekly GROUP BY wk HAVING count(*) = 5
        |), wv AS (SELECT w.* FROM weekly w JOIN complete USING (wk)),
        |ranks AS (
        | SELECT a.o_orderpriority, a.wk,
        |  cast(sum(CASE WHEN b.cents < a.cents THEN 2 ELSE 0 END)
        |   + sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 as bigint) r2
        | FROM wv a JOIN wv b ON a.wk = b.wk
        | GROUP BY 1, 2
        |)
        |SELECT o_orderpriority,
        | cast(substring(o_orderpriority, 1, 1) as bigint) AS prio_idx,
        | count(*) AS n_blocks, cast(sum(r2) as bigint) AS sum_r2,
        | cast(sum(cast(r2 as hugeint) * r2) as bigint) AS sum_r2_sq
        |FROM ranks GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "dd_soft_weights" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |), comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |csz AS (SELECT component, count(*) csize FROM comp GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(comp.component, d.doc_id) AS component,
        | cast(coalesce(csize, 1) as bigint) AS cluster_size,
        | 1000000 // cast(coalesce(csize, 1) as bigint) AS weight_micro
        |FROM documents d
        |LEFT JOIN comp ON d.doc_id = comp.doc_id
        |LEFT JOIN csz ON comp.component = csz.component
        |ORDER BY d.doc_id""".stripMargin,

    "sim_centroid_shift" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label, dist,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), assign_ AS (SELECT vec_id, new_label FROM best WHERE rn = 1),
        |newcent AS (
        | SELECT new_label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings e JOIN assign_ a ON e.vec_id = a.vec_id CROSS JOIN dims
        | GROUP BY 1, 2
        |), newcentv AS (SELECT new_label, list(c ORDER BY i) nv FROM newcent GROUP BY 1),
        |no AS (SELECT label, count(*) n_old FROM embeddings GROUP BY 1),
        |nn AS (SELECT new_label, count(*) n_new FROM assign_ GROUP BY 1)
        |SELECT c.clabel AS label, cast(n_old as bigint) AS n_old, cast(n_new as bigint) AS n_new,
        | round(list_reduce(list_prepend(cast(0 as double),
        |   list_transform(range(1, 65), i -> (c.cv[i] - v.nv[i]) * (c.cv[i] - v.nv[i]))),
        |  (acc, x) -> acc + x), 6) AS shift_sq
        |FROM centv c JOIN newcentv v ON c.clabel = v.new_label
        |JOIN no ON c.clabel = no.label JOIN nn ON c.clabel = nn.new_label
        |ORDER BY label""".stripMargin,

    "q153_cochran_q" ->
      """WITH a95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |a96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |a97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |f AS (
        | SELECT c_custkey,
        |  CASE WHEN a95.o_custkey IS NOT NULL THEN 1 ELSE 0 END y95,
        |  CASE WHEN a96.o_custkey IS NOT NULL THEN 1 ELSE 0 END y96,
        |  CASE WHEN a97.o_custkey IS NOT NULL THEN 1 ELSE 0 END y97
        | FROM customer
        | LEFT JOIN a95 ON c_custkey = a95.o_custkey
        | LEFT JOIN a96 ON c_custkey = a96.o_custkey
        | LEFT JOIN a97 ON c_custkey = a97.o_custkey
        |), g AS (
        | SELECT count(*) n_customers,
        |  cast(sum(y95) as bigint) g95, cast(sum(y96) as bigint) g96,
        |  cast(sum(y97) as bigint) g97,
        |  cast(sum(y95 + y96 + y97) as bigint) sum_l,
        |  cast(sum((y95 + y96 + y97) * (y95 + y96 + y97)) as bigint) sum_l2
        | FROM f
        |), y AS (
        | SELECT 1995 AS year, g95 AS gg FROM g
        | UNION ALL SELECT 1996, g96 FROM g
        | UNION ALL SELECT 1997, g97 FROM g
        |)
        |SELECT cast(year as bigint) AS year, gg AS g, n_customers,
        | cast(2 * (3 * (cast(g95 as hugeint) * g95 + cast(g96 as hugeint) * g96
        |   + cast(g97 as hugeint) * g97)
        |  - cast(g95 + g96 + g97 as hugeint) * (g95 + g96 + g97)) as bigint) AS q_num,
        | cast(cast(3 as hugeint) * sum_l - sum_l2 as bigint) AS q_den,
        | CASE WHEN 3 * sum_l - sum_l2 = 0 THEN NULL
        |  ELSE cast(2 * (3 * (cast(g95 as hugeint) * g95 + cast(g96 as hugeint) * g96
        |    + cast(g97 as hugeint) * g97)
        |   - cast(g95 + g96 + g97 as hugeint) * (g95 + g96 + g97)) as double)
        |   / cast(cast(3 as hugeint) * sum_l - sum_l2 as double) END AS q_stat
        |FROM y CROSS JOIN g ORDER BY year""".stripMargin,

    "txt_doc_keywords" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        | FROM documents
        |), tf AS (SELECT doc_id, term, count(*) tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) df FROM tok GROUP BY 1),
        |nd AS (SELECT count(*) n FROM documents),
        |scored AS (
        | SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  cast(tf.tf as double) * (SELECT n FROM nd) / df.df AS score
        | FROM tf JOIN df ON tf.term = df.term
        |)
        |SELECT doc_id, cast(rnk as bigint) AS rank, term,
        | cast(tf as bigint) AS tf, cast(df as bigint) AS df, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) rnk
        |      FROM scored)
        |WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q154_grubbs_inputs" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, count(*) n, cast(sum(cents) as bigint) s,
        |  sum(cast(cents as hugeint) * cents) sx2
        | FROM daily GROUP BY 1
        |), dev AS (
        | SELECT d.o_orderpriority, day, n, s, sx2,
        |  abs(cast(n as hugeint) * cents - s) AS dv
        | FROM daily d JOIN tot USING (o_orderpriority)
        |), pk AS (
        | SELECT o_orderpriority, day peak_day,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY dv DESC, day) rn
        | FROM dev
        |)
        |SELECT t.o_orderpriority, cast(n as bigint) AS n_days, s AS sum_cents,
        | (SELECT cast(max(dv) as bigint) FROM dev
        |   WHERE dev.o_orderpriority = t.o_orderpriority) AS g_num,
        | (SELECT peak_day FROM pk
        |   WHERE pk.o_orderpriority = t.o_orderpriority AND rn = 1) AS peak_day,
        | cast(cast(n as hugeint) * sx2 - cast(s as hugeint) * s as varchar) AS s2_num
        |FROM tot t ORDER BY o_orderpriority""".stripMargin,

    "dd_lsh_precision" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), shd AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (
        | SELECT doc_id, unnest(shingles) s FROM shd
        |), sizes AS (
        | SELECT doc_id, count(*) n FROM rows_ GROUP BY 1
        |), hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |), inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |), exact AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |), shr AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), sig AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_transform(shingles, s -> md5(cast(i as varchar) || ':' || s)), 'min')) m
        | FROM shr
        |), bands AS (
        | SELECT doc_id, b, md5(m[2*b+1] || m[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |), cand AS (
        | SELECT a.doc_id ca, b.doc_id cb
        | FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        | GROUP BY 1, 2
        |)
        |SELECT count(*) AS n_candidates,
        | cast(sum(CASE WHEN da IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_true,
        | CASE WHEN count(*) = 0 THEN NULL
        |  ELSE cast(sum(CASE WHEN da IS NOT NULL THEN 1 ELSE 0 END) as bigint) * 1000000
        |   // count(*) END AS precision_micro
        |FROM cand LEFT JOIN exact ON ca = da AND cb = db""".stripMargin,

    "sim_norm2_hist" ->
      """WITH n2 AS (
        | SELECT cast(cast(round(list_reduce(list_prepend(cast(0 as double),
        |   list_transform(embedding, x -> cast(x as double) * x)),
        |   (acc, x) -> acc + x), 6) as decimal(18,6)) * 1000000 as bigint) AS n2_micro
        | FROM embeddings
        |), b AS (SELECT min(n2_micro) lo, max(n2_micro) hi FROM n2)
        |SELECT (n2_micro - lo) * 10 // (hi - lo + 1) AS bucket,
        | cast(count(*) as bigint) AS n_vecs,
        | cast(min(n2_micro) as bigint) AS min_n2_micro,
        | cast(max(n2_micro) as bigint) AS max_n2_micro
        |FROM n2 CROSS JOIN b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // MaxSim: the per-sub maxima are floored to micro BEFORE the sum, so
    // the score is an order-free integer sum of 4 longs; only the pair
    // cosines are doubles, computed with the same left-to-right fold as
    // sim_topk_bruteforce (slice indexing s*16+i here ≡ the operator's
    // slice-then-fold — identical product sequence)
    "sim_maxsim" ->
      """WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, e.vec_id,
        |  cast(list_sum(list_transform(range(0, 4), s ->
        |   cast(floor(1000000 * list_max(list_transform(range(0, 4), t ->
        |    list_sum(list_transform(range(1, 17), i -> cast(qe[s*16+i] as double) * cast(e.embedding[t*16+i] as double))) /
        |    (sqrt(list_sum(list_transform(range(1, 17), i -> cast(qe[s*16+i] as double) * cast(qe[s*16+i] as double)))) *
        |     sqrt(list_sum(list_transform(range(1, 17), i -> cast(e.embedding[t*16+i] as double) * cast(e.embedding[t*16+i] as double)))))))) as bigint))) as bigint) score_micro
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |), r AS (
        | SELECT qid query_id, vec_id, score_micro,
        |  row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, score_micro
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    // Ragged MaxSim: docs carry 2-5 overlapping 16-wide sub-vectors
    // (stride-13 windows), queries 2-4 (stride 11); every 17th doc is
    // un-encoded (NULL token list) and must not be retrievable.
    "sim_maxsim_ragged" ->
      """WITH q AS (
        | SELECT vec_id qid, list_transform(range(0, cast(vec_id % 3 as int) + 2), s ->
        |   embedding[(s*11) % 49 + 1 : (s*11) % 49 + 16]) qsubs
        | FROM embeddings WHERE vec_id < 5
        |), d AS (
        | SELECT vec_id, CASE WHEN vec_id % 17 = 0 THEN NULL ELSE
        |   list_transform(range(0, cast(vec_id % 4 as int) + 2), t ->
        |     embedding[(t*13) % 49 + 1 : (t*13) % 49 + 16]) END dsubs
        | FROM embeddings
        |), s AS (
        | SELECT q.qid, d.vec_id, cast(len(dsubs) as bigint) n_doc_subs,
        |  cast(list_sum(list_transform(qsubs, qs ->
        |   cast(floor(1000000 * list_max(list_transform(dsubs, dt ->
        |    list_sum(list_transform(range(1, 17), i -> cast(qs[i] as double) * cast(dt[i] as double))) /
        |    (sqrt(list_sum(list_transform(range(1, 17), i -> cast(qs[i] as double) * cast(qs[i] as double)))) *
        |     sqrt(list_sum(list_transform(range(1, 17), i -> cast(dt[i] as double) * cast(dt[i] as double)))))))) as bigint))) as bigint) score_micro
        | FROM q CROSS JOIN d WHERE d.vec_id <> q.qid AND d.dsubs IS NOT NULL
        |), r AS (
        | SELECT qid query_id, vec_id, n_doc_subs, score_micro,
        |  row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, vec_id) rnk FROM s
        |)
        |SELECT query_id, cast(rnk as bigint) AS rank, vec_id, n_doc_subs, score_micro
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_mmr" -> mmrOracle(20, 5),

    // Kendall's W: exact integer pieces off the shared Friedman doubled
    // midranks; dev = R2_j - b(k+1), W = 3*S4 / (b^2 k (k^2-1))
    "q164_kendall_w" ->
      """WITH weekly AS (
        | SELECT o_orderpriority,
        |  date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) // 7 AS wk,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), complete AS (
        | SELECT wk FROM weekly GROUP BY wk HAVING count(*) = 5
        |), wv AS (SELECT w.* FROM weekly w JOIN complete USING (wk)),
        |ranks AS (
        | SELECT a.o_orderpriority, a.wk,
        |  cast(sum(CASE WHEN b.cents < a.cents THEN 2 ELSE 0 END)
        |   + sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 as bigint) r2
        | FROM wv a JOIN wv b ON a.wk = b.wk
        | GROUP BY 1, 2
        |), f AS (
        | SELECT o_orderpriority,
        |  cast(substring(o_orderpriority, 1, 1) as bigint) AS prio_idx,
        |  cast(count(*) as bigint) AS n_blocks, cast(sum(r2) as bigint) AS sum_r2
        | FROM ranks GROUP BY 1
        |), per AS (
        | SELECT o_orderpriority, prio_idx, n_blocks, sum_r2,
        |  sum_r2 - 6 * n_blocks AS dev
        | FROM f
        |), tot AS (
        | SELECT cast(count(*) as bigint) k, cast(max(n_blocks) as bigint) b,
        |  cast(sum(cast(dev as hugeint) * dev) as bigint) s4
        | FROM per
        |)
        |SELECT o_orderpriority, prio_idx, n_blocks, sum_r2, dev, s4,
        | cast(3 * s4 as bigint) AS w_num,
        | cast(b * b * k * (k * k - 1) as bigint) AS w_den,
        | cast((3 * cast(s4 as hugeint) * 1000000)
        |  // (cast(b as hugeint) * b * k * (k * k - 1)) as bigint) AS w_micro
        |FROM per CROSS JOIN tot ORDER BY o_orderpriority""".stripMargin,

    // Ansari-Bradley: doubled midranks from both ends toward the middle
    "q167_ansari_bradley" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW') GROUP BY 1, 2
        |), tot AS (SELECT cast(count(*) as bigint) n_total FROM daily),
        |dv AS (
        | SELECT cents, cast(count(*) as bigint) n_v,
        |  cast(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) as bigint) a_urg,
        |  cast(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) as bigint) a_low
        | FROM daily GROUP BY 1
        |), cum AS (
        | SELECT *, coalesce(sum(n_v) OVER (ORDER BY cents
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) c_lt
        | FROM dv
        |), sc AS (
        | SELECT n_v, a_urg, a_low, n_total,
        |  least(2 * c_lt + n_v + 1, 2 * (n_total + 1) - (2 * c_lt + n_v + 1)) ab2
        | FROM cum CROSS JOIN tot
        |), pooled AS (
        | SELECT cast(max(n_total) as bigint) n_total,
        |  cast(sum(n_v * ab2) as bigint) pool_ab2,
        |  cast(sum(cast(n_v as hugeint) * ab2 * ab2) as bigint) pool_ab2_sq
        | FROM sc
        |), g AS (
        | SELECT '1-URGENT' o_orderpriority, cast(sum(a_urg) as bigint) n_g,
        |  cast(sum(a_urg * ab2) as bigint) ab2_sum FROM sc
        | UNION ALL
        | SELECT '5-LOW', cast(sum(a_low) as bigint), cast(sum(a_low * ab2) as bigint) FROM sc
        |)
        |SELECT g.o_orderpriority, g.n_g, g.ab2_sum, p.n_total, p.pool_ab2, p.pool_ab2_sq
        |FROM g CROSS JOIN pooled p ORDER BY 1""".stripMargin,

    // LPA, two synchronous steps from id seeds over the co-purchase
    // graph (same edge CTEs as q58); tie -> smallest label
    "q168_lpa_step" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |), e AS MATERIALIZED (
        | SELECT a AS src, b2 AS dst FROM pairs UNION ALL SELECT b2, a FROM pairs
        |), l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
        |s1 AS (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, l0.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, l0.label) rn
        |  FROM e JOIN l0 ON e.dst = l0.node GROUP BY e.src, l0.label
        | ) t WHERE rn = 1
        |), s2 AS (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, s1.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, s1.label) rn
        |  FROM e JOIN s1 ON e.dst = s1.node GROUP BY e.src, s1.label
        | ) t WHERE rn = 1
        |)
        |SELECT node, label, votes FROM s2 ORDER BY node""".stripMargin,

    // LPA, FOUR synchronous steps — exercises the loop past the
    // unrolled-2 case (per-iteration localCheckpoint keeps the Spark
    // plan depth constant; the oracle just unrolls two more stages)
    "q168_lpa4" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |), e AS MATERIALIZED (
        | SELECT a AS src, b2 AS dst FROM pairs UNION ALL SELECT b2, a FROM pairs
        |), l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
        |s1 AS MATERIALIZED (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, l0.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, l0.label) rn
        |  FROM e JOIN l0 ON e.dst = l0.node GROUP BY e.src, l0.label
        | ) t WHERE rn = 1
        |), s2 AS MATERIALIZED (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, s1.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, s1.label) rn
        |  FROM e JOIN s1 ON e.dst = s1.node GROUP BY e.src, s1.label
        | ) t WHERE rn = 1
        |), s3 AS MATERIALIZED (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, s2.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, s2.label) rn
        |  FROM e JOIN s2 ON e.dst = s2.node GROUP BY e.src, s2.label
        | ) t WHERE rn = 1
        |), s4 AS (
        | SELECT node, l AS label, c AS votes FROM (
        |  SELECT e.src AS node, s3.label AS l, cast(count(*) as bigint) c,
        |   row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, s3.label) rn
        |  FROM e JOIN s3 ON e.dst = s3.node GROUP BY e.src, s3.label
        | ) t WHERE rn = 1
        |)
        |SELECT node, label, votes FROM s4 ORDER BY node""".stripMargin,

    // silence trim: conditional min/max over the full-frame energies
    "mm_silence_trim" ->
      """WITH d AS (
        | SELECT doc_id, text, cast(length(text) as bigint) n_bytes FROM documents
        |), f AS (
        | SELECT doc_id, n_bytes, text, unnest(range(0, (n_bytes - 1) // 8 + 1)) frame_idx
        | FROM d
        |), e AS (
        | SELECT doc_id, cast(frame_idx as bigint) frame_idx,
        |  cast(list_sum(list_transform(range(1, cast(least(8, n_bytes - frame_idx * 8) as int) + 1),
        |    i -> ascii(substring(text, cast(frame_idx * 8 as int) + i, 1)))) as bigint) energy
        | FROM f WHERE least(8, n_bytes - frame_idx * 8) = 8
        |)
        |SELECT doc_id, cast(count(*) as bigint) AS n_frames,
        | min(CASE WHEN energy >= 700 THEN frame_idx END) AS first_loud,
        | max(CASE WHEN energy >= 700 THEN frame_idx END) AS last_loud,
        | coalesce(max(CASE WHEN energy >= 700 THEN frame_idx END)
        |   - min(CASE WHEN energy >= 700 THEN frame_idx END) + 1, 0) AS kept_frames,
        | coalesce(min(CASE WHEN energy >= 700 THEN frame_idx END), count(*)) AS lead_cut,
        | coalesce(cast(count(*) as bigint) - 1 - max(CASE WHEN energy >= 700 THEN frame_idx END), 0) AS trail_cut,
        | min(CASE WHEN energy >= 700 THEN frame_idx END) IS NULL AS all_silent
        |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // RAKE: corpus-derived stoplist (top-10 DF per lang), stopword-free
    // runs via gaps-and-islands, exact fixed-point word/phrase scores
    "txt_rake" ->
      """WITH d AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), tp AS (
        | SELECT doc_id, lang, unnest(range(1, len(t) + 1)) pos, t FROM d
        |), tk AS (
        | SELECT doc_id, lang, pos, t[pos] term FROM tp
        |), dfc AS (
        | SELECT lang, term, count(DISTINCT doc_id) df FROM tk GROUP BY 1, 2
        |), stop AS (
        | SELECT lang, term FROM (
        |  SELECT lang, term, row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) rn FROM dfc
        | ) s WHERE rn <= 10
        |), ns AS (
        | SELECT tk.doc_id, tk.lang, tk.pos, tk.term,
        |  tk.pos - row_number() OVER (PARTITION BY tk.doc_id ORDER BY tk.pos) run_id
        | FROM tk LEFT JOIN stop ON tk.lang = stop.lang AND tk.term = stop.term
        | WHERE stop.term IS NULL
        |), rl AS (
        | SELECT doc_id, run_id, cast(count(*) as bigint) run_len FROM ns GROUP BY 1, 2
        |), occ AS (
        | SELECT ns.*, rl.run_len FROM ns JOIN rl USING (doc_id, run_id)
        |), ws AS (
        | SELECT lang, term, cast(count(*) as bigint) freq,
        |  cast(sum(run_len) as bigint) deg
        | FROM occ GROUP BY 1, 2
        |), w2 AS (
        | SELECT lang, term, deg * 1000000 // freq AS w_micro FROM ws
        |), ph AS (
        | SELECT o.doc_id, o.lang, o.run_id,
        |  string_agg(o.term, ' ' ORDER BY o.pos) phrase,
        |  cast(count(*) as bigint) n_words,
        |  cast(sum(w2.w_micro) as bigint) score_micro
        | FROM occ o JOIN w2 ON w2.lang = o.lang AND w2.term = o.term
        | GROUP BY 1, 2, 3
        |), bp AS (
        | SELECT lang, phrase, cast(count(*) as bigint) n_occ,
        |  max(n_words) n_words, max(score_micro) score_micro
        | FROM ph GROUP BY 1, 2
        |)
        |SELECT lang, cast(rn as bigint) AS rank, phrase, n_words, n_occ, score_micro
        |FROM (
        | SELECT bp.*, row_number() OVER (PARTITION BY lang ORDER BY score_micro DESC, phrase) rn FROM bp
        |) f WHERE rn <= 10 ORDER BY lang, rank""".stripMargin,

    // Adaptive per-language RAKE: the stoplist is each language's own
    // mean-df knee (df * n_terms >= sum_df, division-free), candidate
    // phrases are capped at 4 words (runs longer than the cap are
    // discarded before word stats — the cap lives HERE in the oracle
    // too, per the gating contract).
    "txt_rake_lang" ->
      """WITH d AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), tp AS (
        | SELECT doc_id, lang, unnest(range(1, len(t) + 1)) pos, t FROM d
        |), tk AS (
        | SELECT doc_id, lang, pos, t[pos] term FROM tp
        |), dfc AS (
        | SELECT lang, term, count(DISTINCT doc_id) df FROM tk GROUP BY 1, 2
        |), lt AS (
        | SELECT lang, cast(count(*) as bigint) n_terms, cast(sum(df) as bigint) sum_df FROM dfc GROUP BY 1
        |), stop AS (
        | SELECT dfc.lang, term FROM dfc JOIN lt USING (lang) WHERE df * n_terms >= sum_df
        |), nstop AS (
        | SELECT lang, cast(count(*) as bigint) n_stop FROM stop GROUP BY 1
        |), ns AS (
        | SELECT tk.doc_id, tk.lang, tk.pos, tk.term,
        |  tk.pos - row_number() OVER (PARTITION BY tk.doc_id ORDER BY tk.pos) run_id
        | FROM tk LEFT JOIN stop ON tk.lang = stop.lang AND tk.term = stop.term
        | WHERE stop.term IS NULL
        |), rl AS (
        | SELECT doc_id, run_id, cast(count(*) as bigint) run_len FROM ns GROUP BY 1, 2
        |), occ AS (
        | SELECT ns.*, rl.run_len FROM ns JOIN rl USING (doc_id, run_id) WHERE rl.run_len <= 4
        |), ws AS (
        | SELECT lang, term, cast(count(*) as bigint) freq,
        |  cast(sum(run_len) as bigint) deg
        | FROM occ GROUP BY 1, 2
        |), w2 AS (
        | SELECT lang, term, deg * 1000000 // freq AS w_micro FROM ws
        |), ph AS (
        | SELECT o.doc_id, o.lang, o.run_id,
        |  string_agg(o.term, ' ' ORDER BY o.pos) phrase,
        |  cast(count(*) as bigint) n_words,
        |  cast(sum(w2.w_micro) as bigint) score_micro
        | FROM occ o JOIN w2 ON w2.lang = o.lang AND w2.term = o.term
        | GROUP BY 1, 2, 3
        |), bp AS (
        | SELECT lang, phrase, cast(count(*) as bigint) n_occ,
        |  max(n_words) n_words, max(score_micro) score_micro
        | FROM ph GROUP BY 1, 2
        |)
        |SELECT f.lang, cast(rn as bigint) AS rank, phrase, n_words, n_occ, score_micro, n_stop
        |FROM (
        | SELECT bp.*, row_number() OVER (PARTITION BY lang ORDER BY score_micro DESC, phrase) rn FROM bp
        |) f JOIN nstop ON f.lang = nstop.lang WHERE rn <= 10 ORDER BY f.lang, rank""".stripMargin,

    // TextRank keywords: weighted PageRank over the adjacent-token
    // co-occurrence graph per language, 3 unrolled rounds with the q57
    // round-12-then-DECIMAL contribution device; support floor wgt >= 2
    "txt_textrank" ->
      """WITH toks AS (
        | SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), bg AS (
        | SELECT lang, unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) p
        | FROM toks WHERE len(t) >= 2
        |), pe AS (
        | SELECT lang, least(p[1], p[2]) a, greatest(p[1], p[2]) b FROM bg WHERE p[1] <> p[2]
        |), pairs AS (
        | SELECT lang, a, b, cast(count(*) as bigint) wgt FROM pe GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |), edges AS (
        | SELECT lang, a AS src, b AS dst, wgt FROM pairs
        | UNION ALL SELECT lang, b, a, wgt FROM pairs
        |), wdeg AS (
        | SELECT lang, src, cast(sum(wgt) as bigint) wdeg FROM edges GROUP BY 1, 2
        |), ed AS (
        | SELECT e.lang, e.src, e.dst, e.wgt, d.wdeg
        | FROM edges e JOIN wdeg d ON e.lang = d.lang AND e.src = d.src
        |), pr0 AS (SELECT lang, src AS node, 1.0::double AS pr FROM wdeg),
        |pr1 AS (SELECT ed.lang, dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr * wgt / wdeg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr0 ON ed.lang = pr0.lang AND ed.src = pr0.node GROUP BY 1, 2),
        |pr2 AS (SELECT ed.lang, dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr * wgt / wdeg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr1 ON ed.lang = pr1.lang AND ed.src = pr1.node GROUP BY 1, 2),
        |pr3 AS (SELECT ed.lang, dst AS node, round(0.15 + 0.85 * cast(sum(cast(round(pr * wgt / wdeg, 12) as decimal(30,12))) as double), 12) AS pr
        |        FROM ed JOIN pr2 ON ed.lang = pr2.lang AND ed.src = pr2.node GROUP BY 1, 2)
        |SELECT lang, "rank", node AS term, pr FROM (
        | SELECT lang, node, pr, cast(row_number() OVER (PARTITION BY lang ORDER BY pr DESC, node) as bigint) "rank"
        | FROM pr3) f WHERE "rank" <= 10 ORDER BY lang, "rank"""".stripMargin,

    // Page-Hinkley: running mean as exact cent-floored cum // t, the
    // accumulator and its running min as plain prefix windows
    "q166_page_hinkley" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), c AS (
        | SELECT o_orderpriority, "day", cents,
        |  cast(row_number() OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) t,
        |  cast(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) cum
        | FROM daily
        |), m AS (
        | SELECT o_orderpriority, "day",
        |  cast(sum(cents - cum // t) OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) m
        | FROM c
        |), p AS (
        | SELECT o_orderpriority, "day", m,
        |  cast(min(m) OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) runmin,
        |  m - cast(min(m) OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) ph
        | FROM m
        |), pick AS (
        | SELECT o_orderpriority, "day", ph,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY ph DESC, "day") rn
        | FROM p
        |), agg AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(max_by(m, "day") as bigint) m_end, cast(min(m) as bigint) m_min,
        |  cast(max(ph) as bigint) ph_peak
        | FROM p GROUP BY 1
        |)
        |SELECT a.o_orderpriority, a.n_days, a.m_end, a.m_min, a.ph_peak,
        | k."day" AS peak_day
        |FROM agg a JOIN pick k ON k.o_orderpriority = a.o_orderpriority AND k.rn = 1
        |ORDER BY a.o_orderpriority""".stripMargin,

    // Mood's median: doubled grand median m2 = x_(k1) + x_(k2) off the
    // distinct-value prefix, then the per-priority contingency row
    "q165_mood_median" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (SELECT cast(count(*) as bigint) n_total FROM daily),
        |dv AS (SELECT cents, cast(count(*) as bigint) nv FROM daily GROUP BY 1),
        |cum AS (
        | SELECT cents, nv, coalesce(sum(nv) OVER (ORDER BY cents
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) c_lt
        | FROM dv
        |), med AS (
        | SELECT cast(min(CASE WHEN c_lt + nv >= (n_total + 1) // 2 THEN cents END)
        |  + min(CASE WHEN c_lt + nv >= n_total // 2 + 1 THEN cents END) as bigint) m2
        | FROM cum CROSS JOIN tot
        |)
        |SELECT o_orderpriority, cast(count(*) as bigint) AS n_days,
        | cast(sum(CASE WHEN cents * 2 > m2 THEN 1 ELSE 0 END) as bigint) AS n_above,
        | cast(sum(CASE WHEN cents * 2 < m2 THEN 1 ELSE 0 END) as bigint) AS n_below,
        | cast(sum(CASE WHEN cents * 2 = m2 THEN 1 ELSE 0 END) as bigint) AS n_at,
        | m2
        |FROM daily CROSS JOIN med GROUP BY o_orderpriority, m2
        |ORDER BY o_orderpriority""".stripMargin,

    // t-closeness: exact variational distance between each class's lang
    // distribution and the global one over the full lang support
    "pipe_t_closeness" ->
      """WITH cls AS (
        | SELECT source, n_chars // 100 AS len_bucket, lang,
        |  cast(count(*) as bigint) c
        | FROM documents GROUP BY 1, 2, 3
        |), ct AS (
        | SELECT source, len_bucket, cast(sum(c) as bigint) n_class
        | FROM cls GROUP BY 1, 2
        |), g AS (SELECT lang, cast(count(*) as bigint) gc FROM documents GROUP BY 1),
        |n AS (SELECT cast(count(*) as bigint) n_total FROM documents),
        |grid AS (
        | SELECT ct.source, ct.len_bucket, ct.n_class, n.n_total,
        |  sum(abs(cast(coalesce(cls.c, 0) as hugeint) * n.n_total
        |   - cast(g.gc as hugeint) * ct.n_class)) sum_abs
        | FROM ct CROSS JOIN g CROSS JOIN n
        | LEFT JOIN cls ON cls.source = ct.source
        |  AND cls.len_bucket = ct.len_bucket AND cls.lang = g.lang
        | GROUP BY 1, 2, 3, 4
        |)
        |SELECT source, cast(len_bucket as bigint) AS len_bucket, n_class,
        | cast((sum_abs * 1000000) // (2 * cast(n_class as hugeint) * n_total) as bigint) AS t_micro,
        | (sum_abs * 1000000) // (2 * cast(n_class as hugeint) * n_total) > 300000 AS at_risk
        |FROM grid ORDER BY source, len_bucket""".stripMargin,

    // scene cuts: per-payload rollup of the full-frame energy deltas
    "mm_scene_cut" ->
      """WITH d AS (
        | SELECT doc_id, text, cast(length(text) as bigint) n_bytes FROM documents
        |), f AS (
        | SELECT doc_id, n_bytes, text, unnest(range(0, (n_bytes - 1) // 8 + 1)) frame_idx
        | FROM d
        |), e AS (
        | SELECT doc_id, cast(frame_idx as bigint) frame_idx,
        |  cast(list_sum(list_transform(range(1, cast(least(8, n_bytes - frame_idx * 8) as int) + 1),
        |    i -> ascii(substring(text, cast(frame_idx * 8 as int) + i, 1)))) as bigint) energy
        | FROM f WHERE least(8, n_bytes - frame_idx * 8) = 8
        |), lagged AS (
        | SELECT doc_id, frame_idx, energy,
        |  energy - lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) delta
        | FROM e
        |)
        |SELECT doc_id, cast(count(*) as bigint) AS n_frames,
        | cast(sum(CASE WHEN abs(delta) >= 150 THEN 1 ELSE 0 END) as bigint) AS n_cuts,
        | cast(max(abs(delta)) as bigint) AS max_abs_delta,
        | cast(min(CASE WHEN abs(delta) >= 150 THEN frame_idx END) as bigint) AS first_cut_idx
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q155_binary_seg" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1
        |), pref AS (
        | SELECT day, cents,
        |  row_number() OVER (ORDER BY day) k,
        |  sum(cast(cents as hugeint)) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pfx
        | FROM daily
        |), tot AS (SELECT count(*) n, sum(cast(cents as hugeint)) s FROM daily),
        |scored AS (
        | SELECT day, k, pfx, abs(cast(n as hugeint) * pfx - cast(k as hugeint) * s) score, n, s
        | FROM pref CROSS JOIN tot
        |), cp1 AS (
        | SELECT day cp_day, k k1, pfx p1, score FROM scored WHERE k < n
        | ORDER BY score DESC, k LIMIT 1
        |), lseg AS (
        | SELECT s.day, s.k,
        |  abs(cast(k1 as hugeint) * s.pfx - cast(s.k as hugeint) * p1) lscore
        | FROM scored s CROSS JOIN cp1 WHERE s.k < k1
        |), rseg AS (
        | SELECT s.day, s.k,
        |  abs(cast(s.n - k1 as hugeint) * (s.pfx - p1) - cast(s.k - k1 as hugeint) * (s.s - p1)) rscore
        | FROM scored s CROSS JOIN cp1 WHERE s.k > k1 AND s.k < s.n
        |)
        |SELECT 'all' AS segment, cp_day, cast(k1 as bigint) AS cp_k,
        | cast(score as varchar) AS score FROM cp1
        |UNION ALL
        |SELECT * FROM (SELECT 'left', day, cast(k as bigint), cast(lscore as varchar)
        |FROM lseg ORDER BY lscore DESC, k LIMIT 1)
        |UNION ALL
        |SELECT * FROM (SELECT 'right', day, cast(k as bigint), cast(rscore as varchar)
        |FROM rseg ORDER BY rscore DESC, k LIMIT 1)
        |ORDER BY segment""".stripMargin,

    "txt_fertility" ->
      """WITH t AS (
        | SELECT lang,
        |  cast(length(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) ws,
        |  cast(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) as bigint) bpe
        | FROM documents
        |), g AS (
        | SELECT lang, count(*) n_docs, cast(sum(ws) as bigint) n_ws_tokens,
        |  cast(sum(bpe) as bigint) n_bpe_tokens
        | FROM t GROUP BY 1
        |)
        |SELECT lang, n_docs, n_ws_tokens, n_bpe_tokens,
        | CASE WHEN n_ws_tokens = 0 THEN NULL
        |  ELSE n_bpe_tokens * 1000000 // n_ws_tokens END AS fertility_micro
        |FROM g ORDER BY lang""".stripMargin,

    "sim_ivf_probe_curve" -> ivfProbeOracle(Seq(1, 2, 4)),

    "q156_mk_seasonal" ->
      """WITH daily AS (
        | SELECT cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents,
        |  cast(dayofweek(cast(o_orderdate as date)) as bigint) dow
        | FROM orders GROUP BY 1, 3
        |), s AS (
        | SELECT a.dow,
        |  cast(sum(CASE WHEN b.cents > a.cents THEN 1 WHEN b.cents < a.cents THEN -1 ELSE 0 END) as bigint) s_stat
        | FROM daily a JOIN daily b ON a.dow = b.dow AND a.day < b.day
        | GROUP BY 1
        |), ties AS (
        | SELECT dow, cast(sum(t) as bigint) n_days,
        |  cast(sum(t * (t - 1) * (2 * t + 5)) as bigint) tie_term
        | FROM (SELECT dow, cents, count(*) t FROM daily GROUP BY 1, 2) GROUP BY 1
        |)
        |SELECT t.dow, n_days, s_stat,
        | n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18_num
        |FROM ties t JOIN s ON t.dow = s.dow
        |ORDER BY t.dow""".stripMargin,

    "txt_lid_trigram" ->
      """WITH tri AS (
        | SELECT doc_id, lang,
        |  unnest(list_transform(range(1, greatest(length(text) - 2, 0) + 1), i -> substring(text, i, 3))) tri
        | FROM documents
        |), prof AS (
        | SELECT plang, tri, 101 - rn AS w FROM (
        |  SELECT lang plang, tri, count(*) pc,
        |   row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tri) rn
        |  FROM tri GROUP BY 1, 2
        | ) WHERE rn <= 100
        |), dt AS (SELECT doc_id, tri, count(*) dc FROM tri GROUP BY 1, 2),
        |sc AS (
        | SELECT doc_id, plang, sum(cast(dc as hugeint) * w) score
        | FROM dt JOIN prof USING (tri) GROUP BY 1, 2
        |), pred AS (
        | SELECT doc_id, plang pred_lang FROM (
        |  SELECT doc_id, plang, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) rn
        |  FROM sc
        | ) WHERE rn = 1
        |)
        |SELECT d.lang, coalesce(pred_lang, 'unk') AS pred_lang, cast(count(*) as bigint) AS n_docs
        |FROM documents d LEFT JOIN pred ON d.doc_id = pred.doc_id
        |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,

    "dd_dup_mass_report" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) shingles
        | FROM toks WHERE len(t) >= 3
        |), rows_ AS MATERIALIZED (SELECT doc_id, unnest(shingles) s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM rows_ GROUP BY 1),
        |hot AS (SELECT s FROM rows_ GROUP BY s HAVING count(*) > 100),
        |kept AS MATERIALIZED (
        | SELECT r.doc_id, r.s FROM rows_ r LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL
        |),
        |inter AS (
        | SELECT a.doc_id da, b.doc_id db, count(*) ninter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
        |),
        |pairs AS (
        | SELECT da, db FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        | WHERE ninter * 5 >= (sa.n + sb.n - ninter)
        |),
        |edges AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
        |reach AS (
        | SELECT a AS n, a AS m FROM edges
        | UNION
        | SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n
        |), comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY 1),
        |neardrop AS (SELECT doc_id FROM comp WHERE doc_id <> component),
        |exacth AS (SELECT md5(text) h, min(doc_id) keeper FROM documents GROUP BY 1),
        |exactdrop AS (
        | SELECT d.doc_id FROM documents d JOIN exacth ON md5(d.text) = exacth.h
        | WHERE d.doc_id <> keeper
        |),
        |-- UNION ALL + DISTINCT, NOT a bare UNION: inside this WITH
        |-- RECURSIVE statement DuckDB's deduplicating UNION of a
        |-- recursive-derived CTE (neardrop) with a non-recursive one
        |-- returned 252 rows where the sets overlap in 8 (= no dedup);
        |-- verified standalone at sf0.1 — the DISTINCT form answers 244
        |dropped AS (SELECT DISTINCT doc_id FROM (
        | SELECT doc_id FROM exactdrop UNION ALL SELECT doc_id FROM neardrop)),
        |ds AS (
        | SELECT count(*) n_dropped, coalesce(sum(n_chars), 0) dropped_chars
        | FROM documents JOIN dropped USING (doc_id)
        |), tot AS (
        | SELECT count(*) n_docs, sum(n_chars) total_chars FROM documents
        |)
        |SELECT cast(n_docs as bigint) AS n_docs, cast(total_chars as bigint) AS total_chars,
        | (SELECT cast(count(*) as bigint) FROM exactdrop) AS n_exact_dropped,
        | (SELECT cast(count(*) as bigint) FROM neardrop) AS n_near_dropped,
        | cast(n_dropped as bigint) AS n_dropped,
        | cast(dropped_chars as bigint) AS dropped_chars,
        | cast(dropped_chars as bigint) * 1000000 // cast(total_chars as bigint) AS dropped_char_micro
        |FROM tot CROSS JOIN ds""".stripMargin,

    "q157_two_way_anova" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS day,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority, cast(dayofweek(day) as bigint) AS dow,
        | count(*) AS n_days, cast(sum(cents) as bigint) AS sum_cents,
        | cast(sum(cast(cents as hugeint) * cents) as varchar) AS sum_sq
        |FROM daily GROUP BY 1, 2 ORDER BY o_orderpriority, dow""".stripMargin,

    "pipe_code_mix" ->
      """WITH v AS (
        | SELECT doc_id, lang, cast(length(text) as bigint) n_chars,
        |  cast(len(regexp_extract_all(text, '[{}\[\]()]')) as bigint) nb,
        |  cast(len(regexp_extract_all(text, ';')) as bigint) ns,
        |  cast(len(regexp_extract_all(text, '[=<>!]=|=')) as bigint) na,
        |  cast(len(regexp_extract_all(text, '[a-z]+_[a-z]+')) as bigint) nk
        | FROM documents
        |), f AS (
        | SELECT lang,
        |  n_chars > 0 AND
        |  (CASE WHEN nb * 40 >= n_chars THEN 1 ELSE 0 END
        |   + CASE WHEN ns * 100 >= n_chars THEN 1 ELSE 0 END
        |   + CASE WHEN na * 60 >= n_chars THEN 1 ELSE 0 END
        |   + CASE WHEN nk * 80 >= n_chars THEN 1 ELSE 0 END) >= 2 AS is_code,
        |  n_chars
        | FROM v
        |), g AS (
        | SELECT lang, is_code, count(*) n_docs, cast(sum(n_chars) as bigint) n_chars
        | FROM f GROUP BY 1, 2
        |)
        |SELECT lang, is_code, n_docs, n_chars,
        | cast(sum(n_docs) OVER (PARTITION BY lang) as bigint) AS lang_docs,
        | n_docs * 1000000 // cast(sum(n_docs) OVER (PARTITION BY lang) as bigint) AS share_micro
        |FROM g ORDER BY lang, is_code""".stripMargin,

    "q158_cuped" ->
      """WITH pre AS (
        | SELECT o_custkey, cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) x
        | FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
        |), post AS (
        | SELECT o_custkey, cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) y
        | FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
        |), f AS (
        | SELECT c_mktsegment, coalesce(x, 0) x, coalesce(y, 0) y
        | FROM customer
        | LEFT JOIN pre ON c_custkey = pre.o_custkey
        | LEFT JOIN post ON c_custkey = post.o_custkey
        |), g AS (
        | SELECT c_mktsegment, count(*) n,
        |  cast(sum(x) as bigint) sum_pre, cast(sum(y) as bigint) sum_post,
        |  sum(cast(x as hugeint) * y) sxy, sum(cast(x as hugeint) * x) sx2
        | FROM f GROUP BY 1
        |)
        |SELECT c_mktsegment, n, sum_pre, sum_post,
        | cast(n * sxy - cast(sum_pre as hugeint) * sum_post as varchar) AS theta_num,
        | cast(n * sx2 - cast(sum_pre as hugeint) * sum_pre as varchar) AS theta_den
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "pipe_boilerplate_exposure" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), allsp AS (
        | SELECT doc_id,
        |  unnest(list_transform(range(1, len(t) - 1), i -> list_aggregate(t[i:i+2], 'string_agg', ' '))) span
        | FROM toks WHERE len(t) >= 3
        |), hot AS (
        | SELECT span FROM (
        |  SELECT span, count(DISTINCT doc_id) nd FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |     i -> list_aggregate(t[i:i+2], 'string_agg', ' ')))) span
        |   FROM toks WHERE len(t) >= 3) GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
        |  ORDER BY nd DESC, span LIMIT 50)
        |)
        |SELECT doc_id, cast(count(DISTINCT allsp.span) as bigint) AS n_hot_spans,
        | cast(count(*) as bigint) AS n_hot_hits
        |FROM allsp JOIN hot ON allsp.span = hot.span
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q159_did_cells" ->
      """WITH pre AS (
        | SELECT o_custkey, cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) pre
        | FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
        |), post AS (
        | SELECT o_custkey, cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) post
        | FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
        |), f AS (
        | SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END treated,
        |  coalesce(pre.pre, 0) pre, coalesce(post.post, 0) post
        | FROM customer
        | LEFT JOIN pre ON c_custkey = pre.o_custkey
        | LEFT JOIN post ON c_custkey = post.o_custkey
        |), cells AS (
        | SELECT treated, period, count(*) n, cast(sum(spend) as bigint) sum_cents
        | FROM (
        |  SELECT treated, 0 AS period, pre AS spend FROM f
        |  UNION ALL SELECT treated, 1, post FROM f
        | ) GROUP BY 1, 2
        |), wide AS (
        | SELECT
        |  max(CASE WHEN treated = 1 AND period = 1 THEN n END) n11,
        |  max(CASE WHEN treated = 1 AND period = 1 THEN sum_cents END) s11,
        |  max(CASE WHEN treated = 1 AND period = 0 THEN n END) n10,
        |  max(CASE WHEN treated = 1 AND period = 0 THEN sum_cents END) s10,
        |  max(CASE WHEN treated = 0 AND period = 1 THEN n END) n01,
        |  max(CASE WHEN treated = 0 AND period = 1 THEN sum_cents END) s01,
        |  max(CASE WHEN treated = 0 AND period = 0 THEN n END) n00,
        |  max(CASE WHEN treated = 0 AND period = 0 THEN sum_cents END) s00
        | FROM cells
        |)
        |SELECT cast(treated as bigint) AS treated, cast(period as bigint) AS period,
        | n, sum_cents,
        | cast(cast(s11 as hugeint) * n10 * n01 * n00
        |  - cast(s10 as hugeint) * n11 * n01 * n00
        |  - cast(s01 as hugeint) * n11 * n10 * n00
        |  + cast(s00 as hugeint) * n11 * n10 * n01 as varchar) AS did_num,
        | cast(cast(n11 as hugeint) * n10 * n01 * n00 as varchar) AS did_den
        |FROM cells CROSS JOIN wide
        |ORDER BY treated, period""".stripMargin,

    "sim_pq_residual" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, (i - 1) // 8 AS sub, i,
        |  list_reduce(list_prepend(cast(0 as double),
        |    list(cast(embedding[i] as double) ORDER BY vec_id)),
        |   (acc, x) -> acc + x) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2, 3
        |), centv AS (
        | SELECT label clabel, sub, list(c ORDER BY i) cv FROM cent GROUP BY 1, 2
        |), sv AS (
        | SELECT vec_id, s.sub, embedding
        | FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) sub) s
        |), d AS (
        | SELECT vec_id, sv.sub, clabel,
        |  list_reduce(list_prepend(cast(0 as double), list_transform(range(1, 9), j ->
        |    (cast(embedding[sv.sub * 8 + j] as double) - cv[j]) * (cast(embedding[sv.sub * 8 + j] as double) - cv[j]))),
        |   (acc, x) -> acc + x) dist
        | FROM sv JOIN centv ON sv.sub = centv.sub
        |), best AS (
        | SELECT vec_id, sub, dist,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) rn FROM d
        |)
        |SELECT cast(sub as bigint) AS sub, cast(count(*) as bigint) AS n_vecs,
        | cast(sum(cast(floor(dist * 1000000 + 0.5) as bigint)) as bigint) AS energy_micro,
        | cast(max(cast(floor(dist * 1000000 + 0.5) as bigint)) as bigint) AS max_residual_micro
        |FROM best WHERE rn = 1 GROUP BY sub ORDER BY sub""".stripMargin,
    "txt_mattr" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), w AS (
        | SELECT doc_id, cast(len(t) as bigint) n_tokens,
        |  cast(len(t) - 49 as bigint) n_windows,
        |  cast(list_sum(list_transform(range(1, len(t) - 48), s ->
        |    len(list_distinct(list_transform(range(s, s + 50), j -> t[j]))))) as bigint) mattr_num
        | FROM toks WHERE len(t) >= 50
        |)
        |SELECT doc_id, n_tokens, n_windows, mattr_num,
        | cast(mattr_num * 1000000 // (50 * n_windows) as bigint) AS mattr_micro
        |FROM w ORDER BY doc_id""".stripMargin,
    "dd_oph_sigs" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), h AS (
        | SELECT doc_id, shingles, list_transform(shingles, s -> md5(s)) hs FROM sh
        |), r AS (
        | SELECT doc_id, shingles, list_transform(range(0, 8), i ->
        |   list_aggregate(list_filter(hs, x -> (strpos('0123456789abcdef', substring(x, 32, 1)) - 1) % 8 = i), 'min')) raw
        | FROM h
        |)
        |SELECT doc_id,
        | cast(len(list_distinct(shingles)) as bigint) AS n_shingles,
        | cast(len(list_filter(raw, x -> x IS NULL)) as bigint) AS n_empty,
        | array_to_string(list_transform(range(0, 8), i ->
        |   list_filter(list_transform(range(0, 8), j -> raw[cast((i + j) % 8 as int) + 1]), x -> x IS NOT NULL)[1]), ',') AS signature
        |FROM r ORDER BY doc_id""".stripMargin,
    "q182_adf_inputs" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), l AS (
        | SELECT o_orderpriority, cents,
        |  lag(cents) OVER (PARTITION BY o_orderpriority ORDER BY "day") AS prev
        | FROM daily
        |), obs AS (
        | SELECT o_orderpriority, cast(prev as hugeint) x, cast(cents - prev as hugeint) d
        | FROM l WHERE prev IS NOT NULL
        |), s AS (
        | SELECT o_orderpriority, count(*) n,
        |  sum(x) sx, sum(d) sd, sum(x * d) sxd, sum(x * x) sxx
        | FROM obs GROUP BY 1
        |)
        |SELECT o_orderpriority, n,
        | round(cast(n * sxd - sx * sd as double) / cast(n * sxx - sx * sx as double), 6) AS gamma,
        | cast(CASE WHEN sd * sxx - sx * sxd < 0
        |  THEN -((sx * sxd - sd * sxx) // (n * sxx - sx * sx))
        |  ELSE (sd * sxx - sx * sxd) // (n * sxx - sx * sx)
        | END as bigint) AS intercept_cents
        |FROM s ORDER BY o_orderpriority""".stripMargin,
    "q184_brier_cells" ->
      """WITH f AS (
        | SELECT o_custkey,
        |  max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) f95,
        |  max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) f96
        | FROM orders GROUP BY 1
        |), c AS (
        | SELECT c_mktsegment, coalesce(f95, 0) a95, coalesce(f96, 0) a96
        | FROM customer LEFT JOIN f ON c_custkey = o_custkey
        |)
        |SELECT c_mktsegment,
        | count(*) AS n_cust,
        | cast(sum(a95) as bigint) AS k_pred,
        | cast(sum(a96) as bigint) AS k_out,
        | cast((sum(a95) - sum(a96)) * (sum(a95) - sum(a96)) * 1000000 // count(*) as bigint) AS rel_micro
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_rp_tree" -> rpTreeOracle,
    "sim_rp_recall" -> rpRecallOracle,
    "sim_dbscan_cores_capped" -> dbscanCappedOracle,
    "q183_pacf" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), tot AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(sum(cents) as bigint) s_cents
        | FROM daily GROUP BY 1
        |), res AS (
        | SELECT d.o_orderpriority, t.n_days, t.n_days * d.cents - t.s_cents e,
        |  row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") rn
        | FROM daily d JOIN tot t USING (o_orderpriority)
        |), r0 AS (
        | SELECT o_orderpriority, max(n_days) n_days, sum(cast(e as hugeint) * e) r0
        | FROM res GROUP BY 1
        |), lagged AS (
        | SELECT a.o_orderpriority, l.lag, a.e, b.e e2
        | FROM res a CROSS JOIN (SELECT unnest(range(1, 3)) lag) l
        | JOIN res b ON b.o_orderpriority = a.o_orderpriority AND b.rn = a.rn - l.lag
        |), rk AS (
        | SELECT o_orderpriority,
        |  sum(CASE WHEN lag = 1 THEN cast(e as hugeint) * e2 END) r1,
        |  sum(CASE WHEN lag = 2 THEN cast(e as hugeint) * e2 END) r2
        | FROM lagged GROUP BY 1
        |)
        |SELECT rk.o_orderpriority, r0.n_days,
        | cast(r0.r0 as varchar) AS r0, cast(rk.r1 as varchar) AS r1,
        | cast(rk.r2 as varchar) AS r2,
        | round(cast(rk.r1 as double) / cast(r0.r0 as double), 6) AS phi11,
        | CASE WHEN cast(r0.r0 as double) * cast(r0.r0 as double)
        |        <> cast(rk.r1 as double) * cast(rk.r1 as double) THEN
        |  round((cast(rk.r2 as double) * cast(r0.r0 as double)
        |      - cast(rk.r1 as double) * cast(rk.r1 as double))
        |    / (cast(r0.r0 as double) * cast(r0.r0 as double)
        |      - cast(rk.r1 as double) * cast(rk.r1 as double)), 6)
        | END AS phi22
        |FROM rk JOIN r0 USING (o_orderpriority) ORDER BY 1""".stripMargin,
    "q185_nelson_aalen" ->
      """WITH pc AS (
        | SELECT o_custkey, min(cast(o_orderdate as date)) first_day,
        |  max(cast(o_orderdate as date)) last_day
        | FROM orders GROUP BY 1
        |), co AS (
        | SELECT cast(max(cast(o_orderdate as date)) - INTERVAL 56 DAY as date) AS cutoff FROM orders
        |), byt AS (
        | SELECT date_diff('day', first_day, last_day) // 7 AS t,
        |  cast(sum(CASE WHEN last_day <= cutoff THEN 1 ELSE 0 END) as bigint) d,
        |  cast(sum(CASE WHEN last_day <= cutoff THEN 0 ELSE 1 END) as bigint) cns,
        |  count(*) m
        | FROM pc, co GROUP BY 1
        |), risk AS (
        | SELECT t, d, cns,
        |  cast((SELECT sum(m) FROM byt)
        |   - coalesce(sum(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   as bigint) n_at_risk
        | FROM byt
        |), steps AS (
        | SELECT t AS t_weeks, n_at_risk, d, cns,
        |  cast(d * 1000000 // n_at_risk as bigint) hazard_micro
        | FROM risk WHERE d > 0
        |)
        |SELECT t_weeks, n_at_risk, d AS n_events, cns AS n_censored, hazard_micro,
        | cast(sum(hazard_micro) OVER (ORDER BY t_weeks) as bigint) AS cum_hazard_micro
        |FROM steps ORDER BY t_weeks""".stripMargin,
    "q186_mase" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), l AS (
        | SELECT o_orderpriority, cents,
        |  lag(cents, 7) OVER (PARTITION BY o_orderpriority ORDER BY "day") pred7,
        |  lag(cents, 1) OVER (PARTITION BY o_orderpriority ORDER BY "day") prev1
        | FROM daily
        |), s AS (
        | SELECT o_orderpriority,
        |  cast(sum(CASE WHEN pred7 IS NOT NULL THEN 1 END) as bigint) n_eval,
        |  cast(sum(CASE WHEN pred7 IS NOT NULL THEN abs(cents - pred7) END) as bigint) sae_cents,
        |  cast(sum(CASE WHEN prev1 IS NOT NULL THEN 1 END) as bigint) n_naive,
        |  cast(sum(CASE WHEN prev1 IS NOT NULL THEN abs(cents - prev1) END) as bigint) sad_cents
        | FROM l GROUP BY 1
        |)
        |SELECT o_orderpriority, n_eval, sae_cents, n_naive, sad_cents,
        | CASE WHEN sad_cents > 0 AND n_eval > 0 THEN
        |  cast(cast(sae_cents as hugeint) * n_naive * 1000000
        |   // (cast(sad_cents as hugeint) * n_eval) as bigint)
        | END AS mase_micro
        |FROM s ORDER BY 1""".stripMargin,
    "q187_harmonic" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |edges AS MATERIALIZED (SELECT a AS src, b2 AS dst FROM pairs
        |          UNION ALL SELECT b2, a FROM pairs),
        |deg AS (SELECT src AS n, count(*) AS d FROM edges GROUP BY 1),
        |seeds AS MATERIALIZED (SELECT n AS seed FROM deg ORDER BY d DESC, n LIMIT 5),
        |f1 AS MATERIALIZED (
        | SELECT DISTINCT s.seed, e.dst AS n FROM edges e JOIN seeds s ON e.src = s.seed
        | WHERE e.dst <> s.seed),
        |v1 AS MATERIALIZED (SELECT seed, seed AS n FROM seeds UNION SELECT seed, n FROM f1),
        |f2 AS MATERIALIZED (
        | SELECT DISTINCT f.seed, e.dst AS n FROM edges e JOIN f1 f ON e.src = f.n
        | WHERE NOT EXISTS (SELECT 1 FROM v1 WHERE v1.seed = f.seed AND v1.n = e.dst)),
        |v2 AS MATERIALIZED (SELECT seed, n FROM v1 UNION SELECT seed, n FROM f2),
        |f3 AS MATERIALIZED (
        | SELECT DISTINCT f.seed, e.dst AS n FROM edges e JOIN f2 f ON e.src = f.n
        | WHERE NOT EXISTS (SELECT 1 FROM v2 WHERE v2.seed = f.seed AND v2.n = e.dst)),
        |c1 AS (SELECT seed, count(*) n1 FROM f1 GROUP BY 1),
        |c2 AS (SELECT seed, count(*) n2 FROM f2 GROUP BY 1),
        |c3 AS (SELECT seed, count(*) n3 FROM f3 GROUP BY 1)
        |SELECT s.seed, cast(coalesce(c1.n1, 0) as bigint) AS n1,
        | cast(coalesce(c2.n2, 0) as bigint) AS n2,
        | cast(coalesce(c3.n3, 0) as bigint) AS n3,
        | cast(6 * coalesce(c1.n1, 0) + 3 * coalesce(c2.n2, 0)
        |    + 2 * coalesce(c3.n3, 0) as bigint) AS harmonic_sixths
        |FROM seeds s
        |LEFT JOIN c1 ON s.seed = c1.seed
        |LEFT JOIN c2 ON s.seed = c2.seed
        |LEFT JOIN c3 ON s.seed = c3.seed
        |ORDER BY s.seed""".stripMargin,
    "sim_ari" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), cells AS (
        | SELECT label, new_label, cast(count(*) as hugeint) nij
        | FROM best WHERE rn = 1 GROUP BY 1, 2
        |), sp AS (
        | SELECT sum(nij * (nij - 1) // 2) sp, sum(nij) n FROM cells
        |), sa AS (
        | SELECT sum(ai * (ai - 1) // 2) sa
        | FROM (SELECT sum(nij) ai FROM cells GROUP BY label)
        |), sb AS (
        | SELECT sum(bj * (bj - 1) // 2) sb
        | FROM (SELECT sum(nij) bj FROM cells GROUP BY new_label)
        |)
        |SELECT cast(n as bigint) AS n, cast(sp as bigint) AS sum_pairs,
        | cast(sa as bigint) AS sum_a, cast(sb as bigint) AS sum_b,
        | cast(n * (n - 1) // 2 as bigint) AS n_pairs,
        | CASE WHEN (sa + sb) * (n * (n - 1) // 2) - 2 * sa * sb <> 0 THEN
        |  cast(CASE WHEN 2 * (sp * (n * (n - 1) // 2) - sa * sb) * 1000000 < 0
        |   THEN -((-(2 * (sp * (n * (n - 1) // 2) - sa * sb) * 1000000))
        |     // ((sa + sb) * (n * (n - 1) // 2) - 2 * sa * sb))
        |   ELSE 2 * (sp * (n * (n - 1) // 2) - sa * sb) * 1000000
        |     // ((sa + sb) * (n * (n - 1) // 2) - 2 * sa * sb)
        |  END as bigint)
        | END AS ari_micro
        |FROM sp CROSS JOIN sa CROSS JOIN sb""".stripMargin,
    // NOTE: formulated as a RECURSIVE CTE, not a list_reduce fold — in
    // DuckDB 1.0.0 a list_reduce lambda that captures an outer column
    // returns nondeterministically corrupted accumulators when the scan
    // goes through a view (the oracle harness reads tables as views);
    // the recursion carries the token list through the working set
    // instead and is stable.
    "txt_mtld" ->
      """WITH RECURSIVE toks AS MATERIALIZED (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), walk AS (
        | SELECT doc_id, t, cast(len(t) as bigint) n_tokens,
        |  cast(0 as bigint) i, cast(0 as bigint) f, cast(1 as bigint) s
        | FROM toks WHERE len(t) > 0
        | UNION ALL
        | SELECT doc_id, t, n_tokens, i + 1,
        |  CASE WHEN 25 * len(list_distinct(t[s:i+1])) < 18 * (i + 2 - s) THEN f + 1 ELSE f END,
        |  CASE WHEN 25 * len(list_distinct(t[s:i+1])) < 18 * (i + 2 - s) THEN i + 2 ELSE s END
        | FROM walk WHERE i < n_tokens
        |), g AS (
        | SELECT doc_id, n_tokens, f n_factors, n_tokens - s + 1 tail_len,
        |  CASE WHEN n_tokens - s + 1 > 0
        |   THEN cast(len(list_distinct(t[s:n_tokens])) as bigint)
        |   ELSE cast(0 as bigint) END tail_distinct
        | FROM walk WHERE i = n_tokens
        |)
        |SELECT doc_id, n_tokens, n_factors, tail_len, tail_distinct,
        | CASE WHEN tail_len > 0 THEN
        |  CASE WHEN 7 * tail_len * n_factors + 25 * (tail_len - tail_distinct) > 0
        |   THEN n_tokens * 7 * tail_len * 1000000
        |        // (7 * tail_len * n_factors + 25 * (tail_len - tail_distinct))
        |  END
        | ELSE n_tokens * 1000000 // n_factors END AS mtld_micro
        |FROM g ORDER BY doc_id""".stripMargin,
    "sim_calinski" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, round(dist, 6) dist, clabel new_label,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), win AS (
        | SELECT cast(count(DISTINCT new_label) as bigint) k,
        |  cast(sum(cast(cast(round(dist, 6) as decimal(18,6)) * 1000000 as bigint)) as bigint) within_micro
        | FROM best WHERE rn = 1
        |), gcent AS (
        | SELECT i, cast(sum(cast(floor(cast(embedding[i] as double) * 1000000000 + 0.5) as bigint)) as double) / 1000000000 / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1
        |), gv AS (SELECT list(c ORDER BY i) gv FROM gcent),
        |tot AS (
        | SELECT cast(count(*) as bigint) n,
        |  cast(sum(cast(cast(round(
        |   list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - gv.gv[i]) * (cast(e.embedding[i] as double) - gv.gv[i]))), 6) as decimal(18,6)) * 1000000 as bigint)) as bigint) total_micro
        | FROM embeddings e CROSS JOIN gv
        |)
        |SELECT n, k, total_micro, within_micro,
        | total_micro - within_micro AS between_micro,
        | CASE WHEN within_micro > 0 AND k > 1 THEN
        |  cast(cast(total_micro - within_micro as hugeint) * (n - k) * 1000000
        |   // (cast(within_micro as hugeint) * (k - 1)) as bigint)
        | END AS ch_micro
        |FROM tot CROSS JOIN win""".stripMargin,
    "sim_cluster_purity" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, e.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), cells AS (
        | SELECT new_label, label, cast(count(*) as bigint) nij
        | FROM best WHERE rn = 1 GROUP BY 1, 2
        |), ranked AS (
        | SELECT new_label, label, nij,
        |  row_number() OVER (PARTITION BY new_label ORDER BY nij DESC, label) rn FROM cells
        |)
        |SELECT new_label, cast(sum(nij) as bigint) AS n_vecs,
        | max(CASE WHEN rn = 1 THEN label END) AS top_label,
        | cast(max(CASE WHEN rn = 1 THEN nij END) as bigint) AS n_top,
        | cast(max(CASE WHEN rn = 1 THEN nij END) * 1000000 // sum(nij) as bigint) AS purity_micro
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "q188_cohens_d" ->
      """WITH o AS (
        | SELECT n_name, year(o_orderdate) = 1995 AS is_a,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE year(o_orderdate) IN (1995, 1996)
        |), s AS (
        | SELECT n_name,
        |  cast(sum(CASE WHEN is_a THEN 1 ELSE 0 END) as bigint) n_a,
        |  cast(sum(CASE WHEN is_a THEN 0 ELSE 1 END) as bigint) n_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) END) s_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) END) s_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) * cents END) q_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) * cents END) q_b
        | FROM o GROUP BY 1
        |), ss AS (
        | SELECT n_name, n_a, n_b,
        |  n_a * q_a - s_a * s_a ss_a, n_b * q_b - s_b * s_b ss_b, s_a, s_b
        | FROM s WHERE n_a >= 2 AND n_b >= 2
        |)
        |SELECT n_name, n_a, n_b,
        | cast(ss_a as varchar) AS ss_a, cast(ss_b as varchar) AS ss_b,
        | round((cast(s_a * n_b - s_b * n_a as double) / (cast(n_a as double) * n_b))
        |  / sqrt((cast(n_b as double) * cast(ss_a as double) / n_a
        |        + cast(n_a as double) * cast(ss_b as double) / n_b)
        |     / (cast(n_a as double) * n_b * (n_a + n_b - 2))), 6) AS cohens_d
        |FROM ss WHERE ss_a + ss_b > 0 ORDER BY n_name""".stripMargin,
    "q189_gehan" ->
      """WITH pc AS (
        | SELECT o_custkey, min(cast(o_orderdate as date)) first_day,
        |  max(cast(o_orderdate as date)) last_day
        | FROM orders GROUP BY 1
        |), co AS (
        | SELECT cast(max(cast(o_orderdate as date)) - INTERVAL 56 DAY as date) AS cutoff FROM orders
        |), life AS (
        | SELECT date_diff('day', first_day, last_day) // 7 AS t,
        |  CASE WHEN last_day <= cutoff THEN 1 ELSE 0 END ev,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END g1
        | FROM pc JOIN customer ON o_custkey = c_custkey, co
        |), byt AS (
        | SELECT t, count(*) m, cast(sum(g1) as bigint) m1,
        |  cast(sum(ev) as bigint) d, cast(sum(ev * g1) as bigint) d1
        | FROM life GROUP BY 1
        |), risk AS (
        | SELECT t, d, d1,
        |  cast((SELECT count(*) FROM life)
        |   - coalesce(sum(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   as bigint) n_risk,
        |  cast((SELECT sum(g1) FROM life)
        |   - coalesce(sum(m1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   as bigint) n1_risk
        | FROM byt
        |), steps AS (
        | SELECT t AS t_weeks, n_risk, n1_risk, d, d1,
        |  n_risk * d1 - n1_risk * d w_oe,
        |  CASE WHEN n_risk > 1 THEN
        |   cast(d as hugeint) * n1_risk * (n_risk - n1_risk) * (n_risk - d)
        |  ELSE cast(0 as hugeint) END v_num
        | FROM risk WHERE d > 0
        |)
        |SELECT t_weeks, n_risk, n1_risk, d AS n_events, d1 AS n_events_g1,
        | w_oe, cast(sum(w_oe) OVER (ORDER BY t_weeks) as bigint) AS w_oe_cum,
        | cast(v_num as varchar) AS v_num,
        | cast(greatest(n_risk - 1, 1) as bigint) AS v_den
        |FROM steps ORDER BY t_weeks""".stripMargin,
    "sim_triplets" ->
      """WITH q AS (SELECT vec_id qid, label qlabel, embedding qe FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |  list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(e.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(qe[i] as double) * cast(qe[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e.embedding[i] as double) * cast(e.embedding[i] as double))))) cosim
        | FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
        |), pos AS (
        | SELECT qid, vec_id pos_id, cosim pos_cos FROM (
        |  SELECT qid, vec_id, cosim,
        |   row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vec_id) rn
        |  FROM s WHERE label = qlabel) WHERE rn = 1
        |), negs AS (
        | SELECT s.qid, s.vec_id, s.cosim, pos.pos_id, pos.pos_cos,
        |  CASE WHEN s.cosim < pos.pos_cos THEN 1 ELSE 0 END in_band
        | FROM s JOIN pos ON s.qid = pos.qid WHERE s.label <> s.qlabel
        |), pick AS (
        | SELECT qid, vec_id, cosim, pos_id, pos_cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY in_band DESC, cosim DESC, vec_id) rn,
        |  sum(in_band) OVER (PARTITION BY qid) n_band
        | FROM negs
        |)
        |SELECT qid AS anchor_id, pos_id, round(pos_cos, 6) AS pos_score,
        | vec_id AS neg_id, round(cosim, 6) AS neg_score,
        | cast(n_band as bigint) AS n_band
        |FROM pick WHERE rn = 1 ORDER BY anchor_id""".stripMargin,
    "sim_dbscan_cores" ->
      """WITH p AS (
        | SELECT a.vec_id va, a.label,
        |  sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |    i -> (cast(a.embedding[i] as double) - cast(b.embedding[i] as double)) * (cast(a.embedding[i] as double) - cast(b.embedding[i] as double)))) <= 1.5
        |   THEN 1 ELSE 0 END) n_neighbors
        | FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id <> b.vec_id
        | GROUP BY 1, 2
        |)
        |SELECT va AS vec_id, cast(label as bigint) AS cell,
        | cast(n_neighbors as bigint) AS n_neighbors,
        | n_neighbors >= 4 AS is_core
        |FROM p ORDER BY vec_id""".stripMargin,
    "q190_pettitt" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), cells AS (
        | SELECT o_orderpriority, cents, cast(count(*) as bigint) c FROM daily GROUP BY 1, 2
        |), ranked AS (
        | SELECT o_orderpriority, cents,
        |  2 * coalesce(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 s
        | FROM cells
        |), tot AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days FROM daily GROUP BY 1
        |), u AS (
        | SELECT d.o_orderpriority, d."day", t.n_days,
        |  row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") t,
        |  sum(r.s) OVER (PARTITION BY d.o_orderpriority ORDER BY d."day")
        |   - row_number() OVER (PARTITION BY d.o_orderpriority ORDER BY d."day") * (t.n_days + 1) u_t
        | FROM daily d
        | JOIN ranked r ON d.o_orderpriority = r.o_orderpriority AND d.cents = r.cents
        | JOIN tot t ON d.o_orderpriority = t.o_orderpriority
        |), pick AS (
        | SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |   ORDER BY abs(u_t) DESC, "day") rn FROM u
        |)
        |SELECT o_orderpriority, n_days, cast(t as bigint) AS t_star,
        | "day" AS day_star, cast(u_t as bigint) AS u_star,
        | cast(abs(u_t) as bigint) AS k_stat
        |FROM pick WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,
    "sim_spherical_step" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |nh AS (
        | SELECT vec_id, label,
        |  list_transform(embedding, x -> cast(x as double) /
        |    sqrt(list_sum(list_transform(embedding, y -> cast(y as double) * cast(y as double))))) nhat
        | FROM embeddings
        |), cent AS (
        | SELECT label, i,
        |  cast(sum(cast(floor(nhat[i] * 1000000000 + 0.5) as bigint)) as double) / 1000000000 / count(*) c
        | FROM nh CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT nh.vec_id, nh.label, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> nhat[i] * cv.cv[i])) /
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cv.cv[i] * cv.cv[i]))) cos
        | FROM nh CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, label, clabel new_label, cos,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) rn FROM d
        |)
        |SELECT vec_id, label, new_label, round(cos, 6) AS cos
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "txt_sichel" ->
      """WITH toks AS (
        | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), b AS (
        | SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) bg
        | FROM toks WHERE len(t) >= 2
        |), c AS (
        | SELECT lang, bg, cast(count(*) as bigint) tf FROM b GROUP BY 1, 2
        |)
        |SELECT lang, cast(count(*) as bigint) AS v,
        | cast(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) as bigint) AS v1,
        | cast(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) as bigint) AS v2,
        | cast(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) * 1000000 // count(*) as bigint) AS sichel_micro
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_honore" ->
      ("""WITH RECURSIVE toks AS (
        | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), b AS (
        | SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) bg
        | FROM toks WHERE len(t) >= 2
        |), c AS MATERIALIZED (
        | SELECT lang, bg, cast(count(*) as bigint) tf FROM b GROUP BY 1, 2
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) v,
        |  cast(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) as bigint) v1,
        |  cast(sum(tf) as bigint) n_bigrams
        | FROM c GROUP BY 1
        |), gs AS (
        | SELECT lang, v, v1, n_bigrams,
        |  greatest(0, length(bin(n_bigrams)) - 43) sh,
        |  (n_bigrams) // (cast(1 as bigint) << greatest(0, length(bin(n_bigrams)) - 43)) arg
        | FROM g
        |), lgvals(x) AS (
        | SELECT DISTINCT arg FROM gs
        |), """ + LgCte + """
        |SELECT gs.lang, n_bigrams, v, v1,
        | CASE WHEN v1 < v THEN
        |  cast(cast(l.lg + gs.sh * 1048576 as hugeint) * 100000 * v
        |   // ((v - v1) * 1048576) as bigint) END AS honore_lg2_milli
        |FROM gs JOIN lg l ON l.x = gs.arg
        |ORDER BY gs.lang""").stripMargin,
    "sim_davies_bouldin" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, clabel new_label, round(dist, 6) rd,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), scat AS (
        | SELECT new_label, cast(count(*) as bigint) n_vecs,
        |  cast(sum(cast(round(sqrt(rd), 6) as decimal(38,6))) * 1000000 as hugeint) ssum
        | FROM best WHERE rn = 1 GROUP BY 1
        |), s AS (SELECT new_label, n_vecs, cast(ssum // n_vecs as bigint) s_micro FROM scat),
        |sep AS (
        | SELECT a.clabel i, b.clabel j,
        |  cast(cast(round(sqrt(list_sum(list_transform(range(1, 65), k -> (a.cv[k] - b.cv[k]) * (a.cv[k] - b.cv[k])))), 6) as decimal(38,6)) * 1000000 as bigint) d_micro
        | FROM centv a JOIN centv b ON a.clabel <> b.clabel
        |), r AS (
        | SELECT sep.i, max(cast(si.s_micro + sj.s_micro as hugeint) * 1000000 // sep.d_micro) db
        | FROM sep JOIN s si ON si.new_label = sep.i JOIN s sj ON sj.new_label = sep.j
        | WHERE sep.d_micro > 0 GROUP BY 1
        |)
        |SELECT s.new_label, s.n_vecs, s.s_micro, cast(r.db as bigint) AS db_micro
        |FROM s LEFT JOIN r ON r.i = s.new_label ORDER BY s.new_label""".stripMargin,
    "dd_oph_lsh" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), h AS (
        | SELECT doc_id, list_transform(shingles, s -> md5(s)) hs FROM sh
        |), r AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_filter(hs, x -> (strpos('0123456789abcdef', substring(x, 32, 1)) - 1) % 8 = i), 'min')) raw
        | FROM h
        |), dens AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_filter(list_transform(range(0, 8), j -> raw[cast((i + j) % 8 as int) + 1]), x -> x IS NOT NULL)[1]) sl
        | FROM r
        |), bands AS (
        | SELECT doc_id, b, md5(sl[2*b+1] || sl[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM dens CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |)
        |SELECT a.doc_id doc_a, b.doc_id doc_b
        |FROM bands a JOIN bands b ON a.bh = b.bh AND a.b = b.b AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_knn_accuracy" ->
      """WITH planes AS (
        | SELECT p, list_transform(range(1, 65), d ->
        |   cast(list_sum(list_transform(range(1, 9), i ->
        |     cast((strpos('0123456789abcdef', substring(md5(cast(p as varchar) || ':' || cast(d as varchar)), i, 1)) - 1) as bigint)
        |     * cast(power(16, 8 - i) as bigint))) as double) / 4294967295.0 - 0.5) w
        | FROM (SELECT unnest(range(0, 6)) p)
        |), b AS MATERIALIZED (
        | SELECT e.vec_id, e.label, e.embedding,
        |  cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), d -> cast(e.embedding[d] as double) * pl.w[d])) > 0
        |       THEN cast(1 as bigint) << pl.p ELSE 0 END) as bigint) bucket
        | FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2, 3
        |), s AS (
        | SELECT a.vec_id src, a.label slabel, e2.vec_id dst, e2.label dlabel,
        |  list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(e2.embedding[i] as double))) /
        |  (sqrt(list_sum(list_transform(range(1, 65), i -> cast(a.embedding[i] as double) * cast(a.embedding[i] as double)))) *
        |   sqrt(list_sum(list_transform(range(1, 65), i -> cast(e2.embedding[i] as double) * cast(e2.embedding[i] as double))))) cosim
        | FROM b a JOIN b e2 ON e2.bucket = a.bucket AND e2.vec_id <> a.vec_id
        |), r AS (
        | SELECT src, slabel, dlabel,
        |  row_number() OVER (PARTITION BY src ORDER BY cosim DESC, dst) rnk FROM s
        |), v AS (
        | SELECT src, slabel, dlabel, count(*) votes FROM r WHERE rnk <= 3 GROUP BY 1, 2, 3
        |), p AS (
        | SELECT src, slabel, dlabel,
        |  row_number() OVER (PARTITION BY src ORDER BY votes DESC, dlabel) rn FROM v
        |), tot AS (SELECT label, cast(count(*) as bigint) n_vectors FROM b GROUP BY 1)
        |SELECT cast(p.slabel as bigint) AS label, max(t.n_vectors) AS n_vectors,
        | count(*) AS n_eval,
        | cast(sum(CASE WHEN p.dlabel = p.slabel THEN 1 ELSE 0 END) as bigint) AS n_correct,
        | cast(sum(CASE WHEN p.dlabel = p.slabel THEN 1 ELSE 0 END) * 1000000 // count(*) as bigint) AS acc_micro
        |FROM p JOIN tot t ON t.label = p.slabel WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q193_cox_stuart" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) AS cents
        | FROM orders GROUP BY 1, 2
        |), r AS (
        | SELECT o_orderpriority, cents,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY "day") rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) n
        | FROM daily
        |)
        |SELECT a.o_orderpriority,
        | cast(max(a.n) as bigint) AS n_days,
        | count(*) AS n_pairs,
        | cast(sum(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END) as bigint) AS n_pos,
        | cast(sum(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END) as bigint) AS n_neg,
        | cast(sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) as bigint) AS n_zero
        |FROM r a JOIN r b ON a.o_orderpriority = b.o_orderpriority
        | AND b.rn = a.rn + (a.n + 1) // 2
        |WHERE a.rn <= a.n // 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q194_welch_t" ->
      """WITH o AS (
        | SELECT n_name, year(o_orderdate) = 1995 AS is_a,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE year(o_orderdate) IN (1995, 1996)
        |), s AS (
        | SELECT n_name,
        |  cast(sum(CASE WHEN is_a THEN 1 ELSE 0 END) as bigint) n_a,
        |  cast(sum(CASE WHEN is_a THEN 0 ELSE 1 END) as bigint) n_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) END) s_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) END) s_b,
        |  sum(CASE WHEN is_a THEN cast(cents as hugeint) * cents END) q_a,
        |  sum(CASE WHEN NOT is_a THEN cast(cents as hugeint) * cents END) q_b
        | FROM o GROUP BY 1
        |), ss AS (
        | SELECT n_name, n_a, n_b, s_a, s_b,
        |  n_a * q_a - s_a * s_a ss_a, n_b * q_b - s_b * s_b ss_b
        | FROM s WHERE n_a >= 2 AND n_b >= 2
        |), se AS (
        | SELECT *,
        |  cast(ss_a as double) / (cast(n_a as double) * n_a * (n_a - 1)) sea,
        |  cast(ss_b as double) / (cast(n_b as double) * n_b * (n_b - 1)) seb
        | FROM ss WHERE ss_a > 0 AND ss_b > 0
        |)
        |SELECT n_name, n_a, n_b,
        | cast(ss_a as varchar) AS ss_a, cast(ss_b as varchar) AS ss_b,
        | round((cast(s_a as double) / n_a - cast(s_b as double) / n_b)
        |  / sqrt(sea + seb), 6) AS welch_t,
        | round((sea + seb) * (sea + seb)
        |  / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)), 6) AS welch_df
        |FROM se ORDER BY n_name""".stripMargin,
    "q191_jarque_bera" ->
      """WITH c AS (
        | SELECT o_orderpriority,
        |  cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders
        |), s AS (
        | SELECT o_orderpriority, count(*) n,
        |  sum(cast(cents as hugeint)) s1,
        |  sum(cast(cents as hugeint) * cents) s2,
        |  sum(cast(cents as hugeint) * cents * cents) s3,
        |  sum(cast(cents as hugeint) * cents * cents * cents) s4
        | FROM c GROUP BY 1
        |), m AS (
        | SELECT *, cast(n as double) nd, cast(s1 as double) / n md1,
        |  cast(s2 as double) / n ds2, cast(s3 as double) / n ds3,
        |  cast(s4 as double) / n ds4
        | FROM s WHERE n >= 2
        |), mm AS (
        | SELECT *, ds2 - md1 * md1 m2,
        |  ds3 - 3 * md1 * ds2 + 2 * md1 * md1 * md1 m3,
        |  ds4 - 4 * md1 * ds3 + 6 * md1 * md1 * ds2 - 3 * md1 * md1 * md1 * md1 m4
        | FROM m
        |), sk AS (
        | SELECT *, m3 / sqrt(m2 * m2 * m2) skew, m4 / (m2 * m2) kurt FROM mm
        |)
        |SELECT o_orderpriority, n,
        | cast(s1 as varchar) AS s1, cast(s2 as varchar) AS s2,
        | cast(s3 as varchar) AS s3, cast(s4 as varchar) AS s4,
        | round(skew, 6) AS skew, round(kurt, 6) AS kurt,
        | round(nd / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4), 6) AS jb
        |FROM sk ORDER BY o_orderpriority""".stripMargin,
    "q192_clustering_coeff" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |),
        |deg AS (
        | SELECT node, count(*) degree FROM (
        |  SELECT a node FROM pairs UNION ALL SELECT b2 FROM pairs) GROUP BY 1
        |),
        |tri AS (
        | SELECT ab.a x, ab.b2 y, bc.b2 z
        | FROM pairs ab JOIN pairs bc ON ab.b2 = bc.a
        | JOIN pairs ac ON ac.a = ab.a AND ac.b2 = bc.b2
        |),
        |tpn AS (
        | SELECT node, cast(count(*) as bigint) triangles FROM (
        |  SELECT x node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        | GROUP BY 1
        |)
        |SELECT d.node, cast(d.degree as bigint) AS degree,
        | coalesce(t.triangles, 0) AS triangles,
        | cast(2 * cast(coalesce(t.triangles, 0) as hugeint) * 1000000
        |   // (cast(d.degree as hugeint) * (d.degree - 1)) as bigint) AS cc_micro
        |FROM deg d LEFT JOIN tpn t ON d.node = t.node
        |WHERE d.degree >= 2
        |ORDER BY d.degree DESC, d.node LIMIT 20""".stripMargin,
    "q195_block_maxima" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), blk AS (
        | SELECT o_orderpriority, date_trunc('week', "day") wk, max(cents) mx
        | FROM daily GROUP BY 1, 2
        |), g AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_blocks,
        |  sum(cast(mx as hugeint)) s1, sum(cast(mx as hugeint) * mx) s2
        | FROM blk GROUP BY 1
        |), h AS (
        | SELECT *, n_blocks * s2 - s1 * s1 ssb FROM g WHERE n_blocks >= 2
        |), hh AS (
        | SELECT *, sqrt(cast(ssb as double) / (cast(n_blocks as double) * (n_blocks - 1)))
        |   * 2.449489742783178 / 3.141592653589793 beta
        | FROM h WHERE ssb > 0
        |)
        |SELECT o_orderpriority, n_blocks,
        | cast(s1 as varchar) AS s1, cast(s2 as varchar) AS s2,
        | round(beta, 6) AS gumbel_beta,
        | round(cast(s1 as double) / n_blocks - 0.5772156649015329 * beta, 6) AS gumbel_mu
        |FROM hh ORDER BY o_orderpriority""".stripMargin,
    "q196_cvar" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), r AS (
        | SELECT o_orderpriority, cents,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents, "day") rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) n
        | FROM daily
        |), s AS (SELECT *, (n * 95 + 99) // 100 r_star FROM r)
        |SELECT o_orderpriority, cast(max(n) as bigint) AS n_days,
        | max(CASE WHEN rn = r_star THEN cents END) AS var_cents,
        | cast(sum(CASE WHEN rn >= r_star THEN 1 ELSE 0 END) as bigint) AS n_tail,
        | cast(sum(CASE WHEN rn >= r_star THEN cast(cents as hugeint) END)
        |   // sum(CASE WHEN rn >= r_star THEN 1 ELSE 0 END) as bigint) AS cvar_cents
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q197_partial_corr" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) x,
        |  cast(count(*) as bigint) y,
        |  cast(count(DISTINCT o_custkey) as bigint) z
        | FROM orders GROUP BY 1, 2
        |), g AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n,
        |  sum(cast(x as hugeint)) sx, sum(cast(y as hugeint)) sy, sum(cast(z as hugeint)) sz,
        |  sum(cast(x as hugeint) * x) sxx, sum(cast(y as hugeint) * y) syy,
        |  sum(cast(z as hugeint) * z) szz, sum(cast(x as hugeint) * y) sxy,
        |  sum(cast(x as hugeint) * z) sxz, sum(cast(y as hugeint) * z) syz
        | FROM daily GROUP BY 1
        |), d AS (
        | SELECT *, n * sxx - sx * sx dx, n * syy - sy * sy dy, n * szz - sz * sz dz
        | FROM g WHERE n >= 3
        |), rr AS (
        | SELECT *,
        |  cast(n * sxy - sx * sy as double) / sqrt(cast(dx as double) * cast(dy as double)) rxy,
        |  cast(n * sxz - sx * sz as double) / sqrt(cast(dx as double) * cast(dz as double)) rxz,
        |  cast(n * syz - sy * sz as double) / sqrt(cast(dy as double) * cast(dz as double)) ryz
        | FROM d WHERE dx > 0 AND dy > 0 AND dz > 0
        |)
        |SELECT o_orderpriority, n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
        | round(ryz, 6) AS r_yz,
        | round(CASE WHEN (1 - rxz * rxz) * (1 - ryz * ryz) > 0 THEN
        |  (rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) END, 6) AS partial_r
        |FROM rr ORDER BY o_orderpriority""".stripMargin,
    "q198_cronbach_alpha" ->
      """WITH wk AS (
        | SELECT o_orderpriority, date_trunc('week', cast(o_orderdate as date)) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) x
        | FROM orders GROUP BY 1, 2
        |), kf AS (SELECT cast(count(DISTINCT o_orderpriority) as bigint) k FROM wk
        |), complete AS MATERIALIZED (
        | SELECT "day", count(*) np, sum(cast(x as hugeint)) t FROM wk GROUP BY 1
        | HAVING count(*) = (SELECT k FROM kf)
        |), items AS (
        | SELECT sum(ni * qi - si * si) ss_items FROM (
        |  SELECT w.o_orderpriority, cast(count(*) as hugeint) ni,
        |   sum(cast(x as hugeint)) si, sum(cast(x as hugeint) * x) qi
        |  FROM wk w JOIN complete c ON c."day" = w."day" GROUP BY 1
        | )
        |), totals AS (
        | SELECT (SELECT k FROM kf) k, cast(count(*) as bigint) n_weeks,
        |  sum(t) st, sum(t * t) qt FROM complete
        |), tt AS (
        | SELECT k, n_weeks, n_weeks * qt - st * st ss_total FROM totals
        |)
        |SELECT tt.k, tt.n_weeks, cast(items.ss_items as varchar) AS ss_items,
        | cast(tt.ss_total as varchar) AS ss_total,
        | round(cast(tt.k as double) / (tt.k - 1)
        |   * (1 - cast(items.ss_items as double) / cast(tt.ss_total as double)), 6) AS alpha
        |FROM tt, items WHERE tt.k >= 2 AND tt.n_weeks >= 2 AND tt.ss_total > 0""".stripMargin,
    "q199_cooks_distance" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) y
        | FROM orders GROUP BY 1, 2
        |), r AS (
        | SELECT *, cast(row_number() OVER (PARTITION BY o_orderpriority ORDER BY "day") as bigint) t
        | FROM daily
        |), g AS (
        | SELECT o_orderpriority p, cast(count(*) as bigint) n,
        |  sum(cast(t as hugeint)) st, sum(cast(t as hugeint) * t) st2,
        |  sum(cast(y as hugeint)) sy, sum(cast(t as hugeint) * y) sty
        | FROM r GROUP BY 1
        |), gg AS (
        | SELECT *, n * st2 - st * st den, n * sty - st * sy bnum
        | FROM g WHERE n > 2
        |), sc AS (
        | SELECT r.o_orderpriority, r."day", r.y, r.t, gg.n, gg.st, gg.den,
        |  cast(round(cast(gg.den * (gg.n * r.y - gg.sy) - gg.bnum * (gg.n * r.t - gg.st) as double)
        |    / (cast(gg.n as double) * cast(gg.den as double)), 0) as bigint) e_r,
        |  1.0 / gg.n + cast((gg.n * r.t - gg.st) * (gg.n * r.t - gg.st) as double)
        |    / (cast(gg.n as double) * cast(gg.den as double)) h
        | FROM r JOIN gg ON gg.p = r.o_orderpriority WHERE gg.den > 0
        |), se AS (
        | SELECT *, sum(cast(e_r as hugeint) * e_r) OVER (PARTITION BY o_orderpriority) sum_e2 FROM sc
        |), ck AS (
        | SELECT *, cast(sum_e2 as double) / (n - 2) s2 FROM se WHERE sum_e2 > 0
        |), cc AS (
        | SELECT *, (cast(e_r as double) * e_r / (2 * s2)) * (h / ((1 - h) * (1 - h))) cook FROM ck
        |), top AS (
        | SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY cook DESC, "day") rk FROM cc
        |)
        |SELECT o_orderpriority, "day", y AS cents, round(h, 6) AS leverage, round(cook, 6) AS cooks_d
        |FROM top WHERE rk <= 3 ORDER BY o_orderpriority, "day"""".stripMargin,
    "q200_rich_club" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |), deg AS (
        | SELECT n, cast(count(*) as bigint) d FROM (
        |  SELECT a AS n FROM pairs UNION ALL SELECT b2 FROM pairs) GROUP BY 1
        |), ks(k) AS (VALUES (1), (2), (4), (8), (16), (32)),
        |nk AS (
        | SELECT k, cast(count(*) as bigint) n_nodes FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1
        |), em AS (
        | SELECT least(da.d, db.d) m FROM pairs
        |  JOIN deg da ON da.n = pairs.a JOIN deg db ON db.n = pairs.b2
        |), ek AS (
        | SELECT k, cast(count(*) as bigint) n_edges FROM ks JOIN em ON em.m > ks.k GROUP BY 1
        |)
        |SELECT cast(ks.k as bigint) AS k, coalesce(nk.n_nodes, 0) AS n_nodes,
        | coalesce(ek.n_edges, 0) AS n_edges,
        | CASE WHEN coalesce(nk.n_nodes, 0) >= 2 THEN
        |  cast(2 * cast(coalesce(ek.n_edges, 0) as hugeint) * 1000000
        |   // (cast(nk.n_nodes as hugeint) * (nk.n_nodes - 1)) as bigint) END AS phi_micro
        |FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
        |ORDER BY k""".stripMargin,
    "txt_herdan" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) n_tokens,
        |  cast(count(DISTINCT term) as bigint) vocab
        | FROM t GROUP BY 1
        |), gs AS (
        | SELECT lang, n_tokens, vocab,
        |  greatest(0, length(bin(n_tokens)) - 43) shn,
        |  n_tokens // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) argn,
        |  greatest(0, length(bin(vocab)) - 43) shv,
        |  vocab // (cast(1 as bigint) << greatest(0, length(bin(vocab)) - 43)) argv
        | FROM g
        |), lgvals(x) AS (
        | -- explicit DISTINCT subquery: inside WITH RECURSIVE a bare
        | -- `a UNION b` CTE gets the recursive-union treatment and
        | -- does NOT dedup across the branches (seen live: 31 landed
        | -- 5x and fanned the lg join 5x per language)
        | SELECT DISTINCT x FROM (SELECT argn x FROM gs UNION ALL SELECT argv FROM gs)
        |), """ + LgCte + """
        |SELECT gs.lang, n_tokens, vocab,
        | CASE WHEN n_tokens >= 2 THEN
        |  cast(cast(lv.lg + gs.shv * 1048576 as hugeint) * 1000000
        |   // (ln.lg + gs.shn * 1048576) as bigint) END AS herdan_c_micro
        |FROM gs JOIN lg ln ON ln.x = gs.argn JOIN lg lv ON lv.x = gs.argv
        |ORDER BY gs.lang""").stripMargin,
    "sim_xie_beni" ->
      """WITH dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, round(dist, 6) rd,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), tot AS (
        | SELECT cast(count(*) as bigint) n_vecs,
        |  cast(sum(cast(rd as decimal(38,6))) * 1000000 as hugeint) im
        | FROM best WHERE rn = 1
        |), sep AS (
        | SELECT min(cast(cast(round(list_sum(list_transform(range(1, 65), kk -> (a.cv[kk] - b.cv[kk]) * (a.cv[kk] - b.cv[kk]))), 6) as decimal(38,6)) * 1000000 as bigint)) min_sep2_micro
        | FROM centv a JOIN centv b ON a.clabel <> b.clabel
        |)
        |SELECT tot.n_vecs, cast(tot.im as bigint) AS inertia_micro, sep.min_sep2_micro,
        | CASE WHEN sep.min_sep2_micro > 0 THEN
        |  cast(tot.im * 1000000 // (cast(tot.n_vecs as hugeint) * sep.min_sep2_micro) as bigint) END AS xb_micro
        |FROM tot, sep""".stripMargin,
    "q201_adamic_adar" ->
      ("""WITH RECURSIVE b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        | SELECT a, b2 FROM (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b2, count(*) AS support
        |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2) WHERE support >= 2
        |), ed AS MATERIALIZED (
        | SELECT a s, b2 d FROM pairs UNION ALL SELECT b2, a FROM pairs
        |), deg AS MATERIALIZED (
        | SELECT s n, cast(count(*) as bigint) dg FROM ed GROUP BY 1
        |), lgvals(x) AS (SELECT DISTINCT dg FROM deg),
        |""" + LgCte + """,
        |cn AS (
        | SELECT e1.s n1, e2.d n2, cast(count(*) as bigint) common_nbrs,
        |  cast(sum(1048576000 // l.lg) as bigint) aa_milli
        | FROM ed e1 JOIN ed e2 ON e2.s = e1.d AND e1.s < e2.d
        |  JOIN deg dw ON dw.n = e1.d JOIN lg l ON l.x = dw.dg
        | GROUP BY 1, 2
        |)
        |SELECT cn.n1, cn.n2, cn.common_nbrs, cn.aa_milli
        |FROM cn LEFT JOIN pairs p ON p.a = cn.n1 AND p.b2 = cn.n2
        |WHERE p.a IS NULL
        |ORDER BY aa_milli DESC, n1, n2 LIMIT 20""").stripMargin,
    "q202_bowker" ->
      """WITH modal AS (
        | SELECT o_custkey, year(o_orderdate) yr, o_orderpriority p, count(*) c
        | FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        | GROUP BY 1, 2, 3
        |), m AS (
        | SELECT *, row_number() OVER (PARTITION BY o_custkey, yr ORDER BY c DESC, p) rn
        | FROM modal
        |), t AS (
        | SELECT a.o_custkey, a.p p95, b.p p96
        | FROM m a JOIN m b ON b.o_custkey = a.o_custkey AND b.yr = 1996 AND b.rn = 1
        | WHERE a.yr = 1995 AND a.rn = 1
        |), cells AS MATERIALIZED (
        | SELECT p95, p96, cast(count(*) as bigint) c FROM t GROUP BY 1, 2
        |), ps AS (
        | SELECT DISTINCT p FROM (SELECT p95 p FROM cells UNION ALL SELECT p96 FROM cells)
        |)
        |SELECT i.p AS i, j.p AS j,
        | coalesce(nij.c, 0) AS n_ij, coalesce(nji.c, 0) AS n_ji,
        | CASE WHEN coalesce(nij.c, 0) + coalesce(nji.c, 0) > 0 THEN
        |  cast(cast(coalesce(nij.c, 0) - coalesce(nji.c, 0) as hugeint)
        |   * (coalesce(nij.c, 0) - coalesce(nji.c, 0)) * 1000000
        |   // (coalesce(nij.c, 0) + coalesce(nji.c, 0)) as bigint) END AS term_micro
        |FROM ps i JOIN ps j ON i.p < j.p
        |LEFT JOIN cells nij ON nij.p95 = i.p AND nij.p96 = j.p
        |LEFT JOIN cells nji ON nji.p95 = j.p AND nji.p96 = i.p
        |ORDER BY i, j""".stripMargin,
    "q203_dixon_q" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), r AS (
        | SELECT o_orderpriority, cents,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents, "day") ra,
        |  count(*) OVER (PARTITION BY o_orderpriority) n
        | FROM daily
        |), rr AS (SELECT *, n - ra + 1 rd FROM r
        |), g AS (
        | SELECT o_orderpriority, cast(max(n) as bigint) n_days,
        |  max(CASE WHEN ra = 1 THEN cents END) min1,
        |  max(CASE WHEN ra = 2 THEN cents END) min2,
        |  max(CASE WHEN rd = 1 THEN cents END) max1,
        |  max(CASE WHEN rd = 2 THEN cents END) max2
        | FROM rr GROUP BY 1 HAVING count(*) >= 3
        |)
        |SELECT o_orderpriority, n_days, min1, max1,
        | CASE WHEN max1 > min1 THEN
        |  cast(cast(min2 - min1 as hugeint) * 1000000 // (max1 - min1) as bigint) END AS q_low_micro,
        | CASE WHEN max1 > min1 THEN
        |  cast(cast(max1 - max2 as hugeint) * 1000000 // (max1 - min1) as bigint) END AS q_high_micro
        |FROM g ORDER BY o_orderpriority""".stripMargin,
    "q204_kendall_tau_b" ->
      """WITH base AS (
        | SELECT cast(substring(o_orderpriority, 1, 1) as bigint) x,
        |  least(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) // 5000000, 9) y
        | FROM orders
        |), cells AS MATERIALIZED (
        | SELECT x, y, cast(count(*) as bigint) a FROM base GROUP BY 1, 2
        |), pr AS (
        | SELECT ca.x xa, ca.y ya, ca.a na, cb.x xb, cb.y yb, cb.a nb
        | FROM cells ca JOIN cells cb
        |  ON ca.x < cb.x OR (ca.x = cb.x AND ca.y < cb.y)
        |), cd AS (
        | SELECT
        |  sum(CASE WHEN xa < xb AND ya < yb THEN cast(na as hugeint) * nb ELSE 0 END) c_d,
        |  sum(CASE WHEN xa < xb AND ya > yb THEN cast(na as hugeint) * nb ELSE 0 END) d_d
        | FROM pr
        |), mg AS (SELECT sum(cast(a as hugeint)) n FROM cells
        |), t1 AS (
        | SELECT sum(cast(t as hugeint) * (t - 1)) n1_2 FROM (
        |  SELECT x, sum(a) t FROM cells GROUP BY 1)
        |), t2 AS (
        | SELECT sum(cast(t as hugeint) * (t - 1)) n2_2 FROM (
        |  SELECT y, sum(a) t FROM cells GROUP BY 1)
        |), f AS (
        | SELECT mg.n, cd.c_d, cd.d_d, t1.n1_2, t2.n2_2, mg.n * (mg.n - 1) n0_2
        | FROM mg, cd, t1, t2
        |)
        |SELECT cast(n as bigint) AS n,
        | cast(c_d as bigint) AS c_pairs, cast(d_d as bigint) AS d_pairs,
        | cast(n1_2 // 2 as bigint) AS n1_pairs, cast(n2_2 // 2 as bigint) AS n2_pairs,
        | round((cast(c_d as double) - cast(d_d as double))
        |   / sqrt(cast(n0_2 - n1_2 as double) / 2 * (cast(n0_2 - n2_2 as double) / 2)), 6) AS tau_b
        |FROM f WHERE n0_2 > n1_2 AND n0_2 > n2_2""".stripMargin,
    "txt_guiraud" ->
      """WITH t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) n_tokens,
        |  cast(count(DISTINCT term) as bigint) vocab
        | FROM t GROUP BY 1
        |)
        |SELECT lang, n_tokens, vocab,
        | round(cast(vocab as double) / sqrt(cast(n_tokens as double)), 6) AS guiraud_r
        |FROM g ORDER BY lang""".stripMargin,
    "dd_oph_incremental" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t FROM documents
        |), sh AS (
        | SELECT doc_id, list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) shingles
        | FROM toks WHERE len(t) >= 3
        |), h AS (
        | SELECT doc_id, list_transform(shingles, s -> md5(s)) hs FROM sh
        |), r AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_aggregate(list_filter(hs, x -> (strpos('0123456789abcdef', substring(x, 32, 1)) - 1) % 8 = i), 'min')) raw
        | FROM h
        |), dens AS (
        | SELECT doc_id, list_transform(range(0, 8), i ->
        |   list_filter(list_transform(range(0, 8), j -> raw[cast((i + j) % 8 as int) + 1]), x -> x IS NOT NULL)[1]) sl
        | FROM r
        |), bands AS MATERIALIZED (
        | SELECT doc_id, b, md5(sl[2*b+1] || sl[2*b+2] || ':' || cast(b as varchar)) bh
        | FROM dens CROSS JOIN (VALUES (0), (1), (2), (3)) v(b)
        |)
        |SELECT DISTINCT nw.doc_id AS doc_new, old.doc_id AS doc_old
        |FROM bands nw JOIN bands old ON old.b = nw.b AND old.bh = nw.bh
        |WHERE nw.doc_id >= 400 AND old.doc_id < 400
        |ORDER BY doc_new, doc_old""".stripMargin,
    "q205_anderson_darling" ->
      """WITH o AS (
        | SELECT r.r_name, o.o_orderpriority = '1-URGENT' AS is_a,
        |  cast(cast(o.o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        | WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
        |), cells AS (
        | SELECT r_name, cents, cast(count(*) as bigint) c_tot,
        |  cast(sum(CASE WHEN is_a THEN 1 ELSE 0 END) as bigint) c_a
        | FROM o GROUP BY 1, 2
        |), cum AS (
        | SELECT r_name, cents, c_tot, c_a, c_tot - c_a AS c_b,
        |  sum(c_tot) OVER w AS bj, sum(c_a) OVER w AS ma, sum(c_tot - c_a) OVER w AS mb
        | FROM cells
        | WINDOW w AS (PARTITION BY r_name ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), tot AS (
        | SELECT r_name, cast(sum(c_a) as bigint) n_a,
        |  cast(sum(c_tot - c_a) as bigint) n_b, cast(sum(c_tot) as bigint) n_tot
        | FROM cells GROUP BY 1 HAVING sum(c_a) > 0 AND sum(c_tot - c_a) > 0
        |), terms AS (
        | SELECT cum.r_name, t.n_a, t.n_b, t.n_tot,
        |  sum(CASE WHEN bj < n_tot THEN
        |   cast(c_tot as hugeint)
        |    * (cast(n_tot as hugeint) * ma - cast(n_a as hugeint) * bj)
        |    * (cast(n_tot as hugeint) * ma - cast(n_a as hugeint) * bj)
        |    * 1000000 // (cast(bj as hugeint) * (n_tot - bj)) ELSE 0 END) ia,
        |  sum(CASE WHEN bj < n_tot THEN
        |   cast(c_tot as hugeint)
        |    * (cast(n_tot as hugeint) * mb - cast(n_b as hugeint) * bj)
        |    * (cast(n_tot as hugeint) * mb - cast(n_b as hugeint) * bj)
        |    * 1000000 // (cast(bj as hugeint) * (n_tot - bj)) ELSE 0 END) ib
        | FROM cum JOIN tot t ON t.r_name = cum.r_name
        | GROUP BY 1, 2, 3, 4
        |)
        |SELECT r_name, n_a, n_b,
        | cast(ia as varchar) AS inner_a_micro, cast(ib as varchar) AS inner_b_micro,
        | round((cast(ia as double) / cast(n_a as double)
        |   + cast(ib as double) / cast(n_b as double))
        |  / (cast(n_tot as double) * 1e6), 6) AS a2_stat
        |FROM terms ORDER BY r_name""".stripMargin,
    "q206_quade" ->
      """WITH weekly AS (
        | SELECT o_orderpriority,
        |  date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) // 7 AS wk,
        |  cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) cents
        | FROM orders GROUP BY 1, 2
        |), complete AS (
        | SELECT wk FROM weekly GROUP BY wk HAVING count(*) = 5
        |), wv AS (SELECT w.* FROM weekly w JOIN complete USING (wk)),
        |ranks AS (
        | SELECT a.o_orderpriority, a.wk,
        |  cast(sum(CASE WHEN b.cents < a.cents THEN 2 ELSE 0 END)
        |   + sum(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 as bigint) r2
        | FROM wv a JOIN wv b ON a.wk = b.wk
        | GROUP BY 1, 2
        |), ranges AS (
        | SELECT wk, max(cents) - min(cents) AS rng FROM wv GROUP BY 1
        |), q2t AS (
        | SELECT wk, 2 * rank() OVER (ORDER BY rng)
        |   + count(*) OVER (PARTITION BY rng) - 1 AS q2
        | FROM ranges
        |), s4t AS (
        | SELECT r.o_orderpriority, r.wk, cast(q.q2 * (r.r2 - 6) as bigint) s4
        | FROM ranks r JOIN q2t q ON q.wk = r.wk
        |), pt AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_blocks,
        |  cast(sum(cast(s4 as hugeint)) as hugeint) s4_sum
        | FROM s4t GROUP BY 1
        |), a16t AS (
        | SELECT cast(sum(cast(s4 as hugeint) * s4) as hugeint) a16 FROM s4t
        |), ft AS (
        | SELECT max(n_blocks) nb, cast(sum(s4_sum * s4_sum) as hugeint) b16n FROM pt
        |)
        |SELECT pt.o_orderpriority, pt.n_blocks,
        | cast(pt.s4_sum as bigint) AS s4_sum, cast(a16 as varchar) AS a16,
        | round(CASE WHEN cast(nb as hugeint) * a16 - b16n > 0 THEN
        |  cast(cast(nb - 1 as hugeint) * b16n as double)
        |   / cast(cast(nb as hugeint) * a16 - b16n as double) END, 6) AS f_stat
        |FROM pt, a16t, ft ORDER BY pt.o_orderpriority""".stripMargin,
    "q207_theil_index" ->
      ("""WITH RECURSIVE cust AS MATERIALIZED (
        | SELECT n.n_name,
        |  cast(sum(cast(cast(o.o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) x
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        | GROUP BY n.n_name, o.o_custkey
        | HAVING sum(cast(cast(o.o_totalprice as decimal(18,2)) * 100 as bigint)) > 0
        |), grp AS MATERIALIZED (
        | SELECT n_name g, cast(count(*) as bigint) n_g, cast(sum(x) as bigint) s_g
        | FROM cust GROUP BY 1
        |), tot AS MATERIALIZED (
        | SELECT cast(sum(n_g) as bigint) n_tot, cast(sum(s_g) as bigint) s_tot FROM grp
        |), shf AS MATERIALIZED (
        | SELECT v, greatest(0, length(bin(v)) - 43) sh,
        |  v // (cast(1 as bigint) << greatest(0, length(bin(v)) - 43)) arg
        | FROM (SELECT DISTINCT v FROM (
        |   SELECT x v FROM cust UNION ALL SELECT n_g FROM grp
        |   UNION ALL SELECT s_g FROM grp
        |   UNION ALL SELECT n_tot FROM tot UNION ALL SELECT s_tot FROM tot))
        |), lgvals(x) AS (
        | SELECT DISTINCT arg x FROM shf
        |), """ + LgCte + """,
        |lgx AS (
        | SELECT shf.v, l.lg + shf.sh * 1048576 AS lg FROM shf JOIN lg l ON l.x = shf.arg
        |), wn AS (
        | SELECT c.n_name,
        |  cast(sum(cast(c.x as hugeint) * (lx.lg + ln2.lg - ls2.lg)) as hugeint) wnum
        | FROM cust c JOIN grp ON grp.g = c.n_name
        |  JOIN lgx lx ON lx.v = c.x
        |  JOIN lgx ln2 ON ln2.v = grp.n_g
        |  JOIN lgx ls2 ON ls2.v = grp.s_g
        | GROUP BY 1
        |)
        |SELECT grp.g AS n_name, grp.n_g AS n_cust, grp.s_g AS revenue_cents,
        | cast(CASE WHEN wnum * 1000 < 0
        |      THEN -((-(wnum * 1000)) // (cast(grp.s_g as hugeint) * 1048576))
        |      ELSE (wnum * 1000) // (cast(grp.s_g as hugeint) * 1048576) END as bigint)
        |  AS t_within_milli,
        | cast(CASE WHEN bterm * 1000 < 0
        |      THEN -((-(bterm * 1000)) // (cast(t.s_tot as hugeint) * 1048576))
        |      ELSE (bterm * 1000) // (cast(t.s_tot as hugeint) * 1048576) END as bigint)
        |  AS between_term_milli
        |FROM grp
        | JOIN wn ON wn.n_name = grp.g
        | CROSS JOIN tot t
        | JOIN lgx lsg ON lsg.v = grp.s_g
        | JOIN lgx lng ON lng.v = grp.n_g
        | JOIN lgx lnt ON lnt.v = t.n_tot
        | JOIN lgx lst ON lst.v = t.s_tot,
        | LATERAL (SELECT cast(grp.s_g as hugeint) * (lsg.lg + lnt.lg - lng.lg - lst.lg) AS bterm) bt
        |ORDER BY n_name""").stripMargin,
    "q208_dispersion" ->
      """WITH daily AS (
        | SELECT o_orderpriority, cast(o_orderdate as date) AS "day",
        |  cast(count(*) as bigint) c
        | FROM orders GROUP BY 1, 2
        |), g AS (
        | SELECT o_orderpriority, cast(count(*) as bigint) n_days,
        |  cast(sum(c) as bigint) sum_c,
        |  cast(sum(cast(c as hugeint) * c) as hugeint) sum_c2
        | FROM daily GROUP BY 1 HAVING count(*) >= 2 AND sum(c) > 0
        |)
        |SELECT o_orderpriority, n_days, sum_c,
        | cast((cast(n_days as hugeint) * sum_c2 - cast(sum_c as hugeint) * sum_c) * 1000000
        |  // (cast(n_days - 1 as hugeint) * sum_c) as bigint) AS vmr_micro,
        | cast((cast(n_days as hugeint) * sum_c2 - cast(sum_c as hugeint) * sum_c) * 1000000
        |  // cast(sum_c as hugeint) as bigint) AS d_stat_micro
        |FROM g ORDER BY o_orderpriority""".stripMargin,
    "txt_dugast" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) n_tokens,
        |  cast(count(DISTINCT term) as bigint) vocab
        | FROM t GROUP BY 1
        |), gs AS (
        | SELECT lang, n_tokens, vocab,
        |  greatest(0, length(bin(n_tokens)) - 43) shn,
        |  n_tokens // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) argn,
        |  greatest(0, length(bin(vocab)) - 43) shv,
        |  vocab // (cast(1 as bigint) << greatest(0, length(bin(vocab)) - 43)) argv
        | FROM g
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (SELECT argn x FROM gs UNION ALL SELECT argv FROM gs)
        |), """ + LgCte + """
        |SELECT gs.lang, n_tokens, vocab,
        | CASE WHEN n_tokens >= 2
        |   AND ln.lg + gs.shn * 1048576 > lv.lg + gs.shv * 1048576 THEN
        |  cast(cast(ln.lg + gs.shn * 1048576 as hugeint)
        |    * (ln.lg + gs.shn * 1048576) * 1000
        |   // (cast(1048576 as hugeint)
        |       * ((ln.lg + gs.shn * 1048576) - (lv.lg + gs.shv * 1048576))) as bigint)
        | END AS dugast_u_milli
        |FROM gs JOIN lg ln ON ln.x = gs.argn JOIN lg lv ON lv.x = gs.argv
        |ORDER BY gs.lang""").stripMargin,
    "sim_kmeans_bic" ->
      ("""WITH RECURSIVE dims AS (SELECT unnest(range(1, 65)) i),
        |cent AS (
        | SELECT label, i, cast(sum(cast(embedding[i] as decimal(18,9))) as double) / count(*) c
        | FROM embeddings CROSS JOIN dims GROUP BY 1, 2
        |), centv AS (SELECT label clabel, list(c ORDER BY i) cv FROM cent GROUP BY 1),
        |d AS (
        | SELECT e.vec_id, cv.clabel,
        |  list_sum(list_transform(range(1, 65), i -> (cast(e.embedding[i] as double) - cv.cv[i]) * (cast(e.embedding[i] as double) - cv.cv[i]))) dist
        | FROM embeddings e CROSS JOIN centv cv
        |), best AS (
        | SELECT vec_id, clabel new_label, dist,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) rn FROM d
        |), per AS MATERIALIZED (
        | SELECT new_label, cast(count(*) as bigint) n_j,
        |  cast(sum(cast(cast(round(dist, 6) as decimal(18,6)) * 1000000 as bigint)) as bigint) sse_j
        | FROM best WHERE rn = 1 GROUP BY 1
        |), ag AS MATERIALIZED (
        | SELECT cast(sum(n_j) as bigint) n, cast(count(*) as bigint) k,
        |  cast(sum(sse_j) as bigint) sse_micro
        | FROM per
        |), dd AS MATERIALIZED (SELECT cast(max(len(embedding)) as bigint) d FROM embeddings),
        |shf AS MATERIALIZED (
        | SELECT v, greatest(0, length(bin(v)) - 43) sh,
        |  v // (cast(1 as bigint) << greatest(0, length(bin(v)) - 43)) arg
        | FROM (SELECT DISTINCT v FROM (
        |   SELECT n_j v FROM per UNION ALL SELECT n FROM ag
        |   UNION ALL SELECT sse_micro FROM ag
        |   UNION ALL SELECT 1000000 * d * (n - k) FROM ag, dd WHERE n > k))
        |), lgvals(x) AS (
        | SELECT DISTINCT arg x FROM shf
        |), """ + LgCte + """,
        |lgx AS (
        | SELECT shf.v, l.lg + shf.sh * 1048576 AS lg FROM shf JOIN lg l ON l.x = shf.arg
        |), snl AS (
        | SELECT cast(sum(cast(per.n_j as hugeint) * lx.lg) as hugeint) v
        | FROM per JOIN lgx lx ON lx.v = per.n_j
        |), f AS (
        | SELECT ag.n, ag.k, dd.d, ag.sse_micro,
        |  CASE WHEN ag.n > ag.k AND ag.sse_micro > 0 THEN
        |   - cast(ag.n as hugeint) * dd.d
        |     * (2780295 + (SELECT lg FROM lgx WHERE v = ag.sse_micro)
        |        - (SELECT lg FROM lgx WHERE v = 1000000 * dd.d * (ag.n - ag.k)))
        |   - cast(dd.d as hugeint) * (ag.n - ag.k) * 1512775
        |   + 2 * (SELECT v FROM snl)
        |   - 2 * cast(ag.n as hugeint) * (SELECT lg FROM lgx WHERE v = ag.n)
        |  END f2
        | FROM ag, dd
        |)
        |SELECT n AS n_vecs, k, d, sse_micro,
        | cast(CASE WHEN f2 * 1000 < 0 THEN -((-(f2 * 1000)) // 2097152)
        |      ELSE (f2 * 1000) // 2097152 END as bigint) AS ll_bits_milli,
        | cast(CASE WHEN bicf * 1000 < 0 THEN -((-(bicf * 1000)) // 1048576)
        |      ELSE (bicf * 1000) // 1048576 END as bigint) AS bic_bits_milli,
        | cast(CASE WHEN aicf * 1000 < 0 THEN -((-(aicf * 1000)) // 1048576)
        |      ELSE (aicf * 1000) // 1048576 END as bigint) AS aic_bits_milli
        |FROM f,
        | LATERAL (SELECT -f2 + cast(k as hugeint) * (d + 1)
        |    * (SELECT lg FROM lgx WHERE v = f.n) AS bicf,
        |   -f2 + cast(k as hugeint) * (d + 1) * 2 * 1512775 AS aicf) x2""").stripMargin,
    "q209_brunner_munzel" ->
      """WITH o AS (
        | SELECT r.r_name, o.o_orderpriority = '1-URGENT' AS is_a,
        |  cast(cast(o.o_totalprice as decimal(18,2)) * 100 as bigint) cents
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        | WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
        |), cells AS (
        | SELECT r_name, cents, cast(count(*) as bigint) c_tot,
        |  cast(sum(CASE WHEN is_a THEN 1 ELSE 0 END) as bigint) c_a
        | FROM o GROUP BY 1, 2
        |), cum AS (
        | SELECT r_name, cents, c_tot, c_a, c_tot - c_a AS c_b,
        |  2 * (sum(c_tot) OVER w - c_tot) + c_tot + 1 AS r2,
        |  2 * (sum(c_a) OVER w - c_a) + c_a + 1 AS w2a,
        |  2 * (sum(c_tot - c_a) OVER w - (c_tot - c_a)) + (c_tot - c_a) + 1 AS w2b
        | FROM cells
        | WINDOW w AS (PARTITION BY r_name ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), tot AS (
        | SELECT r_name, cast(sum(c_a) as bigint) n_a,
        |  cast(sum(c_tot - c_a) as bigint) n_b,
        |  cast(sum(cast(c_a as hugeint) * r2) as hugeint) sr2a,
        |  cast(sum(cast(c_tot - c_a as hugeint) * r2) as hugeint) sr2b
        | FROM cum GROUP BY 1 HAVING sum(c_a) >= 2 AND sum(c_tot - c_a) >= 2
        |), dv AS (
        | SELECT cum.r_name, t.n_a, t.n_b, t.sr2a, t.sr2b,
        |  sum(cast(c_a as hugeint)
        |   * (cast(n_a as hugeint) * (r2 - w2a + n_a + 1) - sr2a)
        |   * (cast(n_a as hugeint) * (r2 - w2a + n_a + 1) - sr2a)) s4na,
        |  sum(cast(c_b as hugeint)
        |   * (cast(n_b as hugeint) * (r2 - w2b + n_b + 1) - sr2b)
        |   * (cast(n_b as hugeint) * (r2 - w2b + n_b + 1) - sr2b)) s4nb
        | FROM cum JOIN tot t ON t.r_name = cum.r_name
        | GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT r_name, n_a, n_b,
        | cast((sr2b - cast(n_b as hugeint) * (n_b + 1)) * 1000000
        |  // (2 * cast(n_a as hugeint) * n_b) as bigint) AS p_hat_micro,
        | cast(s4na as varchar) AS s4n_a, cast(s4nb as varchar) AS s4n_b,
        | round(CASE WHEN s4na + s4nb > 0 THEN
        |  (cast(n_a as double) * n_b)
        |   * (cast(sr2b as double) / (2 * cast(n_b as double))
        |      - cast(sr2a as double) / (2 * cast(n_a as double)))
        |   / (cast(n_a + n_b as double)
        |      * sqrt(cast(n_a as double)
        |         * (cast(s4na as double) / (4 * cast(n_a as double) * n_a * (n_a - 1)))
        |       + cast(n_b as double)
        |         * (cast(s4nb as double) / (4 * cast(n_b as double) * n_b * (n_b - 1)))))
        | END, 6) AS bm_t
        |FROM dv ORDER BY r_name""".stripMargin,
    "txt_summer" ->
      ("""WITH RECURSIVE t AS (
        | SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term FROM documents
        |), g AS (
        | SELECT lang, cast(count(*) as bigint) n_tokens,
        |  cast(count(DISTINCT term) as bigint) vocab
        | FROM t GROUP BY 1
        |), gs AS (
        | SELECT lang, n_tokens, vocab,
        |  greatest(0, length(bin(n_tokens)) - 43) shn,
        |  n_tokens // (cast(1 as bigint) << greatest(0, length(bin(n_tokens)) - 43)) argn,
        |  greatest(0, length(bin(vocab)) - 43) shv,
        |  vocab // (cast(1 as bigint) << greatest(0, length(bin(vocab)) - 43)) argv
        | FROM g
        |), lgvals1(x) AS (
        | SELECT DISTINCT x FROM (SELECT argn x FROM gs UNION ALL SELECT argv FROM gs)
        |), lgit1 AS (
        | SELECT x, cast(length(bin(cast(x as bigint))) - 1 as bigint) m,
        |  (cast(x as bigint) * 1048576) // (cast(1 as bigint) << (length(bin(cast(x as bigint))) - 1)) r,
        |  cast(0 as bigint) acc, 0 AS i
        | FROM lgvals1
        | UNION ALL
        | SELECT x, m,
        |  CASE WHEN (r*r) // 1048576 >= 2097152 THEN ((r*r) // 1048576) // 2 ELSE (r*r) // 1048576 END,
        |  acc * 2 + CASE WHEN (r*r) // 1048576 >= 2097152 THEN 1 ELSE 0 END, i + 1
        | FROM lgit1 WHERE i < 20
        |), lg1 AS (
        | SELECT x, m * 1048576 + acc AS lg FROM lgit1 WHERE i = 20
        |), g2 AS (
        | SELECT gs.lang, gs.n_tokens, gs.vocab,
        |  ln2.lg + gs.shn * 1048576 AS lgn, lv2.lg + gs.shv * 1048576 AS lgv
        | FROM gs JOIN lg1 ln2 ON ln2.x = gs.argn JOIN lg1 lv2 ON lv2.x = gs.argv
        |), lgvals(x) AS (
        | SELECT DISTINCT x FROM (
        |  SELECT lgn x FROM g2 WHERE lgn > 1048576
        |  UNION ALL SELECT lgv FROM g2 WHERE lgv > 1048576)
        |), """ + LgCte + """
        |SELECT g2.lang, n_tokens, vocab,
        | CASE WHEN lgv > 1048576 AND lgn > 1048576
        |   AND lln.lg - 20971520 > 0 AND llv.lg - 20971520 > 0 THEN
        |  cast(cast(llv.lg - 20971520 as hugeint) * 1000000
        |   // (lln.lg - 20971520) as bigint)
        | END AS summer_s_micro
        |FROM g2
        | LEFT JOIN lg lln ON lln.x = g2.lgn
        | LEFT JOIN lg llv ON llv.x = g2.lgv
        |ORDER BY g2.lang""").stripMargin,
    "sim_hopkins" ->
      """WITH probes AS (
        | SELECT vec_id, embedding FROM (
        |  SELECT vec_id, embedding,
        |   row_number() OVER (ORDER BY md5('hop:' || cast(vec_id as varchar)), vec_id) rn
        |  FROM embeddings
        | ) WHERE rn <= 50
        |), dims AS (SELECT unnest(range(1, 65)) i),
        |bounds AS (
        | SELECT i, min(cast(embedding[i] as double)) lo, max(cast(embedding[i] as double)) hi
        | FROM embeddings CROSS JOIN dims GROUP BY 1
        |), fracs AS (
        | SELECT p.s, b.i, b.lo, b.hi,
        |  list_sum(list_transform(range(1, 9), k ->
        |   cast(strpos('0123456789abcdef',
        |     substring(md5('hopu:' || cast(p.s as varchar) || ':' || cast(b.i as varchar)), cast(k as int), 1)) - 1 as double)
        |   * power(16, 8 - k))) / 4294967296.0 frac
        | FROM (SELECT unnest(range(0, 50)) s) p CROSS JOIN bounds b
        |), synth AS (
        | SELECT s AS probe_id, list(lo + frac * (hi - lo) ORDER BY i) pe FROM fracs GROUP BY 1
        |), wmin AS (
        | SELECT p.vec_id,
        |  cast(floor(1000000 * min(list_sum(list_transform(range(1, 65), i ->
        |   (cast(p.embedding[i] as double) - cast(e.embedding[i] as double))
        |   * (cast(p.embedding[i] as double) - cast(e.embedding[i] as double)))))) as bigint) w2
        | FROM probes p JOIN embeddings e ON e.vec_id <> p.vec_id
        | GROUP BY 1
        |), umin AS (
        | SELECT s.probe_id,
        |  cast(floor(1000000 * min(list_sum(list_transform(range(1, 65), i ->
        |   (s.pe[i] - cast(e.embedding[i] as double))
        |   * (s.pe[i] - cast(e.embedding[i] as double)))))) as bigint) u2
        | FROM synth s CROSS JOIN embeddings e
        | GROUP BY 1
        |)
        |SELECT (SELECT cast(count(*) as bigint) FROM probes) AS m,
        | (SELECT cast(sum(w2) as bigint) FROM wmin) AS sum_w2_micro,
        | (SELECT cast(sum(u2) as bigint) FROM umin) AS sum_u2_micro,
        | cast((SELECT sum(u2) FROM umin) * 1000000
        |  // ((SELECT sum(u2) FROM umin) + (SELECT sum(w2) FROM wmin)) as bigint) AS hopkins_micro""".stripMargin,
  )
}
