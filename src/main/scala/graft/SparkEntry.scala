package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{ExtOracleSql, ExtQueries}
import graft.queries.{BiQueries, Merged, OperatorQueries, OracleSql}
import graft.sinks.Sinks

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here with a
  * DuckDB oracle twin; the driver runs both at sf0.01 and hash-compares
  * (column names must match exactly between the two dialects — the compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.3): revenue + gross margin by financial
    * month over the full cleaned star join at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    BiQueries.revenueByMonth(Merged.cleanedShared(spark, "/root/testdata/sf0.001"))

  /** The `SPARK_GRAFT_ONLY` match rule — exact key, or prefix up to an
    * underscore ("t1" selects t1_token_stats, never t10..t19) — the ONE
    * definition shared by Bench's selection, Verify's dump filter, and
    * [[fewQueryRun]], so the three consumers cannot drift.
    */
  private[graft] def keyMatcher(onlySpec: String): String => Boolean = {
    val names = onlySpec.split(",").map(_.trim).filter(_.nonEmpty).toSet
    k => names.exists(n => k == n || k.startsWith(n + "_"))
  }

  private[graft] def selectedKeyCount(onlySpec: String): Int =
    queries.keySet.count(keyMatcher(onlySpec))

  /** True when this JVM was launched to run at most two queries
    * (`SPARK_GRAFT_ONLY` narrows the selection — local iteration,
    * one-shot debugging).
    */
  private[graft] lazy val fewQueryRun: Boolean =
    sys.env.get("SPARK_GRAFT_ONLY").exists(selectedKeyCount(_) <= 2)

  /** The cleaned star join the BI/P14 entries consume. A full session
    * reuses it ~12×, so it is memoized and pinned
    * ([[Merged.cleanedShared]]); a run narrowed to ≤2 queries takes the
    * declarative [[Merged.cleaned]] instead — the memo materializes the
    * full ~40-column union frame, which a one-shot 3-column query must
    * not pay for (per-query scan pruning is the 100-TB-correct plan
    * when there is nothing to amortize the memo across).
    */
  private def biBase(s: SparkSession, dir: String): DataFrame =
    if (fewQueryRun) Merged.cleaned(s, dir) else Merged.cleanedShared(s, dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BI aggregations over the cleaned merged frame (SURVEY §2.5-2.7)
    "q1_revenue_by_month" -> ((s, dir) =>
      BiQueries.revenueByMonth(biBase(s, dir))),
    "q1b_gm_join" -> ((s, dir) =>
      BiQueries.revenueByMonthJoined(biBase(s, dir))),
    "q2_top_products" -> ((s, dir) =>
      BiQueries.topProducts(biBase(s, dir))),
    "q3_sales_region_brand" -> ((s, dir) =>
      BiQueries.salesByRegionBrand(biBase(s, dir))),
    "q4_ar_by_region" -> ((s, dir) =>
      BiQueries.arByRegion(biBase(s, dir))),
    "q5_summary" -> ((s, dir) =>
      BiQueries.summary(biBase(s, dir))),
    // Cleaning / metric / projection operator demos (SURVEY §2.2)
    "p3_null_normalize" -> OperatorQueries.nullNormalizeDemo _,
    "p4_cast_coerce" -> OperatorQueries.castCoerceDemo _,
    "p5_date_parse" -> OperatorQueries.dateParseDemo _,
    "p6_event_date" -> OperatorQueries.eventDateDemo _,
    "p11_quality_flags" -> OperatorQueries.qualityFlagsDemo _,
    "p12_quality_filter" -> OperatorQueries.qualityFilterDemo _,
    "p13_display_name" -> OperatorQueries.displayNameDemo _,
    // P14 collection projections (SURVEY §2.1 S6 / §2.2 P14)
    "p14_sales_lines" -> ((s, dir) =>
      Sinks.projectCollection(biBase(s, dir), Sinks.SalesLinesColumns)),
    "p14_receivables" -> ((s, dir) =>
      Sinks.projectCollection(biBase(s, dir), Sinks.ReceivablesColumns)),
    "p14_payments" -> ((s, dir) =>
      Sinks.projectCollection(biBase(s, dir), Sinks.PaymentsColumns)),
    // Fiscal calendar (SURVEY §2.4) — the cross-dialect parity queries
    "c4_fincal_columns" -> OperatorQueries.fincalColumns _,
    "c7_fincal_null_labels" -> OperatorQueries.fincalNullLabels _,
    "c8_fin_week_rollup" -> OperatorQueries.finWeekRollup _,
    // LLM-data-pipeline extensions (north star): dedup, text analysis,
    // similarity search, multimodal plumbing, stream windows
    "d1_exact_dedup" -> ExtQueries.exactDedup _,
    "d2_minhash_lsh_pairs" -> ExtQueries.minHashLshPairs _,
    "d3_simhash_fingerprints" -> ExtQueries.simHashFingerprints _,
    "d4_jaccard_ground_truth" -> ExtQueries.jaccardGroundTruth _,
    "d5_dedup_clusters" -> ExtQueries.dedupClusters _,
    "d6_dedup_survivors" -> ExtQueries.dedupSurvivors _,
    "d7_dedup_dropped" -> ExtQueries.dedupDropped _,
    "d8_decontamination" -> ExtQueries.decontamination _,
    "d9_incremental_dedup" -> ExtQueries.incrementalDedup _,
    "d10_containment" -> ExtQueries.containmentDups _,
    "d11_semantic_clusters" -> ExtQueries.semanticClusters _,
    "d12_best_keeper" -> ExtQueries.bestKeeperClusters _,
    "t18_domain_mixture" -> ExtQueries.domainMixture _,
    "t19_boilerplate_ngrams" -> ExtQueries.boilerplateNgrams _,
    "t20_stratified_sample" -> ExtQueries.stratifiedSample _,
    "t21_domain_quota" -> ExtQueries.domainQuota _,
    "t22_train_order" -> ExtQueries.trainOrder _,
    "t23_contamination_split" -> ExtQueries.contaminationSplit _,
    "t1_token_stats" -> ExtQueries.tokenStats _,
    "t2_lang_stats" -> ExtQueries.langStats _,
    "t3_quality_scores" -> ExtQueries.qualityScores _,
    "t4_lang_id" -> ExtQueries.langId _,
    "t5_fingerprints" -> ExtQueries.fingerprints _,
    "t6_bpe_token_counts" -> ExtQueries.bpeTokenCounts _,
    "t7_winnowing_sketch" -> ExtQueries.winnowingSketch _,
    "t8_nfc_fingerprints" -> ExtQueries.nfcFingerprints _,
    "t9_train_test_split" -> ExtQueries.trainTestSplit _,
    "t10_char_percentiles" -> ExtQueries.charPercentiles _,
    "t11_doc_chunks" -> ExtQueries.docChunks _,
    "t12_sequence_packing" -> ExtQueries.sequencePacking _,
    "t13_top_tokens" -> ExtQueries.topTokens _,
    "t14_tfidf_terms" -> ExtQueries.tfIdfTerms _,
    "t15_pii_scrub" -> ExtQueries.piiScrub _,
    "t16_repetition" -> ExtQueries.repetitionStats _,
    "t17_quality_gate" -> ExtQueries.qualityGate _,
    "t24_kmv_cardinality" -> ExtQueries.kmvCardinality _,
    "t25_unigram_logprob" -> ExtQueries.unigramLogprob _,
    "t26_temperature_resample" -> ExtQueries.temperatureResample _,
    "t27_cms_heavy_hitters" -> ExtQueries.cmsHeavyHitters _,
    "t28_segment_dedup" -> ExtQueries.segmentDedup _,
    "t29_bm25_topk" -> ExtQueries.bm25Search _,
    "t54_hybrid_rrf" -> ExtQueries.hybridSearch _,
    "t55_duplicate_spans" -> ExtQueries.duplicateSpans _,
    "t30_bloom_decontamination" -> ExtQueries.bloomDecontamination _,
    "t31_bigram_logprob" -> ExtQueries.bigramLogprob _,
    "t32_hashed_classifier" -> ExtQueries.hashedClassifier _,
    "t33_weighted_classifier" -> ExtQueries.weightedClassifier _,
    "t34_pii_redact" -> ExtQueries.piiRedact _,
    "t35_gopher_rules" -> ExtQueries.gopherRules _,
    "t36_bpe_encode" -> ExtQueries.bpeEncode _,
    "t37_corpus_diff" -> ExtQueries.corpusDiff _,
    "t38_diff_severity" -> ExtQueries.diffSeverity _,
    "t39_source_report" -> ExtQueries.sourceReport _,
    "t40_domain_stats" -> ExtQueries.domainStats _,
    "t41_blocklist_filter" -> ExtQueries.blocklistFilter _,
    "t42_curation_pipeline" -> ExtQueries.curationPipeline _,
    "t43_quality_budget" -> ExtQueries.qualityBudget _,
    "t45_url_dedup" -> ExtQueries.urlDedup _,
    "t46_weighted_sample" -> ExtQueries.weightedSample _,
    "t47_source_entropy" -> ExtQueries.sourceEntropy _,
    "t48_stratified_sample" -> ExtQueries.stratifiedWeighted _,
    "t49_repeated_ngrams" -> ExtQueries.repeatedNgrams _,
    "t50_lsh_tuning" -> ExtQueries.lshTuning _,
    "t51_bpe_fertility" -> ExtQueries.bpeFertility _,
    "t52_dsir_weights" -> ExtQueries.dsirWeights _,
    "t53_source_overlap" -> ExtQueries.sourceOverlap _,
    "s1_cosine_topk" -> ExtQueries.cosineTopK _,
    "s2_embedding_near_dups" -> ExtQueries.embeddingNearDups _,
    "s3_lang_centroids" -> ExtQueries.langCentroids _,
    "s4_lsh_near_dups" -> ExtQueries.lshEmbeddingNearDups _,
    "s5_quantized_vectors" -> ExtQueries.quantizedVectors _,
    "s6_incremental_embedding_dedup" -> ExtQueries.incrementalEmbeddingDedup _,
    "s7_embedding_outliers" -> ExtQueries.embeddingOutliers _,
    "s8_mips_topk" -> ExtQueries.mipsTopK _,
    "s9_ivf_topk" -> ExtQueries.ivfTopK _,
    "s10_centroid_drift" -> ExtQueries.centroidDrift _,
    "v1_column_profile" -> ExtQueries.columnProfile _,
    "v2_ref_integrity" -> ExtQueries.refIntegrity _,
    "v3_constraint_audit" -> ExtQueries.constraintAudit _,
    "v4_key_uniqueness" -> ExtQueries.keyUniqueness _,
    "m1_media_metadata" -> ExtQueries.mediaMetadata _,
    "m2_media_frames" -> ExtQueries.mediaFrames _,
    "m3_media_dedup" -> ExtQueries.mediaDedup _,
    "m4_media_chunk_dedup" -> ExtQueries.mediaChunkDedup _,
    "m5_media_near_dups" -> ExtQueries.mediaNearDups _,
    "w1_hourly_by_type" -> ExtQueries.hourlyByType _,
    "w2_sliding_hourly" -> ExtQueries.slidingHourly _,
    "w3_user_sessions" -> ExtQueries.userSessions _,
    "w4_click_funnel" -> ExtQueries.clickFunnel _,
    "w5_funnel_transitions" -> ExtQueries.funnelTransitions _,
    "w6_trending" -> ExtQueries.trendingByWindow _,
    "w7_attribution_join" -> ExtQueries.attributionJoin _,
    "x27_attribution_credit" -> ExtQueries.attributionCredit _,
    "x28_price_delay_corr" -> ExtQueries.priceDelayCorr _,
    "x29_modal_hour" -> ExtQueries.modalHour _,
    "x1_salted_revenue" -> ExtQueries.saltedRevenue _,
    "x2_range_join" -> ExtQueries.rangeJoinAttribution _,
    "x3_asof_join" -> ExtQueries.asOfJoin _,
    "x4_rollup_sales" -> ExtQueries.rollupSales _,
    "x5_moving_avg_revenue" -> ExtQueries.movingAvgRevenue _,
    "x6_pivot_regions" -> ExtQueries.pivotRegions _,
    "x7_unpivot_regions" -> ExtQueries.unpivotRegions _,
    "x8_cube_sales" -> ExtQueries.cubeSales _,
    "x9_set_ops_users" -> ExtQueries.setOpsUsers _,
    "x10_hourly_anomalies" -> ExtQueries.hourlyAnomalies _,
    "x11_price_histogram" -> ExtQueries.priceHistogram _,
    "x12_retention_cohorts" -> ExtQueries.retentionCohorts _,
    "x13_price_quantiles" -> ExtQueries.priceQuantiles _,
    "x14_props_rollup" -> ExtQueries.propsRollup _,
    "x15_scd2_intervals" -> ExtQueries.scd2Intervals _,
    "x35_cdc_apply" -> ExtQueries.cdcApply _,
    "x16_drift_psi" -> ExtQueries.driftPsi _,
    "x17_key_skew" -> ExtQueries.keySkew _,
    "x18_fuzzy_linkage" -> ExtQueries.fuzzyLinkage _,
    "x19_bloom_join" -> ExtQueries.bloomJoin _,
    "x20_pagerank" -> ExtQueries.pageRank _,
    "x30_hits" -> ExtQueries.hitsScores _,
    "x31_triangles" -> ExtQueries.triangleStats _,
    "x32_concurrency" -> ExtQueries.concurrency _,
    "x33_trustrank" -> ExtQueries.trustRank _,
    "x34_label_propagation" -> ExtQueries.labelPropagation _,
    "x36_basket_rules" -> ExtQueries.basketRules _,
    "x37_pareto_parts" -> ExtQueries.paretoParts _,
    "x38_khop_reach" -> ExtQueries.kHopReach _,
    "x39_rfm_segments" -> ExtQueries.rfmSegments _,
    "t56_zipf_fit" -> ExtQueries.zipfFit _,
    "s11_knn_classify" -> ExtQueries.knnClassify _,
    "x40_ab_test" -> ExtQueries.abTest _,
    "s12_bucket_purity" -> ExtQueries.bucketPurity _,
    "x41_top_journeys" -> ExtQueries.topJourneys _,
    "s13_ivf_recall" -> ExtQueries.ivfRecall _,
    "v6_benford" -> ExtQueries.benford _,
    "x42_cohort_ltv" -> ExtQueries.cohortLtv _,
    "t57_langid_confusion" -> ExtQueries.langIdConfusion _,
    "x43_clamped_balance" -> ExtQueries.clampedBalance _,
    "x44_interval_coverage" -> ExtQueries.intervalCoverage _,
    "v7_fd_audit" -> ExtQueries.fdAudit _,
    "x45_conversion_latency" -> ExtQueries.conversionLatency _,
    "x21_incremental_rollup" -> ExtQueries.incrementalRollup _,
    "x22_join_estimate" -> ExtQueries.joinEstimate _,
    "x23_equal_freq_bins" -> ExtQueries.equalFreqBins _,
    "x24_zscore_events" -> ExtQueries.zscoreEvents _,
    "x26_robust_outliers" -> ExtQueries.robustOutliers _,
    "v5_k_anonymity" -> ExtQueries.kAnonymity _,
    // spec-gated (no DuckDB zlib): rows-only check by design
    "t44_compression_stats" -> ExtQueries.compressionStats _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_revenue_by_month" -> OracleSql.q1RevenueByMonth,
    "q1b_gm_join" -> OracleSql.q1bGmJoin,
    "q2_top_products" -> OracleSql.q2TopProducts,
    "q3_sales_region_brand" -> OracleSql.q3SalesByRegionBrand,
    "q4_ar_by_region" -> OracleSql.q4ArByRegion,
    "q5_summary" -> OracleSql.q5Summary,
    "p3_null_normalize" -> OracleSql.p3NullNormalize,
    "p4_cast_coerce" -> OracleSql.p4CastCoerce,
    "p5_date_parse" -> OracleSql.p5DateParse,
    "p6_event_date" -> OracleSql.p6EventDate,
    "p11_quality_flags" -> OracleSql.p11QualityFlags,
    "p12_quality_filter" -> OracleSql.p12QualityFilter,
    "p13_display_name" -> OracleSql.p13DisplayName,
    "p14_sales_lines" -> OracleSql.p14SalesLines,
    "p14_receivables" -> OracleSql.p14Receivables,
    "p14_payments" -> OracleSql.p14Payments,
    "c4_fincal_columns" -> OracleSql.c4FincalColumns,
    "c7_fincal_null_labels" -> OracleSql.c7FincalNullLabels,
    "c8_fin_week_rollup" -> OracleSql.c8FinWeekRollup,
    "d1_exact_dedup" -> ExtOracleSql.d1ExactDedup,
    "d2_minhash_lsh_pairs" -> ExtOracleSql.d2MinHashLshPairs,
    "d3_simhash_fingerprints" -> ExtOracleSql.d3SimHashFingerprints,
    "d4_jaccard_ground_truth" -> ExtOracleSql.d4JaccardGroundTruth,
    "d5_dedup_clusters" -> ExtOracleSql.d5DedupClusters,
    "d6_dedup_survivors" -> ExtOracleSql.d6DedupSurvivors,
    "d7_dedup_dropped" -> ExtOracleSql.d7DedupDropped,
    "d8_decontamination" -> ExtOracleSql.d8Decontamination,
    "d9_incremental_dedup" -> ExtOracleSql.d9IncrementalDedup,
    "d10_containment" -> ExtOracleSql.d10Containment,
    "d11_semantic_clusters" -> ExtOracleSql.d11SemanticClusters,
    "d12_best_keeper" -> ExtOracleSql.d12BestKeeper,
    "t18_domain_mixture" -> ExtOracleSql.t18DomainMixture,
    "t19_boilerplate_ngrams" -> ExtOracleSql.t19Boilerplate,
    "t20_stratified_sample" -> ExtOracleSql.t20StratifiedSample,
    "t21_domain_quota" -> ExtOracleSql.t21DomainQuota,
    "t22_train_order" -> ExtOracleSql.t22TrainOrder,
    "t23_contamination_split" -> ExtOracleSql.t23ContaminationSplit,
    "t1_token_stats" -> ExtOracleSql.t1TokenStats,
    "t2_lang_stats" -> ExtOracleSql.t2LangStats,
    "t3_quality_scores" -> ExtOracleSql.t3QualityScores,
    "t4_lang_id" -> ExtOracleSql.t4LangId,
    "t5_fingerprints" -> ExtOracleSql.t5Fingerprints,
    "t6_bpe_token_counts" -> ExtOracleSql.t6BpeTokenCounts,
    "t7_winnowing_sketch" -> ExtOracleSql.t7WinnowingSketch,
    "t8_nfc_fingerprints" -> ExtOracleSql.t8NfcFingerprints,
    "t9_train_test_split" -> ExtOracleSql.t9TrainTestSplit,
    "t10_char_percentiles" -> ExtOracleSql.t10CharPercentiles,
    "t11_doc_chunks" -> ExtOracleSql.t11DocChunks,
    "t12_sequence_packing" -> ExtOracleSql.t12SequencePacking,
    "t13_top_tokens" -> ExtOracleSql.t13TopTokens,
    "t14_tfidf_terms" -> ExtOracleSql.t14TfIdfTerms,
    "t15_pii_scrub" -> ExtOracleSql.t15PiiScrub,
    "t16_repetition" -> ExtOracleSql.t16Repetition,
    "t17_quality_gate" -> ExtOracleSql.t17QualityGate,
    "t24_kmv_cardinality" -> ExtOracleSql.t24KmvCardinality,
    "t25_unigram_logprob" -> ExtOracleSql.t25UnigramLogprob,
    "t26_temperature_resample" -> ExtOracleSql.t26TemperatureResample,
    "t27_cms_heavy_hitters" -> ExtOracleSql.t27CmsHeavyHitters,
    "t28_segment_dedup" -> ExtOracleSql.t28SegmentDedup,
    "t29_bm25_topk" -> ExtOracleSql.t29Bm25TopK,
    "t54_hybrid_rrf" -> ExtOracleSql.t54HybridRrf,
    "t55_duplicate_spans" -> ExtOracleSql.t55DuplicateSpans,
    "t30_bloom_decontamination" -> ExtOracleSql.t30BloomDecontamination,
    "t31_bigram_logprob" -> ExtOracleSql.t31BigramLogprob,
    "t32_hashed_classifier" -> ExtOracleSql.t32HashedClassifier,
    "t33_weighted_classifier" -> ExtOracleSql.t33WeightedClassifier,
    "t34_pii_redact" -> ExtOracleSql.t34PiiRedact,
    "t35_gopher_rules" -> ExtOracleSql.t35GopherRules,
    "t36_bpe_encode" -> ExtOracleSql.t36BpeEncode,
    "t37_corpus_diff" -> ExtOracleSql.t37CorpusDiff,
    "t38_diff_severity" -> ExtOracleSql.t38DiffSeverity,
    "t39_source_report" -> ExtOracleSql.t39SourceReport,
    "t40_domain_stats" -> ExtOracleSql.t40DomainStats,
    "t41_blocklist_filter" -> ExtOracleSql.t41BlocklistFilter,
    "t42_curation_pipeline" -> ExtOracleSql.t42CurationPipeline,
    "t43_quality_budget" -> ExtOracleSql.t43QualityBudget,
    "s1_cosine_topk" -> ExtOracleSql.s1CosineTopK,
    "s2_embedding_near_dups" -> ExtOracleSql.s2EmbeddingNearDups,
    "s3_lang_centroids" -> ExtOracleSql.s3LangCentroids,
    "s4_lsh_near_dups" -> ExtOracleSql.s4LshNearDups,
    "s5_quantized_vectors" -> ExtOracleSql.s5QuantizedVectors,
    "s6_incremental_embedding_dedup" ->
      ExtOracleSql.s6IncrementalEmbeddingDedup,
    "s7_embedding_outliers" -> ExtOracleSql.s7EmbeddingOutliers,
    "s8_mips_topk" -> ExtOracleSql.s8MipsTopK,
    "s9_ivf_topk" -> ExtOracleSql.s9IvfTopK,
    "s10_centroid_drift" -> ExtOracleSql.s10CentroidDrift,
    "v1_column_profile" -> ExtOracleSql.v1ColumnProfile,
    "v2_ref_integrity" -> ExtOracleSql.v2RefIntegrity,
    "v3_constraint_audit" -> ExtOracleSql.v3ConstraintAudit,
    "v4_key_uniqueness" -> ExtOracleSql.v4KeyUniqueness,
    "m1_media_metadata" -> ExtOracleSql.m1MediaMetadata,
    "m2_media_frames" -> ExtOracleSql.m2MediaFrames,
    "m3_media_dedup" -> ExtOracleSql.m3MediaDedup,
    "m4_media_chunk_dedup" -> ExtOracleSql.m4MediaChunkDedup,
    "m5_media_near_dups" -> ExtOracleSql.m5MediaNearDups,
    "w1_hourly_by_type" -> ExtOracleSql.w1HourlyByType,
    "w2_sliding_hourly" -> ExtOracleSql.w2SlidingHourly,
    "w3_user_sessions" -> ExtOracleSql.w3UserSessions,
    "w4_click_funnel" -> ExtOracleSql.w4ClickFunnel,
    "w5_funnel_transitions" -> ExtOracleSql.w5FunnelTransitions,
    "w6_trending" -> ExtOracleSql.w6Trending,
    "w7_attribution_join" -> ExtOracleSql.w7AttributionJoin,
    "x27_attribution_credit" -> ExtOracleSql.x27AttributionCredit,
    "x28_price_delay_corr" -> ExtOracleSql.x28PriceDelayCorr,
    "x29_modal_hour" -> ExtOracleSql.x29ModalHour,
    "x1_salted_revenue" -> ExtOracleSql.x1SaltedRevenue,
    "x2_range_join" -> ExtOracleSql.x2RangeJoinAttribution,
    "x3_asof_join" -> ExtOracleSql.x3AsOfJoin,
    "x4_rollup_sales" -> ExtOracleSql.x4RollupSales,
    "x5_moving_avg_revenue" -> ExtOracleSql.x5MovingAvgRevenue,
    "x6_pivot_regions" -> ExtOracleSql.x6PivotRegions,
    "x7_unpivot_regions" -> ExtOracleSql.x7UnpivotRegions,
    "x8_cube_sales" -> ExtOracleSql.x8CubeSales,
    "x9_set_ops_users" -> ExtOracleSql.x9SetOpsUsers,
    "x10_hourly_anomalies" -> ExtOracleSql.x10HourlyAnomalies,
    "x11_price_histogram" -> ExtOracleSql.x11PriceHistogram,
    "x12_retention_cohorts" -> ExtOracleSql.x12RetentionCohorts,
    "x13_price_quantiles" -> ExtOracleSql.x13PriceQuantiles,
    "x14_props_rollup" -> ExtOracleSql.x14PropsRollup,
    "x15_scd2_intervals" -> ExtOracleSql.x15Scd2Intervals,
    "x35_cdc_apply" -> ExtOracleSql.x35CdcApply,
    "x16_drift_psi" -> ExtOracleSql.x16DriftPsi,
    "x17_key_skew" -> ExtOracleSql.x17KeySkew,
    "x18_fuzzy_linkage" -> ExtOracleSql.x18FuzzyLinkage,
    "t45_url_dedup" -> ExtOracleSql.t45UrlDedup,
    "t46_weighted_sample" -> ExtOracleSql.t46WeightedSample,
    "t47_source_entropy" -> ExtOracleSql.t47SourceEntropy,
    "t48_stratified_sample" -> ExtOracleSql.t48StratifiedSample,
    "t49_repeated_ngrams" -> ExtOracleSql.t49RepeatedNgrams,
    "t50_lsh_tuning" -> ExtOracleSql.t50LshTuning,
    "t51_bpe_fertility" -> ExtOracleSql.t51BpeFertility,
    "t52_dsir_weights" -> ExtOracleSql.t52DsirWeights,
    "t53_source_overlap" -> ExtOracleSql.t53SourceOverlap,
    "x19_bloom_join" -> ExtOracleSql.x19BloomJoin,
    "x20_pagerank" -> ExtOracleSql.x20PageRank,
    "x30_hits" -> ExtOracleSql.x30Hits,
    "x31_triangles" -> ExtOracleSql.x31Triangles,
    "x32_concurrency" -> ExtOracleSql.x32Concurrency,
    "x33_trustrank" -> ExtOracleSql.x33TrustRank,
    "x34_label_propagation" -> ExtOracleSql.x34LabelPropagation,
    "x36_basket_rules" -> ExtOracleSql.x36BasketRules,
    "x37_pareto_parts" -> ExtOracleSql.x37ParetoParts,
    "x38_khop_reach" -> ExtOracleSql.x38KhopReach,
    "x39_rfm_segments" -> ExtOracleSql.x39RfmSegments,
    "t56_zipf_fit" -> ExtOracleSql.t56ZipfFit,
    "s11_knn_classify" -> ExtOracleSql.s11KnnClassify,
    "x40_ab_test" -> ExtOracleSql.x40AbTest,
    "s12_bucket_purity" -> ExtOracleSql.s12BucketPurity,
    "x41_top_journeys" -> ExtOracleSql.x41TopJourneys,
    "s13_ivf_recall" -> ExtOracleSql.s13IvfRecall,
    "v6_benford" -> ExtOracleSql.v6Benford,
    "x42_cohort_ltv" -> ExtOracleSql.x42CohortLtv,
    "t57_langid_confusion" -> ExtOracleSql.t57LangIdConfusion,
    "x43_clamped_balance" -> ExtOracleSql.x43ClampedBalance,
    "x44_interval_coverage" -> ExtOracleSql.x44IntervalCoverage,
    "v7_fd_audit" -> ExtOracleSql.v7FdAudit,
    "x45_conversion_latency" -> ExtOracleSql.x45ConversionLatency,
    "x21_incremental_rollup" -> ExtOracleSql.x21IncrementalRollup,
    "x22_join_estimate" -> ExtOracleSql.x22JoinEstimate,
    "x23_equal_freq_bins" -> ExtOracleSql.x23EqualFreqBins,
    "x24_zscore_events" -> ExtOracleSql.x24ZscoreEvents,
    "x26_robust_outliers" -> ExtOracleSql.x26RobustOutliers,
    "v5_k_anonymity" -> ExtOracleSql.v5KAnonymity
  )
}
