package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every `queries` key has a matching `oracleSql` entry
  * (DuckDB SQL over the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs in the CALLER's session — apply the session settings our query
    * semantics assume (pandas-style coerce casts, nanos events).
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    CoreQueries.q02GoldenJoin(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.q01PricingSummary _),
    "q02_golden_join" -> (CoreQueries.q02GoldenJoin _),
    "q03_dedup_latest" -> (EtlQueries.q03DedupLatest _),
    "q04_melt" -> (EtlQueries.q04Melt _),
    "q05_merge_upsert" -> (EtlQueries.q05MergeUpsert _),
    "q06_hybrid_merge" -> (EtlQueries.q06HybridMerge _),
    "q07_trends_agg" -> (EtlQueries.q07TrendsAgg _),
    "q08_quality_checks" -> (EtlQueries.q08QualityChecks _),
    "q11_fx_normalize" -> (AnalyticsQueries.q11FxNormalize _),
    "q13_top_per_brand" -> (AnalyticsQueries.q13TopPerBrand _),
    "q14_market_share" -> (AnalyticsQueries.q14MarketShare _),
    "q15_price_history" -> (AnalyticsQueries.q15PriceHistory _),
    "q16_rolling_trend" -> (AnalyticsQueries.q16RollingTrend _),
    "q37_fx_carry_forward" -> (AnalyticsQueries.q37FxCarryForward _),
    "q09_parse_funcs" -> (ParseQueries.q09ParseFuncs _),
    "q10_category_path" -> (ParseQueries.q10CategoryPath _),
    "q12_star_split" -> (EtlQueries.q12StarSplit _),
    "q17_windowed_events" -> (StreamingQueries.q17WindowedEvents _),
    "q18_sessionize" -> (StreamingQueries.q18Sessionize _),
    "q20_dedup_exact" -> (DedupQueries.q20DedupExact _),
    "q21_ngram_jaccard" -> (DedupQueries.q21NgramJaccard _),
    "q22_minhash_lsh" -> (DedupQueries.q22MinhashLsh _),
    "q23_simhash" -> (DedupQueries.q23Simhash _),
    "q24_cosine_topk" -> (SimilarityQueries.q24CosineTopk _),
    "q25_lsh_ann" -> (SimilarityQueries.q25LshAnn _),
    "q30_multimodal" -> (SimilarityQueries.q30Multimodal _),
    "q34_shipping_priority" -> (MartQueries.q34ShippingPriority _),
    "q35_regional_volume" -> (MartQueries.q35RegionalVolume _),
    "q36_big_baskets" -> (MartQueries.q36BigBaskets _),
    "q38_cheapest_supplier" -> (MartQueries.q38CheapestSupplier _),
    "q39_top_orders_per_cust" -> (MartQueries.q39TopOrdersPerCustomer _),
    "q40_supplier_type_counts" -> (MartQueries.q40SupplierTypeCounts _),
    "q41_trends_complete" -> (EtlQueries.q41TrendsComplete _),
    "q42_bucketed_revenue" -> (MartQueries.q42BucketedRevenue _),
    "q43_star_dim" -> (EtlQueries.q43StarDim _),
    "q44_salted_priority_revenue" -> (MartQueries.q44SaltedPriorityRevenue _),
    "q33_ivf_ann" -> (IvfQueries.q33IvfAnn _),
    "q31_embedding_dedup" -> (ExtraQueries.q31EmbeddingDedup _),
    "q32_winnow_fingerprint" -> (ExtraQueries.q32WinnowFingerprint _),
    "q45_unit_vectors" -> (ExtraQueries.q45UnitVectors _),
    "q46_redacted_docs" -> (ExtraQueries.q46RedactedDocs _),
    "q47_train_split" -> (ExtraQueries.q47TrainSplit _),
    "q48_token_packs" -> (CurationQueries.q48TokenPacks _),
    "q49_top_terms" -> (CurationQueries.q49TopTerms _),
    "q50_contamination" -> (CurationQueries.q50Contamination _),
    "q51_strict_packs" -> (CurationQueries.q51StrictPacks _),
    "q52_dup_clusters" -> (DedupQueries.q52DupClusters _),
    "q53_repetition" -> (TextQueries.q53Repetition _),
    "q54_tfidf" -> (TextQueries.q54TfIdf _),
    "q55_hll_distinct" -> (ExtraQueries.q55HllDistinct _),
    "q56_asof_clicks" -> (ExtraQueries.q56AsOfClicks _),
    "q57_errors_in_sessions" -> (StreamingQueries.q57ErrorsInSessions _),
    "q58_cms_terms" -> (CurationQueries.q58CmsTerms _),
    "q59_snapshot_diff" -> (StreamingQueries.q59SnapshotDiff _),
    "q60_stratified_sample" -> (CurationQueries.q60StratifiedSample _),
    "q61_price_bands" -> (MartQueries.q61PriceBands _),
    "q62_price_quantiles" -> (MartQueries.q62PriceQuantiles _),
    "q63_segment_quantiles" -> (MartQueries.q63SegmentQuantiles _),
    "q64_orders_profile" -> (MartQueries.q64OrdersProfile _),
    "q65_dedup_pipeline" -> (DedupQueries.q65DedupPipeline _),
    "q66_zorder_keys" -> (MartQueries.q66ZorderKeys _),
    "q67_price_qty_corr" -> (MartQueries.q67PriceQtyCorrelation _),
    "q26_lang_id" -> (TextQueries.q26LangId _),
    "q27_quality_score" -> (TextQueries.q27QualityScore _),
    "q28_token_count" -> (TextQueries.q28TokenCount _),
    "q29_fingerprint" -> (TextQueries.q29Fingerprint _),
    "q68_tiki_pipeline" -> (PipelineQueries.q68TikiPipeline _),
    "q69_click_attribution" -> (StreamingQueries.q69ClickAttribution _),
    "q70_winnow_dedup" -> (ExtraQueries.q70WinnowDedup _)
  )

  /** DuckDB-runnable oracle for each query (same column names/aliases). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> CoreQueries.q01Oracle,
    "q02_golden_join" -> CoreQueries.q02Oracle,
    "q03_dedup_latest" -> EtlQueries.q03Oracle,
    "q04_melt" -> EtlQueries.q04Oracle,
    "q05_merge_upsert" -> EtlQueries.q05Oracle,
    "q06_hybrid_merge" -> EtlQueries.q06Oracle,
    "q07_trends_agg" -> EtlQueries.q07Oracle,
    "q08_quality_checks" -> EtlQueries.q08Oracle,
    "q11_fx_normalize" -> AnalyticsQueries.q11Oracle,
    "q13_top_per_brand" -> AnalyticsQueries.q13Oracle,
    "q14_market_share" -> AnalyticsQueries.q14Oracle,
    "q15_price_history" -> AnalyticsQueries.q15Oracle,
    "q16_rolling_trend" -> AnalyticsQueries.q16Oracle,
    "q37_fx_carry_forward" -> AnalyticsQueries.q37Oracle,
    "q09_parse_funcs" -> ParseQueries.q09Oracle,
    "q10_category_path" -> ParseQueries.q10Oracle,
    "q12_star_split" -> EtlQueries.q12Oracle,
    "q17_windowed_events" -> StreamingQueries.q17Oracle,
    "q18_sessionize" -> StreamingQueries.q18Oracle,
    "q20_dedup_exact" -> DedupQueries.q20Oracle,
    "q21_ngram_jaccard" -> DedupQueries.q21Oracle,
    "q22_minhash_lsh" -> DedupQueries.q22Oracle,
    "q23_simhash" -> DedupQueries.q23Oracle,
    "q24_cosine_topk" -> SimilarityQueries.q24Oracle,
    "q25_lsh_ann" -> SimilarityQueries.q25Oracle,
    "q30_multimodal" -> SimilarityQueries.q30Oracle,
    "q34_shipping_priority" -> MartQueries.q34Oracle,
    "q35_regional_volume" -> MartQueries.q35Oracle,
    "q36_big_baskets" -> MartQueries.q36Oracle,
    "q38_cheapest_supplier" -> MartQueries.q38Oracle,
    "q39_top_orders_per_cust" -> MartQueries.q39Oracle,
    "q40_supplier_type_counts" -> MartQueries.q40Oracle,
    "q41_trends_complete" -> EtlQueries.q41Oracle,
    "q42_bucketed_revenue" -> MartQueries.q42Oracle,
    "q43_star_dim" -> EtlQueries.q43Oracle,
    "q44_salted_priority_revenue" -> MartQueries.q44Oracle,
    "q33_ivf_ann" -> IvfQueries.q33Oracle,
    "q31_embedding_dedup" -> ExtraQueries.q31Oracle,
    "q32_winnow_fingerprint" -> ExtraQueries.q32Oracle,
    "q45_unit_vectors" -> ExtraQueries.q45Oracle,
    "q46_redacted_docs" -> ExtraQueries.q46Oracle,
    "q47_train_split" -> ExtraQueries.q47Oracle,
    "q48_token_packs" -> CurationQueries.q48Oracle,
    "q49_top_terms" -> CurationQueries.q49Oracle,
    "q50_contamination" -> CurationQueries.q50Oracle,
    "q51_strict_packs" -> CurationQueries.q51Oracle,
    "q52_dup_clusters" -> DedupQueries.q52Oracle,
    "q53_repetition" -> TextQueries.q53Oracle,
    "q54_tfidf" -> TextQueries.q54Oracle,
    "q55_hll_distinct" -> ExtraQueries.q55Oracle,
    "q56_asof_clicks" -> ExtraQueries.q56Oracle,
    "q57_errors_in_sessions" -> StreamingQueries.q57Oracle,
    "q58_cms_terms" -> CurationQueries.q58Oracle,
    "q59_snapshot_diff" -> StreamingQueries.q59Oracle,
    "q60_stratified_sample" -> CurationQueries.q60Oracle,
    "q61_price_bands" -> MartQueries.q61Oracle,
    "q62_price_quantiles" -> MartQueries.q62Oracle,
    "q63_segment_quantiles" -> MartQueries.q63Oracle,
    "q64_orders_profile" -> MartQueries.q64Oracle,
    "q65_dedup_pipeline" -> DedupQueries.q65Oracle,
    "q66_zorder_keys" -> MartQueries.q66Oracle,
    "q67_price_qty_corr" -> MartQueries.q67Oracle,
    "q26_lang_id" -> TextQueries.q26Oracle,
    "q27_quality_score" -> TextQueries.q27Oracle,
    "q28_token_count" -> TextQueries.q28Oracle,
    "q29_fingerprint" -> TextQueries.q29Oracle,
    "q68_tiki_pipeline" -> PipelineQueries.q68Oracle,
    "q69_click_attribution" -> StreamingQueries.q69Oracle,
    "q70_winnow_dedup" -> ExtraQueries.q70Oracle
  )
}
