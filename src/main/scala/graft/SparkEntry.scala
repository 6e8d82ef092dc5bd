package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/pattern from SURVEY.md §2,
  * built with the DataFrame API; [[oracleSql]] carries the equivalent ANSI
  * SQL the driver runs in DuckDB over the same parquet tables. Column names
  * are aliased identically on both sides (the driver sorts columns by name
  * before hashing). Queries without an oracle entry are non-SQL-expressible
  * (hash/sketch-based) and get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregations
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "q12_grouping_sets" -> (AggQueries.q12GroupingSets _),
    "q13_distinct_aggs" -> (AggQueries.q13DistinctAggs _),
    "q14_argminmax" -> (AggQueries.q14ArgMinMax _),
    "q15_stats" -> (AggQueries.q15Stats _),
    // §2.3 joins / §2.11 set ops
    "q3_revenue_by_region_month" -> (JoinQueries.q3RevenueByRegionMonth _),
    "q4_segments_with_orders" -> (JoinQueries.q4SegmentsWithOrders _),
    "q5_customers_no_orders" -> (JoinQueries.q5CustomersNoOrders _),
    "q6_full_outer_daily" -> (JoinQueries.q6FullOuterDaily _),
    "q7_priority_region_matrix" -> (JoinQueries.q7PriorityRegionMatrix _),
    "q25_asof_view_before_purchase" -> (JoinQueries.q25AsofViewBeforePurchase _),
    "q26_union_counts" -> (JoinQueries.q26UnionCounts _),
    "q27_quantity_bands" -> (JoinQueries.q27QuantityBands _),
    // §2.5 windows
    "q2_latest_order_per_customer" -> (WindowQueries.q2LatestOrderPerCustomer _),
    "q8_event_gaps" -> (WindowQueries.q8EventGaps _),
    "q9_sessions" -> (WindowQueries.q9Sessions _),
    "q10_rolling_revenue" -> (WindowQueries.q10RollingRevenue _),
    "q11_retention_flags" -> (WindowQueries.q11RetentionFlags _),
    "q16_first_last_per_user" -> (WindowQueries.q16FirstLastPerUser _),
    "q28_revenue_share" -> (WindowQueries.q28RevenueShare _),
    // §2.6 generators / §2.7 scalar families / §2.8 functions
    "q17_date_spine" -> (ScalarQueries.q17DateSpine _),
    "q18_word_pairs" -> (ScalarQueries.q18WordPairs _),
    "q19_strings" -> (ScalarQueries.q19Strings _),
    "q20_datetime" -> (ScalarQueries.q20Datetime _),
    "q21_json" -> (ScalarQueries.q21Json _),
    "q22_array_hof" -> (ScalarQueries.q22ArrayHof _),
    "q23_map_struct" -> (ScalarQueries.q23MapStruct _),
    "q24_msk_dates" -> (ScalarQueries.q24MskDates _),
    // §2.9 dbt-runtime engine end-to-end (DAG + incremental insert_overwrite)
    "q30_gold_orders_pipeline" -> (PipelineQueries.q30GoldOrdersPipeline _),
    // north star: dedup / text analysis / similarity / multimodal
    "q31_dedup_exact" -> (NorthStarQueries.q31DedupExact _),
    "q32_ngram_jaccard" -> (NorthStarQueries.q32NgramJaccard _),
    "q33_minhash_lsh" -> (NorthStarQueries.q33MinhashLsh _),
    "q34_simhash_neardup" -> (NorthStarQueries.q34SimhashNearDup _),
    "q35_text_stats" -> (NorthStarQueries.q35TextStats _),
    "q36_lang_profile" -> (NorthStarQueries.q36LangProfile _),
    "q37_fingerprint" -> (NorthStarQueries.q37Fingerprint _),
    "q38_ann_brute_topk" -> (NorthStarQueries.q38AnnBruteTopK _),
    "q39_ann_ivf" -> (NorthStarQueries.q39AnnIvf _),
    "q40_embed_neardup" -> (NorthStarQueries.q40EmbedNearDup _),
    "q41_multimodal" -> (NorthStarQueries.q41Multimodal _),
    // remaining §2 inventory coverage
    "q42_predicates" -> (CoverageQueries.q42Predicates _),
    "q43_generators" -> (CoverageQueries.q43Generators _),
    "q44_scalar_misc" -> (CoverageQueries.q44ScalarMisc _),
    "q45_window_first_last" -> (CoverageQueries.q45WindowFirstLast _),
    "q46_struct_json_extras" -> (CoverageQueries.q46StructJsonExtras _),
    "q47_sql_text_model" -> (CoverageQueries.q47SqlTextModel _),
    "q48_approx_distinct" -> (CoverageQueries.q48ApproxDistinct _),
    // §2.8 parameterized model-template macro, two instantiations
    "q49_active_users_retention" -> (graft.models.ActiveRetention.activeUsers _),
    "q50_active_devices_retention" -> (graft.models.ActiveRetention.activeDevices _),
    "q51_nested_mongo" -> (CoverageQueries.q51NestedMongo _),
    "q52_wilson_ci" -> (CoverageQueries.q52WilsonCi _),
    "q53_scd2_pipeline" -> (Scd2Queries.q53Scd2Pipeline _),
    "q54_conditionals" -> (CoverageQueries.q54Conditionals _),
    "q55_rollup_cube" -> (AggQueries.q55RollupCube _),
    "q56_ann_lsh_neardup" -> (NorthStarQueries.q56AnnLshNearDup _),
    "q57_funnel" -> (FunnelQueries.q57Funnel _),
    // §2.4/§2.5 gap closers + templater/model-port + new engine gates (round 3)
    "q58_funnel_ranking" -> (RankQueries.q58FunnelRanking _),
    "q59_onfy_sessions" -> (TemplaterQueries.q59OnfySessions _),
    "q60_scd2_check" -> (Scd2Queries.q60Scd2Check _),
    "q61_interval_frame" -> (WindowQueries.q61IntervalFrame _),
    "q62_append_overwrite" -> (PipelineQueries.q62AppendOverwrite _),
    "q63_active_devices" -> (TemplaterQueries.q63ActiveDevices _),
    "q64_skew_join" -> (JoinQueries.q64SkewJoin _),
    "q65_seed_join" -> (PipelineQueries.q65SeedJoin _),
    "q66_schema_evolution" -> (PipelineQueries.q66SchemaEvolution _),
    "q67_bucketed_join" -> (JoinQueries.q67BucketedJoin _),
    "q68_funnel_rank" -> (TemplaterQueries.q68FunnelRank _),
    "q69_pivot" -> (AggQueries.q69Pivot _),
    "q70_window_ranks" -> (WindowQueries.q70WindowRanks _),
    "q71_status_matrix" -> (TemplaterQueries.q71StatusMatrix _),
    "q72_orders_wide" -> (GoldOrdersWide.q72OrdersWide _),
    // round 5: MERGE-equivalent bucket-pruned snapshot; dup-group closure
    "q73_scd2_bucketed" -> (Scd2Queries.q73Scd2Bucketed _),
    "q74_campaign_funnels" -> (CampaignFunnels.q74CampaignFunnels _),
    "q75_dup_groups" -> (NorthStarQueries.q75DupGroups _),
    // round 5 cont.: Delta-MERGE-parity upsert; deterministic split; for-loop templating
    "q76_incremental_merge" -> (MergeQueries.q76IncrementalMerge _),
    "q77_train_split" -> (NorthStarQueries.q77TrainSplit _),
    "q78_event_matrix" -> (TemplaterQueries.q78EventMatrix _),
    "q79_setops" -> (JoinQueries.q79SetOps _),
    "q80_snapshot_file" -> (Scd2Queries.q80SnapshotFile _),
    // round 10: transaction-log table format (Delta-log stand-in)
    "q81_txlog_pipeline" -> (TxLogQueries.q81TxLogPipeline _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> CoreQueries.q1OracleSql,
    "q12_grouping_sets" -> AggQueries.q12Oracle,
    "q13_distinct_aggs" -> AggQueries.q13Oracle,
    "q14_argminmax" -> AggQueries.q14Oracle,
    "q15_stats" -> AggQueries.q15Oracle,
    "q3_revenue_by_region_month" -> JoinQueries.q3Oracle,
    "q4_segments_with_orders" -> JoinQueries.q4Oracle,
    "q5_customers_no_orders" -> JoinQueries.q5Oracle,
    "q6_full_outer_daily" -> JoinQueries.q6Oracle,
    "q7_priority_region_matrix" -> JoinQueries.q7Oracle,
    "q25_asof_view_before_purchase" -> JoinQueries.q25Oracle,
    "q26_union_counts" -> JoinQueries.q26Oracle,
    "q27_quantity_bands" -> JoinQueries.q27Oracle,
    "q2_latest_order_per_customer" -> WindowQueries.q2Oracle,
    "q8_event_gaps" -> WindowQueries.q8Oracle,
    "q9_sessions" -> WindowQueries.q9Oracle,
    "q10_rolling_revenue" -> WindowQueries.q10Oracle,
    "q11_retention_flags" -> WindowQueries.q11Oracle,
    "q16_first_last_per_user" -> WindowQueries.q16Oracle,
    "q28_revenue_share" -> WindowQueries.q28Oracle,
    "q17_date_spine" -> ScalarQueries.q17Oracle,
    "q18_word_pairs" -> ScalarQueries.q18Oracle,
    "q19_strings" -> ScalarQueries.q19Oracle,
    "q20_datetime" -> ScalarQueries.q20Oracle,
    "q21_json" -> ScalarQueries.q21Oracle,
    "q22_array_hof" -> ScalarQueries.q22Oracle,
    "q23_map_struct" -> ScalarQueries.q23Oracle,
    "q24_msk_dates" -> ScalarQueries.q24Oracle,
    "q30_gold_orders_pipeline" -> PipelineQueries.q30Oracle,
    "q31_dedup_exact" -> NorthStarQueries.q31Oracle,
    "q32_ngram_jaccard" -> NorthStarQueries.q32Oracle,
    "q33_minhash_lsh" -> NorthStarQueries.q33Oracle,
    "q39_ann_ivf" -> NorthStarQueries.q39Oracle,
    "q56_ann_lsh_neardup" -> NorthStarQueries.q56Oracle,
    "q35_text_stats" -> NorthStarQueries.q35Oracle,
    "q34_simhash_neardup" -> NorthStarQueries.q34Oracle,
    "q36_lang_profile" -> NorthStarQueries.q36Oracle,
    "q37_fingerprint" -> NorthStarQueries.q37Oracle,
    "q38_ann_brute_topk" -> NorthStarQueries.q38Oracle,
    "q40_embed_neardup" -> NorthStarQueries.q40Oracle,
    "q41_multimodal" -> NorthStarQueries.q41Oracle,
    "q42_predicates" -> CoverageQueries.q42Oracle,
    "q43_generators" -> CoverageQueries.q43Oracle,
    "q44_scalar_misc" -> CoverageQueries.q44Oracle,
    "q45_window_first_last" -> CoverageQueries.q45Oracle,
    "q46_struct_json_extras" -> CoverageQueries.q46Oracle,
    "q47_sql_text_model" -> CoverageQueries.q47Oracle,
    "q48_approx_distinct" -> CoverageQueries.q48Oracle,
    "q49_active_users_retention" -> graft.models.ActiveRetention.usersOracle,
    "q50_active_devices_retention" -> graft.models.ActiveRetention.devicesOracle,
    "q51_nested_mongo" -> CoverageQueries.q51Oracle,
    "q52_wilson_ci" -> CoverageQueries.q52Oracle,
    "q53_scd2_pipeline" -> Scd2Queries.q53Oracle,
    "q54_conditionals" -> CoverageQueries.q54Oracle,
    "q55_rollup_cube" -> AggQueries.q55Oracle,
    "q57_funnel" -> FunnelQueries.q57Oracle,
    "q58_funnel_ranking" -> RankQueries.q58Oracle,
    "q59_onfy_sessions" -> TemplaterQueries.q59Oracle,
    "q60_scd2_check" -> Scd2Queries.q60Oracle,
    "q61_interval_frame" -> WindowQueries.q61Oracle,
    "q62_append_overwrite" -> PipelineQueries.q62Oracle,
    "q63_active_devices" -> TemplaterQueries.q63Oracle,
    "q64_skew_join" -> JoinQueries.q64Oracle,
    "q65_seed_join" -> PipelineQueries.q65Oracle,
    "q66_schema_evolution" -> PipelineQueries.q66Oracle,
    "q67_bucketed_join" -> JoinQueries.q67Oracle,
    "q68_funnel_rank" -> TemplaterQueries.q68Oracle,
    "q69_pivot" -> AggQueries.q69Oracle,
    "q70_window_ranks" -> WindowQueries.q70Oracle,
    "q71_status_matrix" -> TemplaterQueries.q71Oracle,
    "q72_orders_wide" -> GoldOrdersWide.q72Oracle,
    "q73_scd2_bucketed" -> Scd2Queries.q73Oracle,
    "q74_campaign_funnels" -> CampaignFunnels.q74Oracle,
    "q75_dup_groups" -> NorthStarQueries.q75Oracle,
    "q76_incremental_merge" -> MergeQueries.q76Oracle,
    "q77_train_split" -> NorthStarQueries.q77Oracle,
    "q78_event_matrix" -> TemplaterQueries.q78Oracle,
    "q79_setops" -> JoinQueries.q79Oracle,
    // same closed form as q53: the file layer must reproduce it bit-for-bit
    "q80_snapshot_file" -> Scd2Queries.q53Oracle,
    "q81_txlog_pipeline" -> TxLogQueries.q81Oracle
  )
}
