package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (the t2 inventory).
  *
  * Every implemented operator has a `queries` entry; operators whose output
  * is SQL-expressible also have an `oracleSql` DuckDB twin over the same
  * parquet tables (names = file stems). Column names and order semantics are
  * aligned pairwise; every floating aggregate is ROUND-ed identically on
  * both sides (SURVEY §5.3 determinism rules).
  *
  * Every query is oracle-paired as of round 5: q21 declares the
  * cross-engine tolerance VERDICT (each engine runs its own HLL sketch and
  * emits `|approx − exact|/exact ≤ 0.05`), and x09 declares exact integer
  * byte moments over the ASCII corpus slice (char-level `ascii()` twin).
  */
object SparkEntry {

  /** DuckDB sees events.ts as TIMESTAMP_NS; CAST to µs TIMESTAMP matches the
    * Spark view's floor-truncating nanos→micros conversion exactly. */
  private val E =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

  /** Brute-force all-pairs cosine ≥ 0.9 — the declared semantics of BOTH
    * x07 (brute-force baseline) and x12 (SRP-banded production path). */
  private val EmbedNearDupSql: String =
    """WITH c AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |   / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |    * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cos FROM c WHERE cos >= 0.9 ORDER BY id_a, id_b""".stripMargin

  /** round(cos(a,b),4) as a single-line DuckDB expression — the shared
    * kernel of the q54/x08/x37 twins. */
  private def cosSql(a: String, b: String): String =
    s"ROUND(list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (SQRT(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * SQRT(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))), 4)"

  /** Integer-exact squared-L2 twin of VectorOps.d2i: the dot-expansion over
    * list_dot_product, 1e6-scaled, rounded at scale 0 (where both engines'
    * rounding agrees on every double) into a BIGINT rank key. */
  private def d2Sql(a: String, b: String): String =
    s"CAST(ROUND(1000000.0 * (list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))" +
      s" - 2.0 * list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" + list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))) AS BIGINT)"

  /** Flagship: Q48 downsample (the canonical TSDB query) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    TimeSeriesOps.q48(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_count"      -> (RelationalOps.q01 _),
    "q02_projection"      -> (RelationalOps.q02 _),
    "q03_catalog"         -> (RelationalOps.q03 _),
    "q04_filter_bool"     -> (RelationalOps.q04 _),
    "q05_ts_range"        -> (RelationalOps.q05 _),
    "q06_in_list"         -> (RelationalOps.q06 _),
    "q07_like"            -> (RelationalOps.q07 _),
    "q08_null_semantics"  -> (RelationalOps.q08 _),
    "q09_join_broadcast"  -> (RelationalOps.q09 _),
    "q10_join_smj"        -> (RelationalOps.q10 _),
    "q11_join_left"       -> (RelationalOps.q11 _),
    "q12_join_full"       -> (RelationalOps.q12 _),
    "q13_join_semi"       -> (RelationalOps.q13 _),
    "q14_join_anti"       -> (RelationalOps.q14 _),
    "q15_join_cross"      -> (RelationalOps.q15 _),
    "q16_theta_band"      -> (RelationalOps.q16 _),
    "q17_asof"            -> (TimeSeriesOps.q17 _),
    "q18_interval_join"   -> (TimeSeriesOps.q18 _),
    "q19_agg_tpch_q1"     -> (RelationalOps.q19 _),
    "q20_count_distinct"  -> (RelationalOps.q20 _),
    "q21_approx_distinct" -> (RelationalOps.q21 _),
    "q22_rollup"          -> (RelationalOps.q22 _),
    "q23_cube"            -> (RelationalOps.q23 _),
    "q24_having"          -> (RelationalOps.q24 _),
    "q25_percentiles"     -> (RelationalOps.q25 _),
    "q26_stats"           -> (RelationalOps.q26 _),
    "q27_array_agg"       -> (RelationalOps.q27 _),
    "q28_distinct"        -> (RelationalOps.q28 _),
    "q29_ranking"         -> (AnalyticOps.q29 _),
    "q30_lag_delta"       -> (AnalyticOps.q30 _),
    "q31_running_sum"     -> (AnalyticOps.q31 _),
    "q32_moving_avg"      -> (AnalyticOps.q32 _),
    "q33_last_point"      -> (AnalyticOps.q33 _),
    "q34_topk_group"      -> (AnalyticOps.q34 _),
    "q35_multisort"       -> (AnalyticOps.q35 _),
    "q36_topk"            -> (AnalyticOps.q36 _),
    "q37_union"           -> (AnalyticOps.q37 _),
    "q38_intersect"       -> (AnalyticOps.q38 _),
    "q39_except"          -> (AnalyticOps.q39 _),
    "q40_string_funcs"    -> (AnalyticOps.q40 _),
    "q41_regex"           -> (AnalyticOps.q41 _),
    "q42_datetime"        -> (AnalyticOps.q42 _),
    "q43_math"            -> (AnalyticOps.q43 _),
    "q44_array_funcs"     -> (AnalyticOps.q44 _),
    "q45_json"            -> (AnalyticOps.q45 _),
    "q46_cond_cast"       -> (AnalyticOps.q46 _),
    "q47_series_scan"     -> (TimeSeriesOps.q47 _),
    "q48_downsample"      -> (TimeSeriesOps.q48 _),
    "q49_rate"            -> (TimeSeriesOps.q49 _),
    "q50_gapfill"         -> (TimeSeriesOps.q50 _),
    "q51_sma"             -> (TimeSeriesOps.q51 _),
    "q52_exact_dedup"     -> (TextOps.q52 _),
    "q53_minhash_lsh"     -> (TextOps.q53 _),
    "q54_cosine_topk"     -> (VectorOps.q54 _),
    "q55_text_stats"      -> (TextOps.q55 _),
    "q56_tfidf"           -> (TextOps.q56 _),
    "q57_multimodal_arr"  -> (VectorOps.q57 _),
    "x01_simhash"         -> (TextOps.x01Simhash _),
    "x02_ngram_jaccard"   -> (TextOps.x02NgramJaccard _),
    "x03_langid"          -> (TextOps.x03LangId _),
    "x04_quality"         -> (TextOps.x04Quality _),
    "x05_token_count"     -> (TextOps.x05TokenCount _),
    "x06_fingerprint"     -> (TextOps.x06Fingerprint _),
    "x07_embed_neardup"   -> (VectorOps.x07EmbedNearDup _),
    "x08_ann_ivf"         -> (VectorOps.x08AnnIvf _),
    "x09_multimodal"      -> (MultimodalOps.x09Multimodal _),
    "x10_centroids"       -> (VectorOps.x10Centroids _),
    "x11_stopword_ratio"  -> (TextOps.x11StopwordRatio _),
    "x12_embed_neardup_lsh" -> (VectorOps.x12EmbedNearDupLsh _),
    "x13_asof_exec"       -> (TimeSeriesOps.x13AsofExec _),
    "x14_dedup_clusters"  -> (TextOps.x14DedupClusters _),
    "x15_stratified_sample" -> (TextOps.x15StratifiedSample _),
    "x16_token_shards"    -> (TextOps.x16TokenShards _),
    "x17_contamination"   -> (TextOps.x17Contamination _),
    "x18_lm_score"        -> (TextOps.x18LmScore _),
    "x19_frame_sample"    -> (MultimodalOps.x19FrameSample _),
    "x20_sessionize"      -> (TimeSeriesOps.x20Sessionize _),
    "x21_repetition"      -> (TextOps.x21Repetition _),
    "x22_quantize"        -> (VectorOps.x22Quantize _),
    "x23_counter_rate"    -> (TimeSeriesOps.x23CounterRate _),
    "x24_twa"             -> (TimeSeriesOps.x24Twa _),
    "x25_anomaly"         -> (TimeSeriesOps.x25Anomaly _),
    "x26_interpolate"     -> (TimeSeriesOps.x26Interpolate _),
    "x27_span_dedup"      -> (TextOps.x27SpanDedup _),
    "x28_scrub"           -> (TextOps.x28Scrub _),
    "x29_mixture_resample" -> (TextOps.x29MixtureResample _),
    "x30_source_overlap"  -> (TextOps.x30SourceOverlap _),
    "x31_top_bigrams"     -> (TextOps.x31TopBigrams _),
    "x32_vocab_growth"    -> (TextOps.x32VocabGrowth _),
    "x33_dedup_survivors" -> (TextOps.x33DedupSurvivors _),
    "x34_quantile_sketch" -> (RelationalOps.x34QuantileSketch _),
    "x35_fixed_k_sample"  -> (TextOps.x35FixedKSample _),
    "x36_chunk_windows"   -> (TextOps.x36ChunkWindows _),
    "x37_ann_recall"      -> (VectorOps.x37AnnRecall _),
    "x38_dedup_first"     -> (TextOps.x38DedupFirstNearDup _),
    "x39_dedup_pipeline"  -> (TextOps.x39DedupPipeline _),
    "x40_embed_dedup_first" -> (VectorOps.x40EmbedDedupFirst _),
    "x41_embed_pipeline"  -> (VectorOps.x41EmbedPipeline _),
    "x42_incremental_dedup" -> (TextOps.x42IncrementalDedup _),
    "x43_weighted_sample" -> (TextOps.x43WeightedSample _),
    "x44_overlap_sketch"  -> (TextOps.x44OverlapSketch _),
    "x45_kmeans_step"     -> (VectorOps.x45KmeansStep _),
    "x46_pq_encode"       -> (VectorOps.x46PqEncode _),
    "x47_pq_recall"       -> (VectorOps.x47PqRecall _),
    "x48_leak_split"      -> (TextOps.x48LeakSplit _),
    "x49_heavy_hitters"   -> (TextOps.x49HeavyHitters _),
    "x50_bloom_contamination" -> (TextOps.x50BloomContamination _),
    "x51_power_iter"      -> (VectorOps.x51PowerIter _),
    "x52_quality_bins"    -> (TextOps.x52QualityBins _),
    "x53_label_prop"      -> (TextOps.x53LabelProp _),
    "x54_novelty"         -> (TextOps.x54Novelty _),
    "x55_dataset_card"    -> (TextOps.x55DatasetCard _),
    "x56_snapshot_diff"   -> (TextOps.x56SnapshotDiff _),
    "x57_transitions"     -> (TimeSeriesOps.x57Transitions _),
    "x58_box"             -> (TimeSeriesOps.x58Box _),
    "x59_funnel"          -> (TimeSeriesOps.x59Funnel _),
    "x60_decay"           -> (TimeSeriesOps.x60Decay _),
    "x61_pivot"           -> (AnalyticOps.x61Pivot _),
    "x62_unpivot"         -> (AnalyticOps.x62Unpivot _),
    "x63_sketch_union"    -> (RelationalOps.x63SketchUnion _),
    "x64_range_agg"       -> (TimeSeriesOps.x64RangeAgg _),
    "x65_time_window"     -> (TimeSeriesOps.x65TimeWindow _),
    "x66_interval_union"  -> (TimeSeriesOps.x66IntervalUnion _),
    "x67_source_kl"       -> (TextOps.x67SourceKl _),
    "x68_norm_audit"      -> (VectorOps.x68NormAudit _),
    "x69_trend"           -> (TimeSeriesOps.x69Trend _),
    "x70_mad_outliers"    -> (TimeSeriesOps.x70MadOutliers _),
    "x71_user_entropy"    -> (TimeSeriesOps.x71UserEntropy _),
    "x72_retention"       -> (TimeSeriesOps.x72Retention _),
    "x73_convert_time"    -> (TimeSeriesOps.x73ConvertTime _),
    "x74_pmi"             -> (TextOps.x74Pmi _),
    "x75_stickiness"      -> (TimeSeriesOps.x75Stickiness _),
    "x76_typicality"      -> (TimeSeriesOps.x76Typicality _),
    "x77_fuzzy"           -> (TextOps.x77Fuzzy _),
    "x78_length_pr"       -> (TextOps.x78LengthPr _),
    "x79_attribution"     -> (TimeSeriesOps.x79Attribution _),
    "x80_backtest"        -> (TimeSeriesOps.x80Backtest _),
    "x81_weekday"         -> (TimeSeriesOps.x81Weekday _),
    "x82_cluster_sizes"   -> (TextOps.x82ClusterSizes _),
    "x83_bm25"            -> (TextOps.x83Bm25 _),
    "x84_rrf"             -> (TextOps.x84Rrf _),
    "x85_search_eval"     -> (VectorOps.x85SearchEval _),
    "x86_cusum"           -> (TimeSeriesOps.x86Cusum _),
    "x87_ewma"            -> (TimeSeriesOps.x87Ewma _),
    "x88_benford"         -> (RelationalOps.x88Benford _),
    "x89_kanon"           -> (TextOps.x89KAnon _),
    "x90_path_trigrams"   -> (TimeSeriesOps.x90PathTrigrams _),
    "x91_scd2"            -> (TimeSeriesOps.x91Scd2 _),
    "x92_corr_pairs"      -> (TimeSeriesOps.x92CorrPairs _),
    "x93_containment"     -> (TextOps.x93Containment _),
    "x94_stopwords"       -> (TextOps.x94Stopwords _),
    "x95_bpe_pairs"       -> (TextOps.x95BpePairs _),
    "x96_key_skew"        -> (TimeSeriesOps.x96KeySkew _),
    "x97_cluster_audit"   -> (TextOps.x97ClusterAudit _),
    "x98_psi_drift"       -> (TimeSeriesOps.x98PsiDrift _),
    "x99_align"           -> (TimeSeriesOps.x99Align _),
    "x100_ohlc"           -> (TimeSeriesOps.x100Ohlc _),
    "x101_matryoshka"     -> (VectorOps.x101Matryoshka _),
    "x102_seq_pack"       -> (TextOps.x102SeqPack _),
    "x103_length_auc"     -> (TextOps.x103LengthAuc _),
    "x104_star_join"      -> (RelationalOps.x104StarJoin _),
    "x105_margin_mine"    -> (VectorOps.x105MarginMine _),
    "x106_exact_pairs"    -> (TextOps.x106ExactPairs _),
    "x107_peak_concurrency" -> (TimeSeriesOps.x107PeakConcurrency _),
    "x108_length_match"   -> (TextOps.x108LengthMatch _),
    "x109_ks_drift"       -> (TimeSeriesOps.x109KsDrift _),
    "x110_canon_dedup"    -> (TextOps.x110CanonDedup _),
    "x111_m4"             -> (TimeSeriesOps.x111M4 _),
    "x112_triangles"      -> (TextOps.x112Triangles _),
    "x113_snm_dedup"      -> (TextOps.x113SnmDedup _),
    "x114_mass_quantiles" -> (TextOps.x114MassQuantiles _),
    "x115_two_pass_median" -> (RelationalOps.x115TwoPassMedian _),
    "x116_assoc_rules"    -> (TextOps.x116AssocRules _),
    "x117_burstiness"     -> (TimeSeriesOps.x117Burstiness _),
    "x118_blocker_ablation" -> (TextOps.x118BlockerAblation _),
    "x119_boilerplate"    -> (TextOps.x119Boilerplate _),
    "x120_hourly_acf"     -> (TimeSeriesOps.x120HourlyAcf _),
    "x121_syndication"    -> (TextOps.x121Syndication _),
    "x122_budget_cut"     -> ((s, d) => TextOps.x122BudgetCut(s, d)),
    "x123_retention"      -> (TimeSeriesOps.x123Retention _),
    "x124_rolling_active" -> (TimeSeriesOps.x124RollingActive _),
    "x125_cluster_sep"    -> (VectorOps.x125ClusterSep _),
    "x126_markov_trans"   -> (TimeSeriesOps.x126MarkovTransitions _),
    "x127_chunk_manifest" -> ((s, d) => MultimodalOps.x127ChunkManifest(s, d)),
    "x128_grouping_sets"  -> (RelationalOps.x128GroupingSets _),
    "x129_streaks"        -> (TimeSeriesOps.x129Streaks _),
    "x130_burst_flags"    -> (TimeSeriesOps.x130BurstFlags _),
    "x131_ship_priority"  -> (RelationalOps.x131ShipPriority _),
    "x132_dominant_supplier" -> (RelationalOps.x132DominantSupplier _),
    "x133_trade_volume"   -> (RelationalOps.x133TradeVolume _),
    "x134_returned_revenue" -> (RelationalOps.x134ReturnedRevenue _),
    "x135_promo_share"    -> (RelationalOps.x135PromoShare _),
    "x136_disjunctive_revenue" -> (RelationalOps.x136DisjunctiveRevenue _),
    "x137_dormant_rich"   -> (RelationalOps.x137DormantRich _),
    "x138_market_share"   -> (RelationalOps.x138MarketShare _),
    "x139_above_avg"      -> (RelationalOps.x139AboveAvg _),
    "x140_brand_coverage" -> (RelationalOps.x140BrandCoverage _),
    "x141_oov_rate"       -> (TextOps.x141OovRate _),
    "x142_day_rank"       -> (TimeSeriesOps.x142DayRank _),
    "x143_late_ship"      -> (RelationalOps.x143LateShipOrders _),
    "x144_scan_revenue"   -> (RelationalOps.x144ScanRevenue _),
    "x145_sla_flags"      -> (RelationalOps.x145SlaFlags _),
    "x146_waterfill"      -> (TextOps.x146Waterfill _),
    "x147_next_incident"  -> (TimeSeriesOps.x147NextIncident _),
    "x148_mutual_nn"      -> (VectorOps.x148MutualNn _),
    "x149_priority_split" -> (RelationalOps.x149PrioritySplit _),
    "x150_order_count_dist" -> (RelationalOps.x150OrderCountDist _),
    "x151_top_supplier"   -> (RelationalOps.x151TopSupplier _),
    "x152_small_qty_rev"  -> (RelationalOps.x152SmallQtyRevenue _),
    "x153_whale_orders"   -> (RelationalOps.x153WhaleOrders _),
    "x154_sole_blame"     -> (RelationalOps.x154SoleBlame _),
    "x155_replica_diff"   -> (TimeSeriesOps.x155ReplicaDiff _),
    "x156_shard_move"     -> (TextOps.x156ShardMove _),
    "x157_gram_commonness" -> (TextOps.x157GramCommonness _),
    "x158_labeler_kappa"  -> (TextOps.x158LabelerKappa _),
    "x159_tfidf_terms"    -> (TextOps.x159TfidfTerms _),
    "x160_source_gini"    -> (TextOps.x160SourceGini _),
    "x161_important_parts" -> (RelationalOps.x161ImportantParts _),
    "x162_supp_diversity" -> (RelationalOps.x162SupplierDiversity _),
    "x163_dominant_ship"  -> (RelationalOps.x163DominantShippers _),
    "x164_ab_test"        -> (TimeSeriesOps.x164AbTest _),
    "x165_hazard_curve"   -> (TimeSeriesOps.x165HazardCurve _),
    "x166_cusum_cp"       -> (TimeSeriesOps.x166CusumChangepoint _),
    "x167_local_volume"   -> (RelationalOps.x167LocalSupplierVolume _),
    "x168_product_profit" -> (RelationalOps.x168ProductProfit _),
    "x169_cheapest_supp"  -> (RelationalOps.x169CheapestSupplier _),
    "x170_column_profile" -> (TextOps.x170ColumnProfile _),
    "x171_edit_distance"  -> (TextOps.x171EditDistance _),
    "x172_ref_integrity"  -> (RelationalOps.x172RefIntegrity _),
    "x173_l_diversity"    -> (TimeSeriesOps.x173LDiversity _),
    "x174_pareto_skyline" -> (RelationalOps.x174ParetoSkyline _),
    "x175_contingency"    -> (TextOps.x175ContingencyAudit _),
    "x176_ols_fit"        -> (TimeSeriesOps.x176OlsFit _),
    "x177_pattern_match"  -> (TimeSeriesOps.x177PatternMatch _),
    "x178_cross_corr"     -> (TimeSeriesOps.x178CrossCorrelation _),
    "x179_fifo_matching"  -> (TimeSeriesOps.x179FifoMatching _),
    "x180_growth_acct"    -> (TimeSeriesOps.x180GrowthAccounting _),
    "x181_cdc_chunking"   -> ((s, d) => MultimodalOps.x181CdcChunking(s, d)),
    "x182_bootstrap"      -> (TimeSeriesOps.x182Bootstrap _),
    "x183_dow_hour_resid" -> (TimeSeriesOps.x183WeekdayHourResiduals _),
    "x184_byte_entropy"   -> ((s, d) => MultimodalOps.x184ByteEntropy(s, d)),
    "x185_pii_audit"      -> (TextOps.x185PiiAudit _),
    "x186_kcore"          -> (TextOps.x186KCore _),
    "x187_label_prop_iter" -> (TextOps.x187LabelPropIter _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_count" -> "SELECT COUNT(*) AS n FROM lineitem",

    "q02_projection" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "q03_catalog" -> Tables.all.sorted
      .map(t => s"SELECT '$t' AS tbl, COUNT(*) AS n FROM $t")
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tbl"),

    "q04_filter_bool" ->
      "SELECT event_id FROM events WHERE value > 100 AND event_type <> 'error' ORDER BY event_id",

    "q05_ts_range" ->
      s"""WITH e AS ($E) SELECT event_id, strftime(ts, '%Y-%m-%d') AS d FROM e
         |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
         |ORDER BY event_id""".stripMargin,

    "q06_in_list" ->
      "SELECT COUNT(*) AS n FROM events WHERE event_type IN ('click','view')",

    "q07_like" ->
      "SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%' ORDER BY p_partkey",

    "q08_null_semantics" ->
      """SELECT COUNT(*) AS n, COUNT(x) AS nn FROM
        |(SELECT CASE WHEN value > 300 THEN value END AS x FROM events) t""".stripMargin,

    "q09_join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_cust FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q10_join_smj" ->
      """SELECT o_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS rev
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey ORDER BY rev DESC, o_orderkey LIMIT 100""".stripMargin,

    "q11_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer
        |LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q12_join_full" ->
      """SELECT COUNT(CASE WHEN l_partkey IS NULL THEN 1 END) AS part_only,
        |COUNT(CASE WHEN p_partkey IS NULL THEN 1 END) AS li_only,
        |COUNT(CASE WHEN p_partkey IS NOT NULL AND l_partkey IS NOT NULL THEN 1 END) AS matched
        |FROM part FULL JOIN (SELECT DISTINCT l_partkey FROM lineitem) li
        |ON p_partkey = l_partkey""".stripMargin,

    "q13_join_semi" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,

    "q14_join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q15_join_cross" ->
      "SELECT COUNT(*) AS n FROM region CROSS JOIN nation",

    "q16_theta_band" ->
      """SELECT COUNT(*) AS n FROM orders o1 JOIN orders o2
        |ON o2.o_totalprice BETWEEN o1.o_totalprice * 0.999 AND o1.o_totalprice * 1.001
        |AND o1.o_orderkey < o2.o_orderkey""".stripMargin,

    "q17_asof" ->
      s"""WITH e AS ($E)
         |SELECT COUNT(*) AS n_matched, ROUND(SUM(c.value), 4) AS sum_click
         |FROM (SELECT * FROM e WHERE event_type = 'error') er
         |ASOF JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |ON er.user_id = c.user_id AND er.ts >= c.ts""".stripMargin,

    // x13 = q17's contract via the custom AsOfMergeJoinExec strategy path:
    // identical declared semantics, so it shares the ASOF twin verbatim
    "x13_asof_exec" ->
      s"""WITH e AS ($E)
         |SELECT COUNT(*) AS n_matched, ROUND(SUM(c.value), 4) AS sum_click
         |FROM (SELECT * FROM e WHERE event_type = 'error') er
         |ASOF JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |ON er.user_id = c.user_id AND er.ts >= c.ts""".stripMargin,

    "q18_interval_join" ->
      s"""WITH e AS ($E),
         |iv AS (SELECT user_id AS iv_user,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS lo,
         |  MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS hi
         |  FROM e GROUP BY 1)
         |SELECT e.user_id, COUNT(*) AS n FROM e
         |JOIN iv ON e.user_id = iv.iv_user AND e.ts BETWEEN iv.lo AND iv.hi
         |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,

    "q19_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty,
        |ROUND(SUM(l_extendedprice), 4) AS sum_base, ROUND(AVG(l_discount), 4) AS avg_disc,
        |COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q20_count_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q21: sketch VALUES are engine-specific, so the declared output is the
    // tolerance verdict — each engine runs its OWN approx_count_distinct
    // and reports whether it lands within 5% of exact (both HLLs are ~1%
    // off at these cardinalities, so the booleans agree)
    "q21_approx_distinct" ->
      """SELECT event_type, n_exact,
        |CAST(ABS(n_approx - n_exact) / CAST(n_exact AS DOUBLE) <= 0.05 AS INT) AS ok
        |FROM (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  approx_count_distinct(user_id) AS n_approx FROM events GROUP BY event_type) t
        |ORDER BY event_type""".stripMargin,

    "q22_rollup" ->
      """WITH base AS (SELECT r_name, n_name, l_extendedprice * (1 - l_discount) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
        |COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
        |ROUND(SUM(rev), 4) AS revenue FROM base GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name, n_name""".stripMargin,

    "q23_cube" ->
      s"""WITH e AS ($E),
         |t AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS d FROM e)
         |SELECT CAST(GROUPING(event_type) AS INT) AS g_t, CAST(GROUPING(d) AS INT) AS g_d,
         |COALESCE(event_type, 'ALL') AS event_type, COALESCE(d, 'ALL') AS d, COUNT(*) AS n
         |FROM t GROUP BY CUBE(event_type, d) ORDER BY g_t, g_d, event_type, d""".stripMargin,

    "q24_having" ->
      """SELECT event_type, ROUND(AVG(value), 4) AS avg_val FROM events
        |GROUP BY event_type HAVING ROUND(AVG(value), 4) > 45 ORDER BY event_type""".stripMargin,

    "q25_percentiles" ->
      """SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |ROUND(quantile_cont(value, 0.9), 4) AS p90,
        |ROUND(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q26_stats" ->
      """SELECT event_type, ROUND(stddev_samp(value), 4) AS sd,
        |ROUND(var_samp(value), 4) AS vr,
        |ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS cr
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q27_array_agg" ->
      """SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q28_distinct" ->
      "SELECT DISTINCT event_type, user_id FROM events ORDER BY event_type, user_id",

    "q29_ranking" ->
      """SELECT event_id, event_type, CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk,
        |CAST(drk AS BIGINT) AS drk, CAST(nt AS BIGINT) AS nt FROM
        |(SELECT event_id, event_type, row_number() OVER w AS rn, rank() OVER w AS rk,
        | dense_rank() OVER w AS drk, ntile(4) OVER w AS nt FROM events
        | WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)) t
        |WHERE rn <= 20 ORDER BY event_type, rn""".stripMargin,

    "q30_lag_delta" ->
      """SELECT event_type, ROUND(SUM(delta), 4) AS sum_delta, COUNT(delta) AS n_delta FROM
        |(SELECT event_type, value - lag(value) OVER
        |  (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS delta FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q31_running_sum" ->
      """SELECT user_id, ROUND(SUM(cum), 4) AS checksum FROM
        |(SELECT user_id, SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q32_moving_avg" ->
      """SELECT event_type, ROUND(SUM(ma), 4) AS checksum FROM
        |(SELECT event_type, AVG(value) OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q33_last_point" ->
      s"""WITH e AS ($E)
         |SELECT user_id, event_type, ROUND(max_by(value, ts), 4) AS last_value,
         |strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
         |FROM e GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,

    "q34_topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM
        |(SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER
        |  (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q35_multisort" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin,

    "q36_topk" ->
      "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 10",

    "q37_union" ->
      """SELECT * FROM (
        |SELECT 'all' AS kind, COUNT(*) AS n FROM
        |  (SELECT event_type FROM events UNION ALL SELECT event_type FROM events) a
        |UNION ALL
        |SELECT 'dist' AS kind, COUNT(*) AS n FROM
        |  (SELECT event_type FROM events UNION SELECT event_type FROM events) b
        |) ORDER BY kind""".stripMargin,

    "q38_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "q39_except" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,

    "q40_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS up, substr(p_name, 1, 5) AS s5,
        |CAST(LENGTH(p_name) AS BIGINT) AS len, TRIM(CONCAT(' ', p_name, ' ')) AS tr,
        |REPLACE(p_name, 'a', '@') AS rep FROM part ORDER BY p_partkey""".stripMargin,

    "q41_regex" ->
      """SELECT word, COUNT(*) AS n, MIN(masked) AS sample FROM
        |(SELECT regexp_extract(p_type, '^(\w+)', 1) AS word,
        |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked FROM part) t
        |GROUP BY word ORDER BY word""".stripMargin,

    "q42_datetime" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |COUNT(*) AS n,
        |MAX(CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)) AS max_dd,
        |MIN(strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')) AS min_plus30,
        |MIN(CAST(epoch(o_orderdate) AS BIGINT)) AS min_epoch
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "q43_math" ->
      """SELECT event_id, ROUND(value, 4) AS v, ROUND(ABS(value - 50), 4) AS a,
        |CAST(CEIL(value) AS BIGINT) AS c, CAST(FLOOR(value) AS BIGINT) AS f,
        |ROUND(LN(value + 1), 4) AS lnv, ROUND(EXP(value / 100), 4) AS ex,
        |ROUND(SQRT(value), 4) AS sq, CAST(FLOOR(value * 100) AS BIGINT) % 7 AS md
        |FROM events ORDER BY event_id""".stripMargin,

    "q44_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS s8,
        |ROUND(SQRT(list_sum(list_transform(embedding,
        |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm,
        |CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q45_json" ->
      """SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MIN(k) AS BIGINT) AS min_k,
        |CAST(MAX(k) AS BIGINT) AS max_k, COUNT(k) AS n FROM
        |(SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q46_cond_cast" ->
      """SELECT event_id, CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR) AS dec_str,
        |COALESCE(NULLIF(event_type, 'error'), 'E') AS cond,
        |CASE WHEN value > 100 THEN 'hi' WHEN value > 50 THEN 'mid' ELSE 'lo' END AS band
        |FROM events ORDER BY event_id""".stripMargin,

    "q47_series_scan" ->
      s"""WITH e AS ($E)
         |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_id, value FROM e
         |WHERE user_id = 7 AND event_type = 'click'
         |AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
         |ORDER BY ts, event_id""".stripMargin,

    "q48_downsample" ->
      s"""WITH e AS ($E)
         |SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, COUNT(*) AS n,
         |ROUND(AVG(value), 4) AS avg_v,
         |ROUND(SUM(value), 4) AS sum_v,
         |ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v
         |FROM e GROUP BY 1, 2 ORDER BY d, event_type""".stripMargin,

    "q49_rate" ->
      s"""WITH e AS ($E),
         |l AS (SELECT event_type, value - lag(value) OVER w AS dv,
         |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us FROM e
         |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
         |SELECT event_type, ROUND(AVG(dv / (CAST(dt_us AS DOUBLE) / 1000000.0)), 6) AS avg_rate,
         |COUNT(*) AS n_rates FROM l WHERE dt_us > 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q50_gapfill" ->
      s"""WITH e AS ($E),
         |b AS (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n FROM e GROUP BY 1, 2),
         |bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM e),
         |spine AS (SELECT t.event_type, CAST(s.d AS DATE) AS d FROM
         |  (SELECT DISTINCT event_type FROM e) t CROSS JOIN
         |  (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds) s)
         |SELECT sp.event_type, COUNT(CASE WHEN b.n IS NULL THEN 1 END) AS n_empty,
         |COUNT(*) AS n_days FROM spine sp
         |LEFT JOIN b ON sp.event_type = b.event_type AND sp.d = b.d
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q51_sma" ->
      s"""WITH e AS ($E),
         |daily AS (SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, SUM(value) AS sum_v
         |  FROM e GROUP BY 1, 2)
         |SELECT d, event_type, ROUND(AVG(sum_v) OVER (PARTITION BY event_type ORDER BY d
         |ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS sma
         |FROM daily ORDER BY event_type, d""".stripMargin,

    "q52_exact_dedup" ->
      """SELECT sha256(text) AS h, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
        |FROM documents GROUP BY h ORDER BY h""".stripMargin,

    "q53_minhash_lsh" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j
        |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // x38: q52's exact-dedup composed BEFORE q53's near-dup — the twin
    // runs the same composition (collapse identical texts to the min-id
    // representative, exact all-pairs Jaccard among representatives,
    // multiplicities carried instead of the copy square)
    "x38_dedup_first" ->
      """WITH g AS (SELECT MIN(doc_id) AS id, COUNT(*) AS copies, MIN(text) AS text
        |  FROM documents GROUP BY sha256(text)),
        |t AS (SELECT DISTINCT id AS doc_id, tok FROM
        |  (SELECT id, UNNEST(string_split(text, ' ')) AS tok FROM g) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j,
        |ga.copies AS copies_a, gb.copies AS copies_b
        |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // x39: x38's collapse + x14's recursive-CTE reachability over the
    // REPRESENTATIVE graph + x33's integer argmax, with copy
    // multiplicities folded into member counts and byte totals
    "x39_dedup_pipeline" ->
      """WITH RECURSIVE g AS (SELECT MIN(doc_id) AS id, COUNT(*) AS copies,
        |    MIN(text) AS text, MIN(n_chars) AS n_chars
        |  FROM documents GROUP BY sha256(text)),
        |t AS (SELECT DISTINCT id AS doc_id, tok FROM
        |  (SELECT id, UNNEST(string_split(text, ' ')) AS tok FROM g) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT id, id AS comp FROM g
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |j AS (SELECT lab.id, cluster_id, copies, n_chars,
        |  row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_chars DESC, lab.id) AS rnk
        |  FROM lab JOIN g ON lab.id = g.id),
        |a AS (SELECT cluster_id, SUM(copies)::BIGINT AS n_members,
        |  COUNT(*)::BIGINT AS n_reps,
        |  SUM(n_chars * copies)::BIGINT AS chars_total FROM j GROUP BY 1)
        |SELECT a.cluster_id AS cluster_id, k.id AS keeper, n_members, n_reps,
        |k.n_chars AS chars_kept, chars_total - k.n_chars AS chars_dropped
        |FROM a JOIN j k ON a.cluster_id = k.cluster_id AND k.rnk = 1
        |ORDER BY a.cluster_id""".stripMargin,

    // x40: x38's dedup-first composition for vectors — collapse
    // byte-identical embeddings (GROUP BY the list itself; min-id
    // representative), exact all-pairs cosine among representatives,
    // multiplicities carried instead of the copy square. Same twin shape
    // as x07/x12 (the SRP path must reproduce brute force on the fixture).
    "x40_embed_dedup_first" ->
      """WITH g AS (SELECT MIN(vec_id) AS vec_id, embedding, COUNT(*) AS copies
        |  FROM embeddings GROUP BY embedding),
        |c AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cos,
        |  a.copies AS copies_a, b.copies AS copies_b
        |  FROM g a JOIN g b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos, copies_a, copies_b FROM c
        |WHERE cos >= 0.9 ORDER BY id_a, id_b""".stripMargin,

    // x41: x39's recursive-CTE pipeline closure for vectors — x40's
    // collapse + exact cosine pairs among representatives + reachability
    // + argmax-by-(copies, id) survivor, multiplicities folded into
    // member counts. On this fixture every vector is its own singleton
    // cluster (no exact dups, max cos ≈ 0.6), which the CTE reproduces.
    "x41_embed_pipeline" ->
      """WITH RECURSIVE g AS (SELECT MIN(vec_id) AS id, COUNT(*) AS copies
        |  FROM embeddings GROUP BY embedding),
        |v AS (SELECT MIN(vec_id) AS id, embedding FROM embeddings GROUP BY embedding),
        |c AS (SELECT a.id AS id_a, b.id AS id_b,
        |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cos
        |  FROM v a JOIN v b ON a.id < b.id),
        |pairs AS (SELECT id_a, id_b FROM c WHERE cos >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT id, id AS comp FROM g
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |j AS (SELECT lab.id, cluster_id, copies,
        |  row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY copies DESC, lab.id) AS rnk
        |  FROM lab JOIN g ON lab.id = g.id),
        |a AS (SELECT cluster_id, SUM(copies)::BIGINT AS n_members,
        |  COUNT(*)::BIGINT AS n_reps FROM j GROUP BY 1)
        |SELECT a.cluster_id AS cluster_id, k.id AS keeper, n_members, n_reps,
        |k.copies AS copies_kept
        |FROM a JOIN j k ON a.cluster_id = k.cluster_id AND k.rnk = 1
        |ORDER BY a.cluster_id""".stripMargin,

    // x42: incremental dedup — q53's exact-Jaccard twin restricted to
    // cross pairs between the derived batch (doc_id ≡ 0 mod 7) and the
    // standing corpus (the rest); no batch×batch or corpus×corpus pairs
    "x42_incremental_dedup" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_new, b.doc_id AS doc_corpus, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok
        |  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0 GROUP BY 1, 2)
        |SELECT doc_new, doc_corpus,
        |ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j
        |FROM inter JOIN sz sa ON sa.doc_id = doc_new JOIN sz sb ON sb.doc_id = doc_corpus
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY doc_new, doc_corpus""".stripMargin,

    // x43: priority sampling — the uniform u is the first 8 md5 hex digits
    // of the id (dyadic rational), so the priority w/u is ONE exactly-
    // rounded IEEE division and both engines select the identical set;
    // displayed priority ROUND(4)-snapped like every declared double
    "x43_weighted_sample" ->
      """WITH w AS (SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM documents),
        |p AS (SELECT doc_id, lang, source, n_chars,
        |  CAST(n_chars AS DOUBLE) / ((CAST(h AS DOUBLE) + 0.5) / 4294967296.0) AS prio
        |  FROM w),
        |r AS (SELECT doc_id, lang, source, n_chars, prio,
        |  CAST(row_number() OVER (ORDER BY prio DESC, doc_id) AS BIGINT) AS rnk FROM p)
        |SELECT rnk, doc_id, lang, source, n_chars, ROUND(prio, 4) AS prio
        |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin,

    // x44: tolerance-verdict (x37 pattern) — exact inter/union bit-agree;
    // each engine estimates the intersection with its OWN HLL
    // (inclusion–exclusion over per-source + pairwise-union sketches) and
    // the declared verdict |est − inter| ≤ 0.10·union has ≥4× margin over
    // both engines' measured worst case, so verdicts agree everywhere
    "x44_overlap_sketch" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 4),
        |    i -> array_to_string(t[i:i+4], ' '))) AS u(shingle)),
        |n AS (SELECT source, COUNT(*)::BIGINT AS n,
        |  CAST(approx_count_distinct(shingle) AS BIGINT) AS est FROM sh GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*)::BIGINT AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2),
        |pu AS (SELECT s1.src_a, s1.src_b,
        |  CAST(approx_count_distinct(sh.shingle) AS BIGINT) AS est_u
        |  FROM (SELECT DISTINCT src_a, src_b FROM p) s1
        |  JOIN sh ON sh.source IN (s1.src_a, s1.src_b) GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.inter, na.n + nb.n - p.inter AS uni,
        |CAST(ABS((na.est + nb.est - pu.est_u) - p.inter)
        |  <= 0.10 * (na.n + nb.n - p.inter) AS INT) AS ok
        |FROM p JOIN n na ON p.src_a = na.source JOIN n nb ON p.src_b = nb.source
        |JOIN pu ON p.src_a = pu.src_a AND p.src_b = pu.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    // x45: assignment ranked (round(cos,4) DESC, cent_id) like x08/x37;
    // centroid means in EXACT integer arithmetic (components scaled 1e6 →
    // BIGINT sums — associative, no float-order sensitivity), one division
    // back; centroid arrays round(6), shift round(4)
    "x45_kmeans_step" ->
      s"""WITH nv AS (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS stride FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, embedding AS c_emb
        |  FROM embeddings, nv WHERE vec_id % stride = 0),
        |asg AS (SELECT vec_id, embedding, cluster FROM (
        |  SELECT e.vec_id, e.embedding, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.cent_id) AS r
        |  FROM embeddings e CROSS JOIN cents c) q WHERE r = 1),
        |d AS (SELECT cluster, i,
        |  CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS sv1
        |  FROM asg, UNNEST(generate_series(1, len(embedding))) AS g(i)),
        |s AS (SELECT cluster, i, SUM(sv1) AS sv, COUNT(*)::BIGINT AS nm
        |  FROM d GROUP BY 1, 2),
        |cen AS (SELECT cluster, MAX(nm) AS n_members,
        |  list(ROUND(CAST(sv AS DOUBLE) / (nm * 1000000.0), 6) ORDER BY i) AS centroid
        |  FROM s GROUP BY cluster)
        |SELECT cen.cluster AS cluster_id, cen.n_members,
        |ROUND(list_dot_product(CAST(c.c_emb AS DOUBLE[]), cen.centroid)
        |  / (SQRT(list_dot_product(CAST(c.c_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])))
        |   * SQRT(list_dot_product(cen.centroid, cen.centroid))), 4) AS shift_cos,
        |array_to_string(list_transform(cen.centroid,
        |  v -> CAST(ROUND(v * 1000000) AS BIGINT)), ',') AS centroid
        |FROM cen JOIN cents c ON cen.cluster = c.cent_id
        |ORDER BY cluster_id""".stripMargin,

    // x46: per-subspace code choice ranks on the 1e6-scaled BIGINT d², so
    // assignment, tie-break, and the error sum are exact integer arithmetic;
    // d² itself is the dot-expansion over the same list_dot_product kernel
    // the cosine twins use
    "x46_pq_encode" ->
      s"""WITH nv AS (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS stride FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, embedding AS c_emb
        |  FROM embeddings, nv WHERE vec_id % stride = 0),
        |sub AS (SELECT vec_id, j,
        |    embedding[j*sd+1 : j*sd+sd] AS sv
        |  FROM (SELECT vec_id, embedding,
        |          CAST(len(embedding)//8 AS INT) AS sd FROM embeddings) e,
        |       UNNEST(generate_series(0, 7)) AS g(j)),
        |cand AS (SELECT s.vec_id, s.j, c.cent_id, ${d2Sql("s.sv", "cs")} AS d2i
        |  FROM sub s CROSS JOIN
        |    (SELECT cent_id, c_emb, CAST(len(c_emb)//8 AS INT) AS csd FROM cents) c,
        |    LATERAL (SELECT c.c_emb[s.j*c.csd+1 : s.j*c.csd+c.csd] AS cs) l),
        |b AS (SELECT vec_id, j, cent_id AS code, d2i,
        |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d2i, cent_id) AS r
        |  FROM cand)
        |SELECT vec_id, array_to_string(list(code ORDER BY j), ',') AS codes,
        |  ROUND(CAST(SUM(d2i) AS DOUBLE) / 1000000.0, 6) AS err2
        |FROM b WHERE r = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // x47: every ranking keys on the same 1e6-scaled BIGINT d² (code
    // choice, the ADC integer sums, the exact baseline), ties on vec_id —
    // both engines derive identical top-5 sets, so the verdict hash-matches
    "x47_pq_recall" ->
      s"""WITH nv AS (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS stride FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, embedding AS c_emb
        |  FROM embeddings, nv WHERE vec_id % stride = 0),
        |sub AS (SELECT vec_id, j,
        |    embedding[j*sd+1 : j*sd+sd] AS sv
        |  FROM (SELECT vec_id, embedding,
        |          CAST(len(embedding)//8 AS INT) AS sd FROM embeddings) e,
        |       UNNEST(generate_series(0, 7)) AS g(j)),
        |cand AS (SELECT s.vec_id, s.j, c.cent_id, ${d2Sql("s.sv", "cs")} AS d2i
        |  FROM sub s CROSS JOIN
        |    (SELECT cent_id, c_emb, CAST(len(c_emb)//8 AS INT) AS csd FROM cents) c,
        |    LATERAL (SELECT c.c_emb[s.j*c.csd+1 : s.j*c.csd+c.csd] AS cs) l),
        |codes AS (SELECT vec_id, j, cent_id AS code,
        |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d2i, cent_id) AS r
        |  FROM cand),
        |p AS (SELECT vec_id AS probe_id, embedding AS p_emb FROM embeddings WHERE vec_id < 10),
        |psub AS (SELECT probe_id, j,
        |    p_emb[j*sd+1 : j*sd+sd] AS sv
        |  FROM (SELECT probe_id, p_emb,
        |          CAST(len(p_emb)//8 AS INT) AS sd FROM p) q,
        |       UNNEST(generate_series(0, 7)) AS g(j)),
        |lut AS (SELECT s.probe_id, s.j, c.cent_id AS code, ${d2Sql("s.sv", "cs")} AS ld2
        |  FROM psub s CROSS JOIN
        |    (SELECT cent_id, c_emb, CAST(len(c_emb)//8 AS INT) AS csd FROM cents) c,
        |    LATERAL (SELECT c.c_emb[s.j*c.csd+1 : s.j*c.csd+c.csd] AS cs) l),
        |adc AS (SELECT l.probe_id, k.vec_id, SUM(l.ld2) AS adc
        |  FROM (SELECT vec_id, j, code FROM codes WHERE r = 1) k
        |  JOIN lut l ON l.j = k.j AND l.code = k.code
        |  WHERE k.vec_id <> l.probe_id
        |  GROUP BY 1, 2),
        |approx AS (SELECT probe_id, vec_id FROM
        |  (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY adc, vec_id) AS rnk FROM adc) q
        |  WHERE rnk <= 5),
        |exact AS (SELECT probe_id, vec_id FROM
        |  (SELECT pp.probe_id, e.vec_id,
        |    row_number() OVER (PARTITION BY pp.probe_id
        |      ORDER BY ${d2Sql("pp.p_emb", "e.embedding")}, e.vec_id) AS rnk
        |   FROM p pp CROSS JOIN embeddings e WHERE e.vec_id <> pp.probe_id) q
        |  WHERE rnk <= 5)
        |SELECT ex.probe_id, COUNT(*) AS n_exact, COUNT(a.vec_id) AS n_hit,
        |ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*), 4) AS recall,
        |CAST(ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*), 4) >= 0.95 AS INT) AS ok
        |FROM exact ex LEFT JOIN approx a ON ex.probe_id = a.probe_id AND ex.vec_id = a.vec_id
        |GROUP BY ex.probe_id ORDER BY ex.probe_id""".stripMargin,

    "q54_cosine_topk" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT probe_id, vec_id,
        |  ROUND(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk FROM c)
        |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor_id, cos
        |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    "q55_text_stats" ->
      """WITH perdoc AS (SELECT lang, source, COUNT(*) AS n_docs,
        |  ROUND(AVG(n_chars), 2) AS avg_chars FROM documents GROUP BY 1, 2),
        |toks AS (SELECT lang, source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
        |  FROM (SELECT lang, source, UNNEST(string_split(text, ' ')) AS tok FROM documents) u
        |  GROUP BY 1, 2)
        |SELECT p.lang, p.source, p.n_docs, p.avg_chars, t.n_distinct_tokens
        |FROM perdoc p JOIN toks t ON p.lang = t.lang AND p.source = t.source
        |ORDER BY p.lang, p.source""".stripMargin,

    "q56_tfidf" ->
      """WITH toks AS (SELECT lang, doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |stats AS (SELECT lang, term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |  FROM toks GROUP BY 1, 2),
        |s AS (SELECT t.lang, t.term,
        |  ROUND(t.tf * (LN(CAST(n.n_docs + 1 AS DOUBLE) / (t.df + 1)) + 1), 4) AS score
        |  FROM stats t JOIN n ON t.lang = n.lang),
        |r AS (SELECT lang, term, score,
        |  row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rnk FROM s)
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, term, score
        |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "q57_multimodal_arr" ->
      """SELECT label, COUNT(*) AS n,
        |ROUND(SUM(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))), 3) AS checksum
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    // generated from the same bit-index loop as TextOps.x01Simhash: md5 is
    // the one 64-bit-capable hash both engines compute identically, so the
    // SimHash pipeline is fully oracle-checkable; the twin's OR-of-bands
    // join is the oracle-scale formulation of the banded equi-join
    "x01_simhash" -> {
      val bitSums = (0 until 64).map(j =>
        s"SUM(2 * (((strpos('0123456789abcdef', substr(h, ${1 + j / 4}, 1)) - 1) >> ${j % 4}) & 1) - 1) AS s$j")
        .mkString(", ")
      val bandKeys = (0 until 4).map { k =>
        (k * 16 until (k + 1) * 16)
          .map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << (j % 16)} AS BIGINT) ELSE 0 END")
          .mkString(" + ") + s" AS k$k"
      }.mkString(", ")
      val hamming = (0 until 4).map(k => s"bit_count(xor(a.k$k, b.k$k))").mkString(" + ")
      s"""WITH t AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
         |hx AS (SELECT doc_id, md5(tok) AS h FROM t),
         |s AS (SELECT doc_id, $bitSums FROM hx GROUP BY doc_id),
         |sig AS (SELECT doc_id, $bandKeys FROM s)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST($hamming AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  AND (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3)
         |WHERE $hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
    },

    "x02_ngram_jaccard" ->
      """WITH g AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(list_transform(generate_series(1, length(text) - 2),
        |    i -> text[i:i+2])) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j
        |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x03_langid" ->
      """WITH toks AS (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |dtoks AS (SELECT DISTINCT doc_id, lang, tok FROM toks),
        |prof AS (SELECT p_lang, tok FROM
        |  (SELECT p_lang, tok, row_number() OVER
        |    (PARTITION BY p_lang ORDER BY cnt DESC, tok) AS r FROM
        |    (SELECT lang AS p_lang, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2) c) w
        |  WHERE r <= 20),
        |pred AS (SELECT doc_id, lang, p_lang, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS r FROM
        |  (SELECT d.doc_id, d.lang, p.p_lang, COUNT(*) AS score
        |   FROM dtoks d JOIN prof p ON d.tok = p.tok GROUP BY 1, 2, 3) sc)
        |SELECT lang, p_lang AS lang_pred, COUNT(*) AS n FROM pred WHERE r = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x04_quality" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct, n_chars
        |  FROM documents)
        |SELECT doc_id, CAST(15 * LEAST(n_tok, 100) * n_tok + 1500 * n_distinct
        |  + 4 * LEAST(n_chars, 500) * n_tok AS DOUBLE)
        |  / CAST(n_tok * 5000 AS DOUBLE) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "x05_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
        |n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x11_stopword_ratio" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |stop AS (SELECT tok FROM
        |  (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok) g
        |  ORDER BY df DESC, tok LIMIT 30)
        |SELECT t.doc_id, COUNT(*) AS n_tok, COUNT(s.tok) AS n_stop,
        |ROUND(CAST(COUNT(s.tok) AS DOUBLE) / COUNT(*), 4) AS stop_ratio
        |FROM toks t LEFT JOIN stop s ON t.tok = s.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "x06_fingerprint" ->
      """SELECT doc_id, substr(md5(text), 1, 16) AS fp,
        |list_min(list_transform(generate_series(1, length(text) - 7),
        |  i -> substr(md5(text[i:i+7]), 1, 8))) AS fp_rolling
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x07_embed_neardup" -> EmbedNearDupSql,

    // x12 is the banded production path of the SAME contract query: the SRP
    // candidate generation must reproduce the brute-force pair list exactly
    // on the fixture, so it shares x07's declared twin verbatim
    "x12_embed_neardup_lsh" -> EmbedNearDupSql,

    "x10_centroids" ->
      """WITH e AS (SELECT label, UNNEST(embedding) AS v,
        |  UNNEST(generate_series(0, len(embedding) - 1)) AS dim FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
        |ROUND(AVG(CAST(v AS DOUBLE)), 4) AS centroid,
        |ROUND(stddev_samp(CAST(v AS DOUBLE)), 4) AS spread
        |FROM e WHERE dim < 8 GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    // x14's twin recomputes q53's exact-Jaccard edges, then resolves
    // components with a recursive CTE: reach(id, comp) enumerates "comp is
    // in id's component", pruned to comp < dst hops (safe for MIN: the
    // component minimum is < every other member id, so its propagation is
    // never pruned), then MIN(comp) per id
    "x14_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst)
        |SELECT id AS doc_id, MIN(comp) AS cluster_id,
        |CAST(id = MIN(comp) AS INT) AS is_keeper
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    // x82: x14's recursive-CTE labels reduced to the size histogram
    "x82_cluster_sizes" ->
      """WITH RECURSIVE t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |cs AS (SELECT cluster_id, COUNT(*) AS size FROM lab GROUP BY 1)
        |SELECT size, COUNT(*) AS n_clusters,
        |CAST(size * COUNT(*) AS BIGINT) AS n_docs
        |FROM cs GROUP BY size ORDER BY size""".stripMargin,

    // x83: same Lucene-form idf, same k1/b constants, rank on the rounded
    // score with the doc_id tiebreak
    "x83_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents),
        |st AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avglen FROM d),
        |tf AS (SELECT doc_id, len, tok AS term, COUNT(*) AS tf FROM
        |  (SELECT doc_id, len, UNNEST(toks) AS tok FROM d) u
        |  WHERE tok IN ('hash', 'join', 'filter') GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, COUNT(*) AS n_terms,
        |  ROUND(SUM(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
        |    (tf + 1.2 * (0.25 + 0.75 * len / avglen))), 4) AS score
        |  FROM tf JOIN dfr USING (term) CROSS JOIN st GROUP BY doc_id)
        |SELECT doc_id, n_terms, score FROM
        |(SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM sc) q
        |WHERE r <= 20 ORDER BY score DESC, doc_id""".stripMargin,

    // x84: x83's BM25 CTE + q54's cosine form for probe 0, fused on rank
    "x84_rrf" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents),
        |st AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avglen FROM d),
        |tf AS (SELECT doc_id, len, tok AS term, COUNT(*) AS tf FROM
        |  (SELECT doc_id, len, UNNEST(toks) AS tok FROM d) u
        |  WHERE tok IN ('hash', 'join', 'filter') GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, ROUND(SUM(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avglen))), 4) AS score
        |  FROM tf JOIN dfr USING (term) CROSS JOIN st GROUP BY doc_id),
        |sp AS (SELECT doc_id AS id, row_number() OVER
        |  (ORDER BY score DESC, doc_id) AS rank_s FROM sc
        |  QUALIFY rank_s <= 20),
        |p AS (SELECT embedding AS p_emb FROM embeddings WHERE vec_id = 0),
        |co AS (SELECT vec_id AS id,
        |  ROUND(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> 0),
        |de AS (SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS rank_d
        |  FROM co QUALIFY rank_d <= 20),
        |f AS (SELECT COALESCE(sp.id, de.id) AS id,
        |  ROUND(COALESCE(1.0 / (rank_s + 60), 0) + COALESCE(1.0 / (rank_d + 60), 0), 4) AS rrf,
        |  CAST(rank_s IS NOT NULL AS INT) AS in_sparse,
        |  CAST(rank_d IS NOT NULL AS INT) AS in_dense
        |  FROM sp FULL OUTER JOIN de ON sp.id = de.id)
        |SELECT id, rrf, in_sparse, in_dense FROM
        |(SELECT *, row_number() OVER (ORDER BY rrf DESC, id) AS r FROM f) q
        |WHERE r <= 10 ORDER BY rrf DESC, id""".stripMargin,

    // x85: q54's cosine/rank form at k=10 + the label-relevance join
    "x85_search_eval" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb, label AS p_label
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT probe_id, p_label, vec_id, label,
        |  ROUND(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
        |t AS (SELECT probe_id, p_label, label FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cos DESC, vec_id) AS rnk FROM c) q WHERE rnk <= 10),
        |h AS (SELECT probe_id, p_label,
        |  CAST(SUM(CASE WHEN label = p_label THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |  FROM t GROUP BY 1, 2),
        |rl AS (SELECT label AS p_label, COUNT(*) AS n_label FROM embeddings GROUP BY 1)
        |SELECT probe_id, n_hits, CAST(n_label - 1 AS BIGINT) AS n_relevant,
        |ROUND(CAST(n_hits AS DOUBLE) / 10.0, 4) AS p_at_10,
        |ROUND(CAST(n_hits AS DOUBLE) / (n_label - 1), 4) AS r_at_10
        |FROM h JOIN rl USING (p_label) ORDER BY probe_id""".stripMargin,

    // x48: x14's recursive-CTE cluster labels + the x15 md5-prefix split
    // rule applied to the CLUSTER id, so near-dup pairs can never straddle
    // splits; the declared output is the per-split audit aggregate
    "x48_leak_split" ->
      """WITH RECURSIVE t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |sp AS (SELECT l.doc_id, l.cluster_id, d.n_chars,
        |  CASE WHEN md5(CAST(l.cluster_id AS VARCHAR)) < 'cc' THEN 'train'
        |       WHEN md5(CAST(l.cluster_id AS VARCHAR)) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM lab l JOIN documents d ON d.doc_id = l.doc_id)
        |SELECT split, COUNT(DISTINCT cluster_id) AS n_clusters,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "x15_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  (CASE WHEN lang = 'en' THEN '19' ELSE '4c' END)
        |ORDER BY doc_id""".stripMargin,

    "x17_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 4),
        |    i -> array_to_string(t[i:i+4], ' '))) AS u(shingle)),
        |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
        |FROM corpus c JOIN bench b USING (shingle)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5 ORDER BY doc_id, bench_id""".stripMargin,

    // x49: exact counts + threshold from the same integer N both sides;
    // the CMS verdict is pinned to 1 — a sketch estimating outside
    // [cnt, cnt + ceil(eps*N)] fails the hash gate
    "x49_heavy_hitters" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT shingle AS gram FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+1], ' '))) AS u(shingle)),
        |tot AS (SELECT COUNT(*) AS n FROM g)
        |SELECT gram, COUNT(*) AS cnt, 1 AS ok FROM g
        |GROUP BY gram HAVING COUNT(*) >= (SELECT n // 800 FROM tot)
        |ORDER BY cnt DESC, gram""".stripMargin,

    // x50: byte-identical to x17 — the Bloom screen is a plan-level
    // optimization (no false negatives), so the exact twin IS the gate
    "x50_bloom_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 4),
        |    i -> array_to_string(t[i:i+4], ' '))) AS u(shingle)),
        |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
        |FROM corpus c JOIN bench b USING (shingle)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5 ORDER BY doc_id, bench_id""".stripMargin,

    // x51: the per-(row,dim) term rounds at ×1e6 into a BIGINT before the
    // cross-row sum (associative — no float-order sensitivity); the unit
    // components divide by an EXACT Σy² (HUGEINT / DECIMAL(38,0)), so the
    // double division is the same on both engines
    "x51_power_iter" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT v, list_dot_product(v, list_transform(v, x -> 1.0)) AS dt FROM e),
        |t AS (SELECT i - 1 AS dim,
        |  CAST(ROUND(dt * v[i] * 1000000) AS BIGINT) AS term
        |  FROM d, UNNEST(generate_series(1, len(v))) AS g(i)),
        |y AS (SELECT dim, CAST(SUM(term) AS BIGINT) AS y_scaled FROM t GROUP BY dim),
        |n AS (SELECT SUM(CAST(y_scaled AS HUGEINT) * y_scaled) AS n2 FROM y)
        |SELECT dim, ROUND(CAST(y_scaled AS DOUBLE) / SQRT(CAST(n2 AS DOUBLE)), 6) AS comp,
        |y_scaled FROM y, n ORDER BY dim""".stripMargin,

    // x52: integer quality key (x04's numerator, ·1000 div n_tok — exact
    // both sides); exact interpolated quartiles per source (q25's
    // percentile/quantile_cont pairing); bin audit is integer arithmetic
    "x52_quality_bins" ->
      """WITH t AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct, n_chars
        |  FROM documents),
        |k AS (SELECT source, (15 * LEAST(n_tok, 100) * n_tok + 1500 * n_distinct
        |  + 4 * LEAST(n_chars, 500) * n_tok) * 1000 // n_tok AS qk FROM t),
        |b AS (SELECT source, quantile_cont(qk, 0.25) AS b1,
        |  quantile_cont(qk, 0.5) AS b2, quantile_cont(qk, 0.75) AS b3
        |  FROM k GROUP BY source)
        |SELECT k.source, CASE WHEN qk <= b1 THEN 0 WHEN qk <= b2 THEN 1
        |  WHEN qk <= b3 THEN 2 ELSE 3 END AS bin,
        |COUNT(*) AS n_docs, MIN(qk) AS min_qk, MAX(qk) AS max_qk,
        |ROUND(CAST(SUM(qk) AS DOUBLE) / COUNT(*), 4) AS avg_qk
        |FROM k JOIN b ON k.source = b.source
        |GROUP BY 1, 2 ORDER BY k.source, bin""".stripMargin,

    // x53: the exact-Jaccard pair CTE x14/x48 share feeds integer votes;
    // the winner ranks (count DESC, label ASC) — all hash-safe types
    "x53_label_prop" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |seeds AS (SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 0),
        |votes AS (SELECT e.src AS doc_id, s.lang AS pred_lang, COUNT(*) AS c
        |  FROM edges e JOIN seeds s ON s.doc_id = e.dst
        |  WHERE e.src % 10 <> 0 GROUP BY 1, 2),
        |best AS (SELECT doc_id, pred_lang FROM (SELECT doc_id, pred_lang,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, pred_lang) AS r
        |  FROM votes) q WHERE r = 1)
        |SELECT b.doc_id, b.pred_lang, d.lang AS true_lang,
        |CAST(b.pred_lang = d.lang AS INT) AS hit
        |FROM best b JOIN documents d ON d.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // x54: plain exact anti-join twin — the Spark side's Bloom screen is a
    // plan-level optimization in its sound direction (a rejected shingle is
    // PROVABLY novel), so the exact SQL is the gate, like x50
    "x54_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 2),
        |    i -> array_to_string(t[i:i+2], ' '))) AS u(shingle)),
        |ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 100),
        |c AS (SELECT s.doc_id, s.shingle,
        |  CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END AS novel
        |  FROM sh s LEFT JOIN ref r ON s.shingle = r.shingle
        |  WHERE s.doc_id >= 100)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |CAST(SUM(novel) AS BIGINT) AS n_novel,
        |ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 4) AS novelty
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x55: all-integer card; dup exposure is corpus-wide by contract
    "x55_dataset_card" ->
      """WITH d AS (SELECT source, lang, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  sha256(text) AS h FROM documents),
        |c AS (SELECT h, COUNT(*) AS nh FROM d GROUP BY h)
        |SELECT source, lang, COUNT(*) AS n_docs,
        |CAST(SUM(n_tok) AS BIGINT) AS n_tokens, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |CAST(SUM(CASE WHEN nh > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |ROUND(CAST(SUM(CASE WHEN nh > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / COUNT(*), 4) AS dup_frac
        |FROM d JOIN c USING (h)
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    // x56: both engines derive the same two synthetic snapshots (old = ids
    // ≢1 mod 10, new = ids ≢2, revised content at ids ≡3 with a constant
    // 5-char marker) — the diff itself is a digest-only full outer join
    "x56_snapshot_diff" ->
      """WITH oldd AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS nc,
        |  sha256(text) AS h FROM documents WHERE doc_id % 10 <> 1),
        |newd AS (SELECT doc_id, source,
        |  CAST(n_chars + CASE WHEN doc_id % 10 = 3 THEN 5 ELSE 0 END AS BIGINT) AS nc,
        |  CASE WHEN doc_id % 10 = 3 THEN sha256(text || ' rev2')
        |       ELSE sha256(text) END AS h
        |  FROM documents WHERE doc_id % 10 <> 2),
        |j AS (SELECT COALESCE(n.source, o.source) AS source,
        |  CASE WHEN o.h IS NULL THEN 'added' WHEN n.h IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END AS status,
        |  COALESCE(n.nc, 0) - COALESCE(o.nc, 0) AS delta
        |  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
        |SELECT source,
        |CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        |CAST(SUM(delta) AS BIGINT) AS chars_delta
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "x18_lm_score" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt)
        |SELECT t.doc_id, COUNT(*) AS n_tok,
        |ROUND(AVG(LN(CAST(c AS DOUBLE) / n)), 4) AS lm_score
        |FROM toks t JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // x09: the partition-batched binary decode emits exact integer byte
    // moments; on the declared ASCII slice (octet_length = n_chars) byte k
    // IS char k, so DuckDB reproduces them char-level with ascii() — the
    // same twinning trick as x19, no FP anywhere
    "x09_multimodal" ->
      """WITH en AS (SELECT doc_id, text FROM documents
        |  WHERE lang = 'en' AND octet_length(encode(text)) = n_chars),
        |m AS (SELECT doc_id, text,
        |  list_transform(range(1, length(text) + 1),
        |    i -> ascii(substr(text, CAST(i AS INT), 1))) AS bs FROM en)
        |SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |CAST(list_sum(bs) AS BIGINT) AS sum_b,
        |CAST(list_sum(list_transform(bs, b -> b * b)) AS BIGINT) AS sum_sq
        |FROM m ORDER BY media_id""".stripMargin,

    // x19's twin works in CHARS where Spark works in BYTES — identical on
    // the declared ASCII slice (the octet_length = n_chars filter)
    "x19_frame_sample" ->
      """WITH en AS (SELECT doc_id, text FROM documents
        |  WHERE lang = 'en' AND octet_length(encode(text)) = n_chars),
        |u AS (SELECT doc_id, text,
        |  UNNEST(range(0, CAST(CEIL(length(text) / 64.0) AS BIGINT), 2)) AS idx FROM en),
        |fr AS (SELECT doc_id, idx, substr(text, CAST(idx*64+1 AS INT), 64) AS f FROM u)
        |SELECT doc_id AS media_id, CAST(idx AS BIGINT) AS frame_idx,
        |CAST(length(f) AS BIGINT) AS frame_bytes,
        |CAST(list_sum(list_transform(range(1, length(f)+1),
        |  i -> ascii(substr(f, CAST(i AS INT), 1)))) AS BIGINT) AS checksum
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,

    "x16_token_shards" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |  CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d)
        |SELECT lang, (cum - n_tok) // 2000 AS shard, COUNT(*) AS n_docs,
        |CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,

    "x08_ann_ivf" ->
      """WITH cents AS (SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
        |  WHERE vec_id % (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) FROM embeddings) = 0),
        |assigned AS (SELECT vec_id, embedding, cluster FROM
        |  (SELECT vec_id, embedding, cent_id AS cluster,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM
        |   (SELECT e.vec_id, e.embedding, c.cent_id,
        |     ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[]))
        |      / (SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |       * SQRT(list_dot_product(CAST(c.c_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])))), 4) AS ccos
        |    FROM embeddings e CROSS JOIN cents c) s1) s2 WHERE r = 1),
        |probes AS (SELECT vec_id AS probe_id, embedding AS p_emb FROM embeddings WHERE vec_id < 10),
        |pclust AS (SELECT probe_id, p_emb, cluster FROM
        |  (SELECT probe_id, p_emb, cent_id AS cluster,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY ccos DESC, cent_id) AS r FROM
        |   (SELECT p.probe_id, p.p_emb, c.cent_id,
        |     ROUND(list_dot_product(CAST(p.p_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[]))
        |      / (SQRT(list_dot_product(CAST(p.p_emb AS DOUBLE[]), CAST(p.p_emb AS DOUBLE[])))
        |       * SQRT(list_dot_product(CAST(c.c_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])))), 4) AS ccos
        |    FROM probes p CROSS JOIN cents c) s3) s4 WHERE r <= 2),
        |cand AS (SELECT pc.probe_id, a.vec_id,
        |  ROUND(list_dot_product(CAST(pc.p_emb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(pc.p_emb AS DOUBLE[]), CAST(pc.p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))), 4) AS cos
        |  FROM assigned a JOIN pclust pc ON a.cluster = pc.cluster WHERE a.vec_id <> pc.probe_id)
        |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor_id, cos FROM
        |(SELECT probe_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk FROM cand) f
        |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // x37: the ANN accuracy gate — both engines compute BOTH the exact
    // top-5 (q54's formulation) and the IVF top-5 (x08's formulation)
    // themselves and the declared output is hit counts + the recall ≥ 0.95
    // verdict per probe; identical (round(cos,4), id) tie-breaks make the
    // two top-5 SETS deterministic, so the verdicts hash-match
    "x37_ann_recall" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT probe_id, vec_id, ${cosSql("p_emb", "embedding")} AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
        |exact AS (SELECT probe_id, vec_id FROM
        |  (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk FROM c) r
        |  WHERE rnk <= 5),
        |cents AS (SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
        |  WHERE vec_id % (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) FROM embeddings) = 0),
        |assigned AS (SELECT vec_id, embedding, cluster FROM
        |  (SELECT vec_id, embedding, cent_id AS cluster,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM
        |   (SELECT e.vec_id, e.embedding, c2.cent_id,
        |     ${cosSql("e.embedding", "c2.c_emb")} AS ccos
        |    FROM embeddings e CROSS JOIN cents c2) s1) s2 WHERE r = 1),
        |pclust AS (SELECT probe_id, p_emb, cluster FROM
        |  (SELECT probe_id, p_emb, cent_id AS cluster,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY ccos DESC, cent_id) AS r FROM
        |   (SELECT pp.probe_id, pp.p_emb, c2.cent_id,
        |     ${cosSql("pp.p_emb", "c2.c_emb")} AS ccos
        |    FROM p pp CROSS JOIN cents c2) s3) s4 WHERE r <= 2),
        |cand AS (SELECT pc.probe_id, a.vec_id,
        |  ${cosSql("pc.p_emb", "a.embedding")} AS cos
        |  FROM assigned a JOIN pclust pc ON a.cluster = pc.cluster
        |  WHERE a.vec_id <> pc.probe_id),
        |ivf AS (SELECT probe_id, vec_id FROM
        |  (SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk FROM cand) f
        |  WHERE rnk <= 5)
        |SELECT ex.probe_id, COUNT(*) AS n_exact, COUNT(i.vec_id) AS n_hit,
        |ROUND(CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*), 4) AS recall,
        |CAST(ROUND(CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*), 4) >= 0.95 AS INT) AS ok
        |FROM exact ex LEFT JOIN ivf i ON ex.probe_id = i.probe_id AND ex.vec_id = i.vec_id
        |GROUP BY ex.probe_id ORDER BY ex.probe_id""".stripMargin,

    // x20: all gap/duration arithmetic in exact integer µs (epoch_us ≡
    // unix_micros on the same floor-truncated timestamps); only sum_value
    // is a rounded double
    "x20_sessionize" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session FROM b)
         |SELECT user_id, session, COUNT(*) AS n_events, MIN(event_id) AS first_event,
         |(MAX(us) - MIN(us)) // 1000000 AS duration_s, ROUND(SUM(value), 4) AS sum_value
         |FROM s GROUP BY user_id, session ORDER BY user_id, session""".stripMargin,

    // x57: lead target pinned by the (ts, event_id) total order per user;
    // counts integer, one final rounded probability
    "x57_transitions" ->
      s"""WITH e AS ($E),
         |nx AS (SELECT event_type, lead(event_type) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM e),
         |c AS (SELECT event_type, next_type, COUNT(*) AS n FROM nx
         |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
         |SELECT c.event_type, c.next_type, c.n,
         |ROUND(CAST(c.n AS DOUBLE) / tot, 4) AS p
         |FROM c JOIN t USING (event_type)
         |ORDER BY event_type, next_type""".stripMargin,

    // x58: 2-D box slice; the z-store bench row runs the identical contract
    "x58_box" ->
      s"""WITH e AS ($E)
         |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
         |MIN(event_id) AS min_event, MAX(event_id) AS max_event
         |FROM e WHERE user_id BETWEEN 3 AND 7
         |AND ts >= TIMESTAMP '2024-01-10 00:00:00'
         |AND ts < TIMESTAMP '2024-01-15 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x65: value-bounded RANGE frame — tie-proof by construction (the
    // frame is a µs-interval SET, no total order needed)
    "x65_time_window" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, value, epoch_us(ts) AS us FROM e),
         |wnd AS (SELECT user_id,
         |  COUNT(*) OVER (PARTITION BY user_id ORDER BY us
         |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS n_24h,
         |  AVG(value) OVER (PARTITION BY user_id ORDER BY us
         |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS avg_24h
         |  FROM g)
         |SELECT user_id, CAST(SUM(n_24h) AS BIGINT) AS sum_n,
         |ROUND(SUM(ROUND(avg_24h, 4)), 4) AS checksum
         |FROM wnd GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x66: same gaps-and-islands algebra — strict `>` on the running max
    // of previous ends; all-integer µs
    "x66_interval_union" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  epoch_us(ts) + 300000000 AS e FROM e),
         |m AS (SELECT *, MAX(e) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM g),
         |f AS (SELECT *, CASE WHEN prev_max IS NULL OR us > prev_max THEN 1 ELSE 0 END AS new_span FROM m),
         |sp AS (SELECT *, CAST(SUM(new_span) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span FROM f),
         |spans AS (SELECT user_id, span, MIN(us) AS s0, MAX(e) AS s1
         |  FROM sp GROUP BY user_id, span)
         |SELECT user_id, COUNT(*) AS n_spans,
         |CAST(SUM(s1 - s0) // 1000000 AS BIGINT) AS covered_s
         |FROM spans GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x67: the corpus marginal derives from the same (source, tok) CTE;
    // ln-sum rounding under x18's precedent
    "x67_source_kl" ->
      """WITH toks AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |sc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sc GROUP BY 1),
        |cc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM sc GROUP BY 1),
        |ct AS (SELECT CAST(SUM(cc) AS DOUBLE) AS nn FROM cc)
        |SELECT source, MAX(n) AS n_tokens,
        |ROUND(SUM((CAST(c AS DOUBLE) / n) *
        |  LN((CAST(c AS DOUBLE) / n) / (CAST(sc_cc.cc AS DOUBLE) / nn))), 4) AS kl
        |FROM sc JOIN st USING (source) JOIN cc sc_cc USING (tok) CROSS JOIN ct
        |GROUP BY source ORDER BY source""".stripMargin,

    // x68: same fixed-order double dot product + IEEE sqrt both engines
    "x68_norm_audit" ->
      """WITH n AS (SELECT label,
        |  SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                        CAST(embedding AS DOUBLE[]))) AS norm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n, ROUND(AVG(norm), 4) AS avg_norm,
        |ROUND(MIN(norm), 4) AS min_norm, ROUND(MAX(norm), 4) AS max_norm,
        |CAST(SUM(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    // x69: regression aggregates over integer-derived day offsets
    "x69_trend" ->
      s"""WITH e AS ($E),
         |g AS (SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS x,
         |  value AS y FROM e)
         |SELECT event_type, COUNT(*) AS n,
         |ROUND(regr_slope(y, x), 4) AS slope,
         |ROUND(regr_intercept(y, x), 4) AS intercept,
         |ROUND(regr_r2(y, x), 6) AS r2
         |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x70: q25's exact interpolated percentile (quantile_cont) twin for
    // both the median and the MAD median
    "x70_mad_outliers" ->
      s"""WITH e AS ($E),
         |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY 1),
         |mad AS (SELECT e.event_type, quantile_cont(ABS(value - med), 0.5) AS mad
         |  FROM e JOIN med USING (event_type) GROUP BY 1)
         |SELECT e.event_type, COUNT(*) AS n,
         |ROUND(MAX(med), 4) AS median, ROUND(MAX(mad), 4) AS mad,
         |CAST(SUM(CASE WHEN ABS(value - med) > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // x71: entropy + count-argmax, tiebreak = MIN(event_type) among
    // max-count rows — same semantics as the Spark side's reverse-alphabet
    // struct-max involution
    "x71_user_entropy" ->
      s"""WITH e AS ($E),
         |c AS (SELECT user_id, event_type, COUNT(*) AS c FROM e GROUP BY 1, 2),
         |t AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
         |ent AS (SELECT user_id, MAX(n) AS n_events,
         |  ROUND(-SUM((CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n)), 4) AS entropy
         |  FROM c JOIN t USING (user_id) GROUP BY user_id),
         |mx AS (SELECT user_id, MAX(c) AS top_n FROM c GROUP BY 1),
         |top AS (SELECT user_id, MIN(event_type) AS top_type, MAX(c) AS top_n
         |  FROM c JOIN mx USING (user_id) WHERE c = top_n GROUP BY user_id)
         |SELECT user_id, n_events, entropy, top_type, top_n
         |FROM ent JOIN top USING (user_id) ORDER BY user_id""".stripMargin,

    // x72: distinct activity days -> min-day cohorts -> offset matrix
    "x72_retention" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e),
         |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1),
         |sz AS (SELECT cohort_day, COUNT(*) AS n_cohort FROM coh GROUP BY 1),
         |m AS (SELECT cohort_day, date_diff('day', cohort_day, day) AS "offset",
         |  COUNT(*) AS n_active
         |  FROM act JOIN coh USING (user_id)
         |  WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7
         |  GROUP BY 1, 2)
         |SELECT cohort_day, CAST("offset" AS BIGINT) AS "offset",
         |n_active, n_cohort,
         |ROUND(CAST(n_active AS DOUBLE) / n_cohort, 4) AS rate
         |FROM m JOIN sz USING (cohort_day)
         |ORDER BY cohort_day, "offset"""".stripMargin,

    // x73: x59's staged CTEs reduced to the converted-session delta
    // distribution; integer-second deltas before quantile_cont
    "x73_convert_time" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session FROM b),
         |tv AS (SELECT user_id, session, MIN(us) AS t_v FROM s
         |  WHERE event_type = 'view' GROUP BY 1, 2),
         |tc AS (SELECT s.user_id, s.session, MIN(us) AS t_c FROM s
         |  JOIN tv USING (user_id, session)
         |  WHERE event_type = 'click' AND us > t_v GROUP BY 1, 2),
         |tp AS (SELECT s.user_id, s.session, MIN(us) AS t_p FROM s
         |  JOIN tc USING (user_id, session)
         |  WHERE event_type = 'purchase' AND us > t_c GROUP BY 1, 2),
         |dl AS (SELECT (t_p - t_v) // 1000000 AS sec
         |  FROM tp JOIN tv USING (user_id, session))
         |SELECT COUNT(*) AS n_converted,
         |ROUND(quantile_cont(sec, 0.5), 4) AS p50_s,
         |ROUND(quantile_cont(sec, 0.9), 4) AS p90_s,
         |ROUND(AVG(sec), 4) AS mean_s
         |FROM dl""".stripMargin,

    // x74: rank on the ROUNDED pmi with the pair tiebreak, both engines
    "x74_pmi" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT u AS t, COUNT(*) AS cu FROM toks, UNNEST(t) AS z(u) GROUP BY 1),
        |nut AS (SELECT CAST(SUM(cu) AS DOUBLE) AS nu FROM uni),
        |bg AS (SELECT array_to_string(t[i:i+1], ' ') AS p FROM toks,
        |  UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
        |bi AS (SELECT p, COUNT(*) AS cb FROM bg GROUP BY 1 HAVING COUNT(*) >= 5),
        |nbt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nb FROM bg),
        |sc AS (SELECT bi.p AS pair, bi.cb AS n,
        |  ROUND(LN((CAST(bi.cb AS DOUBLE) / nb) / ((CAST(ua.cu AS DOUBLE) / nu)
        |    * (CAST(ub.cu AS DOUBLE) / nu))), 4) AS pmi
        |  FROM bi CROSS JOIN nbt CROSS JOIN nut
        |  JOIN uni ua ON ua.t = string_split(bi.p, ' ')[1]
        |  JOIN uni ub ON ub.t = string_split(bi.p, ' ')[2])
        |SELECT pair, n, pmi FROM
        |(SELECT *, row_number() OVER (ORDER BY pmi DESC, pair) AS r FROM sc) q
        |WHERE r <= 20 ORDER BY pmi DESC, pair""".stripMargin,

    // x75: same join-free explode of each active day onto its 7 covering
    // windows; inner join with DAU prunes past-corpus days
    "x75_stickiness" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM e),
         |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM act GROUP BY 1),
         |wx AS (SELECT day + CAST(i AS INTEGER) AS d, user_id FROM act,
         |  UNNEST(generate_series(0, 6)) AS g(i)),
         |wau AS (SELECT d, COUNT(DISTINCT user_id) AS wau FROM wx GROUP BY 1)
         |SELECT day, dau, wau,
         |ROUND(CAST(dau AS DOUBLE) / wau, 4) AS stickiness
         |FROM dau JOIN wau ON wau.d = dau.day ORDER BY day""".stripMargin,

    // x76: x57's transition CTEs + a per-user cross-entropy reduction
    "x76_typicality" ->
      s"""WITH e AS ($E),
         |nx AS (SELECT user_id, event_type, lead(event_type) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM e),
         |pairs AS (SELECT * FROM nx WHERE next_type IS NOT NULL),
         |c AS (SELECT event_type, next_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(SUM(n) AS DOUBLE) AS tot FROM c GROUP BY 1),
         |m AS (SELECT c.event_type, c.next_type, CAST(n AS DOUBLE) / tot AS p
         |  FROM c JOIN t USING (event_type))
         |SELECT user_id, COUNT(*) AS n_trans,
         |ROUND(AVG(-LN(p)), 4) AS xent
         |FROM pairs JOIN m USING (event_type, next_type)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x77: same lang-blocked probe set, same 40-char prefixes, same
    // (dist, cand_id) argmin
    "x77_fuzzy" ->
      """WITH pref AS (SELECT doc_id, lang, substr(text, 1, 40) AS p40 FROM documents),
        |probes AS (SELECT doc_id AS probe_id, lang, p40 AS probe_p FROM pref
        |  WHERE doc_id % 100 = 0),
        |sc AS (SELECT probe_id, c.doc_id AS cand_id,
        |  levenshtein(probe_p, c.p40) AS dist
        |  FROM probes JOIN pref c USING (lang) WHERE c.doc_id <> probe_id)
        |SELECT probe_id, cand_id AS best_id, CAST(dist AS BIGINT) AS dist FROM
        |(SELECT *, row_number() OVER (PARTITION BY probe_id
        |  ORDER BY dist, cand_id) AS r FROM sc) q
        |WHERE r = 1 ORDER BY probe_id""".stripMargin,

    // x78: the window-function STATEMENT of the same semantics — the
    // Spark side derives identical values from cumulative counts
    "x78_length_pr" ->
      """SELECT doc_id, source, n_chars,
        |ROUND(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 4) AS pr,
        |ROUND(cume_dist() OVER (PARTITION BY source ORDER BY n_chars), 4) AS cd
        |FROM documents ORDER BY doc_id""".stripMargin,

    // x79: same U-shaped weights (1 / 0.5 / 0.4-edges / 0.2 split), same
    // (c_ts, click_id) ordering inside each purchase window
    "x79_attribution" ->
      s"""WITH e AS ($E),
         |c AS (SELECT user_id, event_id AS click_id, ts AS c_ts,
         |  CAST(ts AS DATE) AS c_day FROM e WHERE event_type = 'click'),
         |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM e
         |  WHERE event_type = 'purchase'),
         |cand AS (SELECT p_id, click_id, c_ts, c_day FROM p JOIN c USING (user_id)
         |  WHERE c_ts < p_ts AND c_ts >= p_ts - INTERVAL 24 HOURS),
         |wtd AS (SELECT c_day,
         |  row_number() OVER (PARTITION BY p_id ORDER BY c_ts, click_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY p_id) AS k
         |  FROM cand)
         |SELECT c_day AS day, COUNT(*) AS n_clicks,
         |ROUND(SUM(CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
         |  WHEN rn = 1 OR rn = k THEN 0.4
         |  ELSE 0.2 / (k - 2) END), 4) AS credit
         |FROM wtd GROUP BY c_day ORDER BY day""".stripMargin,

    // x80: lag-7 on the (type, day) aggregate with the calendar-gap guard
    "x80_backtest" ->
      s"""WITH e AS ($E),
         |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |  SUM(value) / COUNT(*) AS m FROM e GROUP BY 1, 2),
         |lagd AS (SELECT event_type, day, m,
         |  lag(m, 7) OVER (PARTITION BY event_type ORDER BY day) AS f,
         |  lag(day, 7) OVER (PARTITION BY event_type ORDER BY day) AS fday
         |  FROM daily)
         |SELECT event_type, COUNT(*) AS n_days,
         |ROUND(AVG(ABS(m - f)), 4) AS mae,
         |ROUND(AVG(ABS(m - f) / ABS(m)), 4) AS mape
         |FROM lagd WHERE f IS NOT NULL AND date_diff('day', fday, day) = 7
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x81: DuckDB dayofweek (0=Sun) ≡ Spark dayofweek−1; integer calendar
    // lookups, no FP in the key
    "x81_weekday" ->
      s"""WITH e AS ($E),
         |a AS (SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
         |  COUNT(*) AS n, SUM(value) AS sv FROM e GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM a GROUP BY 1)
         |SELECT a.event_type, dow, n,
         |ROUND(CAST(n AS DOUBLE) / tot, 4) AS share,
         |ROUND(sv / n, 4) AS avg_value
         |FROM a JOIN t USING (event_type)
         |ORDER BY event_type, dow""".stripMargin,

    // x59: x20's session CTE + three shrinking stage aggregates; the
    // strict `>` ordering inside a session is on µs, tie-free per stage
    // because each stage keys on the PREVIOUS stage's minimum
    "x59_funnel" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session FROM b),
         |tv AS (SELECT user_id, session, MIN(us) AS t_v FROM s
         |  WHERE event_type = 'view' GROUP BY 1, 2),
         |tc AS (SELECT s.user_id, s.session, MIN(us) AS t_c FROM s
         |  JOIN tv USING (user_id, session)
         |  WHERE event_type = 'click' AND us > t_v GROUP BY 1, 2),
         |tp AS (SELECT s.user_id, s.session, MIN(us) AS t_p FROM s
         |  JOIN tc USING (user_id, session)
         |  WHERE event_type = 'purchase' AND us > t_c GROUP BY 1, 2),
         |tot AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, session FROM s)),
         |st AS (SELECT '0_all' AS stage, n AS n_sessions FROM tot
         |  UNION ALL SELECT '1_view', COUNT(*) FROM tv
         |  UNION ALL SELECT '2_view_click', COUNT(*) FROM tc
         |  UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM tp)
         |SELECT stage, CAST(n_sessions AS BIGINT) AS n_sessions,
         |ROUND(CAST(n_sessions AS DOUBLE) / (SELECT n FROM tot), 4) AS frac
         |FROM st ORDER BY stage""".stripMargin,

    // x60: fixed horizon DATE '2024-01-31'; integer day ages, libm exp
    // (x18's ln precedent), one rounded sum
    "x60_decay" ->
      s"""WITH e AS ($E)
         |SELECT user_id, COUNT(*) AS n_events,
         |ROUND(SUM(value * EXP(-CAST(date_diff('day', CAST(ts AS DATE),
         |  DATE '2024-01-31') AS DOUBLE) / 7.0)), 4) AS decay_score
         |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x61: conditional-count twin — the exact shape Spark's explicit-values
    // pivot compiles to
    "x61_pivot" ->
      s"""WITH e AS ($E)
         |SELECT user_id,
         |CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x62: UNION ALL melt twin of Spark's native unpivot
    "x62_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, COUNT(*) AS n, ROUND(SUM(v), 4) AS total,
        |ROUND(AVG(v), 4) AS mean
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin,

    // x63: q21's tolerance-verdict pattern — each engine judges its OWN
    // sketch against the exact count; the verdict, not the estimate, is
    // the declared value
    "x63_sketch_union" ->
      s"""WITH e AS ($E),
         |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
         |  FROM e GROUP BY event_type),
         |ap AS (SELECT event_type, approx_count_distinct(user_id) AS est
         |  FROM e GROUP BY event_type)
         |SELECT ex.event_type, ex.n_exact,
         |CAST(ABS(CAST(est AS DOUBLE) - n_exact) <= 0.05 * n_exact AS INT) AS ok
         |FROM ex JOIN ap USING (event_type) ORDER BY event_type""".stripMargin,

    // x64: direct raw-scan semantics of the rollup-routed range aggregate
    "x64_range_agg" ->
      s"""WITH e AS ($E)
         |SELECT event_type, COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sum_value,
         |MIN(value) AS min_value, MAX(value) AS max_value,
         |ROUND(SUM(value) / COUNT(*), 4) AS avg_value
         |FROM e WHERE ts >= TIMESTAMP '2024-01-05 00:30:10'
         |AND ts < TIMESTAMP '2024-01-20 07:45:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x21_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t) - 2),
        |  i -> array_to_string(t[i:i+2], ' '))) AS g FROM toks)
        |SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct,
        |ROUND(1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x22: FLOOR over the identically-associated IEEE expression on both
    // sides — no half-way hazard; only max_err is a rounded double. The
    // quantized vector is serialized (comma-joined exact integers): the
    // driver's pandas canonicalizer cannot hash a raw LIST column
    "x22_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
        |q AS (SELECT vec_id, v, mn, mx, list_transform(v, x ->
        |  CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |       ELSE CAST(FLOOR((x - mn) * 255.0 / (mx - mn)) AS BIGINT) END) AS qv FROM m)
        |SELECT vec_id,
        |array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ',') AS qv_csv,
        |ROUND(list_max(list_transform(generate_series(1, len(v)),
        |  i -> ABS(v[i] - (mn + qv[i] * (mx - mn) / 255.0)))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // x23: increases are differences (or raw values) of 2-decimal doubles,
    // so the rounded SUM's true value is a multiple of 0.01 — no 4-dp edge
    "x23_counter_rate" ->
      s"""WITH e AS ($E),
         |g AS (SELECT event_type, value, lag(value) OVER
         |  (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev FROM e),
         |i AS (SELECT event_type, value, prev,
         |  CASE WHEN prev IS NULL THEN NULL
         |       WHEN value < prev THEN value ELSE value - prev END AS inc FROM g)
         |SELECT event_type, COUNT(inc) AS n_deltas,
         |COUNT(CASE WHEN value < prev THEN 1 END) AS n_resets,
         |ROUND(SUM(inc), 4) AS total_increase
         |FROM i GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x24: Σ(cents·dt_us) is exact int128 here / DECIMAL(38,0) in Spark;
    // the only IEEE op is the same single divide of the same two integers
    "x24_twa" ->
      s"""WITH e AS ($E),
         |g AS (SELECT event_type, value, epoch_us(ts) AS us, lead(epoch_us(ts)) OVER
         |  (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS next_us FROM e),
         |iv AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         |  next_us - us AS dt_us FROM g WHERE next_us IS NOT NULL AND next_us > us)
         |SELECT event_type, COUNT(*) AS n_intervals,
         |ROUND(CAST(SUM(cents * dt_us) AS DOUBLE) / (CAST(SUM(dt_us) AS DOUBLE) * 100.0), 4) AS twa
         |FROM iv GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x25: daily sums snap to DECIMAL(18,2) before the double cast, so both
    // engines window over identical doubles; z is rounded BEFORE the filter.
    // sd > 0 excludes constant series explicitly on both sides — otherwise
    // Spark's NULL-on-divide-by-zero vs DuckDB's inf diverge (ADVICE r4)
    "x25_anomaly" ->
      s"""WITH e AS ($E),
         |daily AS (SELECT strftime(ts, '%Y-%m-%d') AS d, event_type,
         |  SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec FROM e GROUP BY 1, 2),
         |z AS (SELECT d, event_type, CAST(sum_dec AS DOUBLE) AS day_sum,
         |  AVG(CAST(sum_dec AS DOUBLE)) OVER w AS mu,
         |  stddev_samp(CAST(sum_dec AS DOUBLE)) OVER w AS sd
         |  FROM daily WINDOW w AS (PARTITION BY event_type))
         |SELECT d, event_type, day_sum, ROUND((day_sum - mu) / sd, 2) AS z FROM z
         |WHERE sd > 0 AND ABS(ROUND((day_sum - mu) / sd, 2)) >= 1.8
         |ORDER BY d, event_type""".stripMargin,

    // x26: same association `prev + (next - prev) * (dd/span)` on both
    // sides; day distances are exact integers
    "x26_interpolate" ->
      s"""WITH e AS ($E),
         |daily AS (SELECT CAST(ts AS DATE) AS d, event_type,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v FROM e GROUP BY 1, 2),
         |bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM e),
         |spine AS (SELECT t.event_type, CAST(s.d AS DATE) AS d FROM
         |  (SELECT DISTINCT event_type FROM e) t CROSS JOIN
         |  (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds) s),
         |j AS (SELECT sp.d, sp.event_type, daily.v FROM spine sp
         |  LEFT JOIN daily ON sp.d = daily.d AND sp.event_type = daily.event_type),
         |f AS (SELECT d, event_type, v,
         |  last_value(v IGNORE NULLS) OVER wp AS prev_v,
         |  last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER wp AS prev_d,
         |  first_value(v IGNORE NULLS) OVER wn AS next_v,
         |  first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER wn AS next_d
         |  FROM j WINDOW
         |  wp AS (PARTITION BY event_type ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wn AS (PARTITION BY event_type ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT d, event_type,
         |CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'lerp' END AS src,
         |ROUND(CASE WHEN v IS NOT NULL THEN v
         |  ELSE prev_v + (next_v - prev_v) *
         |    (CAST(d - prev_d AS DOUBLE) / CAST(next_d - prev_d AS DOUBLE)) END, 4) AS v
         |FROM f WHERE v IS NOT NULL OR (prev_v IS NOT NULL AND next_v IS NOT NULL)
         |ORDER BY d, event_type""".stripMargin,

    // x27: all-integer counts + one exact ratio — no FP hazards
    "x27_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sp AS (SELECT DISTINCT doc_id, span FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 12),
        |    i -> array_to_string(t[i:i+12], ' '))) AS u(span)),
        |sh AS (SELECT span FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT sp.doc_id, COUNT(*) AS n_spans, COUNT(sh.span) AS n_shared,
        |ROUND(CAST(COUNT(sh.span) AS DOUBLE) / COUNT(*), 4) AS shared_frac
        |FROM sp LEFT JOIN sh ON sp.span = sh.span
        |GROUP BY sp.doc_id ORDER BY doc_id""".stripMargin,

    // x28: exact strings/integers only; deny = top-8 df tokens (the whole
    // fixture vocabulary is 31 tokens, so 8 is the "function word" mass)
    "x28_scrub" ->
      """WITH toks AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |deny AS (SELECT list(tok) AS dl FROM (SELECT tok FROM
        |  (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
        |  ORDER BY df DESC, tok LIMIT 8)),
        |s AS (SELECT doc_id, string_split(text, ' ') AS t,
        |  list_filter(string_split(text, ' '), x -> NOT list_contains(dl, x)) AS kept
        |  FROM documents CROSS JOIN deny)
        |SELECT doc_id, len(t) AS n_tok, len(kept) AS n_kept,
        |substring(md5(array_to_string(kept, ' ')), 1, 16) AS scrub_fp
        |FROM s ORDER BY doc_id""".stripMargin,

    // x29: all-integer replication arithmetic (HUGEINT twins DECIMAL(38,0));
    // the multiplicative-hash draw and the T/(S*ks) ratio never touch doubles
    "x29_mixture_resample" ->
      """WITH d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents),
        |k AS (SELECT source, SUM(ntok) AS ks FROM d GROUP BY source),
        |t AS (SELECT SUM(ntok) AS tt, COUNT(DISTINCT source) AS srcs FROM d),
        |c AS (SELECT d.doc_id, d.source,
        |  tt // (srcs * ks)
        |  + CASE WHEN (CAST(d.doc_id AS HUGEINT) * 2654435761) % 4294967296
        |             * CAST(srcs * ks AS HUGEINT)
        |           < CAST(tt % (srcs * ks) AS HUGEINT) * 4294967296
        |         THEN 1 ELSE 0 END AS n
        |  FROM d, k, t WHERE d.source = k.source)
        |SELECT doc_id, source, copy FROM (
        |  SELECT doc_id, source,
        |    CAST(UNNEST(generate_series(1, CAST(n AS BIGINT))) AS BIGINT) AS copy
        |  FROM c)
        |ORDER BY doc_id, copy""".stripMargin,

    // x34: q21's tolerance-verdict pattern for the percentile sketch —
    // each engine's own sketch vs its own exact, booleans hash-compared
    "x34_quantile_sketch" ->
      """SELECT event_type, ROUND(e50, 4) AS p50, ROUND(e90, 4) AS p90,
        |CAST(ABS(a50 - e50) <= 0.05 * ABS(e50) AS INT) AS ok50,
        |CAST(ABS(a90 - e90) <= 0.05 * ABS(e90) AS INT) AS ok90
        |FROM (SELECT event_type,
        |  quantile_cont(value, 0.5) AS e50, quantile_cont(value, 0.9) AS e90,
        |  approx_quantile(value, 0.5) AS a50, approx_quantile(value, 0.9) AS a90
        |  FROM events GROUP BY event_type) t
        |ORDER BY event_type""".stripMargin,

    // x33: x14's recursive-CTE reachability + an all-integer argmax
    // (n_chars DESC, doc_id) — the survivor choice cannot diverge
    "x33_dedup_survivors" ->
      """WITH RECURSIVE t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |j AS (SELECT lab.doc_id, cluster_id, n_chars,
        |  row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_chars DESC, lab.doc_id) AS rnk
        |  FROM lab JOIN documents d ON lab.doc_id = d.doc_id),
        |a AS (SELECT cluster_id, COUNT(*)::BIGINT AS n_members,
        |  SUM(n_chars)::BIGINT AS chars_total FROM j GROUP BY 1)
        |SELECT a.cluster_id AS cluster_id, k.doc_id AS keeper, n_members,
        |k.n_chars AS chars_kept, chars_total - k.n_chars AS chars_dropped
        |FROM a JOIN j k ON a.cluster_id = k.cluster_id AND k.rnk = 1
        |ORDER BY a.cluster_id""".stripMargin,

    // x36: the boundary convention (ceil division, clamped final start,
    // 1-based inclusive slice) is pinned identically; strings/ints only
    "x36_chunk_windows" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (SELECT doc_id, t,
        |  CAST(u.k AS BIGINT) AS chunk_idx,
        |  least(u.k * 24, greatest(len(t) - 32, 0)) + 1 AS st
        |  FROM toks, UNNEST(generate_series(0, (greatest(len(t) - 32, 0) + 23) // 24)) AS u(k))
        |SELECT doc_id, chunk_idx,
        |array_to_string(t[st:st+31], ' ') AS chunk,
        |CAST(len(string_split(array_to_string(t[st:st+31], ' '), ' ')) AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // x35: md5 of the decimal id string is engine-independent; ties
    // impossible (md5 collision), doc_id tiebreak pinned anyway
    "x35_fixed_k_sample" ->
      """SELECT lang, rnk, doc_id, source FROM (
        |  SELECT lang, doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
        |  FROM documents) t
        |WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin,

    // x30: integer intersection counts; one ROUND(4)-snapped ratio
    "x30_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 4),
        |    i -> array_to_string(t[i:i+4], ' '))) AS u(shingle)),
        |n AS (SELECT source, COUNT(*)::BIGINT AS n FROM sh GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*)::BIGINT AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, inter, na.n AS na, nb.n AS nb,
        |ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 4) AS jac
        |FROM p JOIN n na ON p.src_a = na.source JOIN n nb ON p.src_b = nb.source
        |ORDER BY src_a, src_b""".stripMargin,

    // x31: integer counts; ties broken (cnt DESC, bigram ASC) in both engines
    "x31_top_bigrams" ->
      """WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT lang, bigram FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+1], ' '))) AS u(bigram)),
        |c AS (SELECT lang, bigram, COUNT(*)::BIGINT AS cnt FROM bg GROUP BY 1, 2)
        |SELECT lang, bigram, cnt, rnk FROM (
        |  SELECT lang, bigram, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS BIGINT) AS rnk
        |  FROM c) WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin,

    // x32: integer novelty counts + cumsum; one ROUND(4)-snapped ratio
    "x32_vocab_growth" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, shingle FROM toks,
        |  UNNEST(list_transform(generate_series(1, len(t) - 2),
        |    i -> array_to_string(t[i:i+2], ' '))) AS u(shingle)),
        |fi AS (SELECT shingle, MIN(source) AS source FROM sh GROUP BY shingle),
        |nv AS (SELECT source, COUNT(*)::BIGINT AS novel FROM fi GROUP BY source),
        |tot AS (SELECT source, COUNT(*)::BIGINT AS n_distinct FROM sh GROUP BY source)
        |SELECT tot.source, n_distinct, COALESCE(novel, 0) AS novel,
        |CAST(SUM(COALESCE(novel, 0)) OVER (ORDER BY tot.source
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_novel,
        |ROUND(CAST(COALESCE(novel, 0) AS DOUBLE) / n_distinct, 4) AS novelty
        |FROM tot LEFT JOIN nv ON tot.source = nv.source
        |ORDER BY tot.source""".stripMargin,

    // x86: all-integer CUSUM — exact cents, BIGINT prefix sums, the peak
    // position tie-broken to the smallest event_id via FILTER on the
    // windowed max
    "x86_cusum" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, ts, event_id,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM e),
         |w AS (SELECT user_id, event_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS i,
         |  CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c FROM g),
         |t AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS tot FROM g GROUP BY 1),
         |dv AS (SELECT w.user_id, event_id, n, ABS(n * c - i * tot) AS dev
         |  FROM w JOIN t USING (user_id)),
         |mx AS (SELECT *, MAX(dev) OVER (PARTITION BY user_id) AS md FROM dv)
         |SELECT user_id, n, MAX(dev) AS peak_dev,
         |MIN(event_id) FILTER (WHERE dev = md) AS peak_event
         |FROM mx GROUP BY user_id, n ORDER BY user_id""".stripMargin,

    // x87: the weight ladder 3^(r−1)·4^(8−r) as an exact literal list on
    // both sides; numerator/denominator are BIGINT sums, one rounded divide
    "x87_ewma" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS BIGINT) AS r
         |  FROM e),
         |k AS (SELECT user_id, cents,
         |  [16384, 12288, 9216, 6912, 5184, 3888, 2916, 2187][CAST(r AS INT)] AS wt
         |  FROM g WHERE r <= 8)
         |SELECT user_id, COUNT(*) AS n_taps,
         |ROUND(CAST(SUM(cents * wt) AS DOUBLE) / CAST(SUM(wt) * 100 AS DOUBLE), 4) AS ewma
         |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x88: digit from the exact-cents integer STRING — no log10 (libm
    // last-ulp differences flip the digit exactly at powers of ten)
    "x88_benford" ->
      """WITH d AS (SELECT SUBSTR(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS VARCHAR), 1, 1) AS digit FROM lineitem),
        |a AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM a)
        |SELECT digit, n, ROUND(CAST(n AS DOUBLE) / tot, 4) AS share
        |FROM a, t ORDER BY digit""".stripMargin,

    // x89: integer floor-division length buckets (n_chars > 0, so Spark's
    // truncating cast ≡ DuckDB's //)
    "x89_kanon" ->
      """WITH c AS (SELECT lang, source, CAST(n_chars AS BIGINT) // 100 AS len_bucket,
        |  COUNT(*) AS sz FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, COUNT(*) AS n_groups,
        |CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |MIN(sz) AS min_size,
        |ROUND(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(sz) AS DOUBLE), 4) AS risk_share
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    // x90: x20's session CTE + two leads; the same-island equality filter
    // replaces any pairwise join
    "x90_path_trigrams" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess FROM b),
         |tri AS (SELECT event_type AS t1,
         |  lead(event_type, 1) OVER w AS t2, lead(event_type, 2) OVER w AS t3,
         |  sess, lead(sess, 2) OVER w AS s3 FROM s
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
         |SELECT t1, t2, t3, COUNT(*) AS n FROM tri
         |WHERE t3 IS NOT NULL AND s3 = sess
         |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,

    // x91: rn − rn_by_type islands; all-integer until the one rounded mean
    "x91_scd2" ->
      s"""WITH e AS ($E),
         |r AS (SELECT user_id, event_type,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         |  - CAST(ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS BIGINT) AS island
         |  FROM e),
         |runs AS (SELECT user_id, event_type, island, COUNT(*) AS len FROM r GROUP BY 1, 2, 3)
         |SELECT event_type, COUNT(*) AS n_intervals,
         |ROUND(CAST(SUM(len) AS DOUBLE) / COUNT(*), 4) AS avg_run,
         |MAX(len) AS max_run
         |FROM runs GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x92: long-form self-join twin of the pivot+constant-width-moments
    // plan; every moment is exact (HUGEINT ≡ Spark DECIMAL(38,0)), the
    // single double step is the same sqrt-of-one-product divide
    "x92_corr_pairs" ->
      s"""WITH e AS ($E),
         |cell AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
         |  SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
         |  FROM e GROUP BY 1, 2, 3),
         |p AS (SELECT user_id, day,
         |  COALESCE(SUM(CASE WHEN event_type = 'click' THEN cents END), 0) AS click,
         |  COALESCE(SUM(CASE WHEN event_type = 'error' THEN cents END), 0) AS error,
         |  COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN cents END), 0) AS purchase,
         |  COALESCE(SUM(CASE WHEN event_type = 'signup' THEN cents END), 0) AS signup,
         |  COALESCE(SUM(CASE WHEN event_type = 'view' THEN cents END), 0) AS view
         |  FROM cell GROUP BY 1, 2),
         |l AS (SELECT user_id, day, 'click' AS t, click AS v FROM p
         |  UNION ALL SELECT user_id, day, 'error', error FROM p
         |  UNION ALL SELECT user_id, day, 'purchase', purchase FROM p
         |  UNION ALL SELECT user_id, day, 'signup', signup FROM p
         |  UNION ALL SELECT user_id, day, 'view', view FROM p),
         |j AS (SELECT a.t AS type_a, b.t AS type_b, a.v AS x, b.v AS y
         |  FROM l a JOIN l b ON a.user_id = b.user_id AND a.day = b.day
         |  WHERE a.t < b.t),
         |mo AS (SELECT type_a, type_b, CAST(COUNT(*) AS HUGEINT) AS n,
         |  CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         |  SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
         |  SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM j GROUP BY 1, 2)
         |SELECT type_a, type_b,
         |ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
         |  / SQRT(CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)), 4) AS corr
         |FROM mo
         |WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |ORDER BY type_a, type_b""".stripMargin,

    // x93: q53's pair CTE at the 0.5 floor + the integer containment gate
    // (10·|∩| ≥ 9·min) — no double in either engine's filter
    "x93_containment" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j,
        |ROUND(CAST(i AS DOUBLE) / LEAST(sa.n, sb.n), 4) AS containment
        |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
        |AND i * 10 >= LEAST(sa.n, sb.n) * 9
        |ORDER BY doc_a, doc_b""".stripMargin,

    // x94: distinct (doc, tok) df counts; deterministic (df DESC, tok) top-30
    "x94_stopwords" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |d AS (SELECT tok, COUNT(*) AS df FROM t GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT tok, df, ROUND(CAST(df AS DOUBLE) / n, 4) AS df_share
        |FROM d, n ORDER BY df DESC, tok LIMIT 30""".stripMargin,

    // x95: adjacent char pairs inside words — substr is character-based
    // (UTF-8-aware) in BOTH engines, so the zh docs pair identically
    "x95_bpe_pairs" ->
      """WITH w AS (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
        |p AS (SELECT UNNEST(list_transform(generate_series(1, length(word) - 1),
        |  i -> substr(word, i, 2))) AS pair FROM w WHERE length(word) >= 2)
        |SELECT pair, COUNT(*) AS n FROM p GROUP BY 1
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // x96: Q25's quantile_cont ≡ Spark percentile twinning for the median
    "x96_key_skew" ->
      s"""WITH e AS ($E),
         |c AS (SELECT user_id, COUNT(*) AS n FROM e GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS total,
         |  quantile_cont(n, 0.5) AS med FROM c)
         |SELECT user_id, n, ROUND(CAST(n AS DOUBLE) / total, 4) AS share,
         |ROUND(CAST(n AS DOUBLE) / med, 2) AS x_median
         |FROM c, st ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

    // x97: x82's recursive-CTE labels + a per-cluster direct-edge count;
    // size ≥ 2 clusters always have ≥ 1 edge, so the join is inner
    "x97_cluster_audit" ->
      """WITH RECURSIVE t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.comp < e.dst),
        |lab AS (SELECT id, MIN(comp) AS cluster_id FROM reach GROUP BY id),
        |cs AS (SELECT cluster_id, COUNT(*) AS size FROM lab GROUP BY 1),
        |direct AS (SELECT l.cluster_id, COUNT(*) AS direct
        |  FROM pairs p JOIN lab l ON l.id = p.doc_a GROUP BY 1),
        |aud AS (SELECT size, cs.cluster_id, direct, size * (size - 1) // 2 AS possible
        |  FROM cs JOIN direct USING (cluster_id) WHERE size >= 2)
        |SELECT size, COUNT(*) AS n_clusters,
        |CAST(SUM(direct) AS BIGINT) AS direct_pairs,
        |CAST(SUM(possible) AS BIGINT) AS possible_pairs,
        |ROUND(1.0 - CAST(SUM(direct) AS DOUBLE) / SUM(possible), 4) AS gap
        |FROM aud GROUP BY size ORDER BY size""".stripMargin,

    // x98: fixed bin edges + full 14-bin Laplace grid on both sides;
    // ln-sum rounding under x18/x67's precedent
    "x98_psi_drift" ->
      s"""WITH e AS ($E),
         |b AS (SELECT event_type,
         |  CASE WHEN ts < TIMESTAMP '2024-01-15 12:00:00' THEN 'a' ELSE 'b' END AS half,
         |  LEAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 2500, 13) AS bin FROM e),
         |c AS (SELECT event_type, half, bin, COUNT(*) AS c FROM b GROUP BY 1, 2, 3),
         |grid AS (SELECT DISTINCT event_type, g.bin FROM c,
         |  (SELECT UNNEST(generate_series(0, 13)) AS bin) g),
         |na AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_a FROM c WHERE half = 'a' GROUP BY 1),
         |nb AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_b FROM c WHERE half = 'b' GROUP BY 1),
         |pa AS (SELECT g.event_type, g.bin,
         |  CAST(COALESCE(ca.c, 0) + 1 AS DOUBLE) / (n_a + 14) AS p_a, n_a
         |  FROM grid g LEFT JOIN (SELECT * FROM c WHERE half = 'a') ca
         |    ON g.event_type = ca.event_type AND g.bin = ca.bin
         |  JOIN na ON na.event_type = g.event_type),
         |pb AS (SELECT g.event_type, g.bin,
         |  CAST(COALESCE(cb.c, 0) + 1 AS DOUBLE) / (n_b + 14) AS p_b, n_b
         |  FROM grid g LEFT JOIN (SELECT * FROM c WHERE half = 'b') cb
         |    ON g.event_type = cb.event_type AND g.bin = cb.bin
         |  JOIN nb ON nb.event_type = g.event_type)
         |SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         |ROUND(SUM((p_a - p_b) * LN(p_a / p_b)), 4) AS psi
         |FROM pa JOIN pb USING (event_type, bin)
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x99: fixture-anchored hourly spine; LOCF via IGNORE NULLS last_value
    // over the same ROWS frame; exact-cents payload end to end
    "x99_align" ->
      s"""WITH e AS ($E),
         |hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
         |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS observed
         |  FROM e GROUP BY 1, 2),
         |spine AS (SELECT t.event_type, g.h
         |  FROM (SELECT DISTINCT event_type FROM hourly) t,
         |  (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
         |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h) g)
         |SELECT event_type, h,
         |CAST(observed IS NOT NULL AS INT) AS is_observed,
         |last_value(observed IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
         |FROM spine LEFT JOIN hourly USING (event_type, h)
         |ORDER BY event_type, h""".stripMargin,

    // x100: open/close via rn-1 conditional aggregates over the total
    // (ts, event_id) order — the twin of Spark's min_by/max_by on structs;
    // picked values are raw doubles, volume exact cents
    "x100_ohlc" ->
      s"""WITH e AS ($E),
         |r AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |  row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
         |    ORDER BY ts, event_id) AS ra,
         |  row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
         |    ORDER BY ts DESC, event_id DESC) AS rd
         |  FROM e)
         |SELECT event_type, day,
         |MAX(CASE WHEN ra = 1 THEN value END) AS open,
         |MAX(value) AS high, MIN(value) AS low,
         |MAX(CASE WHEN rd = 1 THEN value END) AS close,
         |COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS volume_cents
         |FROM r GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,

    // x101: x85's exact rounded-cos ranking twice (full dims and the
    // [1:16] prefix slice), overlap joined on (probe, vec)
    "x101_matryoshka" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb
        |  FROM embeddings WHERE vec_id < 10),
        |cf AS (SELECT probe_id, vec_id,
        |  ROUND(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
        |ct AS (SELECT probe_id, vec_id,
        |  ROUND(list_dot_product(CAST(p_emb AS DOUBLE[])[1:16], CAST(embedding AS DOUBLE[])[1:16])
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[])[1:16], CAST(p_emb AS DOUBLE[])[1:16]))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[])[1:16], CAST(embedding AS DOUBLE[])[1:16]))), 4) AS cos
        |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
        |tf AS (SELECT probe_id, vec_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk
        |   FROM cf) q WHERE rnk <= 10),
        |tt AS (SELECT probe_id, vec_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk
        |   FROM ct) q WHERE rnk <= 10),
        |ov AS (SELECT tf.probe_id, COUNT(*) AS n_common
        |  FROM tf JOIN tt ON tf.probe_id = tt.probe_id AND tf.vec_id = tt.vec_id
        |  GROUP BY 1)
        |SELECT p.probe_id AS probe_id, COALESCE(n_common, 0) AS n_common,
        |ROUND(CAST(COALESCE(n_common, 0) AS DOUBLE) / 10.0, 4) AS recall
        |FROM p LEFT JOIN ov ON p.probe_id = ov.probe_id
        |ORDER BY p.probe_id""".stripMargin,

    // x102: per-lang running token total via a window, each doc unnested
    // into the 256-token chunks it overlaps; all-integer per-chunk manifest
    "x102_seq_pack" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, lang, n,
        |  CAST(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum FROM d),
        |e AS (SELECT lang, doc_id, n, cum,
        |  UNNEST(generate_series((cum - n) // 256, (cum - 1) // 256)) AS chunk FROM c)
        |SELECT lang, chunk, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN (cum - n) // 256 = chunk THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |  MIN(doc_id) AS head_doc,
        |  CAST(LEAST(256 * (chunk + 1), MAX(cum)) - 256 * chunk AS BIGINT) AS n_fill
        |FROM e GROUP BY lang, chunk ORDER BY lang, chunk""".stripMargin,

    // x103: tie-aware Mann–Whitney AUC from the length histogram; U doubled
    // to stay integral, one rounded divide at the end
    "x103_length_auc" ->
      """WITH h AS (SELECT n_chars,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM documents GROUP BY 1),
        |c AS (SELECT n_chars, pos, neg,
        |  CAST(COALESCE(SUM(neg) OVER (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnb
        |  FROM h)
        |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
        |  CAST(SUM(pos * (2 * cnb + neg)) AS BIGINT) AS u2,
        |  ROUND(CAST(SUM(pos * (2 * cnb + neg)) AS DOUBLE)
        |    / (2.0 * SUM(pos) * SUM(neg)), 4) AS auc
        |FROM c""".stripMargin,

    // x104: the TPC-H Q5 shape verbatim — six tables, the correlated
    // local-supplier constraint, one-year date slice, ASIA region
    "x104_star_join" ->
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    // x105: cosines snapped to integer ten-thousandths once, both
    // neighborhood sums exact BIGINTs, margin = one rounded double divide
    "x105_margin_mine" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb
        |  FROM embeddings WHERE vec_id < 10),
        |pr AS (SELECT probe_id, vec_id,
        |  CAST(ROUND(10000 * (list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
        |   / (SQRT(list_dot_product(CAST(p_emb AS DOUBLE[]), CAST(p_emb AS DOUBLE[])))
        |    * SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))))) AS BIGINT) AS cos4
        |  FROM embeddings CROSS JOIN p WHERE vec_id >= 10),
        |sa AS (SELECT probe_id, CAST(SUM(cos4) AS BIGINT) AS sum_a FROM
        |  (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos4 DESC, vec_id) AS rnk
        |   FROM pr) q WHERE rnk <= 10 GROUP BY 1),
        |sb AS (SELECT vec_id, CAST(SUM(cos4) AS BIGINT) AS sum_b FROM pr GROUP BY 1),
        |m AS (SELECT pr.probe_id, pr.vec_id, pr.cos4,
        |  ROUND(20.0 * pr.cos4 / CAST(sum_a + sum_b AS DOUBLE), 4) AS margin
        |  FROM pr JOIN sa USING (probe_id) JOIN sb USING (vec_id)
        |  WHERE sum_a + sum_b <> 0)
        |SELECT probe_id, vec_id AS match_id,
        |  ROUND(CAST(cos4 AS DOUBLE) / 10000.0, 4) AS cos, margin
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY margin DESC, vec_id) AS rnk
        |  FROM m) q WHERE rnk = 1 ORDER BY probe_id""".stripMargin,

    // x106: the exhaustive shared-token join states the same exact-pair
    // contract as q53's twin (prefix filtering is an execution strategy,
    // not a semantic); only the output column names differ
    "x106_exact_pairs" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // x107: x20's session CTE → ±1 boundary sweep; the twin's single
    // global running sum (default RANGE frame — tie peers included, same
    // as the Spark side's RANGE window) states the semantics the two-level
    // hour-carry plan executes
    "x107_peak_concurrency" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM b),
         |iv AS (SELECT user_id, session, MIN(us) AS start_us, MAX(us) AS end_us
         |  FROM s GROUP BY 1, 2),
         |bd AS (SELECT start_us AS us, 0 AS kind, 1 AS delta FROM iv
         |  UNION ALL SELECT end_us, 1, -1 FROM iv),
         |c AS (SELECT us, kind, delta,
         |  CAST(SUM(delta) OVER (ORDER BY us, kind) AS BIGINT) AS cum FROM bd)
         |SELECT us // 86400000000 AS epoch_day, MAX(cum) AS peak,
         |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
         |  CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
         |FROM c GROUP BY 1 ORDER BY epoch_day""".stripMargin,

    // x108: the twin states nearest-match directly as a ranked cross join
    // per lang (fine at oracle scale); the Spark side's two-level
    // directional scans execute the same (|Δ|, len, id) pick
    "x108_length_match" ->
      """WITH t AS (SELECT doc_id, lang, n_chars FROM documents WHERE source = 'src0'),
        |c AS (SELECT doc_id, lang, n_chars FROM documents WHERE source <> 'src0')
        |SELECT doc_id, lang, n_chars, match_id, match_chars, delta FROM (
        |  SELECT t.doc_id, t.lang, t.n_chars, c.doc_id AS match_id,
        |    c.n_chars AS match_chars, ABS(c.n_chars - t.n_chars) AS delta,
        |    row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY ABS(c.n_chars - t.n_chars), c.n_chars, c.doc_id) AS rnk
        |  FROM t JOIN c ON c.lang = t.lang) q
        |WHERE rnk = 1 ORDER BY doc_id""".stripMargin,

    // x109: exact KS over the cents histogram; numerator in HUGEINT
    // (Spark side: DECIMAL(38,0)), one rounded divide
    "x109_ks_drift" ->
      s"""WITH e AS ($E),
         |h AS (SELECT event_type,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 12:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 12:00:00' THEN 0 ELSE 1 END) AS BIGINT) AS cb
         |  FROM e GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS n_a,
         |  CAST(SUM(cb) AS BIGINT) AS n_b FROM h GROUP BY 1),
         |c AS (SELECT event_type, cents, ca, cb,
         |  CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
         |  CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b FROM h)
         |SELECT c.event_type AS event_type, n_a, n_b,
         |  MAX(ABS(n_b * cum_a - n_a * cum_b)) AS d_num,
         |  ROUND(CAST(MAX(ABS(n_b * cum_a - n_a * cum_b)) AS DOUBLE)
         |    / (CAST(n_a AS DOUBLE) * n_b), 4) AS ks
         |FROM c JOIN t ON t.event_type = c.event_type
         |GROUP BY 1, 2, 3 ORDER BY c.event_type""".stripMargin,

    // x110: byte-level ASCII casefold via translate (no Unicode case
    // tables in a contract key), literal-space regex with DuckDB's 'g'
    "x110_canon_dedup" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(translate(trim(regexp_replace(text, ' +', ' ', 'g')),
        |    'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') <> text AS INT)
        |    AS changed,
        |  sha256(translate(trim(regexp_replace(text, ' +', ' ', 'g')),
        |    'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS ch
        |  FROM documents),
        |g AS (SELECT ch, COUNT(*) AS group_n FROM c GROUP BY 1)
        |SELECT doc_id, substring(ch, 1, 16) AS canon_fp, changed, group_n
        |FROM c JOIN g USING (ch) ORDER BY doc_id""".stripMargin,

    // x111: first/last are ROW_NUMBER picks over the same (ts, event_id)
    // total order the Spark side encodes as a min_by/max_by struct key;
    // all four values are selected stored doubles — no rounding needed
    "x111_m4" ->
      s"""WITH e AS ($E),
         |b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, value,
         |  ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
         |    ORDER BY ts, event_id) AS rf,
         |  ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
         |    ORDER BY ts DESC, event_id DESC) AS rl
         |  FROM e)
         |SELECT event_type, hr, COUNT(*) AS n,
         |MIN(value) AS v_min, MAX(value) AS v_max,
         |MAX(CASE WHEN rf = 1 THEN value END) AS v_first,
         |MAX(CASE WHEN rl = 1 THEN value END) AS v_last
         |FROM b GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin,

    // x112: same exact-Jaccard pair base as x97's twin; the declared
    // census covers the deg ≤ 256 core (the unbounded census is
    // Ω(wedges) — ~2.4e9 on this corpus' giant near-clique at sf0.1);
    // the twin counts core triangles with the naive ordered 3-way join
    // (a<b<c once each) — orientation on the Spark side is a physical
    // strategy, not a semantic difference
    "x112_triangles" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |deg AS (SELECT v, COUNT(*) AS deg FROM
        |  (SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b FROM pairs) GROUP BY 1),
        |kept AS (SELECT doc_a, doc_b FROM pairs
        |  JOIN deg xa ON xa.v = doc_a JOIN deg xb ON xb.v = doc_b
        |  WHERE xa.deg <= 256 AND xb.deg <= 256),
        |kdeg AS (SELECT v, COUNT(*) AS deg FROM
        |  (SELECT doc_a AS v FROM kept UNION ALL SELECT doc_b FROM kept) GROUP BY 1),
        |tri AS (SELECT COUNT(*) AS n_triangles FROM kept e1
        |  JOIN kept e2 ON e2.doc_a = e1.doc_b
        |  JOIN kept e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |fg AS (SELECT COUNT(*) AS n_nodes,
        |  CAST(SUM(deg) // 2 AS BIGINT) AS n_edges FROM deg),
        |core AS (SELECT CAST(SUM(deg) // 2 AS BIGINT) AS n_kept_edges,
        |  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM kdeg)
        |SELECT n_nodes, n_edges, n_kept_edges, n_wedges, n_triangles,
        |ROUND(3.0 * n_triangles / n_wedges, 4) AS core_cc
        |FROM fg, core, tri""".stripMargin,

    // x113: the twin takes the SAME (k, doc_id) sort order via one
    // ROW_NUMBER (fine at oracle scale; the Spark side's bucket-carry
    // rank is the scale rewrite) and the same exact-Jaccard verify
    "x113_snm_dedup" ->
      """WITH dk AS (SELECT doc_id, translate(substring(text, 1, 24),
        |  'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS k FROM documents),
        |r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rk FROM dk),
        |cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM r a
        |  JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 8),
        |t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |iv AS (SELECT ia, ib, COUNT(*) AS i FROM cand
        |  JOIN t a ON a.doc_id = ia JOIN t b ON b.doc_id = ib AND b.tok = a.tok
        |  GROUP BY 1, 2),
        |jj AS (SELECT LEAST(ia, ib) AS doc_a, GREATEST(ia, ib) AS doc_b,
        |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
        |  FROM iv JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7)
        |SELECT doc_a, doc_b, ROUND(jac, 4) AS j FROM jj ORDER BY doc_a, doc_b""".stripMargin,

    // x114: all-integer threshold arithmetic — no quantile interpolation,
    // no rounding discipline needed on either side
    "x114_mass_quantiles" ->
      """WITH h AS (SELECT lang, n_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS wsum
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, n_chars, wsum,
        |  SUM(wsum) OVER (PARTITION BY lang ORDER BY n_chars
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(wsum) OVER (PARTITION BY lang) AS wtot FROM h)
        |SELECT lang, CAST(MAX(wtot) AS BIGINT) AS total_tokens,
        |MIN(CASE WHEN cum * 100 >= wtot * 50 THEN n_chars END) AS p50_len,
        |MIN(CASE WHEN cum * 100 >= wtot * 90 THEN n_chars END) AS p90_len,
        |MIN(CASE WHEN cum * 100 >= wtot * 99 THEN n_chars END) AS p99_len
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    // x115: the twin states the contract directly as order statistics
    // (ranks ⌈n/2⌉ and ⌊n/2⌋+1) + the declared lo + 0.5·(hi−lo)
    // interpolation; the Spark side's histogram refinement is a physical
    // strategy for the same selection
    "x115_two_pass_median" ->
      s"""WITH e AS ($E),
         |r AS (SELECT event_type, value,
         |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM e)
         |SELECT event_type, MAX(n) AS n,
         |MIN(CASE WHEN rk = (n + 1) // 2 THEN value END) AS v_lo,
         |MIN(CASE WHEN rk = n // 2 + 1 THEN value END) AS v_hi,
         |ROUND(MIN(CASE WHEN rk = (n + 1) // 2 THEN value END)
         |  + 0.5 * (MIN(CASE WHEN rk = n // 2 + 1 THEN value END)
         |           - MIN(CASE WHEN rk = (n + 1) // 2 THEN value END)), 4) AS median
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x116_assoc_rules" ->
      """WITH inc AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |nn AS (SELECT COUNT(*) AS nd FROM documents),
        |v AS (SELECT tok, COUNT(*) AS df FROM inc GROUP BY 1
        |  ORDER BY df DESC, tok LIMIT 100),
        |h AS (SELECT doc_id, tok, df FROM inc JOIN v USING (tok)),
        |p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS n_a, b.df AS n_b,
        |  COUNT(*) AS n_ab
        |  FROM h a JOIN h b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2, 3, 4)
        |SELECT tok_a, tok_b, n_ab,
        |ROUND(CAST(n_ab AS DOUBLE) / nd, 4) AS support,
        |ROUND(CAST(n_ab AS DOUBLE) / n_a, 4) AS conf_ab,
        |ROUND(CAST(n_ab AS DOUBLE) / n_b, 4) AS conf_ba,
        |ROUND(CAST(n_ab AS DOUBLE) * nd / (CAST(n_a AS DOUBLE) * n_b), 4) AS lift
        |FROM p, nn ORDER BY lift DESC, tok_a, tok_b LIMIT 20""".stripMargin,

    // x117: HUGEINT twins the DECIMAL(38,0) moment arithmetic; sqrt is
    // correctly rounded IEEE in both engines, so only the final ROUND
    // needs the dround discipline
    "x117_burstiness" ->
      s"""WITH e AS ($E),
         |g AS (SELECT event_type, epoch_us(ts) - LAG(epoch_us(ts)) OVER
         |  (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap FROM e),
         |m AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(gap) AS BIGINT) AS sg,
         |  SUM(CAST(gap AS HUGEINT) * gap) AS sq FROM g WHERE gap IS NOT NULL
         |  GROUP BY 1),
         |x AS (SELECT event_type, n, sg,
         |  CAST(n AS HUGEINT) * sq - CAST(sg AS HUGEINT) * sg AS varnum FROM m),
         |f AS (SELECT event_type, n,
         |  CAST(sg AS DOUBLE) / n AS mean,
         |  SQRT(CAST(varnum AS DOUBLE)) / n AS sigma FROM x)
         |SELECT event_type, n, ROUND(mean, 4) AS mean_gap_us,
         |ROUND(sigma / mean, 4) AS cv,
         |ROUND((sigma - mean) / (sigma + mean), 4) AS burstiness
         |FROM f ORDER BY event_type""".stripMargin,

    // x118: all-integer pair-set algebra; the three blockers' pair CTEs
    // are each the same formulations their own twins use
    "x118_blocker_ablation" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |lshp AS (SELECT doc_a AS a, doc_b AS b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |dk AS (SELECT doc_id, translate(substring(text, 1, 24),
        |  'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS k FROM documents),
        |r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rk FROM dk),
        |scand AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM r a
        |  JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 8),
        |siv AS (SELECT ia, ib, COUNT(*) AS i FROM scand
        |  JOIN t a ON a.doc_id = ia JOIN t b ON b.doc_id = ib AND b.tok = a.tok
        |  GROUP BY 1, 2),
        |snmp AS (SELECT LEAST(ia, ib) AS a, GREATEST(ia, ib) AS b
        |  FROM siv JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |cn AS (SELECT doc_id, sha256(translate(trim(regexp_replace(text, ' +', ' ', 'g')),
        |  'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS ch
        |  FROM documents),
        |canp AS (SELECT x.doc_id AS a, y.doc_id AS b FROM cn x
        |  JOIN cn y ON x.ch = y.ch AND x.doc_id < y.doc_id),
        |tagged AS (SELECT a, b, 'lsh' AS blocker FROM lshp
        |  UNION ALL SELECT a, b, 'snm' FROM snmp
        |  UNION ALL SELECT a, b, 'canon' FROM canp),
        |bp AS (SELECT a, b, COUNT(*) AS nb,
        |  MAX(CASE WHEN blocker = 'lsh' THEN 1 ELSE 0 END) AS f_lsh,
        |  MAX(CASE WHEN blocker = 'snm' THEN 1 ELSE 0 END) AS f_snm,
        |  MAX(CASE WHEN blocker = 'canon' THEN 1 ELSE 0 END) AS f_canon
        |  FROM tagged GROUP BY 1, 2),
        |ag AS (SELECT
        |  CAST(SUM(f_lsh) AS BIGINT) AS lsh_n,
        |  CAST(SUM(CASE WHEN f_lsh = 1 AND nb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lsh_o,
        |  CAST(SUM(f_snm) AS BIGINT) AS snm_n,
        |  CAST(SUM(CASE WHEN f_snm = 1 AND nb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS snm_o,
        |  CAST(SUM(f_canon) AS BIGINT) AS can_n,
        |  CAST(SUM(CASE WHEN f_canon = 1 AND nb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS can_o,
        |  COUNT(*) AS u_n,
        |  CAST(SUM(CASE WHEN nb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u_o FROM bp)
        |SELECT 'canon' AS blocker, can_n AS n_pairs, can_o AS n_only FROM ag
        |UNION ALL SELECT 'lsh', lsh_n, lsh_o FROM ag
        |UNION ALL SELECT 'snm', snm_n, snm_o FROM ag
        |UNION ALL SELECT 'union', u_n, u_o FROM ag
        |ORDER BY blocker""".stripMargin,

    // x119: all-integer gram counts; 8-token shingles via the same list
    // slicing the x17/x21 twins use (inclusive slice [i, i+7])
    "x119_boilerplate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, source, array_to_string(w[i:i+7], ' ') AS gram
        |  FROM t, UNNEST(generate_series(1, len(w) - 7)) AS u(i)),
        |df AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
        |  GROUP BY gram HAVING COUNT(*) >= 10),
        |sg AS (SELECT source, gram, COUNT(*) AS occ FROM g GROUP BY 1, 2),
        |j AS (SELECT sg.source, sg.occ,
        |  CASE WHEN df.gram IS NOT NULL THEN sg.occ ELSE 0 END AS bocc
        |  FROM sg LEFT JOIN df USING (gram))
        |SELECT source, CAST(SUM(occ) AS BIGINT) AS n_grams,
        |CAST(SUM(bocc) AS BIGINT) AS n_boiler,
        |ROUND(CAST(SUM(bocc) AS DOUBLE) / CAST(SUM(occ) AS DOUBLE), 4) AS boiler_share
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // x120: zero-filled global hour spine; ACF assembled from integer
    // sums scaled by n² so the one double divide matches bit-for-bit
    "x120_hourly_acf" ->
      s"""WITH e AS ($E),
         |c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS c
         |  FROM e GROUP BY 1, 2),
         |b AS (SELECT MIN(hr) AS hlo, MAX(hr) AS hhi FROM c),
         |sp AS (SELECT et.event_type, g.hr
         |  FROM (SELECT DISTINCT event_type FROM c) et, b,
         |  UNNEST(generate_series(b.hlo, b.hhi)) AS g(hr)),
         |s AS (SELECT sp.event_type, sp.hr, COALESCE(c.c, 0) AS c
         |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.hr = sp.hr),
         |l AS (SELECT event_type, c,
         |  LEAD(c, 1) OVER w AS c1, LEAD(c, 2) OVER w AS c2, LEAD(c, 3) OVER w AS c3
         |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
         |m AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS ss, SUM(c * c) AS qq,
         |  SUM(c * c1) AS xy1, SUM(CASE WHEN c1 IS NOT NULL THEN c END) AS hd1, SUM(c1) AS tl1,
         |  SUM(c * c2) AS xy2, SUM(CASE WHEN c2 IS NOT NULL THEN c END) AS hd2, SUM(c2) AS tl2,
         |  SUM(c * c3) AS xy3, SUM(CASE WHEN c3 IS NOT NULL THEN c END) AS hd3, SUM(c3) AS tl3
         |  FROM l GROUP BY 1)
         |SELECT event_type, lag, ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS r
         |FROM (
         |  SELECT event_type, 1 AS lag,
         |    n*n*xy1 - n*ss*(hd1+tl1) + (n-1)*ss*ss AS num, n*n*qq - n*ss*ss AS den FROM m
         |  UNION ALL SELECT event_type, 2,
         |    n*n*xy2 - n*ss*(hd2+tl2) + (n-2)*ss*ss, n*n*qq - n*ss*ss FROM m
         |  UNION ALL SELECT event_type, 3,
         |    n*n*xy3 - n*ss*(hd3+tl3) + (n-3)*ss*ss, n*n*qq - n*ss*ss FROM m)
         |ORDER BY event_type, lag""".stripMargin,

    // x121: q53's exact-Jaccard pair semantics (threshold on the unrounded
    // divide, j rounded at 4), rolled up per straddled source pair;
    // min/max of rounded j are order-independent
    "x121_syndication" ->
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY 1),
        |iv AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT da, db, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS j
        |  FROM iv JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |d AS (SELECT doc_id, source FROM documents)
        |SELECT LEAST(x.source, y.source) AS src_a, GREATEST(x.source, y.source) AS src_b,
        |CAST(COUNT(*) AS BIGINT) AS n_pairs, MIN(j) AS min_j, MAX(j) AS max_j
        |FROM p JOIN d x ON x.doc_id = da JOIN d y ON y.doc_id = db
        |WHERE x.source <> y.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // x122: the twin walks the declared prefix order directly (oracle
    // scale); the Spark side's histogram cut is provably the same prefix
    "x122_budget_cut" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |r AS (SELECT lang, n_tok, SUM(n_tok) OVER (PARTITION BY lang
        |  ORDER BY n_tok DESC, doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_selected,
        |CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
        |CAST(MIN(n_tok) AS BIGINT) AS cut_len
        |FROM r WHERE cum <= 20000 GROUP BY lang ORDER BY lang""".stripMargin,

    // x123: all-integer cohort matrix, one rounded share
    "x123_retention" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM e),
         |f AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1),
         |sz AS (SELECT cohort_day, COUNT(*) AS cohort_users FROM f GROUP BY 1),
         |m AS (SELECT f.cohort_day, a.day - f.cohort_day AS off, COUNT(*) AS n_active
         |  FROM act a JOIN f USING (user_id)
         |  WHERE a.day - f.cohort_day BETWEEN 0 AND 13 GROUP BY 1, 2)
         |SELECT m.cohort_day, m.off AS "offset",
         |CAST(m.n_active AS BIGINT) AS n_active,
         |CAST(sz.cohort_users AS BIGINT) AS cohort_users,
         |ROUND(CAST(m.n_active AS DOUBLE) / CAST(sz.cohort_users AS DOUBLE), 4) AS retained
         |FROM m JOIN sz USING (cohort_day) ORDER BY cohort_day, "offset"""".stripMargin,

    // x124: exact rolling distinct via 7-day coverage expansion — the
    // twin runs the same algebra (the per-window correlated COUNT
    // DISTINCT is equivalent but quadratic even at oracle scale)
    "x124_rolling_active" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM e),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM act),
         |cov AS (SELECT DISTINCT user_id, day + i AS wday FROM act,
         |  UNNEST(generate_series(0, 6)) AS g(i)),
         |wk AS (SELECT wday, COUNT(*) AS active_7d FROM cov, b
         |  WHERE wday BETWEEN b.d0 AND b.d1 GROUP BY wday),
         |dy AS (SELECT day, COUNT(*) AS active_1d FROM act GROUP BY day)
         |SELECT wk.wday AS day,
         |CAST(COALESCE(dy.active_1d, 0) AS BIGINT) AS active_1d,
         |CAST(wk.active_7d AS BIGINT) AS active_7d,
         |ROUND(CAST(COALESCE(dy.active_1d, 0) AS DOUBLE)
         |  / CAST(wk.active_7d AS DOUBLE), 4) AS stickiness
         |FROM wk LEFT JOIN dy ON dy.day = wk.wday ORDER BY day""".stripMargin,

    // x125: both moments exact in scaled integers (HUGEINT twin of the
    // DECIMAL(38,0) Spark sums); every double is the same divide of the
    // same exact integers, so min/max/rounds agree bit-for-bit
    "x125_cluster_sep" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, label, i - 1 AS dim,
        |  CAST(ROUND(v[i] * 1000000) AS BIGINT) AS sv
        |  FROM e, UNNEST(generate_series(1, len(v))) AS g(i)),
        |n AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
        |q AS (SELECT label, SUM(CAST(sv AS HUGEINT) * sv) AS q FROM x GROUP BY 1),
        |sd AS (SELECT label, dim, SUM(sv) AS sd FROM x GROUP BY 1, 2),
        |s2 AS (SELECT label, SUM(CAST(sd AS HUGEINT) * sd) AS s2 FROM sd GROUP BY 1),
        |msd AS (SELECT n.label, n.n,
        |  CAST(CAST(n.n AS HUGEINT) * q.q - s2.s2 AS DOUBLE)
        |    / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) / 1000000000000.0 AS msd_raw
        |  FROM n JOIN q ON q.label = n.label JOIN s2 ON s2.label = n.label),
        |sda AS (SELECT sd.label, sd.dim, sd.sd, n.n FROM sd JOIN n ON n.label = sd.label),
        |pd AS (SELECT a.label AS la, b.label AS lb, a.n AS na, b.n AS nb,
        |  SUM(CAST(b.n * a.sd - a.n * b.sd AS HUGEINT) * (b.n * a.sd - a.n * b.sd)) AS pd2
        |  FROM sda a JOIN sda b ON a.dim = b.dim AND a.label <> b.label
        |  GROUP BY 1, 2, 3, 4),
        |sep AS (SELECT la, lb, CAST(pd2 AS DOUBLE)
        |  / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |  / 1000000000000.0 AS sep FROM pd),
        |db AS (SELECT sep.la, MIN(sep.sep) AS min_sep,
        |  MAX((ma.msd_raw + mb.msd_raw) / sep.sep) AS dbv
        |  FROM sep JOIN msd ma ON ma.label = sep.la JOIN msd mb ON mb.label = sep.lb
        |  GROUP BY 1)
        |SELECT msd.label, CAST(msd.n AS BIGINT) AS n, ROUND(msd.msd_raw, 6) AS msd,
        |ROUND(db.min_sep, 6) AS min_sep, ROUND(db.dbv, 4) AS db_index
        |FROM msd JOIN db ON db.la = msd.label ORDER BY label""".stripMargin,

    // x126: the x20 sessionization CTEs + one lead pair with the
    // same-session filter (x90's island trick); all-integer counts, one
    // rounded divide; window SUM over BIGINT is HUGEINT in DuckDB → CAST
    "x126_markov_trans" ->
      s"""WITH e AS ($E),
         |g AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |b AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000
         |  THEN 1 ELSE 0 END AS brk FROM g),
         |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM b),
         |t AS (SELECT event_type AS t_from, session,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t_to,
         |  lead(session) OVER (PARTITION BY user_id ORDER BY us, event_id) AS s2 FROM s),
         |m AS (SELECT t_from, t_to, COUNT(*) AS n FROM t
         |  WHERE t_to IS NOT NULL AND s2 = session GROUP BY 1, 2)
         |SELECT t_from, t_to, CAST(n AS BIGINT) AS n,
         |CAST(SUM(n) OVER (PARTITION BY t_from) AS BIGINT) AS n_from,
         |ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY t_from) AS DOUBLE), 4) AS p
         |FROM m ORDER BY t_from, t_to""".stripMargin,

    // x127: byte-level chunking over the ASCII slice (byte k IS char k —
    // x19's trick), sha256 prefixes; both engines hash the same bytes
    "x127_chunk_manifest" ->
      """WITH a AS (SELECT doc_id AS media_id, text, CAST(n_chars AS BIGINT) AS n_bytes
        |  FROM documents
        |  WHERE lang = 'en' AND octet_length(encode(text)) = n_chars AND n_chars > 0),
        |c AS (SELECT media_id, i AS chunk_idx, i * 64 AS off,
        |  LEAST(64, n_bytes - i * 64) AS length,
        |  sha256(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS sha
        |  FROM a, UNNEST(generate_series(0, (n_bytes - 1) // 64)) AS g(i))
        |SELECT media_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |CAST(off AS BIGINT) AS "offset", CAST(length AS BIGINT) AS length,
        |substring(sha, 1, 16) AS sha FROM c
        |ORDER BY media_id, chunk_idx""".stripMargin,

    // x128: identical set list + grouping flags; COALESCE'd names keep
    // the output NULL-free so neither engine's NULL ordering matters
    "x128_grouping_sets" ->
      """SELECT CAST(GROUPING(source) AS INT) AS g_s, CAST(GROUPING(lang) AS INT) AS g_l,
        |COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
        |COUNT(*) AS n_docs,
        |CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
        |ORDER BY g_s, g_l, source, lang""".stripMargin,

    // x129: gaps-and-islands on distinct active days; all-integer
    "x129_streaks" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM e),
         |r AS (SELECT user_id, day,
         |  day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM act),
         |runs AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2),
         |pu AS (SELECT user_id, MAX(len) AS best_streak, COUNT(*) AS n_streaks
         |  FROM runs GROUP BY 1)
         |SELECT best_streak, CAST(COUNT(*) AS BIGINT) AS n_users,
         |CAST(SUM(n_streaks) AS BIGINT) AS total_streaks
         |FROM pu GROUP BY best_streak ORDER BY best_streak""".stripMargin,

    // x130: zero-filled spine + trailing-24h frame; integer-only flags
    "x130_burst_flags" ->
      s"""WITH e AS ($E),
         |c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS c
         |  FROM e GROUP BY 1, 2),
         |b AS (SELECT MIN(hr) AS hlo, MAX(hr) AS hhi FROM c),
         |sp AS (SELECT et.event_type, g.hr
         |  FROM (SELECT DISTINCT event_type FROM c) et, b,
         |  UNNEST(generate_series(b.hlo, b.hhi)) AS g(hr)),
         |s AS (SELECT sp.event_type, sp.hr, COALESCE(c.c, 0) AS c
         |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.hr = sp.hr),
         |t AS (SELECT event_type, hr, c,
         |  SUM(c) OVER w AS sum24, COUNT(*) OVER w AS n24
         |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY hr
         |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT event_type, hr, CAST(c AS BIGINT) AS n, CAST(sum24 AS BIGINT) AS sum24
         |FROM t WHERE n24 = 24 AND c >= 10 AND c * 24 >= sum24 * 3
         |ORDER BY event_type, hr""".stripMargin,

    // x131: TPC-H Q3 shape; order date as a formatted string so neither
    // engine's timestamp rendering is in the hash
    "x131_ship_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    // x132: per-part argmax over the (part, supp) aggregate; quantities
    // are integral doubles — exact sums carried as BIGINT
    "x132_dominant_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |  CAST(SUM(l_quantity) AS BIGINT) AS qty, COUNT(*) AS n_ship
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS part_qty
        |  FROM ps GROUP BY 1),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
        |  ORDER BY qty DESC, l_suppkey) AS rk FROM ps)
        |SELECT rk.l_partkey, rk.l_suppkey AS top_supp, rk.qty, rk.n_ship,
        |tot.part_qty,
        |ROUND(CAST(rk.qty AS DOUBLE) / CAST(tot.part_qty AS DOUBLE), 4) AS share
        |FROM rk JOIN tot ON tot.l_partkey = rk.l_partkey
        |WHERE rk.rk = 1 ORDER BY rk.l_partkey""".stripMargin,

    // x133: TPC-H Q7 shape; the pair disjunction keeps both directions
    "x133_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |CAST(year(l_shipdate) AS INT) AS yr, COUNT(*) AS n_items,
        |ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // x134: TPC-H Q10 shape; c_acctbal ships raw (selection, no math)
    "x134_returned_revenue" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // x135: TPC-H Q14 shape; share divides the ROUNDED sums
    "x135_promo_share" ->
      """WITH a AS (SELECT
        |  ROUND(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS promo_rev,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00')
        |SELECT promo_rev, total_rev,
        |ROUND(promo_rev / total_rev, 6) AS promo_share FROM a""".stripMargin,

    // x136: TPC-H Q19 shape; OR of brand/size/quantity conjunction blocks
    "x136_disjunctive_revenue" ->
      """SELECT COUNT(*) AS n_items,
        |ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // x137: TPC-H Q22 shape; exact integer-cents threshold (cross-multiplied,
    // no division) + NOT EXISTS anti-join; cent sums exact → /100 once
    "x137_dormant_rich" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |t AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
        |  COUNT(*) AS n_pos FROM c WHERE bal_cents > 0)
        |SELECT n_name, COUNT(*) AS n_cust,
        |ROUND(CAST(CAST(SUM(bal_cents) AS BIGINT) AS DOUBLE) / 100.0, 2) AS total_bal
        |FROM c CROSS JOIN t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // x138: TPC-H Q8 shape; numerator and denominator from ONE pass,
    // share divides the rounded sums
    "x138_market_share" ->
      """WITH f AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  n2.n_name AS supp_nation,
        |  l_extendedprice * (1 - l_discount) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_custkey IN (SELECT c_custkey FROM customer
        |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |      JOIN region ON n1.n_regionkey = r_regionkey
        |      WHERE r_name = 'EUROPE')),
        |a AS (SELECT yr,
        |  ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0.0 END), 4)
        |    AS nation_rev,
        |  ROUND(SUM(rev), 4) AS mkt_rev
        |  FROM f GROUP BY yr)
        |SELECT yr, nation_rev, mkt_rev,
        |ROUND(nation_rev / mkt_rev, 6) AS share FROM a ORDER BY yr""".stripMargin,

    // x139: "beats 1.5x own-customer average" — the correlated scalar
    // subquery, written decorrelated with the exact integer-cents
    // cross-multiplied predicate (2·tp·n > 3·Σ; no FP boundary)
    "x139_above_avg" ->
      """WITH o AS (SELECT o_orderpriority, o_custkey, o_totalprice,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS tp_cents
        |  FROM orders),
        |c AS (SELECT o_custkey, COUNT(*) AS n_ord,
        |  CAST(SUM(tp_cents) AS BIGINT) AS sum_cents FROM o GROUP BY 1)
        |SELECT o_orderpriority, COUNT(*) AS n_above,
        |MAX(o_totalprice) AS top_price
        |FROM o JOIN c USING (o_custkey)
        |WHERE 2 * tp_cents * n_ord > 3 * sum_cents
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x140: relational division via the aggregation form — cover all 5
    // brands within the window; integer/string output only
    "x140_brand_coverage" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS n_ship
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY 1, 2
        |HAVING COUNT(DISTINCT p_brand) = 5
        |ORDER BY 1""".stripMargin,

    // x141: top-1000 vocab (count DESC, word ASC — exact boundary), then
    // per-lang OOV occurrence share against the broadcast vocab
    "x141_oov_rate" ->
      """WITH toks AS (SELECT lang, UNNEST(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok AS vtok FROM (
        |  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1)
        |  ORDER BY cnt DESC, tok LIMIT 1000),
        |a AS (SELECT lang, COUNT(*) AS n_tok,
        |  CAST(SUM(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM toks LEFT JOIN v ON tok = vtok GROUP BY lang)
        |SELECT lang, n_tok, n_oov,
        |ROUND(CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS oov_rate
        |FROM a ORDER BY lang""".stripMargin,

    // x142: distribution windows over the (type, day) aggregate; full
    // (n, day) tiebreak makes every rank position unique; nth_value needs
    // the explicit full frame in both engines
    "x142_day_rank" ->
      s"""WITH e AS ($E),
         |d AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n FROM e GROUP BY 1, 2)
         |SELECT event_type, day, n,
         |ROUND(percent_rank() OVER w, 6) AS pr,
         |ROUND(cume_dist() OVER w, 6) AS cd,
         |CAST(nth_value(n, 3) OVER (PARTITION BY event_type ORDER BY n, day
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)
         |  AS third_low
         |FROM d WINDOW w AS (PARTITION BY event_type ORDER BY n, day)
         |ORDER BY event_type, day""".stripMargin,

    // x143: TPC-H Q4 shape — correlated EXISTS with a cross-table date
    // inequality; integer calendar arithmetic only
    "x143_late_ship" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x144: TPC-H Q6 shape — every predicate scan-evaluable, one agg
    "x144_scan_revenue" ->
      """SELECT COUNT(*) AS n_items,
        |ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // x145: bool_and / bool_or / count_if in one pass; predicates compare
    // stored doubles to literals (no arithmetic)
    "x145_sla_flags" ->
      s"""WITH e AS ($E)
         |SELECT event_type, COUNT(*) AS n,
         |bool_and(value < 400) AS all_below_400,
         |bool_or(value > 400) AS any_over_400,
         |CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_over_100
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // x146: exact integer waterfilling — saturation via the cross-multiplied
    // prefix condition (provably a prefix of ascending-supply order);
    // remainder to the alphabetically-first unsaturated langs
    "x146_waterfill" ->
      """WITH sup AS (SELECT lang,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS supply
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(supply) AS BIGINT) AS tot, COUNT(*) AS k FROM sup),
        |m AS (SELECT lang, supply, tot * 8 // 10 AS budget, k,
        |  ROW_NUMBER() OVER w AS rn,
        |  COALESCE(CAST(SUM(supply) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING) AS BIGINT), 0) AS pfx
        |  FROM sup CROSS JOIN t
        |  WINDOW w AS (ORDER BY supply, lang)),
        |f AS (SELECT *, supply * (k - rn + 1) <= budget - pfx AS sat FROM m),
        |g AS (SELECT COALESCE(CAST(SUM(CASE WHEN sat THEN supply END) AS BIGINT), 0)
        |  AS sat_sum, COALESCE(SUM(CASE WHEN sat THEN 1 END), 0) AS m FROM f),
        |h AS (SELECT f.*, budget - sat_sum AS r_budget,
        |  GREATEST(k - g.m, 1) AS u,
        |  SUM(CASE WHEN NOT sat THEN 1 ELSE 0 END) OVER (ORDER BY lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS urk
        |  FROM f CROSS JOIN g)
        |SELECT lang, supply,
        |CAST(CASE WHEN sat THEN supply
        |  ELSE r_budget // u + (CASE WHEN urk <= r_budget % u THEN 1 ELSE 0 END)
        |END AS BIGINT) AS alloc, sat AS saturated
        |FROM h ORDER BY lang""".stripMargin,

    // x147: forward conditional carry — next error strictly after each
    // purchase via a (1 FOLLOWING, ∞) frame; all-integer µs, null gap
    // when no error follows
    "x147_next_incident" ->
      s"""WITH e AS ($E),
         |s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM e),
         |m AS (SELECT *, MIN(CASE WHEN event_type = 'error' THEN us END) OVER
         |  (PARTITION BY user_id ORDER BY us, event_id
         |   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_err_us
         |  FROM s)
         |SELECT user_id, event_id,
         |CAST((next_err_us - us) // 1000000 AS BIGINT) AS gap_s
         |FROM m WHERE event_type = 'purchase'
         |ORDER BY user_id, event_id""".stripMargin,

    // x148: reciprocal top-1 on rounded cosine; ties to the lowest
    // neighbor id; mutual join on the per-vector argmax rows
    "x148_mutual_nn" ->
      s"""WITH p AS (SELECT a.vec_id AS id_a, a.label AS l_a,
         |  b.vec_id AS id_b, b.label AS l_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |n AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
         |  ORDER BY cos DESC, id_b) AS rk FROM p),
         |nn AS (SELECT id_a, l_a, id_b, l_b, cos FROM n WHERE rk = 1)
         |SELECT x.id_a, x.id_b, x.cos, x.l_a = x.l_b AS same_label
         |FROM nn x JOIN nn y ON x.id_b = y.id_a AND y.id_b = x.id_a
         |WHERE x.id_a < x.id_b ORDER BY x.id_a""".stripMargin,

    // x149: TPC-H Q12 shape — conditional two-way counts, all-integer
    "x149_priority_split" ->
      """SELECT l_linestatus,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x150: TPC-H Q13 shape — LEFT JOIN keeps the zero-order bucket;
    // COUNT(o_orderkey) (not COUNT(*)) zeroes the null matches
    "x150_order_count_dist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN
        |    (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus <> 'P') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // x151: TPC-H Q15 shape — revenue in exact integer 1e-4 dollars
    // (cents × (100 − disc%)), so max-equality can't be FP-flipped
    "x151_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |ROUND(CAST(rev4 AS DOUBLE) / 10000.0, 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev4 = (SELECT MAX(rev4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    // x152: TPC-H Q17 shape — the correlated avg decorrelated; the
    // predicate cross-multiplied into exact integers (qty < sum/(5n))
    "x152_small_qty_rev" ->
      """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3'),
        |ag AS (SELECT l_partkey AS a_partkey,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum,
        |  COUNT(*) AS qn FROM li GROUP BY 1)
        |SELECT COUNT(*) AS n_items,
        |ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |  / 700.0, 4) AS avg_yearly
        |FROM li JOIN ag ON l_partkey = a_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * qn < qsum""".stripMargin,

    // x153: TPC-H Q18 shape — HAVING on the order-level quantity sum
    "x153_whale_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date, total_qty
        |FROM (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) b
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,

    // x154: TPC-H Q21 shape — positive EXISTS + negative EXISTS against
    // the same fact, both over dedup'd (orderkey, suppkey) pair sets
    "x154_sole_blame" ->
      """WITH r AS (SELECT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_returnflag = 'R'),
        |rp AS (SELECT DISTINCT l_orderkey AS r_ok, l_suppkey AS r_sk FROM r),
        |ap AS (SELECT DISTINCT l_orderkey AS a_ok, l_suppkey AS a_sk FROM lineitem)
        |SELECT s_suppkey, s_name, numwait FROM (
        |  SELECT l_suppkey, COUNT(*) AS numwait FROM r
        |  WHERE EXISTS (SELECT 1 FROM ap
        |      WHERE a_ok = r.l_orderkey AND a_sk <> r.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM rp
        |      WHERE r_ok = r.l_orderkey AND r_sk <> r.l_suppkey)
        |  GROUP BY 1) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    // x155: day fingerprints (order-insensitive md5-prefix sums) → the
    // mismatched-day shortlist → row repair restricted to those days
    "x155_replica_diff" ->
      s"""WITH e AS ($E),
         |k AS (SELECT epoch_us(ts) // 86400000000 AS day, event_id,
         |  ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS h
         |  FROM e),
         |b AS (SELECT * FROM k
         |  WHERE NOT (day % 7 = 3 AND event_id % 97 = 0)),
         |fa AS (SELECT day, COUNT(*) AS n, CAST(SUM(h) AS BIGINT) AS fp
         |  FROM k GROUP BY 1),
         |fb AS (SELECT day AS b_day, COUNT(*) AS n_b, CAST(SUM(h) AS BIGINT) AS fp_b
         |  FROM b GROUP BY 1),
         |bad AS (SELECT day, n AS n_a, COALESCE(n_b, 0) AS n_b
         |  FROM fa LEFT JOIN fb ON day = b_day
         |  WHERE fp_b IS NULL OR fp <> fp_b OR n <> n_b)
         |SELECT k.day, k.event_id, bad.n_a, bad.n_b
         |FROM k JOIN bad USING (day)
         |WHERE NOT EXISTS (SELECT 1 FROM b
         |  WHERE b.day = k.day AND b.event_id = k.event_id)
         |ORDER BY day, event_id""".stripMargin,

    // x156: HRW argmax via arg_max; minimal movement pinned by `ok`
    "x156_shard_move" ->
      """WITH h AS (SELECT doc_id, s,
        |  md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)) AS h
        |  FROM documents, UNNEST(generate_series(0, 16)) AS u(s)),
        |a AS (SELECT doc_id,
        |  arg_max(s, h) FILTER (WHERE s < 16) AS shard_before,
        |  arg_max(s, h) AS shard_after
        |  FROM h GROUP BY 1)
        |SELECT shard_before, shard_after, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |shard_before <> shard_after AS moved,
        |CAST(shard_before = shard_after OR shard_after = 16 AS INT) AS ok
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // x157: trigram corpus counts joined back per doc; all-integer mean
    "x157_gram_commonness" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, gram FROM t,
        |  UNNEST(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS u(gram)),
        |ct AS (SELECT gram, COUNT(*) AS c FROM sh GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS mean_df,
        |CAST(MIN(c) AS BIGINT) AS rarest,
        |CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |FROM sh JOIN ct USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x158: κ cleared of nested divisions — exact integer confusion
    // moments, one double divide each for po/pe/κ
    "x158_labeler_kappa" ->
      """WITH l AS (SELECT
        |  CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
        |  CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(a*b) AS BIGINT) AS n11, CAST(SUM(a*(1-b)) AS BIGINT) AS n10,
        |  CAST(SUM((1-a)*b) AS BIGINT) AS n01,
        |  CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00 FROM l)
        |SELECT n, n11, n10, n01, n00,
        |ROUND(CAST(n11 + n00 AS DOUBLE) / n, 4) AS po,
        |ROUND(CAST((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10) AS DOUBLE)
        |  / CAST(n*n AS DOUBLE), 4) AS pe,
        |ROUND(CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10)) AS DOUBLE)
        |  / CAST(n*n - ((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10)) AS DOUBLE), 4)
        |  AS kappa
        |FROM m""".stripMargin,

    // x159: tf·ln(N/df), ranked on the ROUNDED score (x83's ln precedent)
    "x159_tfidf_terms" ->
      """WITH tf AS (SELECT source, t, COUNT(*) AS tf FROM
        |  (SELECT source, UNNEST(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT t, COUNT(*) AS df FROM
        |  (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS t
        |   FROM documents) GROUP BY 1),
        |n AS (SELECT COUNT(*) AS nn FROM documents),
        |sc AS (SELECT source, t, tf, df,
        |  ROUND(tf * LN(CAST(nn AS DOUBLE) / df), 4) AS score
        |  FROM tf JOIN df USING (t) CROSS JOIN n),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |  ORDER BY score DESC, t) AS rk FROM sc)
        |SELECT source, CAST(rk AS BIGINT) AS rk, t AS term,
        |CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // x160: Lorenz curve + closed-form Gini over the |sources| aggregate
    "x160_source_gini" ->
      """WITH m AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source, tokens,
        |  CAST(ROW_NUMBER() OVER (ORDER BY tokens ASC, source ASC) AS BIGINT) AS rk,
        |  CAST(SUM(tokens) OVER (ORDER BY tokens ASC, source ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens FROM m),
        |t AS (SELECT COUNT(*) AS k, CAST(SUM(tokens) AS BIGINT) AS total,
        |  CAST(SUM(rk * tokens) AS BIGINT) AS iwx FROM r)
        |SELECT rk, source, tokens,
        |ROUND(CAST(cum_tokens AS DOUBLE) / total, 6) AS cum_share,
        |ROUND(CAST(2*iwx - (k+1)*total AS DOUBLE) / CAST(k*total AS DOUBLE), 6)
        |  AS gini
        |FROM r CROSS JOIN t ORDER BY rk""".stripMargin,

    // x161: TPC-H Q11 shape — HAVING vs a global scalar, integer-exact
    // (rev4·10⁴ > total4·5; uncast sums stay HUGEINT only inside the CTE)
    "x161_important_parts" ->
      """WITH rev AS (SELECT l_partkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev4
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(rev4) AS total4 FROM rev)
        |SELECT l_partkey,
        |ROUND(CAST(rev4 AS DOUBLE) / 10000.0, 4) AS revenue,
        |ROUND(CAST(rev4 AS DOUBLE) / CAST(total4 AS DOUBLE), 6) AS share
        |FROM rev CROSS JOIN tot
        |WHERE rev4 * 10000 > total4 * 5
        |ORDER BY revenue DESC, l_partkey""".stripMargin,

    // x162: TPC-H Q16 shape — NOT IN → anti join + COUNT(DISTINCT)
    "x162_supp_diversity" ->
      """WITH excluded AS (SELECT DISTINCT l_suppkey AS x_supp FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_quantity = 50 AND l_discount = 0.1)
        |SELECT p_brand, p_size,
        |CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT x_supp FROM excluded)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    // x163: TPC-H Q20 shape — the nested chain flattened into ONE
    // conditional-sum aggregate; exact integral-quantity sums
    "x163_dominant_ship" ->
      """WITH p AS (SELECT l_partkey, l_suppkey,
        |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty97,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_all
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_parts, qty97_sum FROM (
        |  SELECT l_suppkey, COUNT(*) AS n_parts,
        |  CAST(SUM(qty97) AS BIGINT) AS qty97_sum
        |  FROM p WHERE qty97 > 0 AND qty97 * 2 > qty_all GROUP BY 1) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY n_parts DESC, s_suppkey""".stripMargin,

    // x164: md5-parity assignment; z² cleared of nested divisions —
    // HUGEINT moments, one double divide each (the x158 discipline)
    "x164_ab_test" ->
      s"""WITH e AS ($E),
         |u AS (SELECT user_id,
         |  CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 10
         |    THEN 1 ELSE 0 END AS conv,
         |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS variant
         |  FROM e GROUP BY user_id),
         |m AS (SELECT
         |  CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
         |  CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
         |  FROM u)
         |SELECT n1, c1, n2, c2,
         |ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
         |ROUND(CAST(c2 AS DOUBLE) / n2, 6) AS p2,
         |ROUND(CAST(c2 * n1 AS DOUBLE) / CAST(c1 * n2 AS DOUBLE), 6) AS lift,
         |ROUND(CAST((c1*n2 - c2*n1) * (c1*n2 - c2*n1) * (n1+n2) AS DOUBLE)
         |  / CAST(n1 * n2 * (c1+c2) * (n1+n2-c1-c2) AS DOUBLE), 4) AS z2,
         |CAST(CAST((c1*n2 - c2*n1) * (c1*n2 - c2*n1) * (n1+n2) AS DOUBLE)
         |  / CAST(n1 * n2 * (c1+c2) * (n1+n2-c1-c2) AS DOUBLE) > 3.841459 AS INT)
         |  AS significant
         |FROM m""".stripMargin,

    // x165: distinct (user, day) → per-user lifetime → age histogram →
    // reversed cumulative risk set; censored users never count as deaths
    "x165_hazard_curve" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id,
         |  epoch_us(ts) // 86400000000 AS day FROM e),
         |h AS (SELECT MAX(day) AS h_day FROM act),
         |life AS (SELECT MAX(day) - MIN(day) AS age,
         |  CASE WHEN MAX(day) >= (SELECT h_day FROM h) - 7 THEN 1 ELSE 0 END
         |    AS censored
         |  FROM act GROUP BY user_id),
         |byage AS (SELECT age, COUNT(*) AS n_ending,
         |  CAST(SUM(1 - censored) AS BIGINT) AS d FROM life GROUP BY 1)
         |SELECT age,
         |CAST(SUM(n_ending) OVER (ORDER BY age DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS n_at_risk,
         |d AS n_churned,
         |ROUND(CAST(d AS DOUBLE) / CAST(SUM(n_ending) OVER (ORDER BY age DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         |  AS hazard
         |FROM byage ORDER BY age""".stripMargin,

    // x166: n-scaled integer CUSUM; argmax ties to the earliest split;
    // shift = raw-ratio difference rounded ONCE (mirrors the Spark side)
    "x166_cusum_cp" ->
      s"""WITH e AS ($E),
         |cnt AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |  COUNT(*) AS c FROM e GROUP BY 1, 2),
         |px AS (SELECT event_type, day, c,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
         |  CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
         |  FROM cnt),
         |tt AS (SELECT event_type AS g_type, MAX(t) AS n, MAX(p) AS s_tot
         |  FROM px GROUP BY 1),
         |dv AS (SELECT px.*, n, s_tot, ABS(n*px.p - t*s_tot) AS absd
         |  FROM px JOIN tt ON event_type = g_type WHERE t < n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |  ORDER BY absd DESC, t ASC) AS rk FROM dv)
         |SELECT event_type, day AS cp_day, t, n AS n_days, absd,
         |ROUND(CAST(p AS DOUBLE) / t, 4) AS before_mean,
         |ROUND(CAST(s_tot - p AS DOUBLE) / (n - t), 4) AS after_mean,
         |ROUND(CAST(s_tot - p AS DOUBLE) / (n - t)
         |  - CAST(p AS DOUBLE) / t, 4) AS shift
         |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // x167: TPC-H Q5 shape — cyclic join (customer and supplier must
    // share a nation); revenue in exact integer 1e-4 dollars
    "x167_local_volume" ->
      """SELECT n_name,
        |ROUND(CAST(rev4 AS DOUBLE) / 10000.0, 4) AS revenue
        |FROM (SELECT n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev4
        |  FROM customer
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  JOIN orders   ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |              AND c_nationkey = s_nationkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1)
        |ORDER BY rev4 DESC, n_name""".stripMargin,

    // x168: TPC-H Q9 shape recast — profit vs catalog price (no
    // partsupp in the fixture), exact integer 1e-4 dollars per row
    "x168_product_profit" ->
      """SELECT n_name, yr,
        |ROUND(CAST(profit4 AS DOUBLE) / 10000.0, 4) AS profit
        |FROM (SELECT n_name, CAST(year(l_shipdate) AS INT) AS yr,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
        |    - CAST(ROUND(p_retailprice*100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit4
        |  FROM lineitem
        |  JOIN part     ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%rod%'
        |  GROUP BY 1, 2)
        |ORDER BY n_name, yr DESC""".stripMargin,

    // x169: TPC-H Q2 shape recast — part↔supplier link derived from
    // lineitem; min unit price in exact integer 1e-4 dollars (floor
    // division of positives: DuckDB // ≡ Spark div)
    "x169_cheapest_supp" ->
      """WITH eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |sl AS (SELECT p_partkey, p_name FROM part WHERE p_size = 5),
        |off AS (SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |  MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT) * 100
        |      // CAST(l_quantity AS BIGINT)) AS unit4
        |  FROM lineitem
        |  JOIN sl ON l_partkey = p_partkey
        |  JOIN eu ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |best AS (SELECT p_partkey AS b_key, MIN(unit4) AS best4
        |  FROM off GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
        |ROUND(CAST(unit4 AS DOUBLE) / 10000.0, 4) AS unit_price
        |FROM off JOIN best ON p_partkey = b_key AND unit4 = best4
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // x170: per-column profile card over the derived dirty view (the
    // x56 precedent); mode = max-count + min-value-at-max, no window
    "x170_column_profile" ->
      """WITH dirty AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 3 THEN NULL ELSE lang END AS lang,
        |  CASE WHEN doc_id % 17 = 5 THEN NULL ELSE source END AS source,
        |  CASE WHEN doc_id % 19 = 7 THEN NULL ELSE n_chars END AS n_chars
        |  FROM documents),
        |lg AS (
        |  SELECT 'doc_id' AS colname, CAST(doc_id AS VARCHAR) AS v FROM dirty
        |  UNION ALL SELECT 'lang', lang FROM dirty
        |  UNION ALL SELECT 'source', source FROM dirty
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM dirty),
        |counts AS (SELECT colname, v, COUNT(*) AS cnt FROM lg GROUP BY 1, 2),
        |stats AS (SELECT colname,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
        |  COUNT(v) AS n_distinct
        |  FROM counts GROUP BY 1),
        |mx AS (SELECT colname AS x_col, MAX(cnt) AS top_cnt
        |  FROM counts WHERE v IS NOT NULL GROUP BY 1),
        |md AS (SELECT colname AS m_col, MIN(v) AS mode_value,
        |  MAX(top_cnt) AS mode_count
        |  FROM counts JOIN mx ON colname = x_col AND cnt = top_cnt
        |  WHERE v IS NOT NULL GROUP BY 1)
        |SELECT colname, n_rows, n_null, n_distinct,
        |ROUND(CAST(n_rows - n_null AS DOUBLE) / n_rows, 4) AS completeness,
        |mode_value, mode_count
        |FROM stats JOIN md ON colname = m_col
        |ORDER BY colname""".stripMargin,

    // x171: length-blocked Levenshtein adjudication; both engines run the
    // classic DP on pure-ASCII 160-char prefixes, so distances are exact
    "x171_edit_distance" ->
      """WITH d AS (SELECT doc_id, lang, n_chars, substr(text, 1, 160) AS pfx,
        |  n_chars // 32 AS b FROM documents)
        |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |CAST(levenshtein(a.pfx, c.pfx) AS BIGINT) AS dist,
        |ROUND(1.0 - CAST(levenshtein(a.pfx, c.pfx) AS DOUBLE)
        |  / greatest(length(a.pfx), length(c.pfx)), 4) AS sim
        |FROM d a JOIN d c ON a.lang = c.lang
        |  AND c.b BETWEEN a.b - 1 AND a.b + 1
        |  AND a.doc_id < c.doc_id AND abs(a.n_chars - c.n_chars) <= 12
        |WHERE levenshtein(a.pfx, c.pfx) <= 40
        |ORDER BY doc_a, doc_b""".stripMargin,

    // x172: per-FK-edge orphan audit over prime-mod derived parent loss;
    // all-integer counts + one rounded share per edge
    "x172_ref_integrity" ->
      """WITH ok AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 997 <> 13),
        |pk AS (SELECT p_partkey FROM part WHERE p_partkey % 193 <> 7),
        |ck AS (SELECT c_custkey FROM customer WHERE c_custkey % 89 <> 11),
        |nk AS (SELECT n_nationkey FROM nation WHERE n_nationkey % 7 <> 3)
        |SELECT * FROM (
        |SELECT 'lineitem->orders' AS edge, COUNT(*) AS n_child,
        |  CAST(SUM(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
        |  COUNT(DISTINCT CASE WHEN ok.o_orderkey IS NULL THEN l.l_orderkey END) AS n_orphan_keys,
        |  ROUND(CAST(SUM(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS orphan_share
        |FROM lineitem l LEFT JOIN ok ON l.l_orderkey = ok.o_orderkey
        |UNION ALL
        |SELECT 'lineitem->part', COUNT(*),
        |  CAST(SUM(CASE WHEN pk.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT CASE WHEN pk.p_partkey IS NULL THEN l.l_partkey END),
        |  ROUND(CAST(SUM(CASE WHEN pk.p_partkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |FROM lineitem l LEFT JOIN pk ON l.l_partkey = pk.p_partkey
        |UNION ALL
        |SELECT 'orders->customer', COUNT(*),
        |  CAST(SUM(CASE WHEN ck.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT CASE WHEN ck.c_custkey IS NULL THEN o.o_custkey END),
        |  ROUND(CAST(SUM(CASE WHEN ck.c_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |FROM orders o LEFT JOIN ck ON o.o_custkey = ck.c_custkey
        |UNION ALL
        |SELECT 'supplier->nation', COUNT(*),
        |  CAST(SUM(CASE WHEN nk.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT CASE WHEN nk.n_nationkey IS NULL THEN s.s_nationkey END),
        |  ROUND(CAST(SUM(CASE WHEN nk.n_nationkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |FROM supplier s LEFT JOIN nk ON s.s_nationkey = nk.n_nationkey
        |) ORDER BY edge""".stripMargin,

    // x173: QI cells then per-type rollup; l = exact distinct users per
    // (type, day, hour-of-day) cell, all-integer + one rounded share
    "x173_l_diversity" ->
      s"""WITH e AS ($E),
         |cells AS (SELECT event_type,
         |  epoch_us(ts) // 86400000000 AS day,
         |  (epoch_us(ts) // 3600000000) % 24 AS hod,
         |  COUNT(DISTINCT user_id) AS l, COUNT(*) AS n_rows
         |  FROM e GROUP BY 1, 2, 3)
         |SELECT event_type, COUNT(*) AS n_cells,
         |CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         |MIN(l) AS min_l,
         |ROUND(CAST(SUM(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS DOUBLE)
         |  / SUM(n_rows), 4) AS risk_share
         |FROM cells GROUP BY 1 ORDER BY event_type""".stripMargin,

    // x174: 2-D skyline via per-size max + running max over strictly
    // smaller sizes; frontier membership in exact integer cents
    "x174_pareto_skyline" ->
      """WITH p AS (SELECT p_partkey, p_size,
        |  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents FROM part),
        |s AS (SELECT p_size, MAX(cents) AS max_at FROM p GROUP BY 1),
        |f AS (SELECT p_size, max_at, MAX(max_at) OVER (ORDER BY p_size
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev FROM s)
        |SELECT p_partkey, p.p_size, ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS price
        |FROM p JOIN f ON p.p_size = f.p_size
        |WHERE (max_prev IS NULL OR max_at > max_prev) AND cents = max_at
        |ORDER BY p.p_size, p_partkey""".stripMargin,

    // x175: contingency cells + window marginals over the aggregate;
    // expected/PMI/chi2 each one divide of exact HUGEINT products
    "x175_contingency" ->
      """WITH cells AS (SELECT lang, source, COUNT(*) AS n_xy
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT lang, source, n_xy,
        |  CAST(SUM(n_xy) OVER (PARTITION BY lang) AS HUGEINT) AS hx,
        |  CAST(SUM(n_xy) OVER (PARTITION BY source) AS HUGEINT) AS hy,
        |  CAST(SUM(n_xy) OVER () AS HUGEINT) AS hn FROM cells)
        |SELECT lang, source, n_xy,
        |ROUND(CAST(hx * hy AS DOUBLE) / CAST(hn AS DOUBLE), 4) AS expected,
        |ROUND(LN(CAST(hn * n_xy AS DOUBLE) / CAST(hx * hy AS DOUBLE)), 4) AS pmi,
        |ROUND(CAST((hn * n_xy - hx * hy) * (hn * n_xy - hx * hy) AS DOUBLE)
        |  / CAST(hn * hx * hy AS DOUBLE), 6) AS chi2_cell
        |FROM m ORDER BY lang, source""".stripMargin,

    // x176: normal equations by Cramer over exact HUGEINT moments; each
    // coefficient is one double divide of two exact determinants
    "x176_ols_fit" ->
      s"""WITH e AS ($E),
         |u AS (SELECT user_id,
         |  COUNT(DISTINCT epoch_us(ts) // 86400000000) AS x1,
         |  COUNT(*) AS x2,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
         |  CAST(COUNT(*) AS HUGEINT) AS s00,
         |  CAST(SUM(x1) AS HUGEINT) AS s01, CAST(SUM(x2) AS HUGEINT) AS s02,
         |  CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
         |  CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
         |  CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
         |  CAST(SUM(y) AS HUGEINT) AS t0, CAST(SUM(x1 * y) AS HUGEINT) AS t1,
         |  CAST(SUM(x2 * y) AS HUGEINT) AS t2 FROM u)
         |SELECT nu AS n_users,
         |ROUND(CAST(t0 * (s11 * s22 - s12 * s12) - s01 * (t1 * s22 - s12 * t2)
         |    + s02 * (t1 * s12 - s11 * t2) AS DOUBLE)
         |  / CAST(s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02)
         |    + s02 * (s01 * s12 - s11 * s02) AS DOUBLE), 6) AS b0,
         |ROUND(CAST(s00 * (t1 * s22 - s12 * t2) - t0 * (s01 * s22 - s12 * s02)
         |    + s02 * (s01 * t2 - t1 * s02) AS DOUBLE)
         |  / CAST(s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02)
         |    + s02 * (s01 * s12 - s11 * s02) AS DOUBLE), 6) AS b1,
         |ROUND(CAST(s00 * (s11 * t2 - t1 * s12) - s01 * (s01 * t2 - t1 * s02)
         |    + t0 * (s01 * s12 - s11 * s02) AS DOUBLE)
         |  / CAST(s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02)
         |    + s02 * (s01 * s12 - s11 * s02) AS DOUBLE), 6) AS b2
         |FROM mo""".stripMargin,

    // x177: conditional forward-frame mins (next purchase / next error)
    // off ONE user-ordered window; latency exact integer µs, one divide
    "x177_pattern_match" ->
      s"""WITH e AS ($E),
         |m AS (SELECT user_id, event_type, epoch_us(ts) AS us,
         |  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER w AS np,
         |  MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) OVER w AS ne
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         |v AS (SELECT user_id, COUNT(*) AS n_views,
         |  CAST(SUM(CASE WHEN np IS NOT NULL AND np - us <= 21600000000
         |    AND (ne IS NULL OR ne > np) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         |  SUM(CASE WHEN np IS NOT NULL AND np - us <= 21600000000
         |    AND (ne IS NULL OR ne > np) THEN np - us END) AS lat
         |  FROM m WHERE event_type = 'view' GROUP BY 1)
         |SELECT user_id, n_views, n_matched,
         |ROUND(CAST(n_matched AS DOUBLE) / n_views, 4) AS match_rate,
         |CASE WHEN n_matched > 0 THEN
         |  ROUND(CAST(lat AS DOUBLE) / (n_matched * 1e6), 3) END AS avg_latency_s
         |FROM v ORDER BY user_id""".stripMargin,

    // x178: cross-type Pearson at lags 0-3 over the zero-filled hour
    // spine; moments HUGEINT, one IEEE sqrt + one divide; NULL on a
    // zero-variance side
    "x178_cross_corr" ->
      s"""WITH e AS ($E),
         |c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS c
         |  FROM e GROUP BY 1, 2),
         |b AS (SELECT MIN(hr) AS hlo, MAX(hr) AS hhi FROM c),
         |sp AS (SELECT et.event_type, g.hr
         |  FROM (SELECT DISTINCT event_type FROM c) et, b,
         |  UNNEST(generate_series(b.hlo, b.hhi)) AS g(hr)),
         |s AS (SELECT sp.event_type, sp.hr, COALESCE(c.c, 0) AS c
         |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.hr = sp.hr),
         |pr AS (SELECT s.event_type AS t_lead, s.hr, s.c AS x, g.lag AS lag,
         |  s.hr + g.lag AS tgt FROM s, UNNEST(generate_series(0, 3)) AS g(lag)),
         |m AS (SELECT t_lead, f.event_type AS t_follow, lag,
         |  COUNT(*) AS n, SUM(x) AS sx, SUM(f.c) AS sy, SUM(x * f.c) AS sxy,
         |  SUM(x * x) AS sxx, SUM(f.c * f.c) AS syy
         |  FROM pr JOIN s f ON f.hr = pr.tgt AND f.event_type <> pr.t_lead
         |  GROUP BY 1, 2, 3)
         |SELECT t_lead, t_follow, lag,
         |CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
         |  ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
         |    / SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 4)
         |END AS r
         |FROM m ORDER BY t_lead, t_follow, lag""".stripMargin,

    // x179: FIFO matching via the Lindley reflection — a purchase is
    // wasted iff its post-balance is a new strict minimum below 0; the
    // k-th matched purchase serves the k-th view (rank-equality join)
    "x179_fifo_matching" ->
      s"""WITH e AS ($E),
         |base AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  CASE WHEN event_type = 'view' THEN 1 ELSE -1 END AS delta
         |  FROM e WHERE event_type IN ('view', 'purchase')),
         |m1 AS (SELECT user_id, event_id, us, delta,
         |  CAST(SUM(delta) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS bal
         |  FROM base),
         |m2 AS (SELECT *, MIN(bal) OVER (PARTITION BY user_id ORDER BY us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin FROM m1),
         |mk AS (SELECT *, (delta = -1 AND bal < LEAST(0, COALESCE(pmin, 0))) AS wasted FROM m2),
         |v AS (SELECT user_id, us, ROW_NUMBER() OVER
         |  (PARTITION BY user_id ORDER BY us, event_id) AS rk FROM mk WHERE delta = 1),
         |p AS (SELECT user_id, us, ROW_NUMBER() OVER
         |  (PARTITION BY user_id ORDER BY us, event_id) AS rk
         |  FROM mk WHERE delta = -1 AND NOT wasted),
         |wt AS (SELECT v.user_id, COUNT(*) AS n_served,
         |  CAST(SUM(p.us - v.us) AS BIGINT) AS wait_us
         |  FROM v JOIN p ON v.user_id = p.user_id AND v.rk = p.rk GROUP BY 1),
         |tot AS (SELECT user_id,
         |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         |  CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
         |  FROM base GROUP BY 1)
         |SELECT t.user_id, n_views, n_purchases,
         |COALESCE(n_served, 0) AS n_served,
         |n_purchases - COALESCE(n_served, 0) AS n_wasted,
         |CASE WHEN n_served > 0 THEN
         |  ROUND(CAST(wait_us AS DOUBLE) / (n_served * 1e6), 3) END AS avg_wait_s
         |FROM tot t LEFT JOIN wt ON t.user_id = wt.user_id
         |ORDER BY t.user_id""".stripMargin,

    // x180: growth accounting off distinct (user, day); churn aligned
    // over the dense day spine; quick ratio NULL when churn is 0
    "x180_growth_acct" ->
      s"""WITH e AS ($E),
         |act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM e),
         |cl AS (SELECT day,
         |  CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_new,
         |  CASE WHEN prev = day - 1 THEN 1 ELSE 0 END AS is_ret,
         |  CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END AS is_res
         |  FROM (SELECT user_id, day,
         |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev FROM act)),
         |daily AS (SELECT day, COUNT(*) AS n_active,
         |  CAST(SUM(is_new) AS BIGINT) AS n_new,
         |  CAST(SUM(is_ret) AS BIGINT) AS n_retained,
         |  CAST(SUM(is_res) AS BIGINT) AS n_resurrected
         |  FROM cl GROUP BY 1),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
         |sp AS (SELECT g.day FROM b, UNNEST(generate_series(b.d0, b.d1)) AS g(day)),
         |j AS (SELECT sp.day, COALESCE(n_active, 0) AS n_active,
         |  COALESCE(n_new, 0) AS n_new, COALESCE(n_retained, 0) AS n_retained,
         |  COALESCE(n_resurrected, 0) AS n_resurrected
         |  FROM sp LEFT JOIN daily d ON sp.day = d.day),
         |f AS (SELECT *, COALESCE(LAG(n_active) OVER (ORDER BY day), 0)
         |  - n_retained AS churned FROM j)
         |SELECT day, n_active, n_new, n_retained, n_resurrected, churned,
         |CASE WHEN churned > 0 THEN
         |  ROUND(CAST(n_new + n_resurrected AS DOUBLE) / churned, 4) END AS quick_ratio
         |FROM f ORDER BY day""".stripMargin,

    // x181: CDC boundaries where the 8-byte polynomial rolling hash hits
    // 0 mod 64; byte ≡ char on the ASCII corpus so the twin is exact
    "x181_cdc_chunking" ->
      """WITH dcs AS (SELECT doc_id, source, text,
        |  CAST(length(text) AS BIGINT) AS n,
        |  list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes
        |  FROM documents WHERE octet_length(encode(text)) = n_chars AND n_chars > 0),
        |bd AS (SELECT doc_id, source, text, n,
        |  list_filter(range(1, n + 1), i -> i >= 8 AND (
        |    1 * codes[CAST(i AS INT)]
        |    + 31 * codes[CAST(i - 1 AS INT)]
        |    + 961 * codes[CAST(i - 2 AS INT)]
        |    + 29791 * codes[CAST(i - 3 AS INT)]
        |    + 923521 * codes[CAST(i - 4 AS INT)]
        |    + 28629151 * codes[CAST(i - 5 AS INT)]
        |    + 887503681 * codes[CAST(i - 6 AS INT)]
        |    + 27512614111 * codes[CAST(i - 7 AS INT)]) % 64 = 0) AS bnds
        |  FROM dcs),
        |ed AS (SELECT doc_id, source, text,
        |  CASE WHEN len(bnds) = 0 OR bnds[-1] <> n
        |    THEN list_append(bnds, n) ELSE bnds END AS ends FROM bd),
        |pr AS (SELECT doc_id, source, text,
        |  UNNEST(list_transform(range(1, len(ends) + 1), k ->
        |    {'p': CASE WHEN k = 1 THEN 0 ELSE ends[CAST(k - 1 AS INT)] END,
        |     'e': ends[CAST(k AS INT)]})) AS u FROM ed),
        |ch AS (SELECT doc_id, source, u.e - u.p AS clen,
        |  md5(substr(text, CAST(u.p + 1 AS INT), CAST(u.e - u.p AS INT))) AS h
        |  FROM pr)
        |SELECT source, COUNT(DISTINCT doc_id) AS n_payloads,
        |COUNT(*) AS n_chunks, COUNT(DISTINCT h) AS n_distinct_chunks,
        |ROUND(CAST(SUM(clen) AS DOUBLE) / COUNT(*), 4) AS mean_chunk_bytes,
        |ROUND(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 4) AS dedup_share
        |FROM ch GROUP BY 1 ORDER BY source""".stripMargin,

    // x182: Poisson(1) bootstrap weights from the md5 table lookup
    // (CDF quantized at 1e-4); exact integer folds, one divide each
    "x182_bootstrap" ->
      s"""WITH e AS ($E),
         |u AS (SELECT user_id,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |r AS (SELECT user_id, y, g.rep FROM u,
         |  UNNEST(generate_series(0, 9)) AS g(rep)),
         |h AS (SELECT rep, y,
         |  ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)),
         |    1, 8))::BIGINT % 10000 AS hv FROM r),
         |w AS (SELECT rep, y,
         |  CASE WHEN hv < 3679 THEN 0 WHEN hv < 7358 THEN 1 WHEN hv < 9197 THEN 2
         |       WHEN hv < 9810 THEN 3 WHEN hv < 9963 THEN 4 ELSE 5 END AS w FROM h)
         |SELECT rep, CAST(SUM(w) AS BIGINT) AS n_drawn,
         |ROUND(CAST(SUM(w * y) AS DOUBLE) / SUM(w), 6) AS mean_purchases
         |FROM w GROUP BY 1 ORDER BY rep""".stripMargin,

    // x183: two-way additive decomposition over the zero-filled 7x24
    // grid; fitted/residual cleared to integer x 168 — one divide each.
    // dayofweek(ts): DuckDB's is 0=Sunday..6; Spark's 1..7, minus 1
    "x183_dow_hour_resid" ->
      s"""WITH e AS ($E),
         |c AS (SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
         |  (epoch_us(ts) // 3600000000) % 24 AS hod, COUNT(*) AS n
         |  FROM e GROUP BY 1, 2),
         |sp AS (SELECT gd.dow, gh.hod FROM
         |  UNNEST(generate_series(0, 6)) AS gd(dow),
         |  UNNEST(generate_series(0, 23)) AS gh(hod)),
         |cells AS (SELECT sp.dow, sp.hod, COALESCE(c.n, 0) AS n
         |  FROM sp LEFT JOIN c ON sp.dow = c.dow AND sp.hod = c.hod),
         |r AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS rs FROM cells GROUP BY 1),
         |cl AS (SELECT hod, CAST(SUM(n) AS BIGINT) AS cs FROM cells GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM cells)
         |SELECT cells.dow, cells.hod, n,
         |ROUND(CAST(7 * rs + 24 * cs - tt AS DOUBLE) / 168.0, 4) AS fitted,
         |ROUND(CAST(168 * n - 7 * rs - 24 * cs + tt AS DOUBLE) / 168.0, 4) AS residual
         |FROM cells JOIN r ON cells.dow = r.dow
         |JOIN cl ON cells.hod = cl.hod CROSS JOIN t
         |ORDER BY cells.dow, cells.hod""".stripMargin,

    // x184: Shannon byte entropy in nats; integer histogram, <=256-term
    // c*ln(c) double reduction (x67's ln-sum precedent), one divide
    "x184_byte_entropy" ->
      """WITH dcs AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n
        |  FROM documents WHERE octet_length(encode(text)) = n_chars AND n_chars > 0),
        |ex AS (SELECT doc_id, n,
        |  UNNEST(list_transform(string_split(text, ''), ch -> ord(ch))) AS b
        |  FROM dcs),
        |bins AS (SELECT doc_id, n, b, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3)
        |SELECT doc_id, n AS n_bytes, COUNT(*) AS n_distinct_bytes,
        |ROUND(LN(CAST(n AS DOUBLE))
        |  - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) / n, 4) AS entropy
        |FROM bins GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // x185: deterministic PII injection + regex-class detection; both
    // patterns sit in the Java/RE2-identical regex subset
    "x185_pii_audit" ->
      """WITH dirty AS (SELECT doc_id, source, text
        |  || CASE WHEN doc_id % 11 = 3
        |     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |     ELSE '' END
        |  || CASE WHEN doc_id % 13 = 4
        |     THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |     ELSE '' END AS text
        |  FROM documents),
        |c AS (SELECT source,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS ne,
        |  CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS np
        |  FROM dirty)
        |SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
        |CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
        |CAST(SUM(ne) AS BIGINT) AS email_hits,
        |CAST(SUM(np) AS BIGINT) AS phone_hits,
        |ROUND(CAST(SUM(CASE WHEN ne > 0 OR np > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / COUNT(*), 4) AS pii_share
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,

    // x186: x14's exact-Jaccard pair CTE + 8 unrolled peel rounds.
    // MATERIALIZED is load-bearing: inlined CTEs re-expand each prior
    // round ~4x per level (exponential plan; measured a hang at depth 9)
    "x186_kcore" -> {
      val rounds = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (SELECT id, COUNT(*) AS dg FROM
           |  (SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE dg >= 64),
           |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
           |  WHERE a IN (SELECT id FROM k$i) AND b IN (SELECT id FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b
         |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
         |$rounds
         |SELECT id AS doc_id, COUNT(*) AS core_deg FROM
         |(SELECT a AS id FROM e8 UNION ALL SELECT b FROM e8)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // x187: x53's vote rule run to a BOUNDED fixpoint — the twin unrolls
    // exactly 4 vote/pick rounds under MATERIALIZED CTEs (the x186 rule:
    // inlined CTEs re-expand the pair scan per level), labels immutable
    // once assigned; Spark runs the same 4 rounds with early-exit only
    // at the fixpoint (LabelPropIterSpec pins fixture fixpoint ≤ 4 and
    // round-1 ≡ x53)
    "x187_label_prop_iter" -> {
      val rounds = (1 to 4).map { i =>
        s"""v$i AS MATERIALIZED (SELECT e.src AS id, l.pred_lang, COUNT(*) AS c
           |  FROM edges e JOIN l${i - 1} l ON l.id = e.dst
           |  WHERE e.src NOT IN (SELECT id FROM l${i - 1}) GROUP BY 1, 2),
           |b$i AS MATERIALIZED (SELECT id, pred_lang, $i AS hops FROM
           |  (SELECT id, pred_lang,
           |     row_number() OVER (PARTITION BY id ORDER BY c DESC, pred_lang) AS r
           |   FROM v$i) q WHERE r = 1),
           |l$i AS MATERIALIZED (SELECT * FROM l${i - 1} UNION ALL SELECT * FROM b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) u),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS MATERIALIZED (SELECT doc_a, doc_b
         |  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |l0 AS MATERIALIZED (SELECT doc_id AS id, lang AS pred_lang, 0 AS hops
         |  FROM documents WHERE doc_id % 10 = 0),
         |$rounds
         |SELECT l.id AS doc_id, l.pred_lang, l.hops, d.lang AS true_lang,
         |CAST(l.pred_lang = d.lang AS INT) AS hit
         |FROM l4 l JOIN documents d ON d.doc_id = l.id
         |WHERE l.id % 10 <> 0 ORDER BY doc_id""".stripMargin
    },
  )
}
