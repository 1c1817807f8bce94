package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §5.3's FP-determinism contract, tested directly: every contract
  * query must produce IDENTICAL canonical output under different shuffle
  * parallelism. Double summation is order-sensitive at the last bits; the
  * contract's ROUND(,4) wrappers must absorb that — if a query ever sits on
  * a rounding knife edge, this catches it before the oracle gate does.
  */
class DeterminismSpec extends SparkSpecBase {

  // FP-heaviest queries: multi-agg sums/avgs, window checksums, stats, rates
  private val sensitive = Seq(
    "q10_join_smj", "q19_agg_tpch_q1", "q22_rollup", "q24_having",
    "q26_stats", "q30_lag_delta", "q31_running_sum", "q32_moving_avg",
    "q48_downsample", "q49_rate", "q51_sma", "q54_cosine_topk", "q57_multimodal_arr",
    // round-4 additions: x14's iterative label fixpoint, x16's windowed
    // cumsum/shard assignment, x18's AVG-of-logs (sum order ± last ulp)
    "x14_dedup_clusters", "x16_token_shards", "x18_lm_score",
    // x20: per-session SUM(value) is order-sensitive double addition under
    // dround; x22: max-abs reconstruction error over IEEE mul/div chains
    "x20_sessionize", "x22_quantize",
    // x23: SUM of double increases (order ± last ulp under dround);
    // x25: windowed avg/stddev partials merge in partitioning order
    "x23_counter_rate", "x25_anomaly",
    // round-5 additions: x29's integer replication must be partition-blind
    // by construction (the whole point of the multiplicative-hash draw);
    // x30/x32 carry one ROUND(4) ratio over integer counts; x33's argmax
    // must not depend on which partition delivers the cluster rows
    "x29_mixture_resample", "x30_source_overlap", "x32_vocab_growth",
    "x33_dedup_survivors",
    // x31/x35: two-level top-k must pick identical finalists at any width;
    // x34: both sketches' tolerance booleans must not wobble with merges
    "x31_top_bigrams", "x34_quantile_sketch", "x35_fixed_k_sample",
    // x37: the recall verdict composes two FP-ranked top-k sets; both must
    // select identical finalists at any width for ok to be stable
    "x37_ann_recall",
    // round-8 additions: x104's revenue is an order-sensitive double sum
    // under dround; x105 ranks on a rounded ratio of integer sums — the
    // snap-to-cos4 step must make the ranking partition-blind
    "x104_star_join", "x105_margin_mine",
    // x106: the prefix-filtered pair list must be identical at any width —
    // candidate completeness is order-theoretic, not partitioning-lucky
    "x106_exact_pairs",
    // round-9 additions: x120's ACF divide must see the same integer sums
    // at any width (lead windows over the spine merge in partition order);
    // x121's min/max of rounded j must be partition-blind; x122's
    // histogram cut must equal the same prefix under any partitioning
    "x120_hourly_acf", "x121_syndication", "x122_budget_cut",
    // x131: Q3's revenue is an order-sensitive double sum under dround
    "x131_ship_priority",
    // x133-x136/x138: every revenue figure is an order-sensitive double sum
    // under dround; x135/x138 additionally divide two rounded sums (the
    // ratio is deterministic only because its inputs are post-round);
    // x134's top-20 cut ranks on the rounded revenue
    "x133_trade_volume", "x134_returned_revenue", "x135_promo_share",
    "x136_disjunctive_revenue", "x138_market_share",
    // x141: the top-1000 vocab cut must select the identical boundary
    // words at any width (integer counts, full tiebreak — but the cut IS
    // the contract, so pin it)
    "x141_oov_rate",
    // x142: percent_rank/cume_dist are rationals of window positions —
    // the full (n, day) tiebreak must make positions width-invariant
    "x142_day_rank",
    // x144: Q6's revenue is an order-sensitive double sum under dround
    "x144_scan_revenue",
    // x146: the saturation prefix + remainder assignment rank on fully
    // tiebroken integer orders — the allocation must be width-invariant
    "x146_waterfill",
    // x148: the per-vector argmax on rounded cosine (map-side-combined
    // struct max) must pick identical neighbors at any width
    "x148_mutual_nn")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(v => if (v == null) "∅" else v.toString).mkString("|"))
      .toSeq
  }

  test("FP-sensitive queries are identical under shuffle parallelism 3 vs 13") {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] =
      sensitive.map(n => n -> canon(SparkEntry.queries(n)(spark, sfDir))).toMap
    try {
      spark.conf.set(key, "3")
      val a = runAll()
      spark.conf.set(key, "13")
      val b = runAll()
      sensitive.foreach { n =>
        assert(a(n) === b(n), s"$n diverges across partitionings")
      }
    } finally spark.conf.set(key, prior)
  }
}
