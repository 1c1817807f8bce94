package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape audit — the 100 TB posture, asserted.
  *
  * Correctness is the oracle's job (tools/check.py); THESE tests pin the
  * plan properties that decide whether each operator survives a 1000×
  * scale-up: pushdown reaching the scan, column pruning, the right join
  * strategy, and no accidental nested-loop/cartesian products.
  */
class PlanSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("Q05: nanos-range pushdown rule lands ts bounds in PushedFilters") {
    val p = planOf(operators.RelationalOps.q05(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(ts,"), s"no lower ts bound pushed:\n$p")
    // int64-nanos layout: the graft rule derives a strict `<` bound;
    // timestamp[µs] layout: Spark unwraps the NTZ cast and pushes `<=`
    assert(p.contains("LessThan(ts,") || p.contains("LessThanOrEqual(ts,"),
           s"no upper ts bound pushed:\n$p")
  }

  test("Q47 series scan: series key AND ts range pushed to parquet") {
    val p = planOf(operators.TimeSeriesOps.q47(spark, sfDir))
    assert(p.contains("EqualTo(user_id,7)"), s"series key not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(ts,"), s"ts range not pushed:\n$p")
  }

  test("x58: both box dimensions (user range AND ts range) reach PushedFilters") {
    val p = planOf(operators.TimeSeriesOps.x58Box(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(user_id,3)") && p.contains("LessThanOrEqual(user_id,7)"),
           s"user bounds not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(ts,"), s"no lower ts bound pushed:\n$p")
    assert(p.contains("LessThan(ts,") || p.contains("LessThanOrEqual(ts,"),
           s"no upper ts bound pushed:\n$p")
  }

  test("x65: RANGE-frame window rides ONE user_id exchange; frame is value-bounded") {
    val p = planOf(operators.TimeSeriesOps.x65TimeWindow(spark, sfDir))
    assert(p.contains("specifiedwindowframe(RangeFrame"),
           s"no value-bounded frame in plan:\n$p")
    val shuffles = p.linesIterator
      .count(l => l.contains("Exchange") && !l.trim.startsWith("("))
    // one shuffle for the window partition + one for the final user agg
    // (AQE may coalesce but not multiply); a third would mean the frame
    // broke the single-pass shape
    assert(shuffles <= 2, s"too many exchanges ($shuffles):\n$p")
  }

  test("x61: explicit-values pivot plans as hash aggregates, no corpus distinct job") {
    val p = planOf(operators.AnalyticOps.x61Pivot(spark, sfDir))
    assert(p.contains("HashAggregate"), s"pivot not aggregate-shaped:\n$p")
    assert(!p.contains("CollectLimit"), s"unexpected driver collect in plan:\n$p")
  }

  test("x72: retention is window-free — distinct + aggregates + one broadcast join") {
    val p = planOf(operators.TimeSeriesOps.x72Retention(spark, sfDir))
    assert(!p.contains("Window"), s"unexpected window in retention plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cohort-size join should broadcast:\n$p")
  }

  test("Q02: column pruning — scan reads exactly the 3 needed columns") {
    val p = planOf(operators.RelationalOps.q02(spark, sfDir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity") &&
           readSchema.contains("l_linenumber"), readSchema)
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
           s"scan reads more than the projection needs: $readSchema")
  }

  test("Q09: dim joins are broadcast, never shuffle") {
    val p = planOf(operators.RelationalOps.q09(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("Q10: fact-fact join is sort-merge as hinted") {
    val p = planOf(operators.RelationalOps.q10(spark, sfDir))
    assert(p.contains("SortMergeJoin"), p)
  }

  test("Q29: no ntile window, no full-group rank — two-level + broadcast count") {
    val p = planOf(operators.AnalyticOps.q29(spark, sfDir))
    // the quartile is the closed form over the count aggregate, never a
    // window function — a ntile anywhere means a full event_type group
    // (corpus/5 rows) serialized onto one task
    assert(!p.contains("ntile"), s"ntile window resurfaced:\n$p")
    // the full-width window partitions by (event_type, bkt); the
    // event_type-only window must sit above the lrk finalist filter
    assert(p.contains("bkt"), s"bucketed local pass missing:\n$p")
    assert(p.contains("lrk"), s"finalist filter missing below the global rank:\n$p")
    // group totals arrive via broadcast, not a shuffle join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"count join fell back to SMJ:\n$p")
  }

  test("Q16 theta join: banding keeps it an equi-join (no nested loop)") {
    val p = planOf(operators.RelationalOps.q16(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"banded range join degenerated to a nested loop:\n$p")
  }

  test("Q17 as-of: union+window plan has no join at all") {
    val p = planOf(operators.TimeSeriesOps.q17(spark, sfDir))
    assert(!p.contains("Join"), s"as-of should be join-free (union+window):\n$p")
    assert(p.contains("Window"), p)
  }

  test("Q53 LSH: candidate generation is an equi-join, not all-pairs") {
    val p = planOf(operators.TextOps.q53(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"LSH candidate join degenerated:\n$p")
  }

  test("Q53 verify stage: band-join width survives to the intersect projection") {
    import org.apache.spark.sql.functions.{col, split}
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val df = functions.MinHashLSH.verifiedPairs(toks, 0.8)
    // static: nothing in the verify pipeline may demand a single partition
    // (the historical failure mode was AQE coalescing a tiny distinct's
    // shuffle to width 1 and re-serializing the per-pair intersect)
    val p = planOf(df)
    assert(!p.contains("SinglePartition"),
           s"verify stage plans a single-partition exchange:\n$p")
    // runtime: the explicit pre-explode repartition is REPARTITION_BY_NUM,
    // which AQE never coalesces — the executed verify projection must keep
    // that width even though every payload table here is broadcast-small
    assert(df.rdd.getNumPartitions > 1,
           "verify stage executed on a single partition")
  }

  test("x38 dedup-first: collapse agg + banded equi-joins, no product") {
    val p = planOf(operators.TextOps.x38DedupFirstNearDup(spark, sfDir))
    assert(p.contains("HashAggregate"), s"sha256 collapse must be a hash agg:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"dedup-first near-dup degenerated to a product:\n$p")
  }

  test("x39 pipeline: collapse agg + banded equi-joins, no product") {
    val p = planOf(operators.TextOps.x39DedupPipeline(spark, sfDir))
    assert(p.contains("HashAggregate"), s"sha256 collapse must be a hash agg:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"dedup pipeline degenerated to a product:\n$p")
  }

  test("x40 embed dedup-first: vector-collapse agg + SRP equi-joins, no product") {
    val p = planOf(operators.VectorOps.x40EmbedDedupFirst(spark, sfDir))
    assert(p.contains("HashAggregate"), s"embedding collapse must be a hash agg:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"dedup-first embed near-dup degenerated to a product:\n$p")
  }

  test("x41 embed pipeline: vector-collapse agg + SRP equi-joins, no product") {
    val p = planOf(operators.VectorOps.x41EmbedPipeline(spark, sfDir))
    assert(p.contains("HashAggregate"), s"embedding collapse must be a hash agg:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"embed pipeline degenerated to a product:\n$p")
  }

  test("x42 incremental dedup: cross band equi-join, no product") {
    val p = planOf(operators.TextOps.x42IncrementalDedup(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
           s"incremental dedup degenerated to a product:\n$p")
  }

  test("Q36 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = planOf(operators.AnalyticOps.q36(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q19/Q48 aggregates are partial+final hash aggregates") {
    for (df <- Seq(operators.RelationalOps.q19(spark, sfDir),
                   operators.TimeSeriesOps.q48(spark, sfDir))) {
      val p = planOf(df)
      assert(p.contains("HashAggregate"), p)
      assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
             s"expected partial+final HashAggregate:\n$p")
    }
  }

  test("Q54 cosine top-k: corpus scans once, probes broadcast") {
    val p = planOf(operators.VectorOps.q54(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"probe join must not shuffle the corpus:\n$p")
  }

  test("CBO: ANALYZE stats reach every base relation of the q22 geo join") {
    // isolated child session: installing the catalog + CBO confs must not
    // leak into the shared test session's resolution
    val s2 = GraftSession.tune(spark.newSession())
    GraftCatalog.install(s2, sfDir)
    // plan.stats reads the THREAD-ACTIVE session's SQLConf: point it at the
    // child session (as execution itself would) or cboEnabled reads false
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
    assert(s2.conf.get("spark.sql.cbo.enabled") == "true")
    // joinReorder deliberately OFF: the DP reorder cross-joins x12's two
    // payload scans (see GraftCatalog scaladoc); strategy selection alone
    // carries the q22/q10 wins
    assert(s2.conf.get("spark.sql.cbo.joinReorder.enabled") == "false")
    // ANALYZE produced an exact row count on the fact table
    val rc = s2.table("default.lineitem").queryExecution.optimizedPlan.stats.rowCount
    assert(rc.isDefined, "no rowCount after ANALYZE — CBO has nothing to cost with")
    assert(rc.get.toLong == s2.read.parquet(s"$sfDir/lineitem.parquet").count())
    // ...and propagates through the view layer to every leaf of the 5-way join
    val opt = operators.RelationalOps.q22(s2, sfDir).queryExecution.optimizedPlan
    val leaves = opt.collectLeaves()
    assert(leaves.size >= 5, s"expected the 5-way geo join's leaves:\n$opt")
    assert(leaves.forall(_.stats.rowCount.isDefined),
           s"some relation lost its catalog stats:\n$opt")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("CBO: reads for a non-installed dir bypass the catalog") {
    val s2 = GraftSession.tune(spark.newSession())
    GraftCatalog.install(s2, sfDir)
    // a different dir must hit its own files, not the catalog's
    val other = Tables.lineitem(s2, "/root/testdata/sf0.01").count()
    assert(other > Tables.lineitem(s2, sfDir).count())
  }

  test("x17 contamination: benchmark side broadcast, no nested loop") {
    val p = planOf(operators.TextOps.x17Contamination(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
           s"containment join degenerated to a product:\n$p")
  }

  test("x15 sampling: pure scan-filter — only the contract ORDER BY exchanges") {
    val p = planOf(operators.TextOps.x15StratifiedSample(spark, sfDir))
    // tree lines only ("+- Exchange (3)") — the formatted detail section
    // repeats each node as "(3) Exchange"
    val exchanges = p.linesIterator
      .count(l => l.contains("Exchange") && !l.trim.startsWith("("))
    assert(exchanges <= 1, s"sampling core must not shuffle (found $exchanges):\n$p")
    assert(!p.contains("Join"), s"sampling must be join-free:\n$p")
  }

  test("x18 LM score: vocab count join has no product; two hash aggregates") {
    val p = planOf(operators.TextOps.x18LmScore(spark, sfDir))
    assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoopJoin"),
           s"unexpected join shape:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("x29 resampling: totals broadcast onto a linear scan, no corpus shuffle") {
    val p = planOf(operators.TextOps.x29MixtureResample(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
           s"per-source/total factors must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
           s"the doc scan must never shuffle for the factor joins:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x30 overlap matrix: shingle self-join is an equi-join, not all-pairs") {
    val p = planOf(operators.TextOps.x30SourceOverlap(spark, sfDir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
           s"pair generation degenerated to a product:\n$p")
  }

  test("x43: per-bucket top-k pushed below the local window; no product joins") {
    val p = planOf(operators.TextOps.x43WeightedSample(spark, sfDir))
    // Spark rewrites the rank-filter into WindowGroupLimit — each bucket
    // keeps k rows BEFORE the window sort, so the corpus never fully sorts
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x44: corpus feeds only aggregates; the pair join sits on the S-row sketch table") {
    val p = planOf(operators.TextOps.x44OverlapSketch(spark, sfDir))
    // hll_sketch_agg is a TypedImperativeAggregate → partial+final
    // ObjectHashAggregate; the only corpus-sized shuffles are aggregates
    assert(p.contains("ObjectHashAggregate"), p)
    // the estimate table joins back to the exact matrix by equi-key
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x45: top-1 assignment group-limited; centroids broadcast; sums partial-agg") {
    val p = planOf(operators.VectorOps.x45KmeansStep(spark, sfDir))
    // the r=1 rank filter must become WindowGroupLimit: each vector keeps
    // its best centroid BEFORE the per-vector sort, so the n·√n assignment
    // table never fully materializes through a global window
    assert(p.contains("WindowGroupLimit"), p)
    // the √n centroid table rides a broadcast; the corpus never shuffles
    // for the cross — BroadcastNestedLoopJoin(cross, build=cents) is the
    // intended shape, a CartesianProduct (both sides shuffled) is not
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // (cluster, dim) integer sums combine map-side before the exchange
    assert(p.contains("partial_sum"), p)
  }

  test("x46: code choice is a partial min-aggregate; codebook broadcast; no products") {
    val p = planOf(operators.VectorOps.x46PqEncode(spark, sfDir))
    // min(struct(d2i, cent_id)) partial-aggregates: each task collapses its
    // n·m·k candidate rows to n·m before any exchange
    assert(p.contains("partial_min"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("x47: ADC joins the int code table to a broadcast LUT; sums partial-agg") {
    val p = planOf(operators.VectorOps.x47PqRecall(spark, sfDir))
    // the corpus floats never shuffle post-encode: the ADC join is a
    // BroadcastHashJoin on (j, code) against the |probes|·m·k-row LUT
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("x31/x32: rank/cumsum windows run over aggregated tables, not the corpus") {
    for (df <- Seq(operators.TextOps.x31TopBigrams(spark, sfDir),
                   operators.TextOps.x32VocabGrowth(spark, sfDir))) {
      val p = planOf(df)
      // every Window node must sit above a HashAggregate in the tree —
      // the window input is the count table, never raw documents
      assert(p.contains("HashAggregate"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    }
  }

  test("x49: sketch screen sits below the only data shuffle") {
    val df = operators.TextOps.x49HeavyHitters(spark, sfDir)
    val p = planOf(df)
    // the CMS point-query filter screens in the scan stage (the codegen
    // kernel, not a ScalaUDF — r9 item 7)...
    assert(p.contains("cms_estimate"), s"sketch screen filter missing:\n$p")
    assert(!p.contains("UDF"), s"ScalaUDF crept back into the screen:\n$p")
    // ...so the single hash exchange carries candidate occurrences only;
    // a second hash exchange would mean a vocabulary-wide shuffle crept in
    val simple = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashEx = simple.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$simple")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x50: Bloom screen filters the corpus before distinct and join") {
    val df = operators.TextOps.x50BloomContamination(spark, sfDir)
    // structural: the corpus-side distinct aggregate must sit ABOVE a
    // Filter holding the Bloom probe kernel — i.e. the screen runs in the
    // scan stage and the corpus never shuffles unscreened
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter}
    import graft.functions.BloomMightContain
    val screened = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.collectLeaves().nonEmpty &&
        a.collect { case f: LFilter if f.condition.exists(_.isInstanceOf[BloomMightContain]) => f }.nonEmpty => a
    }
    assert(screened.nonEmpty, "no aggregate found above the Bloom-probe filter")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x51: one corpus scan into a map-side-combined dim aggregate, no window") {
    val p = planOf(operators.VectorOps.x51PowerIter(spark, sfDir))
    // the power step must never build the d×d Gram matrix or a per-dim
    // re-scan: one Generate (posexplode) over one scan, partial+final hash
    // aggregate on dim, and no window anywhere
    assert(p.contains("Generate"), s"posexplode missing:\n$p")
    assert(p.contains("HashAggregate"), s"dim aggregate not hash-based:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("x52: quartile bounds broadcast back; no per-source window over the corpus") {
    val p = planOf(operators.TextOps.x52QualityBins(spark, sfDir))
    // the q29 trap would be a Window.partitionBy(source) — 10 sources, each
    // group corpus/10 on one task; the two-level shape must bin via a
    // broadcast join against the 10-row bounds aggregate instead
    assert(!p.contains("Window"), s"per-source window resurfaced:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bounds join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x53: votes ride banded equi-joins; no product joins anywhere") {
    val p = planOf(operators.TextOps.x53LabelProp(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the argmax window partitions by doc_id (per-document vote rows),
    // never by the 5-value label
    assert(p.contains("row_number"), s"vote argmax missing:\n$p")
  }

  test("x54: the exact join's input is Bloom-prescreened; no product joins") {
    val df = operators.TextOps.x54Novelty(spark, sfDir)
    // the join must consume only "maybe seen" shingles: a Filter holding
    // the Bloom probe kernel sits below the join (x50's assertion, transposed)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join}
    import graft.functions.BloomMightContain
    val screenedJoins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.collect {
        case f: LFilter if f.condition.exists(_.isInstanceOf[BloomMightContain]) => f
      }.nonEmpty => j
    }
    assert(screenedJoins.nonEmpty, "no join found above a Bloom-probe filter")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x55: dup exposure rides a hash equi-join on the content hash; no products") {
    val p = planOf(operators.TextOps.x55DatasetCard(spark, sfDir))
    assert(p.contains("HashAggregate"), s"hash agg missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(!p.contains("Window"), s"unexpected window:\n$p")
  }

  test("x86/x87/x90/x91: every series window partitions by user_id, never by type") {
    // the q29 lesson, pinned for the round-8 series ops: window partition
    // keys must be the high-cardinality series key (user_id[, event_type]),
    // never the 5-value event_type alone
    for (df <- Seq(operators.TimeSeriesOps.x86Cusum(spark, sfDir),
                   operators.TimeSeriesOps.x87Ewma(spark, sfDir),
                   operators.TimeSeriesOps.x90PathTrigrams(spark, sfDir),
                   operators.TimeSeriesOps.x91Scd2(spark, sfDir))) {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.nonEmpty, "expected at least one window")
      windows.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        assert(keys.contains("user_id"),
          s"window partitions by $keys — missing the high-cardinality series key")
      }
      val p = planOf(df)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    }
  }

  test("x87: rank ≤ 8 compiles to a map-side WindowGroupLimit under the shuffle") {
    // the rank filter must become Spark's WindowGroupLimit with a PARTIAL
    // pass below the exchange: each map task forwards at most 8 rows per
    // user, so the user_id shuffle carries ≤8·|users| rows — not the corpus
    val p = planOf(operators.TimeSeriesOps.x87Ewma(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), s"rank filter not group-limited:\n$p")
    assert(p.contains("Partial"), s"no map-side window group limit:\n$p")
  }

  test("x92: constant-width moment reduction — no window, no join over cells") {
    val p = planOf(operators.TimeSeriesOps.x92CorrPairs(spark, sfDir))
    // the twin's long-form self-join is the SEMANTICS; the plan must be the
    // pivot + one constant-width aggregate (x51's tree-reduce shape):
    // a self-join or per-pair window over cells would rescan per pair
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"pair moments must not join cell tables:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("HashAggregate"), s"moment aggregate not hash-based:\n$p")
  }

  test("x88/x89: pure hash-aggregate audits — no window, no product joins") {
    for (df <- Seq(operators.RelationalOps.x88Benford(spark, sfDir),
                   operators.TextOps.x89KAnon(spark, sfDir))) {
      val p = planOf(df)
      assert(p.contains("HashAggregate"), s"hash agg missing:\n$p")
      assert(!p.contains("Window"), s"unexpected window:\n$p")
      assert(!p.contains("CartesianProduct"), p)
      // the only tolerated nested loop is x88's broadcast of its 1-row total
      assert(!p.replace("BroadcastNestedLoopJoin", "").contains("NestedLoop"), p)
    }
  }

  test("x99/x100: bar and LOCF ops aggregate first; no corpus-wide window") {
    // x100: open/close are min_by/max_by hash aggregates — a per-(type,day)
    // row_number window over the corpus would serialize hot days
    val p100 = planOf(operators.TimeSeriesOps.x100Ohlc(spark, sfDir))
    assert(!p100.contains("Window"), s"OHLC must not window the corpus:\n$p100")
    // min_by/max_by on a struct ordering plans as SortAggregate — still a
    // partial+final aggregate pair (map-side combine), never a per-group
    // serialization; either aggregate node satisfies the scale posture
    assert(p100.contains("HashAggregate") || p100.contains("SortAggregate"), p100)
    // x99: the LOCF window's input must be the (type, hour) aggregate —
    // i.e. a HashAggregate strictly below the Window in the tree
    val df99 = operators.TimeSeriesOps.x99Align(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windowsOverAgg = df99.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.collect { case a: Aggregate => a }.nonEmpty => w
    }
    assert(windowsOverAgg.nonEmpty, "LOCF window does not sit above the hourly aggregate")
  }

  test("x94: df-ratio top-30 compiles to TakeOrderedAndProject over the token table") {
    val p = planOf(operators.TextOps.x94Stopwords(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"full sort of the vocabulary:\n$p")
    // the corpus total rides a 1-row broadcast cross join (the in-plan
    // count subtree) — a BroadcastNestedLoopJoin over ONE row is the
    // intended shape, not a scale hazard; only a non-broadcast product is
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x102: packer windows are bucket-scoped or aggregate-fed; explode present") {
    val df = operators.TextOps.x102SeqPack(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // every Window must either be intra-bucket (partition spec includes bkt —
    // task size bounded by bucketDocs) or run over the bucket AGGREGATE
    // (corpus/256 rows); a per-lang window over raw docs would serialize
    // each language onto one task at scale
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if !w.partitionSpec.exists(_.references.exists(_.name == "bkt")) &&
           w.collect { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"corpus-scoped window in packer plan:\n${bad.mkString}")
    val p = planOf(df)
    assert(p.contains("Generate"), s"chunk explode missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x103: AUC scan runs over the length histogram, never ranks the corpus") {
    val df = operators.TextOps.x103LengthAuc(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // the one (unpartitioned) window must sit ABOVE the histogram aggregate —
    // its input is |distinct n_chars| cells, not corpus rows; and there must
    // be no rank/row_number over raw documents anywhere
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the histogram prefix window")
    assert(windows.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "AUC window does not sit above the histogram aggregate")
  }

  test("x104: date slice pushed to the orders scan; dims broadcast; no product join") {
    val p = planOf(operators.RelationalOps.x104StarJoin(spark, sfDir))
    // the one-year slice must reach the parquet scan — the fact⋈fact join
    // then shuffles one year of orders, not the full table
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"),
      s"o_orderdate lower bound not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate,"),
      s"o_orderdate upper bound not pushed:\n$p")
    // nation/region ride broadcasts; nothing degenerates to a product
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x105: both rank filters group-limit map-side; probes broadcast") {
    val p = planOf(operators.VectorOps.x105MarginMine(spark, sfDir))
    // top-10 neighborhood and best-margin rn=1 must both compile to
    // WindowGroupLimit — each map task forwards ≤10/1 rows per probe
    // before any shuffle; the corpus never serializes through one window
    assert(p.contains("WindowGroupLimit"), s"rank filters not group-limited:\n$p")
    // the probe side rides a broadcast; the only corpus-sized shuffles are
    // the vec_id hash agg + its equi-join back
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), s"non-broadcast product:\n$p")
  }

  test("x106: candidate generation is equi-joins + aggregates; no product join") {
    val p = planOf(operators.TextOps.x106ExactPairs(spark, sfDir))
    // the exact join must never degenerate to a pairwise product — every
    // stage is a token/id equi-join or a hash aggregate; the oracle's
    // exhaustive shared-token shape exists ONLY on the DuckDB side
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("x107: sweep windows are per-user, per-hour, or spine-over-aggregate") {
    val df = operators.TimeSeriesOps.x107PeakConcurrency(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // every window must partition on a high-cardinality key (user_id for
    // sessionization, hr for the intra-hour sweep) or run over the hour
    // AGGREGATE spine — a single global boundary-ordered window would be
    // the classic sweep-line scale-killer
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if !w.partitionSpec.exists(_.references.exists(r =>
             r.name == "user_id" || r.name == "hr")) &&
           w.collect { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"global sweep window:\n${bad.mkString}")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x108: matcher windows are bucket-scoped or spine-over-aggregate") {
    val df = operators.TextOps.x108LengthMatch(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // lang is a low-cardinality key: every window must be intra-bucket
    // (partition spec includes bkt) or run over the bucket-spine aggregate
    // — a plain per-lang window over the corpus is the q29 serialization
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if !w.partitionSpec.exists(_.references.exists(_.name == "bkt")) &&
           w.collect { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"per-lang corpus window in matcher plan:\n${bad.mkString}")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x109: KS scan runs over the cents histogram, never sorts the corpus") {
    val df = operators.TimeSeriesOps.x109KsDrift(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // the CDF windows' input must be the (type, cents) aggregate — cells
    // bounded by the value domain, not the corpus
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the histogram CDF window")
    assert(windows.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "CDF window does not sit above the histogram aggregate")
  }

  test("x111: M4 is ONE hash aggregate — no window, no join, no sort before agg") {
    val df = operators.TimeSeriesOps.x111M4(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "M4 must not use windows — min_by/max_by are declarative aggregates")
    assert(plan.collect { case j: Join => j }.isEmpty, "M4 must not join")
    // partial aggregation must survive to the physical plan AND stay hash-based:
    // a struct order key would demote to SortAggregate (sorts the corpus per
    // partition); the decimal pack keeps HashAggregate + map-side combine
    val p = planOf(df)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("x112: triangle close is equi-join only — no OR-predicate BNL, no product") {
    val df = operators.TextOps.x112Triangles(spark, sfDir)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), p)
    // structural pin: every non-equi join (cross, or OR-predicate — the trap
    // the orientation-ordered wedge pair exists to avoid) must have an
    // aggregate on at least one side (single-row combines / threshold
    // broadcasts); an edge-sized×edge-sized nest has aggregates on neither
    import org.apache.spark.sql.catalyst.expressions.Or
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val bad = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty ||
          j.condition.exists(c => c.exists(_.isInstanceOf[Or])) => j
    }.filterNot(j => Seq(j.left, j.right).exists(
      _.collectFirst { case a: Aggregate => a }.isDefined))
    assert(bad.isEmpty, s"edge-sized non-equi join:\n${bad.mkString("\n")}")
  }

  test("x113: SNM windows are bucket-scoped or spine-over-aggregate") {
    val df = operators.TextOps.x113SnmDedup(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // the global sort position must come from the bucket-carry rewrite: every
    // window either partitions on bkt (intra-bucket row_number) or runs over
    // the bucket-count aggregate (the offset spine) — never one global
    // corpus-ordered window
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if !w.partitionSpec.exists(_.references.exists(_.name == "bkt")) &&
           w.collect { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"global rank window in SNM plan:\n${bad.mkString}")
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the rank's correctness rests on the offset branch and the row_number
    // branch seeing the SAME range boundaries. snmPairsOf materializes the
    // range-bucketed frame ONCE (eager localCheckpoint), so both branches
    // structurally read the same pinned partitions; pin that no residual
    // k-range exchange instantiations disagree (there should be none left
    // in the optimized plan — the checkpoint swallowed the exchange)
    val ranges = p.linesIterator.filter(_.contains("rangepartitioning(k#")).map(
      _.replaceAll("#\\d+", "#").replaceAll("plan_id=\\d+", "plan_id=")
        .trim).toSet
    assert(ranges.size <= 1, s"divergent range exchanges:\n$ranges")
  }

  test("x114/x115: quantile windows run over histograms, never rank the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // x114: the mass-cut window's input is the (lang, n_chars) aggregate
    val w114 = operators.TextOps.x114MassQuantiles(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(w114.nonEmpty && w114.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "x114 window does not sit above the histogram aggregate")
    // x115: the locate window runs over the histogram; the refine window
    // partitions on (event_type, bkt) — per-bucket residents, not the group
    val bad115 = operators.RelationalOps.x115TwoPassMedian(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: LWindow
          if !w.partitionSpec.exists(_.references.exists(_.name == "bkt")) &&
             w.collect { case a: Aggregate => a }.isEmpty => w
      }
    assert(bad115.isEmpty, s"corpus-wide median window:\n${bad115.mkString}")
  }

  test("x116: vocab joins broadcast; pair agg collapses map-side (hash agg)") {
    val p = planOf(operators.TextOps.x116AssocRules(spark, sfDir))
    // the ≤100-row vocab must broadcast onto the incidence table, and the
    // ≤4950-key pair aggregation must be hash (map-side combine is what
    // bounds the exchange at any corpus size)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x117: gap window partitions on the (user_id, event_type) series key") {
    val df = operators.TimeSeriesOps.x117Burstiness(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if !w.partitionSpec.exists(_.references.exists(_.name == "user_id")) => w
    }
    assert(bad.isEmpty, s"lag window not keyed by user_id:\n${bad.mkString}")
  }

  test("x101: both rankings broadcast the probe set; no vector self-join") {
    val p = planOf(operators.VectorOps.x101Matryoshka(spark, sfDir))
    // each ranking is corpus × broadcast(10 probes) — a BroadcastNestedLoop
    // over the tiny probe side, never a shuffled corpus×corpus join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), s"non-broadcast product join:\n$p")
    // any remaining equi-joins (overlap, final probe join) operate on the
    // 10·|probes|-row lists — corpus-independent either way
  }

  test("x94/x116: corpus total is an in-plan grand-total aggregate, one job") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // the corpus count must ride a broadcast 1-row aggregate INSIDE the
    // plan (crossJoin), not a driver-side .count() action — one job, one
    // scan pass at the driver level (r8 verdict item 6)
    for (df <- Seq(operators.TextOps.x94Stopwords(spark, sfDir),
                   operators.TextOps.x116AssocRules(spark, sfDir))) {
      val grandTotalJoins = df.queryExecution.optimizedPlan.collect {
        case j: Join if Seq(j.left, j.right).exists(
          _.collectFirst {
            case a: Aggregate if a.groupingExpressions.isEmpty => a
          }.isDefined) => j
      }
      assert(grandTotalJoins.nonEmpty,
        s"no grand-total aggregate join in plan:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("round-9 ops: windows aggregate-fed or per-user; no corpus window/product") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // x120/x122/x142: every window sits above an aggregate (hour spine /
    // length histogram / daily-volume spine) — aggregate-sized tasks at
    // any corpus scale
    for (df <- Seq(operators.TimeSeriesOps.x120HourlyAcf(spark, sfDir),
                   operators.TextOps.x122BudgetCut(spark, sfDir),
                   operators.TimeSeriesOps.x142DayRank(spark, sfDir),
                   operators.TextOps.x146Waterfill(spark, sfDir))) {
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.collect { case a: Aggregate => a }.nonEmpty),
        s"corpus-fed window:\n${df.queryExecution.optimizedPlan}")
    }
    // x123/x124: pure aggregate pipelines — no window operator anywhere
    for (df <- Seq(operators.TimeSeriesOps.x123Retention(spark, sfDir),
                   operators.TimeSeriesOps.x124RollingActive(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "unexpected window in an aggregate-only plan")
    // x147: per-user windows, never global
    for (df <- Seq(operators.TimeSeriesOps.x147NextIncident(spark, sfDir))) {
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(
        _.partitionSpec.exists(_.references.exists(_.name == "user_id"))))
    }
    // x126: sessionization windows are per-user; the row-marginal window
    // is allowed only because it runs over the (t_from, t_to) AGGREGATE
    // (≤ |types|² rows) — any other corpus-fed global window is a bug
    locally {
      val df = operators.TimeSeriesOps.x126MarkovTransitions(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall { w =>
        w.partitionSpec.exists(_.references.exists(_.name == "user_id")) ||
          w.collect { case a: Aggregate => a }.nonEmpty
      }, s"corpus-fed window in x126:\n${df.queryExecution.optimizedPlan}")
    }
    // x148: the per-vector argmax is an AGGREGATE (map-side combinable),
    // never a per-vector window over the corpus
    assert(operators.VectorOps.x148MutualNn(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "x148 must argmax via aggregate, not a corpus window")
    // x125: all pairwise work on the (label, dim) aggregate — the
    // embedding table must never product-join itself
    val p125 = planOf(operators.VectorOps.x125ClusterSep(spark, sfDir))
    assert(!p125.contains("CartesianProduct"), p125)
  }

  test("round-10 TPC-H shapes: pushdowns, join strategies, staged gates") {
    // x149: the year filter reaches the lineitem scan; one hash agg
    locally {
      val p = planOf(operators.RelationalOps.x149PrioritySplit(spark, sfDir))
      assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
      assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    }
    // x150: the join must stay LEFT OUTER (an inner join drops the
    // zero-order bucket — the classic Q13 bug)
    locally {
      import org.apache.spark.sql.catalyst.plans.LeftOuter
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val df = operators.RelationalOps.x150OrderCountDist(spark, sfDir)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.exists(_.joinType == LeftOuter),
        s"Q13 left outer lost:\n${df.queryExecution.optimizedPlan}")
    }
    // x151: the 1-row max broadcasts back; no window, no product
    locally {
      val p = planOf(operators.RelationalOps.x151TopSupplier(spark, sfDir))
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
      assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    }
    // x152: correlated avg decorrelated — no window, no product; the
    // brand dim broadcasts
    locally {
      val p = planOf(operators.RelationalOps.x152SmallQtyRevenue(spark, sfDir))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    }
    // x153: the quantity gate is an aggregate BELOW the dim joins (the
    // whale shortlist probes orders, never the reverse)
    locally {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
      val df = operators.RelationalOps.x153WhaleOrders(spark, sfDir)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.nonEmpty && joins.forall(
        _.collect { case a: Aggregate => a }.nonEmpty),
        s"whale gate not below the joins:\n${df.queryExecution.optimizedPlan}")
    }
    // x154: the double correlation compiles to LEFT SEMI + LEFT ANTI
    locally {
      import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val df = operators.RelationalOps.x154SoleBlame(spark, sfDir)
      val jts = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
      assert(jts.contains(LeftSemi) && jts.contains(LeftAnti), s"got $jts")
      val p = planOf(df)
      assert(!p.contains("CartesianProduct"), p)
    }
    // x161: one fact aggregate + the grand-total scalar broadcast back
    locally {
      val p = planOf(operators.RelationalOps.x161ImportantParts(spark, sfDir))
      assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    }
    // x162: the NOT IN exclusion is a LEFT ANTI, never a product
    locally {
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val df = operators.RelationalOps.x162SupplierDiversity(spark, sfDir)
      val jts = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
      assert(jts.contains(LeftAnti), s"got $jts")
      assert(!planOf(df).contains("CartesianProduct"), planOf(df))
    }
    // x163: NO self-join — the nested chain must stay one conditional-sum
    // aggregate (the only join is the broadcast supplier dim)
    locally {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val df = operators.RelationalOps.x163DominantShippers(spark, sfDir)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.size === 1, s"x163 must join only the supplier dim:\n$joins")
      assert(!planOf(df).contains("Window"), planOf(df))
    }
    // x167: the Q5 cycle — year filter at the orders scan, region at the
    // nation dim, supplier broadcast; no product, no window
    locally {
      val p = planOf(operators.RelationalOps.x167LocalSupplierVolume(spark, sfDir))
      assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
      assert(!p.contains("Window"), p)
    }
    // x168: the LIKE prunes part BEFORE the broadcast; all dims broadcast
    // (the fact never shuffles pre-aggregate: exactly one hash agg pair)
    locally {
      val df = operators.RelationalOps.x168ProductProfit(spark, sfDir)
      val p = planOf(df)
      assert(p.contains("rod"), s"p_name LIKE not pushed toward the part scan:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    }
    // x169: the Q2 recast — LIMIT compiles to TakeOrderedAndProject
    // (never a full sort); region + size prune dims that broadcast
    locally {
      val p = planOf(operators.RelationalOps.x169CheapestSupplier(spark, sfDir))
      assert(p.contains("TakeOrderedAndProject"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
      assert(!p.contains("Window"), p)
    }
  }

  test("round-10 pipeline ops: one-pass shards, pruned repair, aggregate-fed windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
    // x156: ONE pass — no join anywhere (both argmaxes come from one
    // map-side-combinable aggregate)
    locally {
      val df = operators.TextOps.x156ShardMove(spark, sfDir)
      assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
        s"x156 must be join-free:\n${df.queryExecution.optimizedPlan}")
      assert(!planOf(df).contains("Window"), planOf(df))
    }
    // x155: the row-level repair is a LEFT ANTI whose probe side is
    // pruned by a broadcast join with the mismatched-day shortlist
    locally {
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      val df = operators.TimeSeriesOps.x155ReplicaDiff(spark, sfDir)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.exists(_.joinType == LeftAnti), "repair anti-join missing")
      val anti = joins.filter(_.joinType == LeftAnti)
      assert(anti.forall(_.left.collect { case j: Join => j }.nonEmpty),
        "anti-join PROBE not pruned by the day shortlist")
      assert(anti.forall(_.right.collect { case j: Join => j }.nonEmpty),
        "anti-join BUILD not pruned by the day shortlist")
      assert(planOf(df).contains("BroadcastHashJoin"), planOf(df))
    }
    // x157/x158/x164/x170: no window anywhere (pure aggregate
    // pipelines; x170's mode is max-count + min-at-max folds — a
    // rank-based mode would serialize doc_id into one window partition)
    for (df <- Seq(operators.TextOps.x157GramCommonness(spark, sfDir),
                   operators.TextOps.x158LabelerKappa(spark, sfDir),
                   operators.TimeSeriesOps.x164AbTest(spark, sfDir),
                   operators.TextOps.x170ColumnProfile(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "unexpected window in an aggregate-only plan")
    // x159/x160/x165: every window runs over an aggregate (vocab/source/
    // age-sized, never corpus-sized)
    for (df <- Seq(operators.TextOps.x159TfidfTerms(spark, sfDir),
                   operators.TextOps.x160SourceGini(spark, sfDir),
                   operators.TimeSeriesOps.x165HazardCurve(spark, sfDir),
                   operators.TimeSeriesOps.x166CusumChangepoint(spark, sfDir))) {
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.collect { case a: Aggregate => a }.nonEmpty),
        s"corpus-fed window:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("round-10 audit/model ops: equi-only candidates, broadcast dims, aggregate-fed windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // x171: the ±1-bucket adjacency is an EQUI-join (probe explodes 3 block
    // keys) — an OR bucket condition would nested-loop the corpus; the pin
    // reads the pre-checkpoint stage (the serving side is a LogicalRDD)
    locally {
      val p = planOf(operators.TextOps.x171Scored(spark, sfDir,
        operators.TextOps.x171BlockCandidates(spark, sfDir)))
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
      assert(p.contains("Generate"), s"block-key explode missing:\n$p")
      assert(!p.contains("Window"), p)
      // the DP stage must stay explicitly widened (the repartition the
      // checkpoint pins) — AQE would coalesce the tiny-bytes candidates
      assert(p.contains("RoundRobinPartitioning"), s"DP stage not widened:\n$p")
    }
    // x172: the three dim parents broadcast; the orders parent joins on the
    // shuffled natural key; never a product
    locally {
      val p = planOf(operators.RelationalOps.x172RefIntegrity(spark, sfDir))
      assert(p.split("BroadcastHashJoin").length - 1 >= 3, s"dim parents not broadcast:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    }
    // x174: the running-max window sits over the per-size AGGREGATE (≤50
    // rows), and the join-back broadcasts the frontier
    locally {
      val df = operators.RelationalOps.x174ParetoSkyline(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.collect { case a: Aggregate => a }.nonEmpty),
        "x174 frontier window not aggregate-fed")
      assert(planOf(df).contains("BroadcastHashJoin"), planOf(df))
    }
    // x175: marginal windows run over the |cells| aggregate, never documents
    locally {
      val df = operators.TextOps.x175ContingencyAudit(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.collect { case a: Aggregate => a }.nonEmpty),
        "x175 marginal window not aggregate-fed")
    }
    // x173/x176: pure aggregate pipelines — no window anywhere
    for (df <- Seq(operators.TimeSeriesOps.x173LDiversity(spark, sfDir),
                   operators.TimeSeriesOps.x176OlsFit(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "unexpected window in an aggregate-only plan")
    // x177: both forward mins ride ONE user-keyed exchange+sort (the two
    // Window nodes stack over the same ordering — no second shuffle), every
    // window partitioned (never global), and no self-join against the future
    locally {
      val df = operators.TimeSeriesOps.x177PatternMatch(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
        "x177 window must partition by user")
      val p = planOf(df)
      // exchanges: the window shuffle + the final total-order sort — the
      // stacked second Window must NOT introduce a third (formatted explain
      // names each node twice: tree line + detail header)
      assert(p.split("Exchange").length - 1 <= 4, s"extra shuffle in x177:\n$p")
      assert(!p.contains("Join"), "x177 must not self-join future events")
    }
  }

  test("x178/x179/x180: spine joins aggregate-sized, user-keyed windows, dense-day ledger") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // x178: no window at all (pure spine-join + moment folds), no product
    locally {
      val df = operators.TimeSeriesOps.x178CrossCorrelation(spark, sfDir)
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "x178 must be window-free (joins + folds only)")
      assert(!planOf(df).contains("CartesianProduct"), planOf(df))
    }
    // x179: every window partitions by user (the reflection walk never
    // serializes the corpus); the rank join is user-keyed, no product
    locally {
      val df = operators.TimeSeriesOps.x179FifoMatching(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
        "x179 window must partition by user")
      assert(!planOf(df).contains("CartesianProduct"), planOf(df))
    }
    // x180: the only global-ordered window (churn lag) runs over the
    // |days| spine ledger, never the corpus: every unpartitioned window's
    // subtree contains an Aggregate
    locally {
      val df = operators.TimeSeriesOps.x180GrowthAccounting(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(ws.nonEmpty, "x180 lost its classification windows")
      val global = ws.filter(_.partitionSpec.isEmpty)
      assert(global.forall(_.collect { case a: Aggregate => a }.nonEmpty),
        "x180 global churn window not aggregate-fed")
    }
    // x181/x182: window-free (HOF chunking + folds; map-side weights +
    // folds); x181's chunk explode is a Generate, never a join
    for (df <- Seq(operators.MultimodalOps.x181CdcChunking(spark, sfDir),
                   operators.TimeSeriesOps.x182Bootstrap(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "unexpected window in a HOF/fold-only plan")
    locally {
      val p = planOf(operators.MultimodalOps.x181CdcChunking(spark, sfDir))
      assert(p.contains("Generate"), s"x181 chunk explode missing:\n$p")
      assert(!p.contains("Join"), s"x181 must not join:\n$p")
    }
    // x183/x184/x185: window-free folds; x183's marginal joins all broadcast
    for (df <- Seq(operators.TimeSeriesOps.x183WeekdayHourResiduals(spark, sfDir),
                   operators.MultimodalOps.x184ByteEntropy(spark, sfDir),
                   operators.TextOps.x185PiiAudit(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        "unexpected window in a fold-only plan")
    locally {
      val p = planOf(operators.TimeSeriesOps.x183WeekdayHourResiduals(spark, sfDir))
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
        s"x183 marginals must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"x183 must not shuffle-join the grid:\n$p")
    }
  }

  test("x131/x132: Q3 pushdowns + top-k; argmax window over the aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // x131: segment + both date predicates reach their scans; the top-10
    // compiles to TakeOrderedAndProject, never a full sort
    val p131 = planOf(operators.RelationalOps.x131ShipPriority(spark, sfDir))
    assert(p131.contains("TakeOrderedAndProject"), p131)
    assert(p131.contains("BUILDING"), "segment filter missing from plan")
    assert(!p131.contains("CartesianProduct") && !p131.contains("NestedLoop"), p131)
    // x132: the argmax window's input is the (part, supp) aggregate —
    // partition size is suppliers-per-part, never the fact table
    val w132 = operators.RelationalOps.x132DominantSupplier(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(w132.nonEmpty && w132.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "x132 window does not sit above the (part, supp) aggregate")
  }

  test("x133-x138: TPC-H shape pins — pushdowns, join strategies, one-pass aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // x133: both nation dims broadcast; shipdate range pushed to lineitem;
    // the pair disjunction never degrades the join tree to a product
    val p133 = planOf(operators.RelationalOps.x133TradeVolume(spark, sfDir))
    assert(p133.contains("GreaterThanOrEqual(l_shipdate,"), s"shipdate not pushed:\n$p133")
    assert(!p133.contains("CartesianProduct"), p133)
    assert(p133.split("BroadcastHashJoin").length - 1 >= 2, "nation dims not broadcast")
    // x134: quarter + returnflag pushed; top-20 is TakeOrderedAndProject
    val p134 = planOf(operators.RelationalOps.x134ReturnedRevenue(spark, sfDir))
    assert(p134.contains("TakeOrderedAndProject"), p134)
    assert(p134.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p134")
    assert(p134.contains("GreaterThanOrEqual(o_orderdate,"), s"quarter not pushed:\n$p134")
    // x135/x138: numerator+denominator from ONE logical aggregate pass
    for (df <- Seq(operators.RelationalOps.x135PromoShare(spark, sfDir),
                   operators.RelationalOps.x138MarketShare(spark, sfDir)))
      assert(df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size == 1,
        "conditional share must be a single aggregate pass, not a join of rollups")
    // x136: the extractable union constraints reach both scans; part is the
    // broadcast build side
    val p136 = planOf(operators.RelationalOps.x136DisjunctiveRevenue(spark, sfDir))
    assert(p136.contains("LessThanOrEqual(l_quantity,30.0)"), s"qty bound not pushed:\n$p136")
    assert(p136.contains("LessThanOrEqual(p_size,15)"), s"size bound not pushed:\n$p136")
    assert(p136.contains("BroadcastHashJoin"), p136)
    // x137: threshold rides a 1-row broadcast; dormancy is an ANTI join over
    // the date-pruned orders scan
    val p137 = planOf(operators.RelationalOps.x137DormantRich(spark, sfDir))
    assert(p137.contains("LeftAnti"), p137)
    assert(p137.contains("GreaterThanOrEqual(o_orderdate,"), s"dormancy date not pushed:\n$p137")
    // x138: the region scope is a LeftSemi — customer payload never joins in
    val p138 = planOf(operators.RelationalOps.x138MarketShare(spark, sfDir))
    assert(p138.contains("LeftSemi"), p138)
    // x139: the decorrelated form — per-customer aggregate joined back on
    // the correlation key, never a per-row nested subquery plan
    val p139 = planOf(operators.RelationalOps.x139AboveAvg(spark, sfDir))
    assert(!p139.contains("CartesianProduct") && !p139.contains("BroadcastNestedLoop"), p139)
    // x140: division via aggregation — brand set + window pushed, part broadcast
    val p140 = planOf(operators.RelationalOps.x140BrandCoverage(spark, sfDir))
    assert(p140.contains("In(p_brand"), s"brand set not pushed:\n$p140")
    assert(p140.contains("GreaterThanOrEqual(l_shipdate,"), s"window not pushed:\n$p140")
    assert(p140.contains("BroadcastHashJoin"), p140)
    // x141: vocab is a top-k over the word-count AGGREGATE (TakeOrdered,
    // never a full sort) and joins back as the broadcast side
    val p141 = planOf(operators.TextOps.x141OovRate(spark, sfDir))
    assert(p141.contains("TakeOrderedAndProject"), p141)
    assert(p141.contains("BroadcastHashJoin"), p141)
    // x143: the correlated EXISTS is a LEFT SEMI (quarter pushed); the
    // cross-table inequality must not degrade it to a nested-loop join
    val p143 = planOf(operators.RelationalOps.x143LateShipOrders(spark, sfDir))
    assert(p143.contains("LeftSemi"), p143)
    assert(p143.contains("GreaterThanOrEqual(o_orderdate,"), s"quarter not pushed:\n$p143")
    assert(!p143.contains("CartesianProduct") && !p143.contains("BroadcastNestedLoop"), p143)
    // x144: the Q6 canary — ALL predicates reach the scan and the read
    // schema is exactly the 4 touched columns
    val p144 = planOf(operators.RelationalOps.x144ScanRevenue(spark, sfDir))
    assert(p144.contains("GreaterThanOrEqual(l_shipdate,"), s"shipdate not pushed:\n$p144")
    assert(p144.contains("GreaterThanOrEqual(l_discount,0.05)"), s"discount not pushed:\n$p144")
    assert(p144.contains("LessThan(l_quantity,24.0)"), s"quantity not pushed:\n$p144")
    val rs144 = p144.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"))
      assert(rs144.contains(c), s"$c missing from ReadSchema: $rs144")
    assert(!rs144.contains("l_orderkey"), s"scan reads untouched columns: $rs144")
  }

  test("nanos pushdown rule is a no-op on non-matching filters") {
    // value is a plain double column: the rule must not touch this plan
    val df = Tables.events(spark, sfDir).filter("value > 100")
    val p = planOf(df)
    assert(p.contains("GreaterThan(value,100.0)"), p)
  }

  test("nanos pushdown preserves results exactly (superset + original filter)") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, sfDir)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val withRule = e.filter(col("ts") >= lo && col("ts") <= hi).count()
    // reference computed WITHOUT pushdown opportunity: materialize ts first
    val ref = e.select(col("ts")).collect().map(_.getTimestamp(0))
      .count(t => !t.before(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
                  !t.after(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
    assert(withRule === ref)
  }
}
