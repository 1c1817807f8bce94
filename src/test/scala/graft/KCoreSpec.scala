package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** x186's fixed-round k-core contract: the 8-round budget must reach the
  * peel fixpoint on the fixture (so Spark's early-exit, the twin's
  * unrolled 8 rounds, and a longer budget all agree), the peel must
  * actually remove something (k = 64 discriminates on this graph), and
  * every survivor's within-core degree honors the k threshold. */
class KCoreSpec extends SparkSpecBase {

  test("8-round peel is the fixpoint; peel removes nodes; core degrees >= k") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val pairs = graft.functions.MinHashLSH.verifiedPairs(toks, 0.8)
      .select("id_a", "id_b").localCheckpoint(true)
    val nodesInGraph = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id"))).distinct().count()
    val r8 = TextOps.x186KCoreFrom(spark, sfDir, pairs).cache()
    val r12 = TextOps.x186KCoreFrom(spark, sfDir, pairs, maxRounds = 12)
    try {
      assert(r8.count() > 0, "fixture's dup blob should survive a 64-core peel")
      assert(r8.count() < nodesInGraph,
        "peel removed nothing — k is not discriminating on this graph")
      assert(r8.except(r12).isEmpty && r12.except(r8).isEmpty,
        "round-8 state is not the fixpoint: the twin's fixed budget would diverge")
      assert(r8.agg(min("core_deg")).head.getLong(0) >= 64L,
        "a survivor's within-core degree fell below k")
    } finally { r8.unpersist(); () }
  }

  test("reliable-checkpoint mode peels identical cores to local mode") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val pairs = graft.functions.MinHashLSH.verifiedPairs(toks, 0.8)
      .select("id_a", "id_b").localCheckpoint(true)
    val ckptDir = java.nio.file.Files.createTempDirectory("kcore-ckpt").toString
    val local = TextOps.x186KCoreFrom(spark, sfDir, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reliable = TextOps.x186KCoreFrom(spark, sfDir, pairs,
        checkpointDir = Some(ckptDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local.nonEmpty && reliable === local,
      "reliable-checkpoint peel diverged from local-checkpoint peel")
    // the reliable mode actually wrote round files (executor-loss survival)
    val wrote = new java.io.File(ckptDir).listFiles
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint files written")
  }
}
