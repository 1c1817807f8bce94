package graft

import graft.functions.MinHashLSH
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** x187 iterative label propagation (r13 verdict item 6): x53's one
  * vote step run to a bounded fixpoint with immutable labels. Pins the
  * three contract clauses the oracle twin cannot express alone:
  * one-hop ≡ the existing x53, fixture fixpoint inside the 4-round
  * budget, and monotone coverage (round-1 labels survive verbatim). */
class LabelPropIterSpec extends SparkSpecBase {

  private def docTokens = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
  }

  private def pairs = MinHashLSH.verifiedPairs(docTokens, 0.8)
    .select("id_a", "id_b")

  test("round 1 of x187 is exactly x53 (same docs, same votes, same " +
       "tiebreak) — the one-hop equivalence clause") {
    val oneHop = TextOps.x187From(spark, sfDir, pairs, maxRounds = 1)
      .select("doc_id", "pred_lang", "true_lang", "hit")
      .collect().map(_.toSeq).toSet
    val x53 = TextOps.x53LabelProp(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(oneHop === x53, "one bounded round must reproduce x53 verbatim")
  }

  test("the fixture reaches the fixpoint inside the 4-round budget " +
       "(budget is a twin-expressibility bound, not a semantics change)") {
    val p = pairs.localCheckpoint(true)
    val atBudget = TextOps.x187From(spark, sfDir, p, maxRounds = 4)
      .collect().map(_.toSeq).toSet
    val beyond = TextOps.x187From(spark, sfDir, p, maxRounds = 8)
      .collect().map(_.toSeq).toSet
    assert(atBudget === beyond, "more rounds past the fixture's fixpoint " +
      "must change nothing")
  }

  test("reliable-checkpoint mode labels exactly as localCheckpoint mode " +
       "(the strategy only changes where intermediates live)") {
    val p = pairs.localCheckpoint(true)
    val local = TextOps.x187From(spark, sfDir, p, maxRounds = 4)
      .collect().map(_.toSeq).toSet
    val ckptDir = java.nio.file.Files.createTempDirectory("x187ckpt").toString
    val reliable = TextOps.x187From(spark, sfDir, p, maxRounds = 4,
        checkpointDir = Some(ckptDir))
      .collect().map(_.toSeq).toSet
    assert(reliable === local,
      "reliable checkpointing changed the labels — it must only change storage")
    // and the reliable rounds really did land as checkpoint FILES
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "no reliable checkpoint files were written")
    // superseded rounds' snapshots are DELETED as the loop advances
    // (x186's release discipline — r15 review finding: the first cut
    // leaked up to 2 full snapshots per round); only the surviving
    // state's rdd dir may remain
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).count()
    assert(rddDirs <= 2,
      s"$rddDirs checkpoint snapshots survive the fixpoint — superseded " +
        "rounds are leaking")
  }

  test("labels are immutable once assigned: every round-1 label survives " +
       "to the fixpoint verbatim, and later rounds only extend coverage") {
    val p = pairs.localCheckpoint(true)
    val r1 = TextOps.x187From(spark, sfDir, p, maxRounds = 1)
      .select("doc_id", "pred_lang").collect().map(_.toSeq).toSet
    val fix = TextOps.x187From(spark, sfDir, p, maxRounds = 4)
    val fixR1 = fix.filter(col("hops") === 1)
      .select("doc_id", "pred_lang").collect().map(_.toSeq).toSet
    assert(fixR1 === r1, "round-1 labels must survive the fixpoint run")
    val multiHop = fix.filter(col("hops") > 1).count()
    val covered = fix.count()
    assert(covered >= r1.size.toLong + multiHop)
  }
}
