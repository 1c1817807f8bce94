package graft

import graft.functions.MinHashLSH
import graft.sources.SignatureStore
import org.apache.spark.sql.functions._

/** The persisted signature store must be a pure amortization: an increment
  * computed against the store is bitwise-identical to
  * `crossVerifiedPairs` over the raw frames, and the store side of the
  * band probe is scanned, not shuffled, while the batch is broadcast-small.
  */
class SignatureStoreSpec extends SparkSpecBase {

  private lazy val toks = Tables.documents(spark, sfDir)
    .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
  private lazy val batch = toks.filter(pmod(col("id"), lit(7L)) === 0)
  private lazy val corpus = toks.filter(pmod(col("id"), lit(7L)) =!= 0)
  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-sigstore").toString

  test("increment over the store equals crossVerifiedPairs over raw frames") {
    SignatureStore.write(spark, corpus, dir)
    val viaStore = SignatureStore.incrementPairs(spark, batch, 0.8)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = MinHashLSH.crossVerifiedPairs(batch, corpus, 0.8)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore.nonEmpty, "fixture should contain cross near-dup pairs")
    assert(viaStore === direct)
  }

  test("band probe broadcasts the batch side — the corpus index never shuffles") {
    SignatureStore.write(spark, corpus, dir)
    val df = SignatureStore.incrementPairs(spark, batch, 0.8)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the banded batch broadcast onto the sig_bands scan:\n$plan")
  }
}
