package graft

import graft.functions.MinHashLSH
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** x48's claim is structural: splits assign by near-dup CLUSTER, so no
  * verified near-dup pair can straddle train/val/test. Execute exactly
  * that invariant (with the pair list cached so the leak join sees the
  * same edges CC consumed), plus the audit identities a split must
  * satisfy. */
class X48SplitSpec extends SparkSpecBase {

  private def docTokens = Tables.documents(spark, sfDir)
    .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))

  test("no verified near-dup pair straddles a split; audit sums reconcile") {
    val pairs = MinHashLSH.verifiedPairs(docTokens, 0.8).cache()
    try {
      assert(pairs.count() > 0, "fixture should contain near-dup pairs")
      val labels = TextOps.x48SplitLabels(spark, sfDir, pairs).cache()
      val sm = labels.select(col("doc_id"), col("split"))
      val leaks = pairs
        .join(sm.select(col("doc_id").as("id_a"), col("split").as("sp_a")), "id_a")
        .join(sm.select(col("doc_id").as("id_b"), col("split").as("sp_b")), "id_b")
        .filter(col("sp_a") =!= col("sp_b"))
        .count()
      assert(leaks === 0L, s"$leaks near-dup pairs cross a split boundary")

      // the declared aggregate reconciles with the corpus: every doc in
      // exactly one split, char mass preserved, all three splits non-empty
      val agg = TextOps.x48From(spark, sfDir, pairs).collect()
      assert(agg.map(_.getAs[String]("split")).sorted.toSeq === Seq("test", "train", "val"))
      val docs = Tables.documents(spark, sfDir)
      assert(agg.map(_.getAs[Long]("n_docs")).sum === docs.count())
      assert(agg.map(_.getAs[Long]("n_chars")).sum ===
        docs.agg(sum("n_chars")).head.getLong(0))
      // cluster counts are disjoint by construction (a cluster maps to one
      // split), so they sum to the total cluster count
      assert(agg.map(_.getAs[Long]("n_clusters")).sum ===
        labels.select("cluster_id").distinct().count())
      // train dominates under the 204/26/26 prefix bounds
      val byName = agg.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      assert(byName("train") > byName("val") && byName("train") > byName("test"))
    } finally pairs.unpersist()
  }
}
