package graft

import graft.functions.ConnectedComponents
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(
      nodes.toDF("id"),
      edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cliques, chains, and singletons resolve to the component minimum") {
    // component {1,2,3} (star around 3), chain {10..14}, singleton {99}
    val labels = run(
      Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 14L, 99L),
      Seq((2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L, 99L -> 99L))
  }

  test("labels are invariant under input partitioning and edge orientation") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 58L).map(i => if (i % 2 == 0) (i, i + 2) else (i + 2, i))
    val a = ConnectedComponents.labels(nodes, edges.toDF("id_a", "id_b"))
      .orderBy("id").collect().toSeq
    val b = ConnectedComponents.labels(nodes.repartition(7),
        edges.toDF("id_a", "id_b").repartition(5))
      .orderBy("id").collect().toSeq
    assert(a == b)
    // evens form one component rooted at 0, odds one rooted at 1
    val m = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 60L).forall(i => m(i) == i % 2))
  }

  test("reliable-checkpoint mode produces identical labels") {
    val nodes = (0L until 40L).toDF("id")
    val edges = (0L until 38L).map(i => (i, i + 2)).toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val local = ConnectedComponents.labels(nodes, edges)
        .orderBy("id").collect().toSeq
      val reliable = ConnectedComponents.labels(nodes, edges,
          checkpointDir = Some(dir))
        .orderBy("id").collect().toSeq
      assert(local == reliable)
      // the reliable run actually wrote RDD checkpoints into the dir
      assert(new java.io.File(dir).listFiles().nonEmpty,
             "no checkpoint data written to the reliable dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("x14 clusters are consistent with q53's edge list") {
    val x14 = TextOps.x14DedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // every verified near-dup pair ends up in the same cluster
    val pairs = TextOps.q53(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(x14(a)._1 == x14(b)._1, s"pair ($a,$b) split across clusters")
    }
    // exactly one keeper per cluster, and it is the cluster id itself
    val keepers = x14.collect { case (id, (comp, 1)) => (id, comp) }
    assert(keepers.forall { case (id, comp) => id == comp })
    assert(keepers.size == x14.values.map(_._1).toSet.size)
  }

  test("x14 pipeline overload over precomputed pairs equals the standalone query") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val pairs = graft.functions.MinHashLSH.verifiedPairs(docs, 0.8)
    val fromPairs = TextOps.x14DedupClustersFrom(spark, sfDir, pairs)
      .collect().map(_.toSeq).toSeq
    val standalone = TextOps.x14DedupClusters(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(fromPairs === standalone)
  }

  test("incremental mergeLabels equals the full recompute (x42's batch split)") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val corpus = toks.filter(col("id") % 7 =!= 0)
    val batch = toks.filter(col("id") % 7 === 0)
    // standing state: labels over the corpus's own near-dup graph
    val corpusPairs = graft.functions.MinHashLSH.verifiedPairs(corpus, 0.8)
      .select(col("id_a"), col("id_b"))
    val oldLabels = graft.functions.ConnectedComponents.labels(
      corpus.select("id"), corpusPairs)
    // the increment: batch↔corpus pairs (x42's contract) + batch-internal
    val crossPairs = graft.functions.MinHashLSH.crossVerifiedPairs(batch, corpus, 0.8)
      .select(col("id_a"), col("id_b"))
    val batchPairs = graft.functions.MinHashLSH.verifiedPairs(batch, 0.8)
      .select(col("id_a"), col("id_b"))
    val merged = graft.functions.ConnectedComponents.mergeLabels(
        oldLabels, batch.select("id"), crossPairs.union(batchPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // reference: one CC over everything
    val allPairs = graft.functions.MinHashLSH.verifiedPairs(toks, 0.8)
      .select(col("id_a"), col("id_b"))
    val full = graft.functions.ConnectedComponents.labels(toks.select("id"), allPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(merged.length === full.length)
    assert(merged === full)
  }

  test("x33 pipeline overload over precomputed pairs equals the standalone query") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val pairs = graft.functions.MinHashLSH.verifiedPairs(docs, 0.8)
    val fromPairs = TextOps.x33DedupSurvivorsFrom(spark, sfDir, pairs)
      .collect().map(_.toSeq).toSeq
    val standalone = TextOps.x33DedupSurvivors(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(fromPairs === standalone)
  }
}
