package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** x37's recall gate exercised on a corpus where an IVF index SHOULD work —
  * the complement of the declared fixture, whose near-uniform embeddings
  * make the gate (correctly) reject the index. Here the corpus clusters
  * heavily, so the gate must certify: recall@5 ≥ 0.95 for every probe.
  *
  * Corpus construction (deterministic — xxhash64 draws, no RNG):
  * 400 vectors in 19 label-centered clusters; each vector = its cluster
  * center (uniform [-1,1]^32 from xxhash64(cluster, dim)) plus ±0.05
  * noise (xxhash64(vec_id, dim)). Within-cluster cosine ≈ 0.99+,
  * cross-cluster ≈ |0.3| worst case, so the exact top-5 of every probe is
  * same-cluster by construction.
  *
  * Why 19 clusters for 400 vectors: x08's centroids are every ⌊√n⌋-th
  * vec_id (stride 20, 20 centroids). Cluster = vec_id mod k, so centroid
  * cluster ids walk stride·i mod k — with k COPRIME to the stride they
  * cover every cluster (19 does; 20 would put every centroid in cluster
  * 0 and the index would have nothing to probe). Only cluster 0 gets two
  * centroids, and a cluster-0 probe ranks both as its top-2, so nprobe=2
  * still covers the split membership.
  */
class AnnRecallSpec extends SparkSpecBase {

  private val n = 400
  private val k = 19
  private val dim = 32

  private lazy val clustered = {
    val center = s"cast(pmod(xxhash64(vec_id % $k, j), 2000001) / 1000000.0 - 1.0 as double)"
    val noise = s"0.05 * (pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0)"
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), j -> cast($center + $noise as float))"))
  }

  test("x37 gate certifies the IVF index on a clustered corpus") {
    val verdict = VectorOps.annRecall(clustered, clustered).collect()
    assert(verdict.length === 10, "one verdict row per probe")
    verdict.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      assert(r.getAs[Int]("ok") === 1,
        s"probe ${r.getAs[Long]("probe_id")} recall ${r.getAs[Double]("recall")} < 0.95")
    }
  }

  test("the same gate still rejects the index on the near-uniform fixture") {
    // the fixture has no cluster locality (max pairwise cos ≈ 0.6): most
    // probes must fail the 0.95 bar — the gate distinguishes corpora, it
    // is not a rubber stamp
    val fixture = VectorOps.x37AnnRecall(spark, sfDir).collect()
    assert(fixture.count(_.getAs[Int]("ok") == 0) >= fixture.length / 2)
  }

  test("x08 search auto-arbiter certifies the cheapest faithful nprobe on " +
       "the clustered corpus (first-pass-wins: exactly one curve point)") {
    val cents = VectorOps.seedCents(clustered)
    val (chosen, curve) = VectorOps.x08ChooseNprobeFrom(
      VectorOps.assignCells(clustered, cents), cents)
    assert(chosen === Some(2),
      s"np=2 serves recall ≥ 0.95 on this corpus (test 1), got $chosen ($curve)")
    assert(curve.size === 1 && curve.head._2 >= 0.95,
      s"the walk must stop at the first certified setting: $curve")
  }

  test("x08 search auto-arbiter REJECTS an isotropic corpus (fail closed, " +
       "exact fallback)") {
    val noise = "pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0"
    val isotropic = spark.range(2000).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), j -> cast($noise as float))"))
    val cents = VectorOps.seedCents(isotropic)
    val (chosen, curve) = VectorOps.x08ChooseNprobeFrom(
      VectorOps.assignCells(isotropic, cents), cents)
    assert(chosen.isEmpty,
      s"no nprobe is faithful on isotropic data, yet the gate certified " +
        s"$chosen (curve $curve)")
    assert(curve.size === 4, "a rejecting walk must measure every candidate")
    // measured monotone sanity on the one walk that HAS multiple points
    assert(curve.map(_._2) === curve.map(_._2).sorted,
      s"recall should be non-decreasing in nprobe: $curve")
  }
}
