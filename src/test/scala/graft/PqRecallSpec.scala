package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** x46/x47's PQ machinery exercised on the clustered dev corpus
  * (AnnRecallSpec's construction: 19 label-centered clusters, ±0.05
  * noise, 400 vectors, dim 32).
  *
  * What PQ with the √n seed codebooks can and cannot resolve here:
  * every member of a cluster snaps to the same per-subspace codes (the
  * noise is far below cross-center distance), so the compressed index
  * collapses each cluster to ONE code word. The honest certification is
  * therefore CELL CONTAINMENT — every ADC top-5 hit lies in the probe's
  * true cluster (the search lands in the right codebook cell) — not
  * within-cell order, which ADC cannot see (all members tie; vec_id
  * decides). The declared x47 recall@5 gate accordingly rejects both on
  * the near-uniform fixture (coarse quantization) and inside tied cells;
  * certifying cell containment + rejecting the fixture together pin the
  * gate as an instrument, not a rubber stamp. */
class PqRecallSpec extends SparkSpecBase {

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

  test("ADC search lands every top-5 hit in the probe's true cluster") {
    val hits = VectorOps.pqSearch(spark, clustered, clustered).collect()
    assert(hits.length === 50, "5 hits for each of the 10 probes")
    hits.foreach { r =>
      val probe = r.getAs[Long]("probe_id")
      val hit = r.getAs[Long]("vec_id")
      assert(hit % k === probe % k,
        s"probe $probe (cluster ${probe % k}) hit $hit from cluster ${hit % k}")
    }
  }

  test("x46 codes collapse each cluster to its centroids' code words") {
    // the quantizer should reproduce exactly the cluster structure: one
    // code word per cluster — except cluster 0, which owns TWO codebook
    // entries (seed ids 0 and 380 are both ≡ 0 mod 19, separated only by
    // noise), so its members split between those two ids per subspace
    val grouped = VectorOps
      .pqCodes(spark, clustered, clustered)
      .groupBy("vec_id").agg(array_sort(collect_list(struct(col("j"), col("code")))).as("cw"))
      .select(col("vec_id"), transform(col("cw"), x => x.getField("code")).as("codes"))
      .withColumn("cluster", col("vec_id") % k)
    val cells = grouped.filter(col("cluster") =!= 0)
      .select("cluster", "codes").distinct().count()
    assert(cells === (k - 1).toLong,
      s"expected one code word per single-centroid cluster, got $cells cells")
    // cluster 0's subspace codes never leave its duplicate-centroid pair
    val c0 = grouped.filter(col("cluster") === 0)
      .select(explode(col("codes")).as("c")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(c0.subsetOf(Set(0L, 380L)), s"cluster-0 codes outside its centroids: $c0")
  }

  test("the declared x47 gate rejects the near-uniform fixture") {
    val fixture = VectorOps.x47PqRecall(spark, sfDir).collect()
    assert(fixture.count(_.getAs[Int]("ok") == 0) >= fixture.length / 2)
  }
}
