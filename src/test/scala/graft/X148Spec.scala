package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** x148's candidate-fed production path vs its declared exactness twin.
  *
  * Same planted corpus as AnnRecallSpec (19 heavy clusters, 400 vectors,
  * noise ≪ cluster separation — every vector's true nearest neighbor is
  * same-cluster by construction, and the x08 index assigns/probes those
  * clusters faithfully): there the IVF candidate edges must contain every
  * vector's true top-1, so the mutual-NN output is ROW-IDENTICAL to the
  * exact n² form. On the near-uniform fixture the x37 gate (correctly)
  * rejects the index, and the exact path is the one a pipeline would run —
  * the fixture case pins only that the variant runs and keeps the contract
  * schema, mirroring x37's two-corpus verdict pattern.
  */
class X148Spec extends SparkSpecBase {

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

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos")))
      .toSeq

  test("candidate-fed mutual NN ≡ exact mutual NN on a clustered corpus") {
    val exact = rows(VectorOps.mutualTop1(
      VectorOps.mutualExactEdges(clustered, clustered)))
    val ivf = rows(VectorOps.mutualTop1(
      VectorOps.mutualIvfEdges(clustered, clustered, nprobe = 2)))
    assert(exact.nonEmpty,
      "planted corpus must yield mutual pairs (every NN is same-cluster)")
    assert(ivf === exact,
      s"IVF-fed mutual pairs diverge from exact on the clustered corpus")
  }

  test("IVF candidate edges are subquadratic on the clustered corpus") {
    // each of the n probes joins only its nprobe probed cells' members —
    // edge volume ~ nprobe·n^1.5, a fraction of the n² exact edge set
    val edges = VectorOps.mutualIvfEdges(clustered, clustered, nprobe = 2).count()
    assert(edges < n.toLong * n / 2,
      s"IVF edge set ($edges) should be well under n² (${n.toLong * n})")
  }

  test("fixture: declared exactness twin and IVF variant share the contract schema") {
    val exact = VectorOps.x148MutualNn(spark, sfDir)
    val ivf = VectorOps.x148MutualNnIvf(spark, sfDir)
    assert(ivf.schema === exact.schema)
    // near-uniform fixture: x37's gate rejects the index here, so no
    // equality claim — but the variant must run end to end
    ivf.collect()
  }

  /** An ISOTROPIC corpus large enough that √n cells ≫ max candidate
    * nprobe — the regime where no affordable nprobe recalls mutual pairs
    * (the r11 rehearsal's finding) and the arbiter must refuse the index.
    * (The sf0.001 fixture is too small for this pin: with ~√n ≤ 16 cells
    * even nprobe=16 probes EVERY cell and IVF degenerates to exact.) */
  private lazy val isotropic = {
    val noise = "pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0"
    spark.range(2000).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), j -> cast($noise as float))"))
  }

  test("auto-arbiter picks a cheap nprobe on the clustered corpus and its " +
       "output is row-identical to the exact path") {
    val (chosen, curve) = VectorOps.x148ChooseNprobe(clustered)
    assert(chosen.isDefined,
      s"arbiter rejected every nprobe on a fully-clustered corpus: $curve")
    assert(chosen.get === 2,
      s"cheapest faithful setting on this corpus is np=2 (IVF≡exact there), " +
        s"got $chosen with curve $curve")
    val (auto, np) = VectorOps.x148AutoFrom(spark, clustered, clustered)
    assert(np === chosen)
    assert(rows(auto) === rows(VectorOps.mutualTop1(
      VectorOps.mutualExactEdges(clustered, clustered))),
      "arbitrated output diverged from exact on the corpus the gate certified")
  }

  test("arbiter fails CLOSED without evidence: a sub-2-vector corpus gets " +
       "no certification, not a rubber stamp") {
    val one = spark.range(1).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), j -> cast(1.0 as float))"))
    val (chosen, curve) = VectorOps.x148ChooseNprobe(one)
    assert(chosen.isEmpty && curve.isEmpty,
      s"a gate with no measurable evidence certified $chosen")
  }

  test("auto-arbiter falls back to the exact path on an isotropic corpus") {
    val (chosen, curve) = VectorOps.x148ChooseNprobe(isotropic)
    assert(chosen.isEmpty,
      s"no affordable nprobe is faithful on isotropic data, yet the gate " +
        s"certified $chosen (curve $curve)")
    // measured monotone sanity: more probes can only help
    assert(curve.map(_._2) === curve.map(_._2).sorted,
      s"recall curve should be non-decreasing in nprobe: $curve")
    val (auto, np) = VectorOps.x148AutoFrom(spark, isotropic, isotropic)
    assert(np.isEmpty)
    assert(rows(auto) === rows(VectorOps.mutualTop1(
      VectorOps.mutualExactEdges(isotropic, isotropic))),
      "fallback output must BE the exact path's")
  }
}
