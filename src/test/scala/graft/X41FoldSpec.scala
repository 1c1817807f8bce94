package graft

import graft.operators.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** x41 (embedding dedup pipeline closure) on a corpus WITH byte-identical
  * copies and near-dup clusters — the declared fixture has neither, so only
  * a planted corpus exercises the collapse, the cluster resolution, and the
  * multiplicity folding. Mirrors X39FoldSpec's role for x38/x39: the core
  * claim is that the folded rep-level pipeline reproduces the raw-graph
  * composition exactly.
  *
  * Fixture (same construction as X40DedupFirstSpec): 40 random base
  * vectors; bases 0–3 get extra EXACT copies (counts 3, 2, 4, 2); bases 0
  * and 1 additionally get a near-dup partner at cos ≥ 0.999.
  */
class X41FoldSpec extends SparkSpecBase {

  private val copyCounts = Map(0 -> 3, 1 -> 2, 2 -> 4, 3 -> 2)

  private lazy val planted = {
    val rnd = new scala.util.Random(20260813L)
    val dim = 64
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val bases = Vector.fill(40)(vec())
    val nearDups = (0 until 2).map { i =>
      bases(i).map(x => x + (rnd.nextDouble() * 0.002 - 0.001).toFloat)
    }
    // ids: bases 0..39, near-dups 40..41, exact copies 100+
    val copies = copyCounts.toSeq.sortBy(_._1).flatMap { case (b, n) =>
      (1 until n).map(_ => bases(b)) // n total including the base itself
    }
    val rows = (bases ++ nearDups).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq)
    } ++ copies.zipWithIndex.map { case (v, k) => Row(100L + k, v.toSeq) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("x41 folded bookkeeping equals the raw-graph composition") {
    val folded = VectorOps.x41PipelineFrom(spark, planted).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // Raw-graph ground truth: every copy is a node; SRP pairs over the
    // uncollapsed corpus (copy cliques included), CC over the raw graph,
    // then per-cluster stats derived by grouping members by embedding —
    // n_members counts rows, n_reps counts distinct embeddings, keeper is
    // the min vec_id of the LARGEST embedding group (count desc, id asc).
    val rawPairs = VectorOps.srpVerifiedPairs(planted.repartition(8), planted, 0.9)
    val rawLabels = graft.functions.ConnectedComponents.labels(
      planted.select(col("vec_id").as("id")),
      rawPairs.select(col("id_a"), col("id_b")))
    val perGroup = rawLabels
      .join(planted.select(col("vec_id").as("id"), col("embedding")), "id")
      .groupBy(col("comp"), col("embedding"))
      .agg(count(lit(1)).as("grp_n"), min("id").as("grp_id"))
    val raw = perGroup.groupBy("comp")
      .agg(sum("grp_n").as("n_members"), count(lit(1)).as("n_reps"),
           max_by(struct(col("grp_id"), col("grp_n")),
                  struct(col("grp_n"), -col("grp_id"))).as("k"))
      .select(col("comp"), col("k.grp_id").as("keeper"), col("n_members"),
              col("n_reps"), col("k.grp_n").as("copies_kept"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    assert(folded === raw, s"folded=$folded\nraw=$raw")

    // spot-check the planted structure: cluster 0 = {base 0 (3 copies),
    // near-dup 40}, cluster 1 = {base 1 (2 copies), near-dup 41}, base 2
    // is a 4-copy singleton cluster
    assert(folded(0L) === ((0L, 4L, 2L, 3L)))
    assert(folded(1L) === ((1L, 3L, 2L, 2L)))
    assert(folded(2L) === ((2L, 4L, 1L, 4L)))
  }

  test("x41 on the declared fixture is all singleton clusters") {
    val out = VectorOps.x41EmbedPipeline(spark, sfDir).collect()
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(out.length.toLong === n)
    assert(out.forall { r =>
      r.getLong(0) == r.getLong(1) && r.getLong(2) == 1L &&
        r.getLong(3) == 1L && r.getLong(4) == 1L
    })
  }
}
