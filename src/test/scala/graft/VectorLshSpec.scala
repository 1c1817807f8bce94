package graft

import graft.operators.VectorOps
import org.apache.spark.sql.Row

/** x12 (SRP-banded embedding near-dup) against x07 (brute force) on a
  * synthetic corpus WITH planted near-duplicates — the real fixture has no
  * pair above cos 0.7 at any sf, so only a planted corpus exercises the
  * candidate-generation + verify pipeline end-to-end.
  *
  * Planted pairs sit at cos ≥ 0.999 (true-duplicate regime), where the
  * 512-bit/32-band SRP shape misses with p ≈ 1e-22 per pair — so exact
  * equality with brute force is a sound assertion, not a flaky one.
  */
class VectorLshSpec extends SparkSpecBase {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-x12").toString
    val rnd = new scala.util.Random(20260812L)
    val dim = 64
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // 60 random bases (pairwise cos well under 0.9 at dim 64 whp for this
    // seed — asserted below via x07's own output) + 12 near-copies
    val bases = Vector.fill(60)(vec())
    val nearDups = (0 until 12).map { i =>
      bases(i).map(x => x + (rnd.nextDouble() * 0.002 - 0.001).toFloat)
    }
    val rows = (bases ++ nearDups).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq, if (i % 2 == 0) "a" else "b")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("x12 banded path reproduces x07 brute force exactly on planted near-dups") {
    val brute  = VectorOps.x07EmbedNearDup(spark, dir).collect().toSeq
    val banded = VectorOps.x12EmbedNearDupLsh(spark, dir).collect().toSeq
    assert(brute.size >= 12, s"fixture must contain planted pairs, got ${brute.size}")
    assert(banded == brute)
  }

  test("x12 physical plan has no quadratic join operator") {
    val phys = VectorOps.x12EmbedNearDupLsh(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    assert(!phys.contains("CartesianProduct"), phys)
  }

  test("x12 and x07 agree on the real fixture (both empty: max cos ≈ 0.6)") {
    val brute  = VectorOps.x07EmbedNearDup(spark, sfDir).collect().toSeq
    val banded = VectorOps.x12EmbedNearDupLsh(spark, sfDir).collect().toSeq
    assert(banded == brute)
  }
}
