package graft

import graft.operators.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** x40 (dedup-first embedding near-dup) on a corpus WITH byte-identical
  * copies — the declared fixture has none, so only a planted corpus
  * exercises the collapse. Mirrors X39FoldSpec's role for x38/x39.
  *
  * Fixture: 40 random base vectors; bases 0–3 get extra EXACT copies
  * (copy counts 3, 2, 4, 2); bases 0 and 1 additionally get a near-dup
  * partner at cos ≥ 0.999 (the true-duplicate regime where the SRP shape
  * is sound — see VectorLshSpec).
  */
class X40DedupFirstSpec extends SparkSpecBase {

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
      (1 until n).map(k => bases(b)) // n total including the base itself
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

  test("collapse: representatives are min-id with exact copy counts") {
    val reps = planted.groupBy(col("embedding"))
      .agg(min("vec_id").as("vec_id"), count(lit(1)).as("copies"))
      .select("vec_id", "copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.size === 42) // 40 bases + 2 near-dups; copies folded in
    copyCounts.foreach { case (b, n) =>
      assert(reps(b.toLong) === n.toLong, s"base $b expected $n copies")
    }
    assert(reps.count(_._2 == 1L) === 42 - copyCounts.size)
  }

  test("x40 pairs = x12 over reps; multiplicity expansion recovers the raw pair mass") {
    val x40 = VectorOps.x40From(spark, planted).collect()
    // the planted near-dups pair with their base REPRESENTATIVE only:
    // intra-copy pairs are gone by construction
    val pairSet = x40.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet === Set((0L, 40L), (1L, 41L)), s"unexpected pairs: $pairSet")
    // raw-path ground truth: x12's kernel over the UNCOLLAPSED corpus sees
    // every copy as a node — its pair count must equal x40's
    // multiplicity-expanded mass plus the pure copy squares
    val raw = VectorOps.srpVerifiedPairs(
      planted.repartition(8), planted, 0.9).count()
    val expanded = x40.map(r => r.getLong(3) * r.getLong(4)).sum
    val copySquares = copyCounts.values.map(n => n.toLong * (n - 1) / 2).sum
    assert(raw === expanded + copySquares,
      s"raw=$raw expanded=$expanded squares=$copySquares")
  }

  test("x40 on the declared fixture equals x12 with copies=1 (no exact dups)") {
    val x40 = VectorOps.x40EmbedDedupFirst(spark, sfDir).collect()
    val x12 = VectorOps.x12EmbedNearDupLsh(spark, sfDir).collect()
    assert(x40.length === x12.length) // both empty at cos >= 0.9 here
    assert(x40.forall(r => r.getLong(3) == 1L && r.getLong(4) == 1L))
  }
}
