package graft

import graft.functions.{AllPairsJoin, MinHashLSH}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact AllPairs join (x106): must equal the brute-force
  * all-pairs Jaccard AND the LSH+verify path — completeness here is a
  * theorem about the df token order, so equality is exact by construction,
  * including at the j = t knife edge. */
class AllPairsSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brute(items: org.apache.spark.sql.DataFrame, t: Double): Set[(Long, Long)] = {
    val sets = items.select(col("id"), array_distinct(col("toks")).as("set"))
    sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .withColumn("j",
        size(array_intersect(col("a.set"), col("b.set"))).cast("double") /
          size(array_union(col("a.set"), col("b.set"))).cast("double"))
      .filter(col("j") >= t)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exactPairs == brute force == LSH+verify at 0.8 on sf0.001 documents") {
    val exact = pairSet(AllPairsJoin.exactPairs(docs, 0.8))
    assert(exact === brute(docs, 0.8))
    assert(exact === pairSet(MinHashLSH.verifiedPairs(docs, 0.8)))
  }

  test("exactPairs == brute force at the looser 0.5 threshold") {
    // longer prefixes, denser candidates — exercises the prefix-length
    // arithmetic across a different ⌈t·sz⌉ residue class
    assert(pairSet(AllPairsJoin.exactPairs(docs, 0.5)) === brute(docs, 0.5))
  }

  test("the j = t knife edge survives: sz 4 vs 5 at exactly 0.8") {
    // inter 4, union 5 → j = 0.8 exactly; IEEE 0.8·5 > 4, so a naive
    // ceil(t·sz) prefix or un-slacked size prune would drop this pair
    import spark.implicits._
    val items = Seq(
      (1L, Seq("w", "x", "y", "z")),
      (2L, Seq("w", "x", "y", "z", "q")),
      (3L, Seq("unrelated", "tokens", "here"))
    ).toDF("id", "toks")
    val got = AllPairsJoin.exactPairs(items, 0.8).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(got.head.getDouble(2) === 0.8)
  }
}
