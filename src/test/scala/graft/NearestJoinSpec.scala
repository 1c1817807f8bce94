package graft

import graft.operators.NearestJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NearestJoin (x108's engine): the two-level directional scans must equal
  * the brute-force ranked cross join under every bucket width — bucket
  * boundaries must cancel out of the algebra — and the (|Δ|, axis, id)
  * tie rules must hold exactly. */
class NearestJoinSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  private def treat = docs.filter(col("source") === "src0").drop("source")
  private def ctl = docs.filter(col("source") =!= "src0").drop("source")

  private def canon(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "match_id", "match_axis", "delta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def brute: Set[(Long, Long, Long, Long)] = {
    val w = Window.partitionBy(col("t.doc_id"))
      .orderBy(abs(col("c.n_chars") - col("t.n_chars")), col("c.n_chars"), col("c.doc_id"))
    treat.as("t").join(ctl.as("c"), col("t.lang") === col("c.lang"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("t.doc_id"), col("c.doc_id").as("match_id"),
        col("c.n_chars").as("match_axis"),
        abs(col("c.n_chars") - col("t.n_chars")).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("nearest == brute-force ranked cross join on sf0.001, any bucket width") {
    val expect = brute
    assert(expect.nonEmpty)
    for (w <- Seq(8L, 64L, 1024L))
      assert(canon(NearestJoin.nearest(treat, ctl, "lang", "n_chars", "doc_id", w))
        === expect, s"bucket width $w diverged")
  }

  test("tie rules: equal |Δ| prefers smaller axis; equal axis prefers smaller id") {
    import spark.implicits._
    val pool = Seq((10L, "k", 5L), (11L, "k", 5L), (12L, "k", 9L))
      .toDF("doc_id", "lang", "n_chars")
    val probes = Seq((1L, "k", 7L), (2L, "k", 9L), (3L, "k", 1L))
      .toDF("doc_id", "lang", "n_chars")
    val got = canon(NearestJoin.nearest(probes, pool, "lang", "n_chars", "doc_id"))
    assert(got === Set(
      (1L, 10L, 5L, 2L), // Δ2 both ways → smaller axis 5; two at 5 → id 10
      (2L, 12L, 9L, 0L), // exact hit
      (3L, 10L, 5L, 4L)  // below the whole pool → successor only
    ), s"got $got")
  }
}
