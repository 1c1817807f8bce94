package graft

import graft.functions.{ConnectedComponents, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** x39's multiplicity folding, EXECUTED against the raw-graph answer.
  *
  * The contract fixture has no byte-identical documents, so the declared
  * x39 query never exercises copies > 1. This spec builds a corpus WITH
  * exact-copy groups (including copies of the eventual keeper and copies
  * inside a near-dup cluster) and asserts that the dedup-first pipeline's
  * folded bookkeeping — n_members counting copies, chars_dropped counting
  * collapsed duplicates — is identical to running cluster resolution +
  * survivor selection over the full raw document graph (every copy a
  * node, every near-dup pair an edge), which is the semantics x14/x33
  * define.
  */
class X39FoldSpec extends SparkSpecBase {

  // Near-dup pair (a, b): Jaccard 19/21 ≈ 0.905 >= 0.8. c and the (d1, d2)
  // pair are disjoint vocabularies — separate clusters.
  private val textA  = (1 to 20).map(i => s"w$i").mkString(" ")
  private val textB  = ((1 to 19).map(i => s"w$i") :+ "w21").mkString(" ")
  private val textC  = (1 to 20).map(i => s"u$i").mkString(" ")
  private val textD1 = (1 to 20).map(i => s"v$i").mkString(" ")
  private val textD2 = ((1 to 19).map(i => s"v$i") :+ "v21").mkString(" ")

  // Interleaved ids; copy groups: A x5 (min id 2), B x3 (min id 3),
  // C x1, D1 x2 (min id 5), D2 x1. textB is longer than textA (w21 after
  // w1..w19 keeps length equal to A's... make B's keeper race explicit by
  // length: A and B have equal n_chars, so the keeper tiebreak is min id).
  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, textA), (2L, textA), (30L, textA), (41L, textA), (55L, textA),
      (3L, textB), (22L, textB), (8L, textB),
      (7L, textC),
      (100L, textD1), (5L, textD1),
      (60L, textD2)
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Raw-graph reference: x14/x33 semantics with every copy as a node. */
  private def rawSurvivors(d: DataFrame): DataFrame = {
    val pairs = MinHashLSH.verifiedPairs(
      d.select(col("doc_id").as("id"), split(col("text"), " ").as("toks")), 0.8)
    val labels = ConnectedComponents.labels(
        d.select(col("doc_id").as("id")), pairs.select(col("id_a"), col("id_b")))
      .select(col("id"), col("comp").as("cluster_id"))
    val j = labels.join(d.select(col("doc_id").as("id"), col("n_chars")), "id")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("cluster_id").orderBy(col("n_chars").desc, col("id"))))
    val agg = j.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), sum("n_chars").as("chars_total"))
    j.filter(col("rnk") === 1)
      .select(col("cluster_id"), col("id").as("keeper"), col("n_chars").as("chars_kept"))
      .join(agg, "cluster_id")
      .select(col("cluster_id"), col("keeper"), col("n_members"),
              col("chars_kept"), (col("chars_total") - col("chars_kept")).as("chars_dropped"))
  }

  test("folded pipeline output equals cluster+survivor over the raw copy graph") {
    val folded = operators.TextOps.x39PipelineFrom(docs)
      .select("cluster_id", "keeper", "n_members", "chars_kept", "chars_dropped")
      .orderBy("cluster_id").collect().toSeq
    val raw = rawSurvivors(docs)
      .orderBy("cluster_id").collect().toSeq
    assert(folded == raw,
      s"folded bookkeeping diverged from the raw graph:\nfolded=$folded\nraw=$raw")
  }

  test("fixture exercises real multiplicities and cross-text clusters") {
    val out = operators.TextOps.x39PipelineFrom(docs).orderBy("cluster_id").collect()
    // cluster {A x5, B x3}: 8 members, 2 reps, keeper = min id among the
    // equal-length longest (A's rep, id 2); 7 copies' chars dropped
    val ab = out.find(_.getAs[Long]("cluster_id") == 2L).get
    assert(ab.getAs[Long]("n_members") == 8L, ab.toString)
    assert(ab.getAs[Long]("n_reps") == 2L, ab.toString)
    assert(ab.getAs[Long]("keeper") == 2L, ab.toString)
    // singleton C: 1 member, nothing dropped
    val c = out.find(_.getAs[Long]("cluster_id") == 7L).get
    assert(c.getAs[Long]("n_members") == 1L && c.getAs[Long]("chars_dropped") == 0L, c.toString)
    // cluster {D1 x2, D2 x1}: 3 members, 2 reps
    val d = out.find(_.getAs[Long]("cluster_id") == 5L).get
    assert(d.getAs[Long]("n_members") == 3L && d.getAs[Long]("n_reps") == 2L, d.toString)
  }
}
