package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** x16's two-level prefix scan vs the single-window reference form.
  *
  * The scan is the 100 TB shape (per-(lang,bucket) subtotals → bucket-offset
  * prefix over the aggregate → intra-bucket windows); the window form is the
  * algebraic oracle. They must agree exactly — on the fixture AND on
  * adversarial synthetic data — under any input partitioning and any bucket
  * size, and the scan's corpus-side window must be bucket-partitioned (no
  * per-language single-task window over the full corpus).
  */
class ShardScanSpec extends SparkSpecBase {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def fixtureDocs: DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))

  test("scan == window on the fixture, at several bucket sizes") {
    val expect = canon(operators.TextOps.x16ShardsWindow(fixtureDocs))
    for (bucket <- Seq(1L, 7L, 256L, 1000000L)) {
      val got = canon(operators.TextOps.x16ShardsScan(fixtureDocs, bucketDocs = bucket))
      assert(got === expect, s"bucketDocs=$bucket diverges from the window form")
    }
  }

  test("scan == window on synthetic skew, under different partitionings") {
    // one dominant lang, sparse doc_ids with holes, zero-token docs,
    // budget-boundary-exact token counts
    import spark.implicits._
    val rows = (0L until 500L).map { i =>
      val lang = if (i % 7 == 0) "xx" else "en"
      val tok = (i % 5) match {
        case 0 => 0L          // empty doc: shard of next doc unaffected
        case 1 => 2000L       // exactly one budget
        case _ => (i * 37) % 400
      }
      (i * 3 + (i % 2), lang, tok) // non-contiguous, non-monotone-step ids
    }
    val df = rows.toDF("doc_id", "lang", "n_tok")
    val expect = canon(operators.TextOps.x16ShardsWindow(df))
    for (parts <- Seq(1, 3, 13); bucket <- Seq(1L, 16L, 999L)) {
      val got = canon(operators.TextOps.x16ShardsScan(
        df.repartition(parts), bucketDocs = bucket))
      assert(got === expect, s"parts=$parts bucketDocs=$bucket diverges")
    }
  }

  test("plan: the corpus running sum is (lang, bkt)-windowed, never lang-only") {
    val p = operators.TextOps.x16TokenShards(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // every window ordered by doc_id (the corpus-side running sum) must be
    // partitioned by the bucket too; a lang-only partition spec there would
    // serialize each language onto one task — the r4 scale flaw
    val corpusSpecs = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("doc_id"))
      .toSeq
    assert(corpusSpecs.nonEmpty, s"no corpus-side window found:\n$p")
    corpusSpecs.foreach { l =>
      assert(l.contains("bkt"), s"corpus window not bucket-partitioned: $l")
    }
  }
}
