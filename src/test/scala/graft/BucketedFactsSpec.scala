package graft

import graft.sources.BucketedFacts
import org.apache.spark.sql.execution.ExplainMode

/** The write-time-bucketing contract: a fact–fact equi-join over
  * co-bucketed, per-bucket-sorted tables must plan with NO shuffle and NO
  * sort — the shuffle was paid once at write time. */
class BucketedFactsSpec extends SparkSpecBase {

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("bucketed-facts").toString

  private def tree(df: org.apache.spark.sql.DataFrame): (String, Seq[String]) = {
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    (p, p.linesIterator.filter(l => !l.trim.startsWith("(")).toSeq)
  }

  test("co-bucketed fact join plans with zero Exchange") {
    BucketedFacts.writePair(spark, sfDir, dir)
    val (p, t) = tree(BucketedFacts.revenueJoin(spark))
    assert(p.contains("SortMergeJoin"), p)
    assert(!t.exists(_.contains("Exchange")),
           s"bucketed join must not shuffle:\n$p")
  }

  test("with the scan-ordering flag, the pre-join Sorts are elided too") {
    BucketedFacts.writePair(spark, sfDir, dir)
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try {
      val (p, t) = tree(BucketedFacts.revenueJoin(spark))
      assert(p.contains("SortMergeJoin"), p)
      assert(!t.exists(_.contains("Exchange")), p)
      // one sorted file per bucket (writePair's repartition guarantees it)
      // makes the write-time sortBy trustworthy — no Sort anywhere below
      assert(!t.exists(_.contains("Sort ")),
             s"scan ordering should satisfy the SMJ requirement:\n$p")
    } finally spark.conf.set(key, "false")
  }

  test("bucketed join result equals the plain shuffled join") {
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
            org.apache.spark.sql.functions.col("o_orderkey") ===
              org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    val bucketed = spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"),
            org.apache.spark.sql.functions.col("o_orderkey") ===
              org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    assert(bucketed === plain && plain > 0)
  }
}
