package graft

import graft.operators.SeriesApi
import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._

/** The full ingest lifecycle: stream → raw zone → compacted serving zone,
  * exactly-once on replay, equivalent to batch, partition-pruned. */
class IngestPipelineSpec extends SparkSpecBase {

  private lazy val dirs = {
    val raw = java.nio.file.Files.createTempDirectory("ingest-raw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    val serve = java.nio.file.Files.createTempDirectory("ingest-serve").toString
    val days = IngestPipeline.run(spark, sfDir, raw, ckpt, serve, seriesBuckets = 2)
    (raw, ckpt, serve, days)
  }

  test("serving zone holds exactly the batch rows") {
    val (_, _, serve, days) = dirs
    val serving = IngestPipeline.readServing(spark, serve)
    val batch = Tables.events(spark, sfDir)
    assert(days.nonEmpty)
    assert(serving.count() === batch.count())
    assert(serving.agg(sum("event_id")).head.getLong(0) ===
           batch.agg(sum("event_id")).head.getLong(0))
  }

  test("replaying the stream with the same checkpoint adds nothing (exactly-once)") {
    val (raw, ckpt, serve, _) = dirs
    val before = IngestPipeline.readServing(spark, serve).count()
    val days2 = IngestPipeline.run(spark, sfDir, raw, ckpt, serve, seriesBuckets = 2)
    val after = IngestPipeline.readServing(spark, serve).count()
    assert(after === before)
    assert(days2 === IngestPipeline.listDays(spark, raw))
  }

  test("downsample over serving == downsample over the batch fixture") {
    val (_, _, serve, _) = dirs
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket", "event_type")
        .select(col("bucket"), col("event_type"), col("n"), round(col("sum_v"), 4))
        .collect().toSeq
    val a = canon(SeriesApi.downsample(
      IngestPipeline.readServing(spark, serve), "ts", "yyyy-MM-dd", Seq("event_type"), "value"))
    val b = canon(SeriesApi.downsample(
      Tables.events(spark, sfDir), "ts", "yyyy-MM-dd", Seq("event_type"), "value"))
    assert(a === b)
  }

  test("time filters prune serving partitions before file IO") {
    val (_, _, serve, _) = dirs
    val q = IngestPipeline.readServing(spark, serve)
      .filter(col("day") === "2024-01-05")
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("day"), s"day filter not pruning partitions:\n$p")
  }

  test("each serving day has exactly seriesBuckets files (compaction shape)") {
    val (_, _, serve, days) = dirs
    val d0 = days.head
    val files = new java.io.File(s"$serve/day=$d0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 2)
  }
}
