package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end ingest pipeline — the full catena storage lifecycle
  * re-expressed on Spark:
  *
  *   WAL + memory partition      → Structured Streaming micro-batches with
  *                                 checkpoint/offset log (exactly-once)
  *   partition seal + compaction → per-day compaction job into the
  *                                 series-bucketed serving layout
  *   read-only file partitions   → `day=…` directories, partition-pruned
  *
  * Two zones, because a streaming file sink owns its directory: the sink
  * maintains a `_spark_metadata` transaction log that batch reads of the
  * WHOLE directory honor — rewriting files underneath it would corrupt the
  * manifest. So the stream lands micro-batch-sized files in a RAW zone
  * (append-only, exactly-once), and compaction rewrites each sealed day
  * into a separate SERVING zone (`graft.sources.BucketedLayout` shape:
  * few files per day, series-clustered, ts-sorted). Queries read serving;
  * re-running compaction for a day is idempotent (overwrite of one
  * directory); retention drops serving days wholesale.
  */
object IngestPipeline {

  /** Replay everything available from `srcDir` into the raw zone
    * (exactly-once on re-run via the checkpoint), then compact every day
    * present in raw into the serving zone. Returns the compacted days. */
  def run(spark: SparkSession, srcDir: String, rawDir: String,
          checkpointDir: String, serveDir: String, seriesBuckets: Int = 8): Seq[String] = {
    StreamOps.ingest(spark, srcDir, rawDir, checkpointDir).awaitTermination()
    val days = listDays(spark, rawDir)
    days.foreach(compactDayInto(spark, rawDir, serveDir, _, seriesBuckets))
    days
  }

  /** Days currently present in a day-partitioned directory. */
  def listDays(spark: SparkSession, dir: String): Seq[String] = {
    // the FILESYSTEM of the zone root, not the session default — raw
    // zones legitimately live on s3a/gs while defaultFS is HDFS
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("day=")).map(_.stripPrefix("day=")).sorted
  }

  /** Compact one raw day into the serving layout: read only that day's
    * directory (no manifest involvement), cluster by series hash, sort by
    * (series, ts) within each file, overwrite the serving day dir. */
  def compactDayInto(spark: SparkSession, rawDir: String, serveDir: String,
                     day: String, seriesBuckets: Int): Unit =
    spark.read.parquet(s"$rawDir/day=$day")
      .repartition(seriesBuckets, col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$serveDir/day=$day")

  /** The queryable serving table (day arrives as a partition column). */
  def readServing(spark: SparkSession, serveDir: String): DataFrame =
    spark.read.parquet(serveDir)
}
