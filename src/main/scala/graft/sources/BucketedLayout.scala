package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB storage layout for the events (time-series) table — the batch
  * twin of the streaming ingest sink (SURVEY §2.1 "time-bucketed parquet",
  * catena's compacted file partitions re-expressed as a lake layout).
  *
  * Layout: `sink/day=YYYY-MM-DD/part-*.parquet`, with rows inside each day
  * additionally spread over `seriesBuckets` files by `hash(user_id,
  * event_type)` and sorted by (user_id, event_type, ts) within each file.
  *
  * What each choice buys at scale:
  *  - `partitionBy(day)`: time-range queries (Q05/Q47/Q48) become partition
  *    PRUNING — directories outside the range are never listed, the exact
  *    analogue of catena's partition-list binary search. Retention = drop a
  *    directory.
  *  - series-hash bucketing via `repartition(n, series…)` before the write:
  *    each output file holds few series, whole — a single-series scan
  *    (Q47, the catena iterator) touches 1/n of each day's files, and
  *    per-series window ops over a day read clustered, sorted runs.
  *  - `sortWithinPartitions(series…, ts)`: parquet row-group min/max stats
  *    on (user_id, event_type, ts) become selective, so even within a
  *    touched file, non-matching row groups are skipped.
  *  - One compaction pass per sealed day (`compactDay`) rewrites the
  *    many small files a streaming trigger leaves behind into `n` sorted
  *    files — catena's memory-partition → file-partition seal, as a job.
  */
object BucketedLayout {

  /** Write events into the bucketed day layout (batch sink). */
  def writeEvents(events: DataFrame, sinkDir: String, seriesBuckets: Int = 8): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(seriesBuckets, col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts")
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(sinkDir)

  /** Read the layout back; `day` arrives as a partition column so time
    * filters prune directories before any file IO. */
  def readEvents(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)

  /** Compact one sealed day in place: coalesce the day's files into
    * `seriesBuckets` series-clustered, ts-sorted files. Idempotent; run
    * after the streaming sink seals a day (catena's background compaction). */
  def compactDay(spark: SparkSession, sinkDir: String, day: String, seriesBuckets: Int = 8): Unit = {
    val dayDf = spark.read.parquet(s"$sinkDir/day=$day")
    val tmp = s"$sinkDir/.compact-day=$day"
    dayDf
      .repartition(seriesBuckets, col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(tmp)
    // atomic-enough swap on a posix fs; on an object store this would be a
    // manifest/metadata commit instead
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(s"$sinkDir/day=$day")
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Retention: drop whole days — catena's cheap partition drop. */
  def dropDaysBefore(spark: SparkSession, sinkDir: String, cutoffDay: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(sinkDir)
    if (!fs.exists(base)) return Seq.empty
    val dropped = fs.listStatus(base).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("day=") && p.getName.stripPrefix("day=") < cutoffDay)
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName)
  }

  /** Round-trip the driver's single-file events fixture through the layout
    * (used by tests and as the migration job a reference user would run). */
  def migrate(spark: SparkSession, sfDir: String, sinkDir: String, seriesBuckets: Int = 8): Unit =
    writeEvents(Tables.events(spark, sfDir), sinkDir, seriesBuckets)
}
