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
    * `seriesBuckets` series-clustered, ts-sorted files. Idempotent. For the
    * BATCH layout only — a STREAMING sink's directory carries a
    * `_spark_metadata` transaction manifest that a physical rewrite would
    * invalidate (and whose orphaned uncommitted files it would bake in);
    * this method refuses such dirs, and streaming zones compact via
    * [[graft.streaming.IngestPipeline.compactDayInto]]'s two-zone design
    * instead (raw stays append-only under its manifest; serving is the
    * rewrite target).
    *
    * Crash safety (BucketedLayoutSpec walks the whole kill matrix): the
    * rewrite lands in a hidden `.compact-day=` dir, so the serving day is
    * untouched — and stays readable — until two metadata-only renames swap
    * it: old day → `.old-day=` parking slot, new data → day. BETWEEN those
    * two renames the `day=` directory does not exist: a concurrent reader
    * listing partitions in that instant silently skips the day, so
    * compaction assumes a single writer and no concurrent readers of the
    * day being sealed (schedule it when the day is out of the serving
    * window, or serve reads through a manifest/metastore indirection that
    * republishes the partition atomically). A kill before
    * the swap leaves the day as it was (stale temp dirs are overwritten on
    * retry); a kill between the renames is repaired by the recovery branch
    * on the next call (the day is restored from the parking slot before
    * anything else happens); a kill after the swap costs only the cleanup
    * delete. Both renames are REQUIRED to succeed before the park is
    * deleted — a failed swap aborts with the original data intact (at the
    * serving name, or parked for the recovery branch). On an object store
    * without atomic rename this whole swap becomes a manifest/metadata
    * commit instead. */
  def compactDay(spark: SparkSession, sinkDir: String, day: String, seriesBuckets: Int = 8): Unit = {
    // the two-rename day swap assumes atomic rename — gate the posture
    // here directly (this path is not lease-guarded)
    AtomicRename.ensure(spark, sinkDir, "BucketedLayout.compactDay")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(s"$sinkDir/_spark_metadata")),
      s"$sinkDir is a streaming-sink directory (_spark_metadata present): " +
        "physical compaction would invalidate the manifest and resurrect " +
        "orphaned uncommitted files — use IngestPipeline.compactDayInto")
    val dst = new org.apache.hadoop.fs.Path(s"$sinkDir/day=$day")
    val tmp = new org.apache.hadoop.fs.Path(s"$sinkDir/.compact-day=$day")
    val old = new org.apache.hadoop.fs.Path(s"$sinkDir/.old-day=$day")
    // recovery: a prior run died between the two swap renames — the day is
    // parked at `old`; put it back before doing anything else
    if (!fs.exists(dst) && fs.exists(old))
      require(fs.rename(old, dst), s"recovery rename failed: $old -> $dst")
    // a prior run died after the swap, before cleanup: drop the stale park
    if (fs.exists(old)) fs.delete(old, true)
    spark.read.parquet(dst.toString)
      .repartition(seriesBuckets, col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: two metadata renames; the day dir always points at a complete
    // file set (never a half-deleted one, unlike delete-then-rename). The
    // park is only deleted once BOTH renames verifiably succeeded.
    require(fs.rename(dst, old), s"park rename failed: $dst -> $old")
    require(fs.rename(tmp, dst),
      s"swap rename failed: $tmp -> $dst — day parked at $old; the next call restores it")
    fs.delete(old, true)
  }

  /** Retention: drop whole days — catena's cheap partition drop (one
    * directory delete per retired day, no data scan; readers see each day
    * atomically present or absent, pinned by RetentionSpec across
    * q47/q48-store reads). Derived state: [[RollupStore.dropDaysBefore]]
    * is the cascade for the pre-aggregates (day ids = floorDiv(µs, day));
    * the INDEX stores deliberately do not cascade — they are id-keyed,
    * not time-keyed (rationale on the RollupStore method). */
  def dropDaysBefore(spark: SparkSession, sinkDir: String, cutoffDay: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(sinkDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
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
