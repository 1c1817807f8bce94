package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-resolution rollup store + range router — the TSDB pre-aggregation
  * pattern (a time-series engine's continuous rollups, re-expressed as two
  * parquet tables and a plan-level decomposition).
  *
  * `build` materializes per-(event_type, bucket) additive aggregates
  * (cnt / sum / min / max of `value`) at HOUR and DAY resolution — one
  * corpus scan each, both map-side-combined hash aggregates. `rangeAgg`
  * then answers any [t0, t1) per-type aggregate WITHOUT rescanning raw
  * events where a rollup can serve: the range decomposes into
  *   raw edge ∪ hour chunks ∪ day chunks ∪ hour chunks ∪ raw edge
  * (full days from the day table, edge full-hours from the hour table,
  * sub-hour edges from raw), and the partials re-aggregate — sound because
  * every served aggregate is ADDITIVE (cnt/sum by +, min/max by min/max);
  * averages derive as sum/cnt at the end, never pre-averaged.
  *
  * Scale: the rollup tables are |types|·|buckets| rows regardless of event
  * volume — at 100 TB (billions of events/hour) the day table answers a
  * month-long dashboard query from ~150 rows, and the raw scan is bounded
  * by two sub-hour edges, prunable via BucketedLayout's day partitioning.
  * On THIS fixture the events are sparser than the hour grid, so the hour
  * table is not smaller than raw — the honest small-scale floor
  * (BASELINE.md); the decomposition, not the toy row counts, is the
  * contract (RollupStoreSpec pins routed ≡ direct on aligned and
  * misaligned ranges, and that the router's raw scan touches only the
  * edge rows).
  *
  * Freshness: rollups of a live table are maintained by re-building the
  * open hour/day partitions (or streaming them via foreachBatch like
  * ST12/ST17's stores); sealed buckets never change.
  */
object RollupStore {

  private val HourUs = 3600L * 1000000L
  private val DayUs  = 24L * HourUs

  /** The per-resolution aggregate, carrying the owning `day` as a
    * partition column — the unit sealed/rewritten by [[updateDays]]. */
  private def rollup(events: DataFrame, widthUs: Long): DataFrame =
    events.select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("bucket", graft.functions.SeriesFunctions.floorDiv(col("us"), widthUs))
      .withColumn("day", graft.functions.SeriesFunctions.floorDiv(col("bucket") * widthUs, DayUs))
      .groupBy("event_type", "bucket", "day")
      .agg(count(lit(1)).as("cnt"), sum("value").as("s"),
           min("value").as("mn"), max("value").as("mx"))

  def build(events: DataFrame, dir: String): Unit = {
    rollup(events, HourUs).write.partitionBy("day").mode("overwrite").parquet(s"$dir/hour")
    rollup(events, DayUs).write.partitionBy("day").mode("overwrite").parquet(s"$dir/day")
  }

  /** Incremental maintenance: re-derive ONLY `days`' rollup partitions
    * from the raw store and swap them in via dynamic partition overwrite —
    * the open-partition refresh a streaming ingest calls per micro-batch
    * (ST18), catena's memory-partition → sealed-file-partition cycle as a
    * bounded job. `rawEvents` is the durable raw zone (the ingest sink);
    * cost is O(events in the touched days), and sealed days are never
    * read or written. */
  def updateDays(spark: SparkSession, dir: String, rawEvents: DataFrame,
                 days: Seq[Long]): Unit = {
    if (days.isEmpty) return
    val touched = rawEvents.filter(
      graft.functions.SeriesFunctions.floorDiv(unix_micros(col("ts")), DayUs)
        .isin(days: _*))
    Seq(("hour", HourUs), ("day", DayUs)).foreach { case (name, w) =>
      rollup(touched, w).write.partitionBy("day").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(s"$dir/$name")
    }
  }

  /** Retention cascade for [[graft.sources.BucketedLayout.dropDaysBefore]]:
    * drop the hour/day rollup partitions of retired days (day ids =
    * floorDiv(µs, day) — the `day=` partition values both tables carry),
    * so a post-drop [[rangeAgg]] never serves aggregates of raw rows that
    * no longer exist. Same cost shape as the raw drop: one directory
    * delete per (resolution, retired day), no data scan. Returns the
    * dropped partition names.
    *
    * The INDEX stores (SignatureStore/PostingsStore/VectorStore)
    * deliberately do NOT cascade: they are keyed by doc/vec id, not time
    * — a raw-retention drop does not invalidate a dedup signature or a
    * posting (the document still existed; its duplicates must still be
    * caught), so retiring index rows is a separate, id-keyed curation
    * decision (MergeStore/VersionedStore deletes), never a side effect
    * of time retention. */
  def dropDaysBefore(spark: SparkSession, dir: String,
                     cutoffDayId: Long): Seq[String] = {
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("hour", "day").flatMap { res =>
      val base = new org.apache.hadoop.fs.Path(s"$dir/$res")
      if (!fsys.exists(base)) Nil
      else fsys.listStatus(base).toSeq.map(_.getPath)
        .filter { p =>
          p.getName.startsWith("day=") &&
            p.getName.stripPrefix("day=").toLongOption.exists(_ < cutoffDayId)
        }
        .map { p => fsys.delete(p, true); s"$res/${p.getName}" }
    }
  }

  /** The [t0, t1) decomposition, exposed for the spec: (rawRanges,
    * hourBuckets, dayBuckets) with rawRanges a list of [a, b) µs spans.
    * Greedy outward-in: raw up to the first hour boundary, hours up to the
    * first day boundary, whole days, then mirrored back down. */
  private[graft] def decompose(t0: Long, t1: Long):
      (Seq[(Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)]) = {
    require(t0 <= t1)
    def ceilTo(t: Long, w: Long) = ((t + w - 1) / w) * w
    def floorTo(t: Long, w: Long) = (t / w) * w
    val h0 = ceilTo(t0, HourUs) min t1
    val h1 = floorTo(t1, HourUs) max h0
    val d0 = ceilTo(h0, DayUs) min h1
    val d1 = floorTo(h1, DayUs) max d0
    val raw = Seq((t0, h0), (h1, t1)).filter(r => r._1 < r._2)
    val hours = Seq((h0, d0), (d1, h1)).filter(r => r._1 < r._2)
      .map { case (a, b) => (a / HourUs, b / HourUs) } // bucket id ranges
    val days = if (d0 < d1) Seq((d0 / DayUs, d1 / DayUs)) else Nil
    (raw, hours, days)
  }

  /** Per-type cnt/sum/min/max/avg over [t0, t1) µs, served from the
    * coarsest possible resolution at every point of the range. */
  def rangeAgg(spark: SparkSession, dir: String, rawEvents: DataFrame,
               t0: Long, t1: Long): DataFrame = {
    val (raw, hours, days) = decompose(t0, t1)
    // the bucket predicate answers correctness; the derived day predicate
    // (bucket range → owning-day range) is redundant but reaches the scan
    // as a PARTITION filter, so out-of-range day directories are pruned
    def partOf(df: DataFrame, idRanges: Seq[(Long, Long)], widthUs: Long): Option[DataFrame] =
      if (idRanges.isEmpty) None
      else Some(df.filter(idRanges.map { case (a, b) =>
        col("bucket") >= a && col("bucket") < b &&
          col("day") >= (a * widthUs) / DayUs && col("day") <= ((b * widthUs - 1) / DayUs)
      }.reduce(_ || _)))
    val rawPart =
      if (raw.isEmpty) None
      else Some(rawEvents
        .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
        .filter(raw.map { case (a, b) => col("us") >= a && col("us") < b }.reduce(_ || _))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("value").as("s"),
             min("value").as("mn"), max("value").as("mx")))
    val hourPart = partOf(spark.read.parquet(s"$dir/hour"), hours, HourUs)
      .map(_.groupBy("event_type").agg(sum("cnt").as("cnt"), sum("s").as("s"),
        min("mn").as("mn"), max("mx").as("mx")))
    val dayPart = partOf(spark.read.parquet(s"$dir/day"), days, DayUs)
      .map(_.groupBy("event_type").agg(sum("cnt").as("cnt"), sum("s").as("s"),
        min("mn").as("mn"), max("mx").as("mx")))
    val parts = Seq(rawPart, hourPart, dayPart).flatten
    require(parts.nonEmpty, "empty range")
    parts.reduce(_ unionByName _)
      .groupBy("event_type")
      .agg(sum("cnt").as("cnt"), sum("s").as("s"),
           min("mn").as("mn"), max("mx").as("mx"))
      .select(col("event_type"), col("cnt"), col("s"), col("mn"), col("mx"),
              (col("s") / col("cnt").cast("double")).as("avg"))
  }

  /** The reference the router must equal: one raw scan over the range. */
  def directAgg(rawEvents: DataFrame, t0: Long, t1: Long): DataFrame =
    rawEvents
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .filter(col("us") >= t0 && col("us") < t1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("s"),
           min("value").as("mn"), max("value").as("mx"))
      .select(col("event_type"), col("cnt"), col("s"), col("mn"), col("mx"),
              (col("s") / col("cnt").cast("double")).as("avg"))
}
