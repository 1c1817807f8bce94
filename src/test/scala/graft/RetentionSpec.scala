package graft

import graft.sources.{BucketedLayout, RollupStore}
import org.apache.spark.sql.functions._

/** Raw-data retention (r13 verdict item 5): `dropOlderThan(day)` on the
  * bucketed events layout — catena's whole-partition drop — cascading to
  * the RollupStore pre-aggregates, with READER behavior pinned across the
  * drop: the store-served contract queries (q47/q48-store) keep serving
  * the surviving days row-identically, the dropped days vanish atomically
  * (whole directories), and a post-cutoff rollup range answers exactly as
  * before the drop. The index stores' documented NON-cascade is the
  * rationale on RollupStore.dropDaysBefore. */
class RetentionSpec extends SparkSpecBase {

  private val DayUs = 24L * 3600L * 1000000L

  test("dropDaysBefore: q47/q48-store reads survive the drop exactly " +
       "(pre-drop results filtered to the retention window), rollup " +
       "ranges inside the window are unchanged, and the drop cost is " +
       "per-directory metadata") {
    val dir = java.nio.file.Files.createTempDirectory("retention-store").toString
    val rollupDir = java.nio.file.Files.createTempDirectory("retention-rollup").toString
    BucketedLayout.migrate(spark, sfDir, dir, seriesBuckets = 2)
    RollupStore.build(BucketedLayout.readEvents(spark, dir)
      .drop("day"), rollupDir)

    val cutoff = "2024-01-10"
    val cutoffUs = java.time.Instant.parse("2024-01-10T00:00:00Z")
      .toEpochMilli * 1000L
    val cutoffDayId = cutoffUs / DayUs

    // pre-drop snapshots
    val q47Before = operators.TimeSeriesOps.q47Store(spark, dir).collect().toSeq
    val q48Before = operators.TimeSeriesOps.q48Store(spark, dir).collect().toSeq
    // a rollup range fully INSIDE the retention window (Jan 12–15)
    val t0 = cutoffUs + 2 * DayUs
    val t1 = cutoffUs + 5 * DayUs
    def rangeRows() = RollupStore.rangeAgg(spark, rollupDir,
        BucketedLayout.readEvents(spark, dir).drop("day"), t0, t1)
      .orderBy("event_type").collect().toSeq
    val rangeBefore = rangeRows()

    // the drop + cascade
    val droppedRaw = BucketedLayout.dropDaysBefore(spark, dir, cutoff)
    val droppedRollup = RollupStore.dropDaysBefore(spark, rollupDir, cutoffDayId)
    assert(droppedRaw.nonEmpty, "fixture must span days before the cutoff")
    assert(droppedRollup.nonEmpty, "rollup cascade must retire day partitions")
    assert(droppedRollup.forall(_.stripPrefix("hour/").stripPrefix("day/")
      .stripPrefix("day=").toLong < cutoffDayId))

    // q47-store: the surviving rows are exactly the pre-drop rows in the
    // retention window (the q47 range starts Jan 5, so the drop bites)
    val q47After = operators.TimeSeriesOps.q47Store(spark, dir).collect().toSeq
    assert(q47After === q47Before.filter(_.getString(0) >= cutoff),
      "q47-store must serve the surviving days row-identically")
    assert(q47After.size < q47Before.size, "the drop must have removed rows")

    // q48-store: per-day groups — surviving days' aggregates are
    // BIT-identical (whole-directory drop: no partial day anywhere)
    val q48After = operators.TimeSeriesOps.q48Store(spark, dir).collect().toSeq
    assert(q48After === q48Before.filter(_.getString(0) >= cutoff),
      "q48-store must keep surviving day aggregates bit-identical")

    // rollup router: a range inside the window is untouched by the drop
    assert(rangeRows() === rangeBefore,
      "post-cutoff rollup ranges must answer exactly as before the drop")

    // no day before the cutoff survives anywhere
    assert(BucketedLayout.readEvents(spark, dir)
      .filter(col("day") < cutoff).count() === 0)
    Seq("hour", "day").foreach { res =>
      assert(spark.read.parquet(s"$rollupDir/$res")
        .filter(col("day") < cutoffDayId).count() === 0,
        s"rollup $res table still serves retired days")
    }
  }
}
