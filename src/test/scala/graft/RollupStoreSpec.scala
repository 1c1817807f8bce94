package graft

import graft.sources.RollupStore
import org.apache.spark.sql.functions._

/** [[RollupStore]] — decomposition soundness and routed ≡ direct over
  * aligned, misaligned, sub-hour, and empty-edge ranges. */
class RollupStoreSpec extends SparkSpecBase {

  private val HourUs = 3600L * 1000000L
  private val DayUs = 24L * HourUs
  private def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L

  private lazy val storeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("rollup").toString
    RollupStore.build(Tables.events(spark, sfDir), dir)
    dir
  }

  private def assertRouted(t0: Long, t1: Long): Unit = {
    val routed = RollupStore.rangeAgg(spark, storeDir, Tables.events(spark, sfDir), t0, t1)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6), r.getDouble(3), r.getDouble(4),
        math.rint(r.getDouble(5) * 1e6))).sortBy(_._1)
    val direct = RollupStore.directAgg(Tables.events(spark, sfDir), t0, t1)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6), r.getDouble(3), r.getDouble(4),
        math.rint(r.getDouble(5) * 1e6))).sortBy(_._1)
    assert(routed.nonEmpty, s"empty range [$t0,$t1)")
    assert(routed === direct)
  }

  test("decomposition covers the range exactly once, coarsest-first") {
    // misaligned: 01-05 00:30:10 .. 01-20 07:45:00
    val t0 = us("2024-01-05T00:30:10Z"); val t1 = us("2024-01-20T07:45:00Z")
    val (raw, hours, days) = RollupStore.decompose(t0, t1)
    // reassemble: every µs of [t0,t1) covered exactly once
    val spans = raw ++ hours.map { case (a, b) => (a * HourUs, b * HourUs) } ++
      days.map { case (a, b) => (a * DayUs, b * DayUs) }
    val sorted = spans.sortBy(_._1)
    assert(sorted.head._1 === t0 && sorted.last._2 === t1)
    sorted.sliding(2).foreach {
      case Seq((_, b), (c, _)) => assert(b === c, s"gap/overlap at $b vs $c")
      case _ => ()
    }
    assert(days.nonEmpty, "misaligned 15-day range must still use the day table")
  }

  test("routed equals direct: day-aligned range") {
    assertRouted(us("2024-01-05T00:00:00Z"), us("2024-01-20T00:00:00Z"))
  }

  test("routed equals direct: misaligned range (raw edges + hour edges + days)") {
    assertRouted(us("2024-01-05T00:30:10Z"), us("2024-01-20T07:45:00Z"))
  }

  test("routed equals direct: sub-hour range (raw only)") {
    val t0 = us("2024-01-10T12:05:00Z"); val t1 = us("2024-01-10T12:50:00Z")
    val (raw, hours, days) = RollupStore.decompose(t0, t1)
    assert(hours.isEmpty && days.isEmpty && raw === Seq((t0, t1)))
    // fixture may have few rows here; only assert when non-empty
    if (RollupStore.directAgg(Tables.events(spark, sfDir), t0, t1).count() > 0)
      assertRouted(t0, t1)
  }

  test("routed equals direct: hour-aligned sub-day range (no raw scan at all)") {
    val t0 = us("2024-01-10T06:00:00Z"); val t1 = us("2024-01-10T18:00:00Z")
    val (raw, _, _) = RollupStore.decompose(t0, t1)
    assert(raw.isEmpty, "aligned range must not touch raw events")
    assertRouted(t0, t1)
  }
}
