package graft

import graft.sources.ZOrderLayout
import org.apache.spark.sql.functions._

/** [[ZOrderLayout]] — the 2-D clustered layout: box-read equivalence to
  * the flat scan, file-level skipping actually happening, and the x58
  * contract producing identical output over store and flat paths. */
class ZOrderLayoutSpec extends SparkSpecBase {

  private val usDay10 = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
  private val usDay15 = java.time.Instant.parse("2024-01-15T00:00:00Z").toEpochMilli * 1000L

  private def freshLayout(files: Int = 16): String = {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrderLayout.writeEvents(Tables.events(spark, sfDir), dir, files)
    dir
  }

  test("box read equals flat scan + filter row-for-row") {
    val dir = freshLayout()
    val boxed = ZOrderLayout.readBox(spark, dir, 3, 7, usDay10, usDay15)
      .select("event_id", "user_id", "event_type", "value")
    val flat = Tables.events(spark, sfDir)
      .filter(col("user_id").between(3, 7) &&
        unix_micros(col("ts")) >= usDay10 && unix_micros(col("ts")) < usDay15)
      .select("event_id", "user_id", "event_type", "value")
    assert(boxed.count() > 0, "fixture box must be non-empty")
    assert(boxed.except(flat).isEmpty && flat.except(boxed).isEmpty)
  }

  test("sidecar skipping: the box touches a strict subset of files; an off-domain box touches none") {
    val dir = freshLayout()
    val (sel, total) = ZOrderLayout.prunedPaths(spark, dir, 3, 7, usDay10, usDay15)
    assert(total === 16)
    assert(sel.nonEmpty && sel.length < total,
      s"expected file skipping, selected ${sel.length}/$total")
    val (none, _) = ZOrderLayout.prunedPaths(spark, dir, 100000, 200000, usDay10, usDay15)
    assert(none.isEmpty)
    assert(ZOrderLayout.readBox(spark, dir, 100000, 200000, usDay10, usDay15).count() === 0)
  }

  test("z-clustering narrows BOTH dimensions per file (the 1-D sort cannot)") {
    val dir = freshLayout()
    val stats = spark.read.parquet(s"$dir/_graft_zindex")
    val uDomain = Tables.events(spark, sfDir)
      .agg(max("user_id") - min("user_id")).head.getLong(0)
    // average per-file user span must be well under the domain: every file
    // covering all users would make user-axis stats useless (that is what
    // a ts-only sort produces)
    val avgSpan = stats.agg(avg(col("max_u") - col("min_u"))).head.getDouble(0)
    assert(avgSpan < uDomain * 0.8, s"user span per file not narrowed: $avgSpan of $uDomain")
  }

  test("x58 contract over the z-store equals the declared flat result") {
    val dir = freshLayout()
    val flat = operators.TimeSeriesOps.x58Box(spark, sfDir).collect().toSeq
    val stored = operators.TimeSeriesOps.boxAgg(
      ZOrderLayout.readBox(spark, dir, 3, 7, usDay10, usDay15)).collect().toSeq
    assert(stored === flat)
  }
}
