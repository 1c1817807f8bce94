package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The catena-facade store: iterator semantics, seek ranges, latest-point,
  * insert/append, retention — against the fixture migrated into the layout. */
class GraftStoreSpec extends SparkSpecBase {

  private lazy val store = {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    GraftStore.create(spark, dir, Tables.events(spark, sfDir), seriesBuckets = 2)
  }

  test("series() is the catena iterator: ordered, complete, series-pure") {
    val s = store.series(7L, "click").collect()
    val ref = Tables.events(spark, sfDir)
      .filter(col("user_id") === 7 && col("event_type") === "click")
      .orderBy("ts", "event_id").collect()
    assert(s.length === ref.length)
    assert(s.map(_.getAs[Long]("event_id")).toSeq ===
           ref.map(_.getAs[Long]("event_id")).toSeq)
  }

  test("series(from, until) is Seek(ts): half-open range, pruned scan") {
    val from = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val until = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val q = store.series(7L, "click", Some(from), Some(until))
    val got = q.collect()
    val ref = Tables.events(spark, sfDir)
      .filter(col("user_id") === 7 && col("event_type") === "click" &&
              col("ts") >= lit(from) && col("ts") < lit(until))
      .orderBy("ts", "event_id").collect()
    assert(got.map(_.getAs[Long]("event_id")).toSeq ===
           ref.map(_.getAs[Long]("event_id")).toSeq)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("day"), s"day range must prune partitions:\n$plan")
    assert(plan.contains("EqualTo(user_id,7)"), "series key must reach the scan")
  }

  test("latest() equals the batch max_by; empty series is None") {
    val (ts, v) = store.latest(7L, "click").get
    val ref = Tables.events(spark, sfDir)
      .filter(col("user_id") === 7 && col("event_type") === "click")
      .agg(max_by(col("value"), col("ts")), max(col("ts"))).head
    assert(v === ref.getDouble(0) && ts === ref.getTimestamp(1))
    assert(store.latest(999999L, "click").isEmpty)
  }

  test("insert() appends new points visible to subsequent reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store-ins").toString
    val st = GraftStore.create(spark, dir,
      Tables.events(spark, sfDir).limit(100), seriesBuckets = 2)
    val before = st.table.count()
    val extra = Seq((9999999L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
                     7L, "click", 123.45, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    st.insert(extra, seriesBuckets = 2)
    assert(st.table.count() === before + 1)
    val (ts, v) = st.latest(7L, "click").get
    assert(v === 123.45 && ts === java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
  }

  test("retention drops old days from the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-ret").toString
    val st = GraftStore.create(spark, dir, Tables.events(spark, sfDir), seriesBuckets = 2)
    val dropped = st.dropDaysBefore("2024-01-10")
    assert(dropped.nonEmpty)
    assert(st.table.filter(col("day") < "2024-01-10").count() === 0)
    assert(st.table.filter(col("day") >= "2024-01-10").count() > 0)
  }
}
