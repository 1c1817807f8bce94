package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Point
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SURVEY §2.9 hardening: the state-backed streaming family re-run under
  * the PRODUCTION state store ([[GraftSession.streamingStateConfs]]:
  * RocksDB provider + changelog checkpointing).
  *
  * The transformWithState processors (ST8b/ST9/ST9b/ST10/ST11/ST11b in
  * StreamingSpec) already REQUIRE RocksDB and run under it there; this
  * suite closes the remaining gap — the windowed-agg / watermark-dedup /
  * FMGWS operators StreamingSpec exercises on the default (HDFS-backed
  * in-memory) provider — asserting the SAME stream-vs-batch equivalences
  * hold when state lives in RocksDB, so switching providers at 100 TB is a
  * pure capacity decision, never a semantics change. */
class RocksDbStateSpec extends SparkSpecBase {

  private def withProductionStateStore[T](body: => T): T = {
    val prior = GraftSession.streamingStateConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    GraftSession.streamingStateConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def batchEvents = Tables.events(spark, sfDir)

  test("tumbling window agg under RocksDB == batch") {
    withProductionStateStore {
      runToMemory(StreamOps.tumblingCounts(StreamOps.eventsStream(spark, sfDir)),
                  "rdb_st2", mode = "complete")
    }
    val stream = spark.table("rdb_st2")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("session window under RocksDB == batch") {
    withProductionStateStore {
      runToMemory(StreamOps.sessionCounts(StreamOps.eventsStream(spark, sfDir)),
                  "rdb_st4", mode = "complete")
    }
    val stream = spark.table("rdb_st4").select(col("user_id"), col("n"))
    val batch = batchEvents.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n")).select(col("user_id"), col("n"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("watermark dedup under RocksDB drops replayed ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withProductionStateStore {
      val input = MemoryStream[Point]
      val dedup = input.toDF()
        .withColumn("event_id", col("user_id") * 1000 + col("value").cast("long"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
      val q = dedup.writeStream.format("memory").queryName("rdb_st6")
        .outputMode("append").start()
      val p = Point(1L, "click", Timestamp.valueOf("2024-01-01 00:10:00"), 7.0)
      input.addData(p, p)
      q.processAllAvailable()
      input.addData(p) // replay in a later batch, still within watermark
      q.processAllAvailable()
      q.stop()
    }
    assert(spark.table("rdb_st6").count() === 1)
  }

  test("FMGWS latest-point cache under RocksDB converges to batch max_by") {
    import spark.implicits._
    withProductionStateStore {
      val src = StreamOps.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("ts"), col("value")).as[Point]
      val q = StreamOps.latestPointCache(src).toDF()
        .writeStream.format("memory").queryName("rdb_st8").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts").desc)
    val streamLatest = spark.table("rdb_st8")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
    val batchLatest = batchEvents.groupBy("user_id", "event_type")
      .agg(max_by(col("value"), col("ts")).as("value"))
    assert(streamLatest.except(batchLatest).isEmpty && batchLatest.except(streamLatest).isEmpty)
  }
}
