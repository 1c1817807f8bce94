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

  test("ST23 M4 downsample under RocksDB == x111 batch contract") {
    withProductionStateStore {
      runToMemory(StreamOps.m4Downsample(StreamOps.eventsStream(spark, sfDir)),
                  "rdb_st23", mode = "complete")
    }
    val hourUs = 3600L * 1000000L
    val stream = spark.table("rdb_st23")
      .withColumn("hr", expr(s"unix_micros(window.start) div $hourUs"))
      .select(col("event_type"), col("hr"), col("n"), col("v_min"), col("v_max"),
        col("v_first"), col("v_last"))
    val batch = graft.operators.TimeSeriesOps.x111M4(spark, sfDir)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
    // except() is distinct-based — the count equality closes the
    // duplicate-row divergence hole (matches StreamingSpec's ST23 check)
    assert(stream.count() === batch.count())
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
    // deterministic on ts ties: both sides break equal-ts points by value
    // (window orders by (ts, value) desc; batch max_by keys on the same
    // struct) — without the tiebreak a duplicate-ts fixture would make the
    // comparison arbitrary on each side
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("value").desc)
    val streamLatest = spark.table("rdb_st8")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
    val batchLatest = batchEvents.groupBy("user_id", "event_type")
      .agg(max_by(col("value"), struct(col("ts"), col("value"))).as("value"))
    assert(streamLatest.except(batchLatest).isEmpty && batchLatest.except(streamLatest).isEmpty)
  }

  // Texts for the ST10 TTL tests: identical texts are CERTAIN candidates
  // (identical MinHash signatures share every band key); tOther is a
  // disjoint vocabulary, never a candidate.
  private val tDup   = (1 to 12).map(i => s"w$i").mkString(" ")
  private val tOther = (1 to 12).map(i => s"z$i").mkString(" ")

  // NOTE on the run protocol: with a TTL the processor runs in
  // TimeMode.ProcessingTime, where a stateful query schedules no-data
  // batches FOREVER to expire state — `shouldRunAnotherBatch` is
  // unconditionally true, so processAllAvailable never observes quiescence
  // and even Trigger.AvailableNow never terminates (both verified by
  // hanging). The only sane wait is: paced processing-time trigger, poll
  // lastProgress until the source's target offset has committed, then
  // stop() — exactly how a production job supervises such a query.

  /** Wait until `q` has committed its source through `target`, then stop. */
  private def drainTo(q: org.apache.spark.sql.streaming.StreamingQuery,
                      target: Long): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    def done: Boolean = Option(q.lastProgress).exists { p =>
      p.sources.nonEmpty && Option(p.sources(0).endOffset).exists(_.toLong >= target)
    }
    while (!done && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(done, s"stream did not commit offset $target in time")
    q.stop()
    q.awaitTermination()
  }

  private val paced = Trigger.ProcessingTime("100 milliseconds")

  test("ST10 TTL under RocksDB: expired bucket members stop producing candidates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withProductionStateStore {
      val ckpt = java.nio.file.Files.createTempDirectory("st10-ttl-ckpt").toString
      // file sink, not memory: the memory sink refuses checkpoint recovery,
      // and the restart across the expiry gap is the point of this test
      val out = java.nio.file.Files.createTempDirectory("st10-ttl-out").toString
      val input = MemoryStream[(Long, String)]
      def start() = StreamOps.nearDupCandidates(
          input.toDF().toDF("doc_id", "text"),
          ttl = Some(java.time.Duration.ofSeconds(1))).toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(paced).start()
      def pairsSoFar(): Set[(Long, Long)] =
        spark.read.schema("id_a LONG, id_b LONG, band INT")
          .parquet(out).select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
      val off1 = input.addData((1L, tDup), (2L, tDup))
      drainTo(start(), off1.json.toLong)
      // both docs live in the same run: the pair surfaces
      assert(pairsSoFar() == Set((1L, 2L)), s"live members must pair: ${pairsSoFar()}")
      Thread.sleep(3000) // 3 s > 1 s TTL: the bucket members expire
      val off2 = input.addData((3L, tDup))
      drainTo(start(), off2.json.toLong) // restart from the checkpoint
      // doc 3 is byte-identical to 1 and 2 — without expiry run 2 would
      // append (1,3) and (2,3); TTL must have aged both out of the state
      assert(pairsSoFar() == Set((1L, 2L)),
        s"expired members still pairing: ${pairsSoFar()}")
    }
  }

  test("ST26 idle retirement under RocksDB: retired keys drop ALL state; a return restarts the fold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ev(u: Long, id: Long, hhmm: String) =
      StreamOps.SessEvent(u, id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 0.0)
    withProductionStateStore {
      // --- with retirement (event-time timers; TTLConfig is
      // processing-time-only, so ST26 retires via the watermark) ---
      val input = MemoryStream[StreamOps.SessEvent]
      val q = StreamOps.intervalCoverage(input.toDS(), watermarkDelay = "1 hour",
          idleRetirement = Some(java.time.Duration.ofHours(2))).toDF()
        .writeStream.format("memory").queryName("rdb_st26_ret")
        .outputMode("append").start()
      // user 1: two disjoint intervals in one batch -> snapshot n_iv=2
      input.addData(ev(1, 1, "00:00"), ev(1, 2, "00:08")); q.processAllAvailable()
      // clock carriers march the watermark; user 1's latest end is 00:13,
      // so its retire timer (00:13 + 2h = 02:13) fires once the
      // watermark passes it
      input.addData(ev(2, 3, "09:00")); q.processAllAvailable() // wm -> 08:00 next batch
      // long replay: a one-shot user per batch, each retiring as the
      // clock moves on — the open-ended key space ST26 must bound
      (0 until 8).foreach { i =>
        input.addData(ev(100L + i, 10L + i, f"${10 + i}%02d:00"))
        q.processAllAvailable()
      }
      // user 1 (retired at wm 08:00) and user 100 (retired later) return:
      // base was DROPPED, so each fold restarts at n_iv = 1 with only the
      // fresh 5-minute interval — proof the retired keys held zero state
      input.addData(ev(1, 90, "18:00"), ev(100, 91, "18:00")); q.processAllAvailable()
      q.stop()
      val ret = spark.table("rdb_st26_ret")
        .select("user_id", "n_iv", "n_spans", "covered_s")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(ret.contains((1L, 2L, 2L, 600L)), s"pre-retirement snapshot lost: $ret")
      assert(ret.contains((1L, 1L, 1L, 300L)),
        s"user 1's return must RESTART (state dropped on retirement): $ret")
      assert(ret.contains((100L, 1L, 1L, 300L)),
        s"one-shot user 100's return must restart too: $ret")
      assert(!ret.exists(r => r._1 == 1L && r._2 == 3L),
        s"retired user continued its old fold — state survived retirement: $ret")

      // --- same input WITHOUT retirement: the fold must CONTINUE (the
      // default keeps full history; retirement is the opt-in trade) ---
      val input2 = MemoryStream[StreamOps.SessEvent]
      val q2 = StreamOps.intervalCoverage(input2.toDS(), watermarkDelay = "1 hour").toDF()
        .writeStream.format("memory").queryName("rdb_st26_noret")
        .outputMode("append").start()
      input2.addData(ev(1, 1, "00:00"), ev(1, 2, "00:08")); q2.processAllAvailable()
      input2.addData(ev(2, 3, "09:00")); q2.processAllAvailable()
      input2.addData(ev(1, 90, "18:00")); q2.processAllAvailable()
      q2.stop()
      val noRet = spark.table("rdb_st26_noret")
        .select("user_id", "n_iv", "n_spans", "covered_s")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(noRet.contains((1L, 3L, 3L, 900L)),
        s"without retirement the fold must continue across the idle gap: $noRet")
    }
  }

  test("ST10 TTL under RocksDB: candidates within the live window equal the batch set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val fixture = Seq((1L, tDup), (2L, tDup), (10L, tOther), (3L, tDup), (11L, tOther))
    withProductionStateStore {
      val input = MemoryStream[(Long, String)]
      input.addData(fixture.take(3))
      val off = input.addData(fixture.drop(3))
      val q = StreamOps.nearDupCandidates(
          input.toDF().toDF("doc_id", "text"),
          ttl = Some(java.time.Duration.ofHours(1))).toDF()
        .writeStream.format("memory").queryName("rdb_st10_live")
        .outputMode("append").trigger(paced).start()
      drainTo(q, off.json.toLong)
    }
    val streamed = spark.table("rdb_st10_live").select("id_a", "id_b").distinct()
    val batch = graft.functions.MinHashLSH.candidatePairs(
      fixture.toDF("doc_id", "text")
        .select(col("doc_id").as("id"), split(col("text"), " ").as("toks")))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
           "TTL-bounded stream diverged from batch within the retention window")
  }
}
