package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{LatestPoint, Point}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** A second-deployment CDC row: the v1 [[StreamOps.DocChange]] schema plus
  * a column the store has never seen (top-level so its product Encoder
  * resolves cleanly). */
case class DocChangeV2(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long, quality: Long, op: String)

/** SURVEY §2.9 ST1–ST8: every streaming op is checked for stream-vs-batch
  * equivalence (the Structured Streaming unification guarantee is the test
  * oracle), plus WAL-style exactly-once replay and watermark late-drop. */
class StreamingSpec extends SparkSpecBase {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def batchEvents = Tables.events(spark, sfDir)

  test("ST1 ingest: day-bucketed sink equals batch; checkpoint replay is exactly-once") {
    val sink = tmp("sink"); val ckpt = tmp("ckpt")
    StreamOps.ingest(spark, sfDir, sink, ckpt).awaitTermination()
    val sunk = spark.read.parquet(sink)
    val batch = batchEvents
    assert(sunk.count() === batch.count())
    val (s1, s2) = (sunk.agg(sum("value")).head.getDouble(0),
                    batch.agg(sum("value")).head.getDouble(0))
    assert(math.abs(s1 - s2) / math.max(1.0, math.abs(s2)) < 1e-9) // double-sum order differs
    assert(sunk.select("day").distinct().count() === batch.select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count())
    // restart with the same checkpoint: offsets already committed → no dup rows
    StreamOps.ingest(spark, sfDir, sink, ckpt).awaitTermination()
    assert(spark.read.parquet(sink).count() === batch.count())
  }

  test("ST1c crash between sink file write and commit: restart has no dup/loss") {
    import org.apache.hadoop.fs.Path
    val sink = tmp("sink"); val ckpt = tmp("ckpt")
    StreamOps.ingest(spark, sfDir, sink, ckpt).awaitTermination()
    val expected = batchEvents.count()
    assert(spark.read.parquet(sink).count() === expected)
    // inject the crash the offset/commit protocol exists for: the sink wrote
    // its batch data files, but neither the sink manifest commit nor the
    // checkpoint commit landed — delete the last batch's marker from BOTH
    // logs, leaving that batch's data files orphaned on disk
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val lastBatch = fs.listStatus(new Path(s"$ckpt/commits")).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(fs.delete(new Path(s"$ckpt/commits/$lastBatch"), false))
    assert(fs.delete(new Path(s"$sink/_spark_metadata/$lastBatch"), false))
    // restart with the same checkpoint: the offset log still names the
    // batch, the commit log doesn't → the batch REPLAYS and writes fresh
    // files alongside the orphans, then commits the manifest
    StreamOps.ingest(spark, sfDir, sink, ckpt).awaitTermination()
    // physically the directory now holds orphans + replay copies…
    val physical = fs.listStatus(new Path(sink)).map(_.getPath)
      .filter(_.getName.startsWith("day="))
      .map(p => spark.read.parquet(p.toString).count()).sum
    assert(physical > expected, "injection left no orphan files — nothing was tested")
    // …but the manifest-honoring read is exactly-once: no dup, no loss
    val recovered = spark.read.parquet(sink)
    assert(recovered.count() === expected)
    val (s1, s2) = (recovered.agg(sum("value")).head.getDouble(0),
                    batchEvents.agg(sum("value")).head.getDouble(0))
    assert(math.abs(s1 - s2) / math.max(1.0, math.abs(s2)) < 1e-9)
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "complete"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("ST2 tumbling window agg: stream == batch") {
    runToMemory(StreamOps.tumblingCounts(StreamOps.eventsStream(spark, sfDir)), "st2")
    val stream = spark.table("st2")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("ST3 sliding window: stream == batch") {
    runToMemory(StreamOps.slidingCounts(StreamOps.eventsStream(spark, sfDir)), "st3")
    val stream = spark.table("st3").select(col("window.start").as("ws"), col("n"))
    val batch = batchEvents.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n")).select(col("window.start").as("ws"), col("n"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("ST23 continuous M4 downsample: stream == x111's batch contract") {
    runToMemory(StreamOps.m4Downsample(StreamOps.eventsStream(spark, sfDir)), "st23")
    val hourUs = 3600L * 1000000L
    val stream = spark.table("st23")
      .withColumn("hr", expr(s"unix_micros(window.start) div $hourUs"))
      .select(col("event_type"), col("hr"), col("n"), col("v_min"), col("v_max"),
        col("v_first"), col("v_last"))
    val batch = graft.operators.TimeSeriesOps.x111M4(spark, sfDir)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
    assert(stream.count() === batch.count())
  }

  test("ST4 session window: stream == batch") {
    runToMemory(StreamOps.sessionCounts(StreamOps.eventsStream(spark, sfDir)), "st4")
    val stream = spark.table("st4").select(col("user_id"), col("n"))
    val batch = batchEvents.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n")).select(col("user_id"), col("n"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("ST5 watermark drops late data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Point]
    val agg = input.toDF().withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("st5").outputMode("update").start()
    def pt(hhmm: String) = Point(1L, "click", Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1.0)
    input.addData(pt("00:10"), pt("00:20"))
    q.processAllAvailable()
    input.addData(pt("03:00")) // advances watermark to 02:00
    q.processAllAvailable()
    input.addData(pt("00:30")) // late: window [00:00,01:00) is < watermark → dropped
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("st5").filter(col("window.start") === lit("2024-01-01 00:00:00").cast("timestamp"))
      .select("n").collect().map(_.getLong(0))
    assert(w0.nonEmpty && w0.max === 2, s"late row must not be counted, got ${w0.mkString(",")}")
  }

  test("ST6 dropDuplicatesWithinWatermark dedups replayed ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Point]
    val dedup = input.toDF()
      .withColumn("event_id", col("user_id") * 1000 + col("value").cast("long"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("st6").outputMode("append").start()
    val p = Point(1L, "click", Timestamp.valueOf("2024-01-01 00:10:00"), 7.0)
    input.addData(p, p)
    q.processAllAvailable()
    input.addData(p) // replay in a later batch, still within watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("st6").count() === 1)
  }

  test("ST7 stream-static join == batch join") {
    val dim = Tables.customer(spark, sfDir)
    runToMemory(
      StreamOps.streamStaticJoin(StreamOps.eventsStream(spark, sfDir), dim)
        .select("event_id", "c_name"),
      "st7", mode = "append")
    val batchN = StreamOps.streamStaticJoin(batchEvents, dim).count()
    assert(spark.table("st7").count() === batchN)
  }

  test("ST8 latest-point state cache converges to batch max_by") {
    import spark.implicits._
    val src = StreamOps.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("value")).as[Point]
    val q = StreamOps.latestPointCache(src).toDF()
      .writeStream.format("memory").queryName("st8").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last emission per key == batch latest point
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts").desc)
    val streamLatest = spark.table("st8")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
    val batchLatest = batchEvents.groupBy("user_id", "event_type")
      .agg(max_by(col("value"), col("ts")).as("value"))
    assert(streamLatest.except(batchLatest).isEmpty && batchLatest.except(streamLatest).isEmpty)
  }

  test("ST8b transformWithState latest-point cache converges to batch max_by") {
    import spark.implicits._
    // transformWithState needs the RocksDB provider (column families)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = StreamOps.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("ts"), col("value")).as[Point]
      val q = StreamOps.latestPointCacheTws(src).toDF()
        .writeStream.format("memory").queryName("st8b").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts").desc)
    val streamLatest = spark.table("st8b")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
    val batchLatest = batchEvents.groupBy("user_id", "event_type")
      .agg(max_by(col("value"), col("ts")).as("value"))
    assert(streamLatest.except(batchLatest).isEmpty && batchLatest.except(streamLatest).isEmpty)
  }

  test("ST14 streaming heavy hitters emit exactly the batch heavy set") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // batch reference: exact bigram counts at x49's N/800 threshold
      val grams = Tables.documents(spark, sfDir)
        .select(explode(graft.functions.TextExpressions.wordShingles(
          split(col("text"), " "), 2)).as("gram"))
      val thr = grams.count() / 800
      val batch = grams.groupBy("gram").count().filter(col("count") >= thr)
        .select("gram").collect().map(_.getString(0)).toSet
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      val q = StreamOps.heavyHitters(src, thr).toDF()
        .writeStream.format("memory").queryName("st14").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val emitted = spark.table("st14").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      assert(emitted.map(_._1).toSet === batch)
      assert(emitted.length === batch.size, "a gram was emitted more than once")
      assert(emitted.forall(_._2 >= thr), "crossing-time count below threshold")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST14 emits once even when the crossing spans micro-batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[String]
      val docs = input.toDF().withColumnRenamed("value", "text")
      val q = StreamOps.heavyHitters(docs, 3L).toDF()
        .writeStream.format("memory").queryName("st14b").outputMode("append").start()
      input.addData("a b a b")  // bigrams: "a b"=2, "b a"=1
      q.processAllAvailable()
      input.addData("a b a b")  // "a b"=4 crosses 3 here; "b a"=2
      q.processAllAvailable()
      input.addData("b a b a")  // "b a"=4 crosses; "a b"=5 must NOT re-emit
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("st14b").collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      assert(rows.toSeq === Seq("a b" -> 4L, "b a" -> 4L))
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST10 streaming near-dup candidates equal the batch candidate set") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      val q = StreamOps.nearDupCandidates(src).toDF()
        .writeStream.format("memory").queryName("st10").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
    // a pair may surface from several band buckets in the stream; the batch
    // plan's first-match dedup makes each pair unique — compare as SETS
    val streamed = spark.table("st10").select("id_a", "id_b").distinct()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
    val batch = graft.functions.MinHashLSH.candidatePairs(docs)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST9 streaming as-of enrichment equals the batch as-of join") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = StreamOps.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
        .as[StreamOps.AsOfEvent]
      val q = StreamOps.asOfEnrich(src, quoteType = "click", probeType = "error").toDF()
        .writeStream.format("memory").queryName("st9").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
    val streamed = spark.table("st9")
      .select(col("user_id"), col("event_id"), col("asof_value"))
    val clicks = batchEvents.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val errors = batchEvents.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val batch = graft.operators.AsOfJoin.lastBefore(errors, clicks,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        payload = Seq("value"), inclusive = true, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("asof_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST11 streaming sessionization equals batch x20 on closed sessions") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = StreamOps.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[StreamOps.SessEvent]
      val q = StreamOps.sessionize(src).toDF()
        .writeStream.format("memory").queryName("st11").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
    // the stream emits a session only when a later event CLOSES it, so the
    // batch comparison set is every session except each user's last; the
    // double sum accumulates in ts order streaming vs agg order in batch —
    // compare through the same 4-dp contract rounding as x20
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"), col("session"), col("n_events"), col("first_event"),
      col("duration_s"), graft.functions.Rounding.dround(col("sum_value"), 4).as("sv"))
    val streamed = canon(spark.table("st11"))
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val batch = canon(graft.operators.TimeSeriesOps.x20Sessionize(spark, sfDir)
      .withColumn("max_s", max("session").over(wLast))
      .filter(col("session") < col("max_s")))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key)
    }
  }

  test("ST11b timer-flushed sessionization equals ALL batch x20 rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val evs = batchEvents
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[StreamOps.SessEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      val maxTs = evs.map(_.ts.getTime).max
      val input = MemoryStream[StreamOps.SessEvent]
      val q = StreamOps.sessionizeWithTimers(input.toDS()).toDF()
        .writeStream.format("memory").queryName("st11b").outputMode("append").start()
      input.addData(evs.toSeq)
      q.processAllAvailable()
      // two sentinel batches walk the watermark past every real timer:
      // batch N's timers fire against the watermark from batch N-1's data
      def sentinel(offsetDays: Long) = StreamOps.SessEvent(-1L, -1L,
        new Timestamp(maxTs + offsetDays * 86400L * 1000L), 0.0)
      input.addData(sentinel(365))
      q.processAllAvailable()
      input.addData(sentinel(730))
      q.processAllAvailable()
      q.stop()
    }
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"), col("session"), col("n_events"), col("first_event"),
      col("duration_s"), graft.functions.Rounding.dround(col("sum_value"), 4).as("sv"))
    val streamed = canon(spark.table("st11b").filter(col("user_id") >= 0))
    val batch = canon(graft.operators.TimeSeriesOps.x20Sessionize(spark, sfDir))
    assert(streamed.count() === batch.count(),
      s"tail sessions not flushed: ${streamed.count()} vs ${batch.count()}")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST9b buffered as-of enrichment equals batch under shuffled arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val evs = batchEvents
        .filter(col("event_type").isin("click", "error"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
        .as[StreamOps.AsOfEvent].collect()
      // arbitrary cross-batch disorder, deterministic: shuffle then split
      val shuffled = new scala.util.Random(42).shuffle(evs.toVector)
      val maxTs = evs.map(_.ts.getTime).max
      val chunks = shuffled.grouped((shuffled.size + 2) / 3).toSeq
      val input = MemoryStream[StreamOps.AsOfEvent]
      // delay longer than the fixture's whole span: nothing is ever late,
      // so the buffered processor must reorder EVERYTHING correctly
      val q = StreamOps.asOfEnrichBuffered(input.toDS(), quoteType = "click",
          probeType = "error", watermarkDelay = "35 days").toDF()
        .writeStream.format("memory").queryName("st9b").outputMode("append").start()
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      // sentinel must survive the quote/probe filter (it precedes the
      // watermark) — a quote for the out-of-band user -1 emits nothing
      def sentinel(offsetDays: Long) = StreamOps.AsOfEvent(-1L, -1L,
        new Timestamp(maxTs + offsetDays * 86400L * 1000L), "click", 0.0)
      input.addData(sentinel(365)); q.processAllAvailable()
      input.addData(sentinel(730)); q.processAllAvailable()
      q.stop()
    }
    val streamed = spark.table("st9b")
      .select(col("user_id"), col("event_id"), col("asof_value"))
    val clicks = batchEvents.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val errors = batchEvents.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val batch = graft.operators.AsOfJoin.lastBefore(errors, clicks,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        payload = Seq("value"), inclusive = true, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("asof_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST16 stream-stream interval join equals the batch interval join") {
    val src = StreamOps.eventsStream(spark, sfDir)
    val q = StreamOps.attributionJoin(src).writeStream.format("memory")
      .queryName("st16").outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("st16").select("purchase_id", "click_id")
    val p = batchEvents.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = batchEvents.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("user_id") === col("c_user") && col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 hours"))
      .select("purchase_id", "click_id")
    assert(streamed.count() > 0, "fixture must produce at least one attribution pair")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST17 streaming CDC apply: the store converges to the new snapshot; replay is a no-op") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val oldSnap = docs.filter(col("doc_id") % 10 =!= 1)
    val newSnap = docs.filter(col("doc_id") % 10 =!= 2)
      .withColumn("text", when(col("doc_id") % 10 === 3,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .withColumn("n_chars", when(col("doc_id") % 10 === 3,
        col("n_chars") + 5).otherwise(col("n_chars")))
    val storeDir = tmp("mergestore")
    graft.sources.MergeStore.write(oldSnap, storeDir, buckets = 8)
    def changeRow(r: org.apache.spark.sql.Row, op: String) = StreamOps.DocChange(
      r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4), op)
    val upserts = newSnap.filter(col("doc_id") % 10 === 1 || col("doc_id") % 10 === 3)
      .collect().map(changeRow(_, "upsert"))
    val deletes = docs.filter(col("doc_id") % 10 === 2)
      .collect().map(changeRow(_, "delete"))
    val input = MemoryStream[StreamOps.DocChange]
    val q = StreamOps.mergeIngest(input.toDF(), storeDir, tmp("ckpt"))
    // the diff arrives as three micro-batches in arbitrary op order
    val all = (upserts ++ deletes).sortBy(_.doc_id)
    all.grouped((all.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    // crash-replay simulation: re-apply the final chunk's content once more
    input.addData(all.takeRight(5).toSeq); q.processAllAvailable()
    q.stop()
    val got = graft.sources.MergeStore.read(spark, storeDir)
    assert(got.count() === newSnap.count())
    assert(got.except(newSnap).isEmpty && newSnap.except(got).isEmpty)
  }

  test("ST18 continuous rollup maintenance: store equals batch build; sealed days never rewrite") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rawSink = tmp("raw"); val rollupDir = tmp("rollup")
    val all = Tables.eventsDs(spark, sfDir).collect().sortBy(e => (e.ts.getTime, e.event_id))
    val dayOf = (e: Event) => e.ts.getTime / 86400000L
    val days = all.map(dayOf).distinct.sorted
    // chunk in day order: chunk 1 = first third of days, etc., so early
    // days are SEALED when later chunks stream
    val cut1 = days(days.length / 3); val cut2 = days(2 * days.length / 3)
    val chunks = Seq(all.filter(dayOf(_) < cut1), all.filter(e => dayOf(e) >= cut1 && dayOf(e) < cut2),
      all.filter(dayOf(_) >= cut2))
    val input = MemoryStream[Event]
    val q = StreamOps.rollupIngest(input.toDF(), rawSink, rollupDir, tmp("ckpt"))
    def hourListing() = {
      val d = new java.io.File(s"$rollupDir/hour")
      if (!d.exists()) Map.empty[String, Seq[String]]
      else d.listFiles().filter(_.getName.startsWith("day=")).map(p =>
        p.getName -> p.listFiles().map(f => s"${f.getName}:${f.lastModified()}").toSeq.sorted).toMap
    }
    input.addData(chunks(0).toSeq); q.processAllAvailable()
    input.addData(chunks(1).toSeq); q.processAllAvailable()
    val afterTwo = hourListing()
    input.addData(chunks(2).toSeq); q.processAllAvailable()
    q.stop()
    val afterThree = hourListing()
    // sealed days (chunk 1's) byte-identical after chunk 3 streamed
    val sealedDays = afterTwo.keys.filter(k => k.stripPrefix("day=").toLong < cut1)
    assert(sealedDays.nonEmpty)
    sealedDays.foreach { k => assert(afterThree(k) === afterTwo(k), s"sealed $k rewritten") }
    // final store equals the batch build over the full corpus
    val refDir = tmp("rollupref")
    graft.sources.RollupStore.build(Tables.events(spark, sfDir), refDir)
    def canon(dir: String, res: String) = spark.read.parquet(s"$dir/$res")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Long]("cnt"), math.rint(r.getAs[Double]("s") * 1e6),
        r.getAs[Double]("mn"), r.getAs[Double]("mx"))).sortBy(t => (t._1, t._2))
    assert(canon(rollupDir, "hour") === canon(refDir, "hour"))
    assert(canon(rollupDir, "day") === canon(refDir, "day"))
    // and the router over the streamed store matches the direct scan
    val t0 = java.time.Instant.parse("2024-01-05T00:30:10Z").toEpochMilli * 1000L
    val t1 = java.time.Instant.parse("2024-01-20T07:45:00Z").toEpochMilli * 1000L
    val routed = operators.TimeSeriesOps.rangeContract(
      graft.sources.RollupStore.rangeAgg(spark, rollupDir,
        Tables.events(spark, sfDir), t0, t1)).collect().toSeq
    val direct = operators.TimeSeriesOps.rangeContract(
      graft.sources.RollupStore.directAgg(
        Tables.events(spark, sfDir), t0, t1)).collect().toSeq
    assert(routed === direct)
  }

  test("ST18b late event re-derives ONLY its day; still equals batch build") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rawSink = tmp("raw"); val rollupDir = tmp("rollup")
    val all = Tables.eventsDs(spark, sfDir).collect()
    // hold back one mid-corpus event; stream everything else first
    val held = all.minBy(e => (math.abs(e.ts.getTime - all.map(_.ts.getTime).sorted.apply(all.length / 2)), e.event_id))
    val rest = all.filterNot(_.event_id == held.event_id)
    val input = MemoryStream[Event]
    val q = StreamOps.rollupIngest(input.toDF(), rawSink, rollupDir, tmp("ckpt"))
    input.addData(rest.toSeq); q.processAllAvailable()
    def listing() = new java.io.File(s"$rollupDir/hour").listFiles()
      .filter(_.getName.startsWith("day=")).map(p =>
        p.getName -> p.listFiles().map(f => s"${f.getName}:${f.lastModified()}").toSeq.sorted).toMap
    val before = listing()
    val heldDay = s"day=${held.ts.getTime / 86400000L}"
    input.addData(held); q.processAllAvailable() // the straggler arrives
    q.stop()
    val after = listing()
    assert(after(heldDay) !== before(heldDay), "late event's day must refresh")
    (before.keySet - heldDay).foreach { k =>
      assert(after(k) === before(k), s"unrelated day $k rewritten by a late event")
    }
    // and the store equals the batch build over the FULL corpus
    val refDir = tmp("rollupref")
    graft.sources.RollupStore.build(Tables.events(spark, sfDir), refDir)
    def canon(dir: String) = spark.read.parquet(s"$dir/hour")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Long]("cnt"), math.rint(r.getAs[Double]("s") * 1e6))).sortBy(t => (t._1, t._2))
    assert(canon(rollupDir) === canon(refDir))
  }

  test("ST19 versioned CDC: one atomic version per batch; replay moves the counter, not the data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val oldSnap = docs.filter(col("doc_id") % 10 =!= 1)
    val newSnap = docs.filter(col("doc_id") % 10 =!= 2)
      .withColumn("text", when(col("doc_id") % 10 === 3,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .withColumn("n_chars", when(col("doc_id") % 10 === 3,
        col("n_chars") + 5).otherwise(col("n_chars")))
    val storeDir = tmp("vstore")
    val store = new graft.sources.VersionedStore(spark, storeDir)
    store.write(oldSnap, nBuckets = 8)
    def changeRow(r: org.apache.spark.sql.Row, op: String) = StreamOps.DocChange(
      r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4), op)
    val ups = newSnap.filter(col("doc_id") % 10 === 1 || col("doc_id") % 10 === 3)
      .collect().map(changeRow(_, "upsert"))
    val dels = docs.filter(col("doc_id") % 10 === 2).collect().map(changeRow(_, "delete"))
    val all = (ups ++ dels).sortBy(_.doc_id)
    val input = MemoryStream[StreamOps.DocChange]
    val q = StreamOps.versionedIngest(input.toDF(), storeDir, tmp("ckpt"))
    val chunks = all.grouped((all.length + 1) / 2).toSeq
    chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    val vAfter = store.currentVersion
    assert(vAfter === chunks.length.toLong, s"one version per batch, got $vAfter")
    assert(store.read().count() === newSnap.count())
    assert(store.read().except(newSnap).isEmpty && newSnap.except(store.read()).isEmpty)
    // crash-replay: the last chunk re-arrives → a NEW version, SAME content
    input.addData(chunks.last.toSeq); q.processAllAvailable()
    q.stop()
    assert(store.currentVersion === vAfter + 1)
    assert(store.read().except(store.read(Some(vAfter))).isEmpty &&
           store.read(Some(vAfter)).except(store.read()).isEmpty)
  }

  test("ST19 schema evolution across deployments: a new-column CDC stream upgrades the store") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val storeDir = tmp("vstore2")
    val store = new graft.sources.VersionedStore(spark, storeDir)
    store.write(docs, nBuckets = 8)
    // deployment 2: the CDC producer ships a column the store predates —
    // versionedIngest's merge path must widen the schema, null-fill the
    // untouched residents, and keep v0's time-travel shape
    def v2Row(r: org.apache.spark.sql.Row) = DocChangeV2(
      r.getLong(0), r.getString(1) + " rev2", r.getString(2), r.getString(3),
      r.getLong(4), r.getLong(0) % 7, "upsert")
    val ups = docs.filter(col("doc_id") % 10 === 5).collect().map(v2Row)
    val input = MemoryStream[DocChangeV2]
    val q = StreamOps.versionedIngest(input.toDF(), storeDir, tmp("ckpt2"))
    input.addData(ups.toSeq); q.processAllAvailable(); q.stop()
    val r = store.read()
    assert(r.columns.contains("quality"), "CDC-shipped column missing from store schema")
    assert(r.filter(col("doc_id") % 10 === 5 && col("quality").isNull).count() === 0,
      "upserted rows lost their new-column values")
    assert(r.filter(col("doc_id") % 10 =!= 5 && col("quality").isNotNull).count() === 0,
      "untouched residents must null-fill the new column")
    assert(r.count() === docs.count())
    assert(!store.read(Some(0L)).columns.contains("quality"),
      "v0 must keep its committed shape")
  }

  test("ST27 continuous postings ingest: sink-served BM25 equals declared x83; replay adds nothing") {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    def src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val idx = tmp("pidx"); val ck = tmp("pck")
    StreamOps.postingsIngest(src, idx, ck).awaitTermination()
    val served = StreamOps.bm25FromSink(spark, idx, Seq("hash", "join", "filter"))
    val declared = operators.TextOps.x83Bm25(spark, sfDir)
    assert(served.count() === declared.count())
    assert(served.except(declared).isEmpty && declared.except(served).isEmpty)
    // exactly-once: re-running the finished checkpoint commits nothing new
    val n0 = spark.read.parquet(s"$idx/postings").count()
    StreamOps.postingsIngest(src, idx, ck).awaitTermination()
    assert(spark.read.parquet(s"$idx/postings").count() === n0,
      "file-sink manifest must make replay exactly-once")
  }

  test("ST16b interval-join state eviction: a click behind the watermark never joins") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamOps.AsOfEvent]
    val joined = StreamOps.attributionJoin(input.toDF(), window = "1 hour", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("st16b").outputMode("append").start()
    def ev(id: Long, typ: String, hhmm: String) =
      StreamOps.AsOfEvent(1L, id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), typ, 1.0)
    input.addData(ev(1, "purchase", "01:00"), ev(2, "click", "00:30"))
    q.processAllAvailable()
    assert(spark.table("st16b").count() === 1) // the in-window click joins
    // advance BOTH sides' watermarks far past the first purchase's window
    // (no new pair: the 20:00 purchase's window [19:00, 20:00] is empty)
    input.addData(ev(3, "click", "09:00"), ev(4, "purchase", "20:00"))
    q.processAllAvailable()
    // a click inside the FIRST purchase's window, arriving after the click
    // watermark (08:00) passed it: dropped as late, and the purchase's
    // buffered state is past its provable-match horizon — no new row
    input.addData(ev(5, "click", "00:40"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st16b").select("click_id").as[Long].collect().toSet
    assert(got === Set(2L), s"late click must not produce a join row, got $got")
  }

  /** The batch reference for ST20: the identical integer predicate over
    * EXCLUSIVE prefix moments per (user_id, event_type) in (ts, event_id)
    * order. */
  private def batchAnomalyFlags(minN: Long, lambda2: Long): Set[Long] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    batchEvents
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", coalesce(sum("cents").over(w), lit(0L)))
      .withColumn("q", coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .filter(col("n") >= minN)
      .filter(col("n") * col("q") - col("s") * col("s") > 0)
      // exact decimal arithmetic — dev² would overrun double's 2^53 on
      // long full-range series, and the stream side is BigInt-exact
      .withColumn("dev", (col("cents") * col("n") - col("s")).cast("decimal(38,0)"))
      .withColumn("d", (col("n") * col("q") - col("s") * col("s")).cast("decimal(38,0)"))
      .filter(col("dev") * col("dev") * (col("n") - 1).cast("decimal(38,0)")
        >= lit(lambda2).cast("decimal(38,0)") * col("n").cast("decimal(38,0)") * col("d"))
      .select("event_id").collect().map(_.getLong(0)).toSet
  }

  test("ST20 streaming anomaly flags equal the batch prefix z-score gate") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val expect = batchAnomalyFlags(8L, 9L)
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src = Tables.normalizeTs(spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      val q = StreamOps.anomalyFlags(src).toDF()
        .writeStream.format("memory").queryName("st20").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("st20").select("event_id").as[Long].collect()
      assert(got.length === got.toSet.size, "a point was flagged twice")
      assert(got.toSet === expect)
      assert(expect.nonEmpty, "fixture produced no anomalies — test is vacuous")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST20 state carries moments across micro-batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Timestamp, Double)]
    val events = input.toDF()
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val q = StreamOps.anomalyFlags(events, minN = 4L, lambda2 = 9L).toDF()
      .writeStream.format("memory").queryName("st20b").outputMode("append").start()
    def p(id: Long, mm: Int, v: Double) =
      (7L, "click", id, Timestamp.valueOf(f"2024-01-01 10:$mm%02d:00"), v)
    // batch 1: a flat history — nothing flaggable yet (n < minN at each)
    input.addData(p(1, 1, 10.0), p(2, 2, 10.2), p(3, 3, 9.8), p(4, 4, 10.1))
    q.processAllAvailable()
    assert(spark.table("st20b").count() === 0)
    // batch 2: a wild point against the CARRIED 4-point history flags;
    // the follow-up normal point (history now includes the spike) does not
    input.addData(p(5, 5, 500.0), p(6, 6, 10.0))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("st20b").select("event_id").as[Long].collect().toSet
    assert(flagged === Set(5L), s"expected exactly the spike, got $flagged")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST21 windowed PSI over the live half reproduces x98's batch drift") {
    val mid = Timestamp.valueOf("2024-01-15 12:00:00")
    val ref = StreamOps.referenceHistogram(
      batchEvents.filter(col("ts") < lit(mid)))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val src = Tables.normalizeTs(spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .filter(col("ts") >= lit(mid))
    // align a 16-day window edge exactly to the reference boundary: the
    // single populated window [Jan 15 12:00, Jan 31 12:00) IS x98's live
    // half (fixture events end Jan 30)
    val off = (mid.getTime / 1000) % (16L * 86400L)
    runToMemory(StreamOps.driftHistogram(src, "16 days", s"$off seconds"), "st21")
    val psi = StreamOps.psiOfWindows(spark.table("st21"), ref)
      .select(col("event_type"), col("n_w"), col("psi"))
    val batch = operators.TimeSeriesOps.x98PsiDrift(spark, sfDir)
      .select(col("event_type"), col("n_b").as("n_w"), col("psi"))
    assert(psi.except(batch).isEmpty && batch.except(psi).isEmpty,
      s"stream PSI ${psi.collect().mkString(",")} vs batch ${batch.collect().mkString(",")}")
  }

  /** Batch reference for ST22: per-doc chunk spans from x102's prefixCum. */
  private def batchPackSpans: Set[(String, Long, Long, Long, Long)] =
    operators.TextOps.prefixCum(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tok")))
      .select(col("lang"), col("doc_id"),
        expr("(cum - n_tok) div 256").as("first_chunk"),
        expr("(cum - 1) div 256").as("last_chunk"), col("cum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("ST22 streaming pack assignments equal x102's batch chunk spans") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      val q = StreamOps.packAssignments(src).toDF()
        .writeStream.format("memory").queryName("st22").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("st22").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expect = batchPackSpans
      assert(expect.nonEmpty, "fixture produced no spans — test is vacuous")
      assert(got === expect)
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST22 running token total carries across micro-batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[(Long, String, String)]
      val docs = input.toDF().toDF("doc_id", "lang", "text")
      val q = StreamOps.packAssignments(docs, chunkTok = 10L).toDF()
        .writeStream.format("memory").queryName("st22b").outputMode("append").start()
      def doc(id: Long, n: Int) = (id, "en", Seq.fill(n)("w").mkString(" "))
      // batch 1: 7 + 6 tokens — doc 2 straddles the first 10-token boundary
      input.addData(doc(1, 7), doc(2, 6))
      q.processAllAvailable()
      // batch 2: 4 more tokens — must continue from cum=13, not restart
      input.addData(doc(3, 4))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st22b").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got === Set((1L, 0L, 0L, 7L), (2L, 0L, 1L, 13L), (3L, 1L, 1L, 17L)),
        s"spans drifted: $got")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST24 single-batch budget admission equals x122's prefix cut") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      val q = StreamOps.budgetAdmission(src).toDF()
        .writeStream.format("memory").queryName("st24").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // per-lang admitted count + final running total vs the declared cut
      val got = spark.table("st24")
        .groupBy("lang")
        .agg(sum(col("admitted").cast("long")).as("n_selected"),
          max(when(col("admitted"), col("tokens_used"))).as("tokens_used"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expect = operators.TextOps.x122BudgetCut(spark, sfDir)
        .select("lang", "n_selected", "tokens_used")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(expect.nonEmpty && got === expect, s"stream $got vs batch $expect")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST24 gate closes at first overflow and stays closed across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[(Long, String, String)]
      val docs = input.toDF().toDF("doc_id", "lang", "text")
      val q = StreamOps.budgetAdmission(docs, budget = 10L).toDF()
        .writeStream.format("memory").queryName("st24b").outputMode("append").start()
      def doc(id: Long, n: Int) = (id, "en", Seq.fill(n)("w").mkString(" "))
      input.addData(doc(1, 7), doc(2, 6)) // 7 admits; 6 overflows -> closed
      q.processAllAvailable()
      input.addData(doc(3, 2)) // would fit numerically; gate is closed
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st24b").collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
      assert(got === Set((1L, true, 7L), (2L, false, 7L), (3L, false, 7L)),
        s"gate drifted: $got")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST26 continuous interval coverage: final snapshots equal batch x66") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val src = StreamOps.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[StreamOps.SessEvent]
    val q = StreamOps.intervalCoverage(src).toDF()
      .writeStream.format("memory").queryName("st26").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // n_iv is strictly monotone per key, so the final snapshot is the
    // max-n_iv row; max(struct(...)) selects it without a window
    val stream = spark.table("st26")
      .groupBy("user_id")
      .agg(max(struct(col("n_iv"), col("n_spans"), col("covered_s"))).as("m"))
      .select(col("user_id"), col("m.n_spans").as("n_spans"),
        col("m.covered_s").as("covered_s"))
    val batch = graft.operators.TimeSeriesOps.x66IntervalUnion(spark, sfDir)
      .select(col("user_id"), col("n_spans"), col("covered_s"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
    assert(stream.count() === batch.count())
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST26 late interval bridges spans; union is replay-idempotent; sealed spans stay counted") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val input = MemoryStream[StreamOps.SessEvent]
    val q = StreamOps.intervalCoverage(input.toDS(), watermarkDelay = "1 hour").toDF()
      .writeStream.format("memory").queryName("st26b").outputMode("append").start()
    def ev(id: Long, hhmm: String) =
      StreamOps.SessEvent(7L, id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 0.0)
    // two disjoint 5-min intervals -> 2 spans, 600 s
    input.addData(ev(1, "00:00"), ev(2, "00:08")); q.processAllAvailable()
    // a LATE interval bridging both -> one span [00:00,00:13), 780 s
    input.addData(ev(3, "00:04")); q.processAllAvailable()
    // exact replay of an existing interval -> union no-op
    input.addData(ev(4, "00:08")); q.processAllAvailable()
    // far-future event opens a new span (watermark still behind: nothing sealed)
    input.addData(ev(5, "06:00")); q.processAllAvailable()
    // this batch runs with watermark 05:00 -> the old span SEALS; overlap extends the live one
    input.addData(ev(6, "06:04")); q.processAllAvailable()
    // post-seal growth: snapshot must still include the sealed span
    input.addData(ev(7, "06:08")); q.processAllAvailable()
    q.stop()
    val rows = spark.table("st26b").orderBy("n_iv").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((2L, 2L, 600L), (3L, 1L, 780L), (4L, 1L, 780L),
      (5L, 2L, 1080L), (6L, 2L, 1320L), (7L, 2L, 1560L)), s"got $rows")
    } finally {
      prior match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ST29 continuous pattern match equals batch x177 matches under shuffled arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val evs = batchEvents
        .filter(col("event_type").isin("view", "purchase", "error"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .as[StreamOps.CepEvent].collect()
      // the ST9b disorder discipline: full deterministic shuffle under a
      // delay longer than the fixture span — nothing is late, so the
      // buffered automaton must reorder EVERYTHING correctly
      val shuffled = new scala.util.Random(42).shuffle(evs.toVector)
      val maxTs = evs.map(_.ts.getTime).max
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.patternMatches(input.toDS(), watermarkDelay = "35 days").toDF()
        .writeStream.format("memory").queryName("st29").outputMode("append").start()
      shuffled.grouped((shuffled.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      // the ST11b sentinel discipline: two batches walk the watermark
      // past every buffered row and pending-view timer
      def sentinel(offsetDays: Long) = StreamOps.CepEvent(-1L, -1L,
        new Timestamp(maxTs + offsetDays * 86400L * 1000L), "error")
      input.addData(sentinel(365)); q.processAllAvailable()
      input.addData(sentinel(730)); q.processAllAvailable()
      q.stop()
    }
    // batch per-view match rows — x177's internals before its per-user fold
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val deadline = 6L * 3600L * 1000000L
    val m = batchEvents
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("np",
        min(when(col("event_type") === "purchase",
          struct(col("us"), col("event_id")))).over(w))
      .withColumn("ne", min(when(col("event_type") === "error", col("us"))).over(w))
    val batch = m.filter(col("event_type") === "view" && col("np").isNotNull
        && col("np.us") - col("us") <= deadline
        && (col("ne").isNull || col("ne") > col("np.us")))
      .select(col("user_id"), col("event_id").as("view_id"),
        col("us").as("view_us"), col("np.event_id").as("purchase_id"),
        (col("np.us") - col("us")).as("lat_us"))
    val streamed = spark.table("st29").filter(col("user_id") >= 0)
    assert(streamed.count() === batch.count(),
      s"match cardinality drifted: ${streamed.count()} vs ${batch.count()}")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST29 late error retroactively kills; deadline prunes; error clears pending") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.patternMatches(input.toDS()).toDF()
        .writeStream.format("memory").queryName("st29b").outputMode("append").start()
      def ev(u: Long, id: Long, hhmm: String, kind: String) = StreamOps.CepEvent(
        u, id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), kind)
      // user 7: purchase arrives FIRST; the error between view and purchase
      // arrives a batch later but inside the watermark delay — the match
      // must never be emitted (an in-arrival-order fold would emit it)
      input.addData(ev(7, 1, "00:00", "view"), ev(7, 3, "00:10", "purchase"))
      q.processAllAvailable()
      input.addData(ev(7, 2, "00:05", "error"))
      q.processAllAvailable()
      // user 8: two views share one resolving purchase (both match)
      input.addData(ev(8, 10, "00:00", "view"), ev(8, 12, "00:05", "view"),
        ev(8, 11, "00:30", "purchase"))
      // user 9: purchase beyond the 6 h deadline (no match)
      input.addData(ev(9, 20, "00:00", "view"), ev(9, 21, "07:00", "purchase"))
      // user 10: error clears the first view; the second survives to match
      input.addData(ev(10, 30, "00:00", "view"), ev(10, 31, "00:05", "error"),
        ev(10, 32, "00:06", "view"), ev(10, 33, "00:20", "purchase"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -1L,
        Timestamp.valueOf("2025-01-01 00:00:00"), "error"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -2L,
        Timestamp.valueOf("2026-01-01 00:00:00"), "error"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st29b").filter(col("user_id") >= 0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      assert(got === Set(
        (8L, 10L, 11L, 1800L * 1000000L),
        (8L, 12L, 11L, 1500L * 1000000L),
        (10L, 32L, 33L, 840L * 1000000L)), s"automaton drifted: $got")
    }
  }

  test("ST30 online FIFO queue equals x179's batch reflection pair-for-pair") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val evs = batchEvents
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .as[StreamOps.CepEvent].collect()
      val shuffled = new scala.util.Random(43).shuffle(evs.toVector)
      val maxTs = evs.map(_.ts.getTime).max
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.fifoMatches(input.toDS(), watermarkDelay = "35 days").toDF()
        .writeStream.format("memory").queryName("st30").outputMode("append").start()
      shuffled.grouped((shuffled.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      def sentinel(offsetDays: Long) = StreamOps.CepEvent(-1L, -1L,
        new Timestamp(maxTs + offsetDays * 86400L * 1000L), "view")
      input.addData(sentinel(365)); q.processAllAvailable()
      input.addData(sentinel(730)); q.processAllAvailable()
      q.stop()
    }
    val streamed = spark.table("st30").filter(col("user_id") >= 0)
    val batch = operators.TimeSeriesOps.x179Pairs(spark, sfDir)
    assert(streamed.count() === batch.count(),
      s"pair cardinality drifted: ${streamed.count()} vs ${batch.count()}")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("ST30 late view converts a wasted service into a match") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.fifoMatches(input.toDS()).toDF()
        .writeStream.format("memory").queryName("st30b").outputMode("append").start()
      def ev(id: Long, hhmm: String, kind: String) = StreamOps.CepEvent(
        7L, id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), kind)
      // arrival: v@00:00, p@00:05, p@00:06 (would be wasted), v@00:07
      input.addData(ev(1, "00:00", "view"), ev(2, "00:05", "purchase"),
        ev(3, "00:06", "purchase"), ev(4, "00:07", "view"))
      q.processAllAvailable()
      // LATE view at 00:02 (inside the delay): in event-time order the
      // queue is [v1, v5] at p2, so p3 now serves v5 — the wasted service
      // retroactively becomes a match. An arrival-order fold can't do this.
      input.addData(ev(5, "00:02", "view"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -1L,
        Timestamp.valueOf("2025-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -2L,
        Timestamp.valueOf("2026-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st30b").filter(col("user_id") >= 0).collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      assert(got === Set(
        (1L, 2L, 300L * 1000000L),
        (5L, 3L, 240L * 1000000L)), s"queue drifted: $got")
    }
  }

  /** The ST31 batch twin: the same deadline queue folded in plain Scala
    * over event-time-ordered rows — the reference both the hand case and
    * the fixture equivalence pin against (x179's closed form covers only
    * the unbounded-wait queue; the expiry rule breaks the reflection, so
    * the twin is a fold, cross-checked here rather than asserted). */
  private def deadlineFifoRef(evs: Seq[StreamOps.CepEvent], deadlineUs: Long)
      : Set[(Long, Long, Long, Long, Long, Boolean)] = {
    def us(ts: Timestamp): Long = // the processor's exact micros conversion
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    val out = Set.newBuilder[(Long, Long, Long, Long, Long, Boolean)]
    evs.groupBy(_.user_id).foreach { case (u, rows) =>
      var q = Vector.empty[(Long, Long)] // (us, view_id)
      rows.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
        val eus = us(e.ts)
        e.event_type match {
          case "view" => q :+= (eus, e.event_id)
          case "purchase" =>
            while (q.nonEmpty && q.head._1 + deadlineUs < eus) {
              out += ((u, q.head._2, q.head._1, -1L, deadlineUs, false)); q = q.tail
            }
            if (q.nonEmpty) {
              out += ((u, q.head._2, q.head._1, e.event_id, eus - q.head._1, true))
              q = q.tail
            }
          case _ => ()
        }
      }
      q.foreach(v => out += ((u, v._2, v._1, -1L, deadlineUs, false))) // wm → ∞
    }
    out.result()
  }

  test("ST31 deadline FIFO equals the reference fold over the fixture; " +
       "every view is emitted exactly once (state bound observable)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val deadline = 6L * 3600L * 1000000L
    val evs = batchEvents
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[StreamOps.CepEvent].collect()
    withRocksDb {
      val shuffled = new scala.util.Random(44).shuffle(evs.toVector)
      val maxTs = evs.map(_.ts.getTime).max
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.fifoMatchesDeadline(input.toDS(), deadline,
          watermarkDelay = "35 days").toDF()
        .writeStream.format("memory").queryName("st31").outputMode("append").start()
      shuffled.grouped((shuffled.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      def sentinel(offsetDays: Long) = StreamOps.CepEvent(-1L, -1L,
        new Timestamp(maxTs + offsetDays * 86400L * 1000L), "view")
      input.addData(sentinel(365)); q.processAllAvailable()
      input.addData(sentinel(730)); q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("st31").filter(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val ref = deadlineFifoRef(evs.toSeq, deadline)
    assert(got === ref, s"deadline queue drifted from the reference fold " +
      s"(got ${got.size} rows, ref ${ref.size})")
    // completeness = the state bound: every view resolved (served|expired),
    // none lingers in the queue past its deadline
    val allViews = evs.filter(_.event_type == "view")
      .map(e => (e.user_id, e.event_id)).toSet
    assert(got.map(t => (t._1, t._2)) === allViews,
      "some views never resolved — pending state is not deadline-bounded")
    assert(got.exists(!_._6) && got.exists(_._6),
      "fixture should produce both served and expired outcomes")
  }

  test("ST31 expired view never pairs; a purchase serves the oldest " +
       "surviving view; boundary wait == deadline still serves") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val deadline = 6L * 3600L * 1000000L
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.fifoMatchesDeadline(input.toDS(), deadline).toDF()
        .writeStream.format("memory").queryName("st31b").outputMode("append").start()
      def ev(id: Long, ts: String, kind: String) = StreamOps.CepEvent(
        7L, id, Timestamp.valueOf(s"2024-01-01 $ts"), kind)
      // v1@00:00 expires at 06:00; p2@07:00 must NOT serve it (ST30 would
      // pair them) — the queue is empty at p2, so p2 is wasted
      input.addData(ev(1, "00:00:00", "view"), ev(2, "07:00:00", "purchase"))
      q.processAllAvailable()
      // v3@07:30 + v4@07:31; p5@13:30 serves v3 at wait == deadline
      // EXACTLY (boundary inclusive); v4 expires at 13:31 unserved
      input.addData(ev(3, "07:30:00", "view"), ev(4, "07:31:00", "view"),
        ev(5, "13:30:00", "purchase"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -1L,
        Timestamp.valueOf("2025-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -2L,
        Timestamp.valueOf("2026-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st31b").filter(col("user_id") >= 0).collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got === Set(
        (1L, -1L, deadline, false),
        (3L, 5L, deadline, true),
        (4L, -1L, deadline, false)), s"deadline automaton drifted: $got")
    }
  }

  test("ST31 knife edge: boundary-inclusive expiry (us + deadline <= wm) is " +
       "FINAL because Spark late-drops equal-time rows (ts <= wm)") {
    // The apparent hazard: a purchase with event time EXACTLY equal to the
    // watermark would legally serve a boundary view at wait == deadline, so
    // expiring that view at us + deadline == wm looks premature. It is not:
    // Spark's late filter is LessThanOrEqual(eventTime, wm) (verified in
    // the 4.1.2 WatermarkSupport bytecode) — the equal-time purchase below
    // is dropped before the processor sees it, the boundary view is
    // genuinely unservable, and the <= expiry is exactly aligned. If a
    // Spark upgrade flips the late predicate to strict <, this test FAILS
    // (the purchase would arrive and serve) and the expiry rule must flip
    // to strict < with it — the coupling is the thing under test.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val deadline = 6L * 3600L * 1000000L
      val input = MemoryStream[StreamOps.CepEvent]
      val q = StreamOps.fifoMatchesDeadline(input.toDS(), deadline).toDF()
        .writeStream.format("memory").queryName("st31c").outputMode("append").start()
      def ev(u: Long, id: Long, ts: String, kind: String) = StreamOps.CepEvent(
        u, id, Timestamp.valueOf(s"2024-01-01 $ts"), kind)
      // batch 1: v1@00:00; a foreign 07:00 event pushes the watermark
      // (delay 1h) to EXACTLY 06:00 = v1.us + deadline
      input.addData(ev(9, 1, "00:00:00", "view"), ev(-5, 99, "07:00:00", "view"))
      q.processAllAvailable()
      // batch 2: another key-9 row forces a drain at wm == 06:00, expiring
      // v1 at the inclusive boundary; v3@07:00 keeps the watermark fixed
      input.addData(ev(9, 3, "07:00:00", "view"))
      q.processAllAvailable()
      // batch 3: the equal-time purchase — late-dropped by Spark (ts <= wm),
      // so it must serve nothing and be wasted
      input.addData(ev(9, 2, "06:00:00", "purchase"))
      q.processAllAvailable()
      input.addData(StreamOps.CepEvent(-1L, -1L,
        Timestamp.valueOf("2026-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("st31c").filter(col("user_id") === 9L).collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got === Set(
        (1L, -1L, deadline, false),
        (3L, -1L, deadline, false)),
        s"knife-edge semantics drifted (did Spark's late predicate change?): $got")
    }
  }
}
