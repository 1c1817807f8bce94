package graft

import graft.sources.{AdmitFence, StagedAppend, WriterLease}
import org.apache.hadoop.fs.Path

/** PROCESS-level verification of the crash-safety layer's cross-process
  * claims — the tier the in-JVM suites cannot reach. WriterLeaseSpec
  * plants foreign lease files by hand and AdmitFenceSpec races threads;
  * both are simulations of "another process". This suite launches a REAL
  * second JVM ([[CrossProcessProbe]]), with its own writerId, held map,
  * and fence locks, and delivers REAL SIGKILLs at deterministic protocol
  * points the probe marks on stdout:
  *
  *  - a live foreign WRITER is rejected across the process boundary, its
  *    SIGKILLed corpse stays protected until the staleness bar and is
  *    reclaimable after it;
  *  - cross-process RENEWAL: a live child renewing every staleMs/3 is
  *    unstealable long past staleMs, and releases cleanly;
  *  - two processes advancing ONE fence interleaved end at the max with
  *    no lock/temp corpses;
  *  - a SIGKILLed fence-lock holder's corpse is reclaimed by the next
  *    advance after the 10 s staleness bar (availability is not held
  *    hostage to a dead process);
  *  - the staged-append kill matrix with real process death at each
  *    point (after stage / after commit / after fence / clean), healed by
  *    the parent and asserted exactly-once, including the replay
  *    decision ([[AdmitFence.admitted]]) a foreachBatch restart takes. */
class CrossProcessSpec extends SparkSpecBase {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private final class Child(args: Seq[String]) {
    import scala.jdk.CollectionConverters._
    private val javaBin = sys.props("java.home") + "/bin/java"
    private val errLog = java.nio.file.Files.createTempFile("xproc", ".log").toFile
    val errLogPath: String = errLog.getPath
    // classpath + flag forwarding shared with Bench's isolate children
    private val pb = new ProcessBuilder(
      (Seq(javaBin) ++ Bench.forwardableJvmArgs() ++
        Seq("-cp", Bench.currentClasspath(), "graft.CrossProcessProbe") ++ args).asJava)
    pb.redirectError(errLog)
    val proc: Process = pb.start()
    private val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val reader = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      try Iterator.continually(br.readLine()).takeWhile(_ != null)
        .foreach(lines.add)
      catch { case _: java.io.IOException => () } // killed mid-read
    }, "xproc-stdout-reader")
    reader.setDaemon(true)
    reader.start()

    /** Block until the probe prints ANY of `markers` (Spark logs go to
      * stderr, so stdout carries only markers). */
    def awaitAnyOf(markers: Seq[String], timeoutMs: Long = 120000L): Unit = {
      def seen = lines.asScala.exists(l => markers.contains(l.trim))
      val deadline = java.lang.System.currentTimeMillis() + timeoutMs
      while (!seen) {
        if (java.lang.System.currentTimeMillis() > deadline)
          fail(s"probe never printed any of $markers " +
            s"(so far: ${lines.asScala.toList}; " +
            s"alive=${proc.isAlive}, stderr at ${errLog.getPath})")
        if (!proc.isAlive) {
          // let the reader thread drain the pipe of a just-exited probe
          // before declaring the marker missing
          reader.join(2000L)
          if (!seen)
            fail(s"probe exited (${proc.exitValue()}) before any of $markers " +
              s"(so far: ${lines.asScala.toList}; stderr at ${errLog.getPath})")
        }
        Thread.sleep(25L)
      }
    }

    def await(marker: String, timeoutMs: Long = 120000L): Unit =
      awaitAnyOf(Seq(marker), timeoutMs)

    def sawMarker(marker: String): Boolean =
      lines.asScala.exists(_.trim == marker)

    def kill(): Unit = { proc.destroyForcibly(); proc.waitFor() }

    def waitFor(timeoutMs: Long = 120000L): Int = {
      if (!proc.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        kill(); fail("probe did not exit in time")
      }
      proc.exitValue()
    }
  }

  private def leaseOnDisk(root: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_writer_lease"))

  private def residue(root: String): Seq[String] = {
    val d = new java.io.File(root)
    Option(d.list()).toSeq.flatten.filter(n =>
      n.startsWith("_fence_lock") || n.startsWith("_admitted_upto.tmp") ||
        n.startsWith("_append_stage_") || n.startsWith("_append_ready_") ||
        n.startsWith("_writer_lease"))
  }

  // ---------------------------------------------------------------- lease

  test("a live writer in ANOTHER PROCESS is rejected; its SIGKILLed corpse " +
       "is protected until the staleness bar and reclaimable after it") {
    val root = tmp("xproc-lease")
    val child = new Child(Seq("lease-hold", root, "600000", "600000", "false"))
    try {
      child.await("HELD")
      // live foreign holder (a genuinely different writerId) → reject
      intercept[WriterLease.ConcurrentWriterException] {
        WriterLease.withLease(spark, root, staleMs = 600000L, renew = false) {
          fail("body must not run under a live cross-process holder")
        }
      }
      child.kill() // real SIGKILL mid-hold: lease file survives as a corpse
      assert(leaseOnDisk(root), "SIGKILL must leave the lease corpse behind")
      // fresh corpse (age ≪ staleMs) still protects the root...
      intercept[WriterLease.ConcurrentWriterException] {
        WriterLease.withLease(spark, root, staleMs = 600000L, renew = false) {
          fail("a fresh corpse must not be stolen")
        }
      }
      // ...but past the bar it is reclaimed and the root is writable again
      Thread.sleep(1200L)
      var ran = false
      WriterLease.withLease(spark, root, staleMs = 1000L, renew = false) { ran = true }
      assert(ran && !leaseOnDisk(root),
        "stale corpse not reclaimed or lease not released after")
    } finally child.kill()
  }

  test("cross-process renewal: a live child renewing every staleMs/3 is " +
       "unstealable long past staleMs, then releases cleanly") {
    val root = tmp("xproc-renew")
    // child holds 16 s with staleMs = 5 s → renews every ~1.67 s; the
    // steal check at 10 s then has ~3.3 s of renewal slack against
    // child-side stalls AND ~6 s of hold slack against parent-side
    // stalls (a steal attempt landing after the child RELEASED would
    // succeed and falsely implicate the renewal code)
    val child = new Child(Seq("lease-hold", root, "16000", "5000", "true"))
    try {
      child.await("HELD")
      Thread.sleep(10000L) // 2× the child's staleness bar
      // without renewal this steal would succeed; the live child's
      // re-stamped epoch must keep rejecting it
      intercept[WriterLease.ConcurrentWriterException] {
        WriterLease.withLease(spark, root, staleMs = 5000L, renew = false) {
          fail("stole the lease from a LIVE renewing cross-process writer")
        }
      }
      child.await("RELEASED", timeoutMs = 30000L)
      assert(child.waitFor() == 0, "probe failed")
      assert(!leaseOnDisk(root), "child did not release its lease on exit")
      WriterLease.withLease(spark, root, renew = false) { () } // free again
    } finally child.kill()
  }

  test("three processes racing a stale-corpse reclaim: exactly ONE claims " +
       "(tombstone-rename gate + O_EXCL create), the rest reject") {
    val root = tmp("xproc-reclaim-race")
    // a writer that died an hour ago (parseable, very stale for everyone)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_writer_lease"),
      s"dead-writer/feedface ${java.lang.System.currentTimeMillis() - 3600000L}"
        .getBytes("UTF-8"))
    val children = (1 to 3).map(_ =>
      new Child(Seq("lease-claim-race", root)))
    try {
      // wait for each child's OUTCOME (the winner then parks until the
      // kill below, so a slow-starting sibling can never arrive after a
      // legitimate release and muddy the exactly-one assertion)
      children.foreach(_.awaitAnyOf(Seq("CLAIMED", "REJECTED"),
        timeoutMs = 180000L))
      val outcomes = children.map(c =>
        if (c.sawMarker("CLAIMED")) "CLAIMED" else "REJECTED")
      assert(outcomes.count(_ == "CLAIMED") == 1,
        s"stale-corpse reclaim race produced $outcomes — two concurrent " +
          "claimers usually means the reclaim TOCTOU is back; before " +
          "blaming the gate, check the probes' stderr for the documented " +
          "one-metadata-round-trip residual (a '[WriterLease] reclaim' " +
          s"restore-lost-a-race line): ${children.map(_.errLogPath)}")
    } finally children.foreach(_.kill())
  }

  // ---------------------------------------------------------------- fence

  test("two PROCESSES advancing one fence interleaved end at the max " +
       "with no lock or temp corpses") {
    val root = tmp("xproc-fence")
    val child = new Child(Seq("fence-race", root, "1", "60", "5"))
    try {
      child.await("FENCING")
      (1L to 60L).foreach { id =>
        AdmitFence.advance(spark, root, id)
        Thread.sleep(5L)
      }
      child.await("FENCE_DONE")
      assert(child.waitFor() == 0, "probe failed")
      assert(AdmitFence.upto(spark, root) == 60L,
        s"watermark ${AdmitFence.upto(spark, root)} != 60 after the race")
      assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
    } finally child.kill()
  }

  test("a SIGKILLed fence-lock holder's corpse is reclaimed by the next " +
       "advance after the staleness bar") {
    val root = tmp("xproc-fencelock")
    val child = new Child(Seq("fence-lock-hold", root))
    try {
      child.await("LOCKED")
      child.kill() // the lock file survives as a crashed holder's corpse
      val lockFile = java.nio.file.Paths.get(root, "_fence_lock")
      assert(java.nio.file.Files.exists(lockFile), "no lock corpse")
      // staleness is judged from the lock file's MTIME, so anchor the
      // assertion there too — measuring from a parent-side t0 would
      // charge parent latency (await poll, kill, GC) against the margin
      val lockMtime = java.nio.file.Files
        .getLastModifiedTime(lockFile).toMillis
      AdmitFence.advance(spark, root, 7L) // must wait out the 10 s bar, reclaim, publish
      val waited = java.lang.System.currentTimeMillis() - lockMtime
      assert(AdmitFence.upto(spark, root) == 7L, "advance did not land")
      assert(waited >= 9000L, // 1 s slack for coarse FS mtime granularity
        s"advance landed ${waited} ms after the corpse's mtime — it must " +
          "have stolen a fresh lock instead of waiting out the 10 s bar")
      assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
    } finally child.kill()
  }

  // -------------------------------------------------- staged-append matrix

  private def liveFiles(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/data")
    Option(d.list()).toSeq.flatten.filter(_.endsWith(".bin")).sorted
  }

  private def heal(root: String): Unit =
    StagedAppend.heal(spark, root, sub => new Path(s"$root/$sub"),
      dropStages = true)

  test("staged append killed AFTER STAGE (real SIGKILL): nothing durable, " +
       "heal discards the orphan, the replay then lands exactly once") {
    val root = tmp("xproc-st-stage")
    val child = new Child(Seq("staged", root, "5", "stage"))
    try { child.await("STAGED"); child.kill() } finally child.kill()
    heal(root)
    assert(liveFiles(root).isEmpty, "a pre-commit crash must leave nothing live")
    assert(AdmitFence.upto(spark, root) == -1L, "nothing was committed")
    assert(!AdmitFence.admitted(spark, root, 5L), "replay must NOT be fenced")
    // the replay (a fresh process, as a restarted foreachBatch would be)
    val replay = new Child(Seq("staged", root, "5", "none"))
    try { replay.await("PUBLISHED"); assert(replay.waitFor() == 0) }
    finally replay.kill()
    assert(liveFiles(root) ==
      Seq("part-5-1.bin", "part-5-2.bin", "part-5-3.bin"), s"got ${liveFiles(root)}")
    assert(AdmitFence.upto(spark, root) == 5L)
    assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
  }

  test("staged append killed AFTER COMMIT: the batch is durable — heal " +
       "fences and publishes it, and the replay is a fenced no-op") {
    val root = tmp("xproc-st-commit")
    val child = new Child(Seq("staged", root, "9", "commit"))
    try { child.await("COMMITTED"); child.kill() } finally child.kill()
    assert(AdmitFence.upto(spark, root) == -1L, "fence must not be advanced yet")
    heal(root) // fence-before-publish: committed ⇒ admitted, then drained
    assert(AdmitFence.admitted(spark, root, 9L),
      "heal of a committed batch must fence it — else the replay double-appends")
    assert(liveFiles(root) ==
      Seq("part-9-1.bin", "part-9-2.bin", "part-9-3.bin"), s"got ${liveFiles(root)}")
    heal(root) // idempotent
    assert(liveFiles(root).size == 3, "second heal duplicated the batch")
    assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
  }

  test("staged append killed AFTER FENCE: admitted but unpublished — heal " +
       "drains the ready dir to completion, exactly once") {
    val root = tmp("xproc-st-fence")
    val child = new Child(Seq("staged", root, "3", "fence"))
    try { child.await("FENCED"); child.kill() } finally child.kill()
    assert(AdmitFence.admitted(spark, root, 3L), "fence write was durable")
    assert(liveFiles(root).isEmpty, "nothing published before the kill")
    heal(root)
    assert(liveFiles(root) ==
      Seq("part-3-1.bin", "part-3-2.bin", "part-3-3.bin"), s"got ${liveFiles(root)}")
    assert(AdmitFence.upto(spark, root) == 3L)
    assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
  }

  test("a writer PROCESS appending batch after batch while this process " +
       "heals the same store concurrently: every batch lands exactly once") {
    val root = tmp("xproc-st-race")
    val child = new Child(Seq("staged-loop", root, "1", "25"))
    try {
      child.await("LOOPING")
      // reader-side heals racing the writer's own publishes: moveTree's
      // vanished-source tolerance and the monotonic fence make this safe;
      // dropStages stays FALSE — a reader must never delete the stage dir
      // the live writer is still filling
      while (child.proc.isAlive) {
        StagedAppend.heal(spark, root, sub => new Path(s"$root/$sub"),
          dropStages = false)
        Thread.sleep(15L)
      }
      assert(child.waitFor() == 0, "probe failed mid-race")
      heal(root) // drain anything the last racing heal missed
      val expect = (1L to 25L).flatMap(b =>
        Seq(s"part-$b-1.bin", s"part-$b-2.bin")).sorted
      assert(liveFiles(root) == expect,
        s"lost or duplicated batches: got ${liveFiles(root).size} files")
      assert(AdmitFence.upto(spark, root) == 25L)
      assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
    } finally child.kill()
  }

  // ------------------------------------------------ day-pointer compacts

  private def flatDir(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[FlatObjectFs].getName)
    "s3a://test" + java.nio.file.Files.createTempDirectory(prefix).toString
  }

  private def dayCount(dir: String, day: String): Long = {
    import org.apache.spark.sql.functions.col
    graft.sources.BucketedLayout.readEvents(spark, dir)
      .filter(col("day") === day).count()
  }

  test("two PROCESSES compacting ONE day: the per-day lease rejects the " +
       "second live writer, a different day compacts in parallel, and a " +
       "SIGKILLed holder's orphan + corpse are healed by the next compact " +
       "(r15 verdict item 1)") {
    import graft.sources.BucketedLayout
    import org.apache.hadoop.fs.Path
    val dir = flatDir("xproc-compact-race")
    BucketedLayout.migrate(spark, sfDir, dir, seriesBuckets = 2)
    val fsys = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val day = "2024-01-05"
    val before = dayCount(dir, day)
    val other = dayCount(dir, "2024-01-06")
    // child parks right after staging its generation — INSIDE the lease
    val child = new Child(Seq("compact-day", dir, day, "staged", "600000"))
    try {
      child.await("STAGED", timeoutMs = 180000L)
      // the day serves untouched while a compact is mid-flight
      assert(dayCount(dir, day) === before)
      // same-day compact from THIS process → rejected loudly, day intact
      intercept[WriterLease.ConcurrentWriterException] {
        BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2)
      }
      assert(dayCount(dir, day) === before,
        "a rejected second compact must not have touched the day")
      // the lease is per DAY: a different day compacts concurrently
      BucketedLayout.compactDay(spark, dir, "2024-01-06", seriesBuckets = 2)
      assert(dayCount(dir, "2024-01-06") === other)
      child.kill() // real SIGKILL mid-compact: staged orphan + lease corpse
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        dir.stripPrefix("s3a://test"), s".lock-day=$day", "_writer_lease")),
        "SIGKILL must leave the per-day lease corpse")
      Thread.sleep(2500L) // age the corpse past the reclaim bar below
      BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2,
        leaseStaleMs = 2000L)
      assert(dayCount(dir, day) === before,
        "the healing compact lost or doubled rows")
      // pointer names a LIVE generation; the killed child's orphan is gone
      val cur = graft.sources.GenDir.currentName(fsys, dir, s"day=$day")
      assert(cur != s"day=$day" && fsys.exists(new Path(s"$dir/$cur")),
        s"pointer must name a live generation, got $cur")
      val gens = fsys.listStatus(new Path(dir)).map(_.getPath.getName)
        .filter(_.startsWith(s".day=${day}_g"))
      assert(gens.toSeq === Seq(cur),
        s"healing compact must sweep the killed child's orphan, got ${gens.toSeq}")
    } finally child.kill()
  }

  test("compactDay SIGKILLed at each pointer-protocol point (swept/staged/" +
       "manifest/published): the day serves its exact row set throughout " +
       "and the next compact heals (r15 verdict item 5)") {
    import graft.sources.BucketedLayout
    import org.apache.hadoop.fs.Path
    val dir = flatDir("xproc-compact-kill")
    BucketedLayout.migrate(spark, sfDir, dir, seriesBuckets = 2)
    val fsys = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val points = Seq("swept" -> "2024-01-05", "staged" -> "2024-01-06",
      "manifest" -> "2024-01-07", "published" -> "2024-01-08")
    points.foreach { case (point, day) =>
      val before = dayCount(dir, day)
      val child = new Child(Seq("compact-day", dir, day, point, "600000"))
      try {
        child.await(point.toUpperCase, timeoutMs = 180000L)
        child.kill()
      } finally child.kill()
      // closed-form oracle: every kill point serves EXACTLY the pre-kill
      // rows — pre-publish kills leave the classic dir untouched,
      // post-publish the generation + manifest serve the same set
      assert(dayCount(dir, day) === before,
        s"kill at $point changed the served rows for $day")
      Thread.sleep(2500L)
      BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2,
        leaseStaleMs = 2000L)
      assert(dayCount(dir, day) === before,
        s"healing compact after a $point kill lost or doubled rows")
      val cur = graft.sources.GenDir.currentName(fsys, dir, s"day=$day")
      assert(cur != s"day=$day" && fsys.exists(new Path(s"$dir/$cur")),
        s"after healing a $point kill the pointer must name a live " +
          s"generation, got $cur")
    }
  }

  test("a writer PROCESS appending late batches while this process " +
       "compacts the same day repeatedly: every row lands exactly once " +
       "(the _folded manifest discipline across a real process boundary)") {
    import graft.sources.BucketedLayout
    import org.apache.spark.sql.functions.{col, countDistinct}
    val dir = flatDir("xproc-compact-insert")
    BucketedLayout.migrate(spark, sfDir, dir, seriesBuckets = 2)
    val day = "2024-01-07"
    val before = dayCount(dir, day)
    val (batches, perBatch) = (8, 5)
    val child = new Child(Seq("insert-loop", dir, sfDir, day,
      batches.toString, perBatch.toString))
    try {
      child.await("INSERTING", timeoutMs = 180000L)
      // compact in a loop against the live inserter: a compact that
      // catches a half-committed append fails transiently (FlatObjectFs
      // copies files byte-wise, unlike a real store's atomic PUT) — the
      // END state is the oracle, same as production retry-on-failure
      var compacts = 0
      while (child.proc.isAlive && compacts < 50) {
        try { BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2); () }
        catch { case _: Throwable => () }
        compacts += 1
        Thread.sleep(25L)
      }
      child.await("INSERT_DONE", timeoutMs = 180000L)
      assert(child.waitFor() == 0, s"inserter failed (${child.errLogPath})")
      // quiesced: fold whatever the racing compacts left as leftovers,
      // then once more to reclaim — the count must be exact
      BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2)
      BucketedLayout.compactDay(spark, dir, day, seriesBuckets = 2)
      val expected = before + batches.toLong * perBatch
      val served = BucketedLayout.readEvents(spark, dir)
        .filter(col("day") === day)
      assert(served.count() === expected,
        s"insert-vs-compact race lost or duplicated rows")
      val distinctIds = served.agg(countDistinct(col("event_id"))).head.getLong(0)
      assert(distinctIds === expected,
        "row count matches but event_ids collide — something double-served")
    } finally child.kill()
  }

  test("clean staged append publishes once; a fenced same-id replay is " +
       "skipped by the admitted() check a foreachBatch restart takes") {
    val root = tmp("xproc-st-clean")
    val child = new Child(Seq("staged", root, "12", "none"))
    try { child.await("PUBLISHED"); assert(child.waitFor() == 0) }
    finally child.kill()
    assert(liveFiles(root).size == 3)
    assert(AdmitFence.admitted(spark, root, 12L),
      "completed batch not admitted — the restart would re-append it")
    heal(root)
    assert(liveFiles(root).size == 3, "heal duplicated a clean batch")
    assert(residue(root).isEmpty, s"protocol corpses: ${residue(root)}")
  }
}
