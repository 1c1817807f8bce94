package graft

import graft.sources.AdmitFence

/** The replay fence's watermark file: atomic publish + degraded reads.
  * A torn/garbage watermark must degrade to "nothing admitted" (replay
  * runs at-least-once) instead of wedging every cycle on a parse error,
  * and advance must publish OVER an existing (even damaged) file. */
class AdmitFenceSpec extends SparkSpecBase {

  test("advance/upto round-trip and monotone overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    assert(AdmitFence.upto(spark, dir) === -1L)
    AdmitFence.advance(spark, dir, 3L)
    assert(AdmitFence.upto(spark, dir) === 3L)
    assert(AdmitFence.admitted(spark, dir, 3L))
    assert(!AdmitFence.admitted(spark, dir, 4L))
    AdmitFence.advance(spark, dir, 4L)
    assert(AdmitFence.upto(spark, dir) === 4L)
  }

  test("a garbage watermark degrades to -1 and is healed by the next advance") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    // simulate the torn write of a pre-atomic-publish store
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_upto"), "".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === -1L,
      "an empty watermark must read as 'nothing admitted', not throw")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_upto"), "12garbage".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === -1L)
    // the next completed append publishes cleanly over the damage
    AdmitFence.advance(spark, dir, 7L)
    assert(AdmitFence.upto(spark, dir) === 7L)
  }

  test("advance leaves no stray temp or lock once published") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    AdmitFence.advance(spark, dir, 1L)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(names.contains("_admitted_upto"))
    assert(!names.exists(_.startsWith("_admitted_upto.tmp")),
      s"temp watermark not cleaned up: $names")
    assert(!names.contains("_fence_lock"), s"fence lock leaked: $names")
  }

  // —— round 13: advance is MONOTONIC and SERIALIZED (r12 ADVICE high:
  // a stalled reader heal re-publishing a lower watermark after the
  // writer advanced further would regress the fence and let a fenced
  // replay double-append) ——————————————————————————————————————————

  test("a stale caller can never move the watermark BACKWARDS") {
    val dir = java.nio.file.Files.createTempDirectory("fence-mono").toString
    AdmitFence.advance(spark, dir, 5L)
    // the stalled reader's late advance of an id the writer passed long ago
    AdmitFence.advance(spark, dir, 3L)
    assert(AdmitFence.upto(spark, dir) === 5L,
      "a late lower advance regressed the watermark — fenced replays of " +
        "batches 4..5 would double-append")
  }

  test("racing advances from many threads converge on the max with no " +
       "torn state, stolen temps, or leaked locks") {
    val dir = java.nio.file.Files.createTempDirectory("fence-race").toString
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writer-like ascending ids racing reader-heal-like stale re-advances
    val threads = (1 to 8).map { t =>
      new Thread(() => {
        try (1 to 25).foreach { i =>
          AdmitFence.advance(spark, dir, (i * 7 + t) % 50L)
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent advances threw: ${errs.peek()}")
    // max over every (i*7+t) % 50 attempted above
    val expected = (for { t <- 1 to 8; i <- 1 to 25 } yield (i * 7 + t) % 50L).max
    assert(AdmitFence.upto(spark, dir) === expected)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(!names.exists(_.startsWith("_admitted_upto.tmp")),
      s"orphan temp survived the race: $names")
    assert(!names.contains("_fence_lock"), s"fence lock leaked: $names")
  }

  test("FenceLock release verifies ownership: a paused holder reclaimed " +
       "from neither deletes the new holder's lock nor believes stillOurs") {
    val dir = java.nio.file.Files.createTempDirectory("fence-own").toString
    val fsys = graft.sources.AtomicRename.raw(org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration))
    val lockFile = java.nio.file.Paths.get(dir, "_fence_lock")
    val aHolding = new java.util.concurrent.CountDownLatch(1)
    val bInside = new java.util.concurrent.CountDownLatch(1)
    val aReleased = new java.util.concurrent.CountDownLatch(1)
    @volatile var aSawOurs = true
    val a = new Thread(() => {
      graft.sources.FenceLock.withLock(fsys, dir, staleMs = 100L) { stillOurs =>
        aHolding.countDown()
        // simulate the >staleMs GC pause: B reclaims while we are inside
        bInside.await(10, java.util.concurrent.TimeUnit.SECONDS)
        aSawOurs = stillOurs()
      }
      aReleased.countDown()
    })
    a.start()
    assert(aHolding.await(10, java.util.concurrent.TimeUnit.SECONDS))
    Thread.sleep(150L) // A's claim epoch goes stale
    graft.sources.FenceLock.withLock(fsys, dir, staleMs = 100L) { stillOurs =>
      bInside.countDown() // we hold the reclaimed lock; A now releases
      assert(aReleased.await(10, java.util.concurrent.TimeUnit.SECONDS))
      assert(java.nio.file.Files.exists(lockFile) && stillOurs(),
        "the paused holder's release deleted the NEW holder's lock")
    }
    a.join()
    assert(!aSawOurs,
      "stillOurs answered true to a holder that was reclaimed from")
    assert(!java.nio.file.Files.exists(lockFile),
      "the live holder's own release did not clean up")
  }

  test("a mid-claim lock (visible EMPTY in the create-to-write window) " +
       "reads as FRESH — contenders wait instead of reclaiming the winner") {
    val dir = java.nio.file.Files.createTempDirectory("fence-fresh").toString
    val lockP = java.nio.file.Paths.get(dir, "_fence_lock")
    java.nio.file.Files.write(lockP, Array.emptyByteArray) // mtime = now
    val t = new Thread(() => AdmitFence.advance(spark, dir, 1L))
    t.start()
    Thread.sleep(400L)
    assert(java.nio.file.Files.exists(lockP),
      "a FRESH empty lock was read as torn-ancient and reclaimed — a " +
        "contender could steal the lock inside the winner's claim window")
    assert(AdmitFence.upto(spark, dir) === -1L,
      "advance published through a held lock")
    java.nio.file.Files.delete(lockP) // the winner releases
    t.join(30000L)
    assert(!t.isAlive && AdmitFence.upto(spark, dir) === 1L)
  }

  test("mixed posture: a surviving per-batch marker is honored by an " +
       "atomic-posture upto (marker-mode crash between PUT and fold)") {
    val dir = java.nio.file.Files.createTempDirectory("fence-mixed").toString
    // simulate a marker-mode advance that died between the marker PUT and
    // the floor fold; the store then changes posture (the unsafe flag, or
    // a filesystem migration) and all subsequent reads run atomic-mode
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_b7"), "admitted".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === 7L,
      "a floor-only read under-reads the watermark — a fenced replay of " +
        "batch 7 would double-append")
    assert(AdmitFence.admitted(spark, dir, 7L))
    // the next advance moves past it; the marker stays honored (max)
    AdmitFence.advance(spark, dir, 9L)
    assert(AdmitFence.upto(spark, dir) === 9L)
    // and a floor BELOW a surviving marker never wins
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_b12"), "admitted".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === 12L)
  }

  test("a crashed advance's stale fence lock and orphan temp are reclaimed") {
    val dir = java.nio.file.Files.createTempDirectory("fence-stale").toString
    // simulate a holder that died inside the critical section 1 min ago —
    // staleness is judged from the lock file's MTIME (content timestamps
    // would misread the create-to-write claim window as torn+ancient), so
    // the corpse must be backdated, not just carry an old content ts
    val lockP = java.nio.file.Paths.get(dir, "_fence_lock")
    java.nio.file.Files.write(lockP,
      s"deadtoken ${java.lang.System.currentTimeMillis() - 60000L}".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(lockP,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - 60000L))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_upto.tmp_deadbeef"),
      "9".getBytes("UTF-8"))
    AdmitFence.advance(spark, dir, 2L) // must reclaim, not wedge
    assert(AdmitFence.upto(spark, dir) === 2L)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(!names.exists(_.startsWith("_admitted_upto.tmp")),
      s"the crashed advance's orphan temp was not swept: $names")
    assert(!names.contains("_fence_lock"))
  }
}
