package graft

import graft.sources.AtomicRename

/** The object-store POSTURE (r12 item 3, reworked r14 item 4): protocols
  * that must commit via a directory rename refuse — loudly, with
  * remediation, before touching a flat object store whose rename is a
  * non-atomic copy+delete — while the index-store protocols carry an
  * object-store commit path instead (StagedAppend marker commits,
  * AdmitFence overwrite-PUT fences, GenDir pointer compacts; exercised
  * end to end by IngestSoakSpec's flat-object soak twin). The ensure
  * check is scheme-string-based, so it needs (and has) no s3a connector
  * on the classpath to refuse. */
class AtomicRenameSpec extends SparkSpecBase {

  test("local paths pass; flat object-store schemes are refused with " +
       "remediation text") {
    AtomicRename.ensure(spark, "/tmp/anything", "Test") // must not throw
    AtomicRename.ensure(spark, "file:/tmp/anything", "Test")
    AtomicRename.ensure(spark, "hdfs://nn/warehouse/store", "Test")
    val e = intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "s3a://bucket/store", "StagedAppend")
    }
    assert(e.getMessage.contains("StagedAppend"))
    assert(e.getMessage.contains("manifest"),
      "the refusal must point at the manifest-commit stores the repo ships")
    assert(e.getMessage.contains("unsafeAllowNonAtomicRename"))
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "gs://bucket/store", "AdmitFence")
    }
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "wasb://c@acct.blob.core.windows.net/x", "T")
    }
    // ABFS with hierarchical namespace has atomic rename — allowed
    AtomicRename.ensure(spark, "abfs://c@acct.dfs.core.windows.net/x", "T")
  }

  test("the unsafe override is honored while set, not after") {
    // a session CLONE (own SQLConf, shared context): suites run in
    // parallel against one shared session, and flipping the posture flag
    // globally — even transiently — would flip a concurrently running
    // store protocol's commit mode mid-batch (caught live: the r14
    // flat-object soak twin raced this test's set/unset window)
    val cloned = spark.newSession()
    cloned.conf.set("spark.graft.unsafeAllowNonAtomicRename", "true")
    AtomicRename.ensure(cloned, "s3a://bucket/store", "Test")
    cloned.conf.unset("spark.graft.unsafeAllowNonAtomicRename")
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(cloned, "s3a://bucket/store", "Test")
    }
    // and the clone's flag never leaked into the shared session
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "s3a://bucket/store", "Test")
    }
  }

  test("round 14 posture: the index-store protocols take the object-store " +
       "commit path instead of refusing; rename-dependent protocols still " +
       "refuse") {
    // since round 15 NO shipped protocol refuses a flat store (compactDay
    // and ST28 grew pointer paths) — `ensure` remains the posture guard
    // for user-written rename-committed extensions, and must still throw
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "s3a://bucket/store", "a user extension")
    }
    // the index-store protocols run their object-store commit path on an
    // s3a root (marker commits, PUT fences, lease claims) — no refusal
    // anywhere; the end-to-end exactly-once behavior is certified by
    // IngestSoakSpec's flat-object-store soak twin
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[FlatObjectFs].getName)
    val root = "s3a://test" +
      java.nio.file.Files.createTempDirectory("atomspec").toString
    assert(graft.sources.StagedAppend.heal(spark, root,
      n => new org.apache.hadoop.fs.Path(s"$root/$n"), dropStages = true).isEmpty)
    graft.sources.AdmitFence.advance(spark, root, 1L)
    assert(graft.sources.AdmitFence.upto(spark, root) === 1L)
    var ran = false
    graft.sources.WriterLease.withLease(spark, root) { ran = true }
    assert(ran, "the lease body must run on an object-store root")
    // marker commit end to end at the primitive level: stage a file,
    // commit (marker, no rename), publish into a live dir
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = graft.sources.StagedAppend.stagePath(root, "t1")
    fsys.mkdirs(new org.apache.hadoop.fs.Path(stage, "tbl"))
    val o = fsys.create(new org.apache.hadoop.fs.Path(stage, "tbl/part-1"), true)
    o.write("x".getBytes("UTF-8")); o.close()
    graft.sources.StagedAppend.commit(spark, root, "t1")
    assert(fsys.exists(graft.sources.StagedAppend.commitMarkerPath(root, "t1")),
      "object-store commit must be the marker, not a rename")
    assert(fsys.exists(stage), "staged files stay in place until publish")
    graft.sources.StagedAppend.publish(spark, root, "t1",
      n => new org.apache.hadoop.fs.Path(s"$root/$n"))
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/tbl/part-1")))
    assert(!fsys.exists(stage) &&
      !fsys.exists(graft.sources.StagedAppend.commitMarkerPath(root, "t1")),
      "publish must clear the stage dir and the marker")
  }

  test("object-store fence is monotonic BY CONSTRUCTION: a stale actor's " +
       "floor overwrite cannot regress the watermark (r14 review finding)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[FlatObjectFs].getName)
    val root = "s3a://test" +
      java.nio.file.Files.createTempDirectory("fencemono").toString
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.AdmitFence.advance(spark, root, 5L)
    assert(graft.sources.AdmitFence.upto(spark, root) === 5L)
    // the per-batch marker b5 must survive its own fold (only markers
    // STRICTLY below the written floor are deleted)
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_admitted_b5")))
    // a stale actor that slipped the (best-effort on object stores) fence
    // lock lands its smaller floor LAST — on the overwrite-PUT design this
    // regressed the watermark and reopened the double-append hole; with
    // markers, max(floor, markers) still answers 5
    val o = fsys.create(new org.apache.hadoop.fs.Path(s"$root/_admitted_upto"), true)
    o.write("4".getBytes("UTF-8")); o.close()
    assert(graft.sources.AdmitFence.upto(spark, root) === 5L,
      "a late smaller floor PUT must never regress the fence")
    // later advances fold retired markers away; the newest one survives
    graft.sources.AdmitFence.advance(spark, root, 7L)
    assert(graft.sources.AdmitFence.upto(spark, root) === 7L)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_admitted_b5")),
      "the fold must retire markers the floor now covers")
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_admitted_b7")))
  }

  test("createNoOverwrite is ATOMIC under contention: exactly one winner " +
       "per path and the winner's bytes are never truncated") {
    // Hadoop's RawLocalFileSystem.create(p, overwrite = false) is
    // check-then-act — under this exact barrier-start contention a second
    // claimer slips past the exists() probe and TRUNCATES the winner's
    // claim (the cross-process fence race caught it live). The helper's
    // O_EXCL path must never double-admit.
    val fsys = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files.createTempDirectory("atomic-create").toString
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      (1 to 200).foreach { r =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/claim_$r")
        val barrier = new java.util.concurrent.CyclicBarrier(threads)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val payloads = (0 until threads).map(t => s"winner-$t-round-$r")
        (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              barrier.await()
              if (AtomicRename.createNoOverwrite(fsys, p,
                payloads(t).getBytes("UTF-8"))) wins.incrementAndGet()
            }
          })
        }.foreach(_.get())
        assert(wins.get() == 1,
          s"round $r: ${wins.get()} winners — the claim is not atomic")
        val content = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, s"claim_$r")), "UTF-8")
        assert(payloads.contains(content),
          s"round $r: claim content torn or truncated: '$content'")
      }
    } finally pool.shutdown()
  }
}
