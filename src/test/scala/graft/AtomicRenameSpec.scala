package graft

import graft.sources.AtomicRename

/** The object-store POSTURE (r12 verdict item 3): every rename-committed
  * protocol refuses — loudly, with remediation, before touching the store
  * — on a flat object store whose rename is a non-atomic copy+delete,
  * instead of silently degrading exactly-once to maybe-torn. The check is
  * scheme-string-based, so it needs (and has) no s3a connector on the
  * classpath to refuse. */
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
    spark.conf.set("spark.graft.unsafeAllowNonAtomicRename", "true")
    try AtomicRename.ensure(spark, "s3a://bucket/store", "Test")
    finally spark.conf.unset("spark.graft.unsafeAllowNonAtomicRename")
    intercept[UnsupportedOperationException] {
      AtomicRename.ensure(spark, "s3a://bucket/store", "Test")
    }
  }

  test("the protocols refuse at the first touch of an object-store root") {
    intercept[UnsupportedOperationException] {
      graft.sources.StagedAppend.commit(spark, "s3a://b/store", "t1")
    }
    intercept[UnsupportedOperationException] {
      graft.sources.StagedAppend.heal(spark, "s3a://b/store",
        n => new org.apache.hadoop.fs.Path(s"s3a://b/store/$n"),
        dropStages = false)
    }
    intercept[UnsupportedOperationException] {
      graft.sources.AdmitFence.advance(spark, "s3a://b/store", 1L)
    }
    intercept[UnsupportedOperationException] {
      graft.sources.WriterLease.withLease(spark, "s3a://b/store") {
        fail("body must not run")
      }
    }
    // and the WriterLease refusal must not poison the root in-JVM: the
    // same root must still be rejected for the SAME reason (not a phantom
    // ConcurrentWriterException from a leaked held-map entry)
    val again = intercept[UnsupportedOperationException] {
      graft.sources.WriterLease.withLease(spark, "s3a://b/store") {
        fail("body must not run")
      }
    }
    assert(again.getMessage.contains("WriterLease"))
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
