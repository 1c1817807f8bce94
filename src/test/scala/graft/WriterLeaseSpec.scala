package graft

import graft.sources.{MergeStore, PostingsStore, SignatureStore, WriterLease}
import org.apache.spark.sql.functions._

/** The single-writer GUARD: every store documents "two concurrent writers
  * is a deployment error" — the lease makes that fail loudly instead of
  * corrupting silently, while a crashed writer's stale lease stays
  * reclaimable (availability is not held hostage to a dead process). */
class WriterLeaseSpec extends SparkSpecBase {

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

  test("a torn lease file (unparsable) is reclaimable, not a wedge") {
    val root = tmp("lease-torn")
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_writer_lease"),
      "garbage".getBytes("UTF-8"))
    var ran = false
    WriterLease.withLease(spark, root) { ran = true }
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
