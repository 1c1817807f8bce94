package graft.sources

import org.apache.spark.sql.SparkSession

/** Replay fence for NON-idempotent store appends — the exactly-once shim
  * for stores fed from Structured Streaming `foreachBatch`.
  *
  * The problem it closes: SignatureStore.admit and VectorStore.append
  * mutate the store by APPENDING files. A crash between the append and the
  * streaming checkpoint's commit replays the batch, appending its rows a
  * second time (double-indexed docs/vectors — extra candidates at query
  * time, wasted bytes forever). Stores that are idempotent by construction
  * (MergeStore's copy-on-write merge, the ST28 self-overwriting partials,
  * PostingsStore's manifest-committed file sink) don't need this; the two
  * append-only stores do.
  *
  * The fence is the ST28 watermark pattern: one tiny `_admitted_upto` file
  * beside the store holding the highest batch id whose append COMPLETED.
  * `foreachBatch` delivers batch ids serially and monotonically per
  * checkpoint, so a single high-watermark long suffices — a replayed batch
  * (id ≤ watermark) skips the append entirely. The watermark write is
  * strictly AFTER the append: a crash before it replays the whole cycle
  * (the append happens once in total), a crash after it makes the replay a
  * no-op. The one residual window is a crash INSIDE the multi-file append
  * itself — closing that needs a transactional manifest (BucketedLayout's
  * shape), deliberately not re-built here; the fence reduces the
  * double-append surface from "every replay" to "a crash mid-write".
  *
  * Single writer per store, same as every compact in this repo: two
  * concurrent ingests racing one watermark file is a deployment error. */
object AdmitFence {

  /** The RAW (checksum-free) filesystem: the watermark is published by
    * renaming a temp file over the live one, and a checksummed local FS
    * would leave the old `.crc` sidecar pointing at the old bytes —
    * every subsequent read throws ChecksumException. Raw local rename
    * over an existing file is a single atomic POSIX rename. */
  private def fs(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  private def markPath(storeDir: String) =
    new org.apache.hadoop.fs.Path(s"$storeDir/_admitted_upto")

  /** Highest batch id whose append completed; -1 when none did. An
    * unparsable watermark (a torn write from a pre-atomic-publish store,
    * or manual damage) degrades to -1 — replay-at-least-once — instead
    * of wedging every subsequent cycle on a parse error. */
  def upto(spark: SparkSession, storeDir: String): Long = {
    val fsys = fs(spark)
    val p = markPath(storeDir)
    if (!fsys.exists(p)) -1L
    else {
      val in = fsys.open(p)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
      try raw.toLong
      catch { case _: NumberFormatException =>
        System.err.println(s"[AdmitFence] unparsable watermark at $p " +
          s"('$raw') — treating as -1 (replay-at-least-once)")
        -1L
      }
    }
  }

  /** True iff `batchId`'s append already completed — the replay check. */
  def admitted(spark: SparkSession, storeDir: String, batchId: Long): Boolean =
    batchId <= upto(spark, storeDir)

  /** Record `batchId`'s append as complete. Call strictly AFTER the
    * append's last write. Atomic publish (write a sibling temp, rename
    * over the live file — the base/_upto discipline): a crash mid-write
    * can no longer leave a truncated watermark, only an orphan temp the
    * next advance overwrites. */
  def advance(spark: SparkSession, storeDir: String, batchId: Long): Unit = {
    val fsys = fs(spark)
    val p = markPath(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$storeDir/_admitted_upto.tmp")
    val out = fsys.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (!fsys.rename(tmp, p)) {
      // non-POSIX fallback (e.g. an FS whose rename refuses to overwrite):
      // delete-then-rename — the brief no-watermark window only re-runs a
      // batch, the at-least-once direction the fence already documents
      fsys.delete(p, false)
      require(fsys.rename(tmp, p), s"AdmitFence: could not publish $p")
    }
  }
}
