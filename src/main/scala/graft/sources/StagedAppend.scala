package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Two-phase crash-safe append for the append-only stores (SignatureStore,
  * VectorStore) — closes the "crash inside the multi-file append" window
  * that AdmitFence's scaladoc names as the last at-least-once hole: with a
  * plain `mode("append")` write, a crash inside the commit's rename loop
  * leaves a PARTIAL subset of the batch's files in the live directory,
  * which the next read serves and the replayed batch then duplicates.
  *
  * Protocol (the ST28 stage-swap / BucketedLayout-manifest shape, applied
  * to appends):
  *
  *   1. STAGE: write every file of the batch under
  *      `<root>/_append_stage_<token>/<sub>/...` — a multi-file,
  *      arbitrarily long write. A crash here leaves only an orphan stage
  *      dir; nothing is live, and the next WRITER discards it.
  *   2. COMMIT: one atomic directory rename `_append_stage_<token>` →
  *      `_append_ready_<token>`. Before this rename the batch does not
  *      exist; after it, the batch is durable and WILL be served.
  *   3. FENCE: streaming callers advance the AdmitFence watermark here —
  *      the commit made the batch durable, so marking it admitted before
  *      any file reaches a live directory is safe, and the token carries
  *      the batch id (`b<id>`) so a replay that finds its own committed
  *      ready dir (crash between 2 and 3) recognizes it and only
  *      re-advances the fence instead of appending twice.
  *   4. PUBLISH: move each data file into its live directory, preserving
  *      relative paths (partition subdirs, bucket file names), then
  *      delete the ready dir. Idempotent — a crash mid-move is completed
  *      file-by-file by the next [[heal]]; file names carry per-job UUIDs
  *      so re-moving can never collide.
  *
  * Readers call [[heal]] (dropStages = false) before reading, so a
  * half-published batch is never served partially: pending ready dirs are
  * drained to completion first. Only WRITERS pass dropStages = true — a
  * reader must not delete a stage dir the single writer is still filling.
  * Same single-writer assumption as every compact in this repo, enforced
  * by [[WriterLease]] on the store entry points. */
object StagedAppend {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  def stagePath(root: String, token: String): Path =
    new Path(s"$root/_append_stage_$token")

  def readyPath(root: String, token: String): Path =
    new Path(s"$root/_append_ready_$token")

  /** The COMMIT rename — atomic; after it the batch is durable. */
  def commit(spark: SparkSession, root: String, token: String): Unit = {
    AtomicRename.ensure(spark, root, "StagedAppend")
    val fsys = fs(spark)
    require(fsys.rename(stagePath(root, token), readyPath(root, token)),
      s"staged append: could not commit $token under $root")
  }

  /** Move every data file of `src` into `dstRoot`, mirroring the relative
    * directory structure (partition dirs). Marker files (_SUCCESS, dot
    * files) stay behind and die with the ready dir. A rename that fails
    * because the destination already exists is a completed move from a
    * previous attempt — idempotent by construction. */
  private def moveTree(fsys: FileSystem, src: Path, dstRoot: Path): Unit = {
    // a concurrent drain (a reader healing while the writer's own publish
    // finishes, or two readers draining a crashed writer's batch) can
    // delete src between our listing and our recursion — that means the
    // OTHER party completed the move; vanishing is success, not failure.
    // Vanishing has THREE spellings: FileNotFound, AND — on Linux — an
    // AccessDenied/IO error from listing a directory mid-deletion
    // (File.list() returns null for a vanished dir and Hadoop maps it to
    // AccessDenied; caught live by the cross-process writer-vs-healer
    // race). Re-probe existence to separate those from a real error.
    val entries =
      try fsys.listStatus(src)
      catch {
        case _: java.io.FileNotFoundException => return
        case e: java.io.IOException =>
          if (!fsys.exists(src)) return else throw e
      }
    entries.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) moveTree(fsys, st.getPath, new Path(dstRoot, name))
      else if (!name.startsWith("_") && !name.startsWith(".")) {
        fsys.mkdirs(dstRoot)
        val dst = new Path(dstRoot, name)
        // a concurrent drain can win this rename — vanished source means
        // the other party completed the move, same as the listing above
        val renamed = AtomicRename.renameOrVanished(fsys, st.getPath, dst)
        if (!renamed && !fsys.exists(dst) && fsys.exists(st.getPath))
          sys.error(s"staged append: could not publish ${st.getPath} -> $dst")
      }
    }
  }

  /** PUBLISH a committed batch: drain its ready dir into the live
    * directories (`live` maps each staged top-level name, e.g. "sig_docs"
    * or "vectors", to its current live root) and delete the ready dir. */
  def publish(spark: SparkSession, root: String, token: String,
              live: String => Path): Unit = {
    val fsys = fs(spark)
    val ready = readyPath(root, token)
    if (!fsys.exists(ready)) return
    val entries =
      try fsys.listStatus(ready)
      catch { // drained concurrently (incl. the Linux vanished-dir EACCES)
        case _: java.io.FileNotFoundException => return
        case e: java.io.IOException =>
          if (!fsys.exists(ready)) return else throw e
      }
    entries.foreach { st =>
      if (st.isDirectory) moveTree(fsys, st.getPath, live(st.getPath.getName))
    }
    // two drains can race this recursive delete too — a vanished ready
    // dir is the other party's completed cleanup
    try { fsys.delete(ready, true); () }
    catch { case e: java.io.IOException => if (fsys.exists(ready)) throw e }
  }

  /** Heal the append protocol: publish every committed-but-undrained
    * batch, and — for writers only — discard orphan stage dirs from
    * appends that died before their commit rename.
    *
    * Draining a fenced batch (token `b<id>`) also ADVANCES the AdmitFence
    * watermark: the commit rename made the batch durable, so "committed"
    * must imply "admitted" no matter who drains it — without this, a
    * READER draining the ready dir of an append that crashed between its
    * commit and its fence write would erase the only evidence the
    * replayed append has that its batch already landed, and the replay
    * would double-append. With it, the fence check alone covers every
    * replay path. */
  def heal(spark: SparkSession, root: String, live: String => Path,
           dropStages: Boolean): Seq[String] = {
    AtomicRename.ensure(spark, root, "StagedAppend")
    val fsys = fs(spark)
    val rootP = new Path(root)
    if (!fsys.exists(rootP)) return Nil
    val entries = fsys.listStatus(rootP).map(_.getPath)
    if (dropStages)
      entries.filter(_.getName.startsWith("_append_stage_"))
        .foreach(p => fsys.delete(p, true))
    val tokens = entries.filter(_.getName.startsWith("_append_ready_"))
      .map(_.getName.stripPrefix("_append_ready_")).toSeq
    tokens.foreach { t =>
      // fence BEFORE publish — the same ordering as the append path: a
      // crash after the fence leaves the ready dir for the next heal to
      // re-publish idempotently, while publish-first would delete the
      // only durable evidence of the batch and a crash before the fence
      // write would then let the replay double-append
      t.stripPrefix("b").toLongOption
        .filter(_ => t.startsWith("b"))
        .filter(_ > AdmitFence.upto(spark, root))
        .foreach(id => AdmitFence.advance(spark, root, id))
      publish(spark, root, t, live)
    }
    tokens
  }
}
