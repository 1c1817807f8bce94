package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer GUARD for the persisted stores — makes the assumption
  * every compact/append in this repo documents ("two concurrent writers
  * is a deployment error") fail LOUDLY instead of corrupting silently.
  *
  * A `_writer_lease` file beside the store holds `writerId epochMillis`.
  * Every mutating entry point (write/build, append/admit, compact, merge)
  * runs inside [[withLease]]:
  *
  *  - free → claim it with an atomic create-no-overwrite, run, release;
  *  - held by THIS process (nested call, e.g. admit → append) → reentrant,
  *    tracked by an in-JVM depth map, no extra FS ops;
  *  - held by a DEAD writer → reclaimable: our own id on disk but not in
  *    the depth map means a crashed earlier op of this JVM (reclaim
  *    immediately); a foreign id older than `staleMs` is a crashed other
  *    process (reclaim after the staleness bar);
  *  - held by a LIVE other writer → [[ConcurrentWriterException]].
  *
  * This is a misconfiguration DETECTOR, not a distributed lock manager:
  * the create-no-overwrite race window is filesystem-atomic on local/HDFS
  * but the staleness rule means an op that outlives `staleMs` (default
  * 30 min — far beyond any store op here) could be stolen from; size
  * `staleMs` to the deployment's slowest maintenance job. The stores'
  * crash-safety does NOT depend on the lease — heals/fences cover a
  * single writer crashing; the lease covers the one failure mode they
  * cannot: a second concurrent ingest misconfigured onto the same root. */
object WriterLease {

  final class ConcurrentWriterException(msg: String)
    extends RuntimeException(msg)

  /** Stable id for this writer process (pid@host plus a JVM nonce). */
  val writerId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "/" + java.util.UUID.randomUUID().toString.take(8)

  // roots this JVM currently holds: owning thread id + reentrancy depth.
  // Reentrancy is PER THREAD — a second thread in the same JVM writing
  // the same root is exactly the concurrent-writer misconfiguration the
  // lease exists to catch (and the likeliest one: two streaming queries
  // in one application), so it fails loudly instead of slipping through
  // as "reentrant" and corrupting in-process.
  private val held = scala.collection.mutable.Map[String, (Long, Int)]()

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def leasePath(root: String) = new Path(s"$root/_writer_lease")

  private def readHolder(fsys: FileSystem, p: Path): Option[(String, Long)] =
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
      raw.split(' ') match {
        case Array(id, ts) => ts.toLongOption.map(id -> _)
        case _ => Some(("<unparsable>", 0L)) // torn write: age 0L = ancient → reclaimable
      }
    }

  private def tryClaim(fsys: FileSystem, p: Path): Boolean =
    try {
      val out = fsys.create(p, false) // atomic create-no-overwrite
      try out.write(s"$writerId ${java.lang.System.currentTimeMillis()}"
        .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  /** Run `body` holding the store's writer lease (reentrant per root
    * within this JVM). Throws [[ConcurrentWriterException]] when another
    * live writer holds it. */
  def withLease[T](spark: SparkSession, root: String,
                   staleMs: Long = 30L * 60L * 1000L)(body: => T): T = {
    val me = Thread.currentThread().getId
    val reentrant = synchronized {
      held.get(root) match {
        case Some((owner, d)) if owner == me =>
          held(root) = (owner, d + 1); true
        case Some((owner, _)) =>
          throw new ConcurrentWriterException(
            s"store at $root is being written by thread $owner of THIS " +
              s"process (current thread $me); two concurrent writers per " +
              "store is a deployment error even in-process — serialize the " +
              "two ingests onto one store, or point them at distinct roots")
        case None =>
          held(root) = (me, 1); false
      }
    }
    if (!reentrant) {
      val fsys = fs(spark)
      fsys.mkdirs(new Path(root))
      val p = leasePath(root)
      var claimed = tryClaim(fsys, p)
      if (!claimed) {
        val holder = readHolder(fsys, p)
        val reclaimable = holder.exists { case (id, ts) =>
          // our own id on disk while the in-JVM map says free = a crashed
          // earlier op of this process (a LIVE in-process holder was
          // already rejected above, so this cannot steal from one)
          id == writerId ||
            java.lang.System.currentTimeMillis() - ts > staleMs
        }
        if (reclaimable) {
          fsys.delete(p, false)
          claimed = tryClaim(fsys, p)
        }
        if (!claimed) {
          synchronized { held.remove(root) }
          throw new ConcurrentWriterException(
            s"store at $root is being written by ${holder.map(_._1).getOrElse("?")} " +
              s"(lease ${p}); two concurrent writers per store is a " +
              "deployment error — stop one ingest, or delete the lease if " +
              "the holder is known dead")
        }
      }
    }
    try body
    finally {
      val release = synchronized {
        val (owner, d) = held(root)
        if (d == 1) { held.remove(root); true }
        else { held(root) = (owner, d - 1); false }
      }
      if (release) { fs(spark).delete(leasePath(root), false); () }
    }
  }
}
