package graft

import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-cell-partitioned embedding store — the vector analogue of
  * [[GraftStore]]/BucketedLayout: the ANN index IS the storage layout.
  *
  * `build` derives the deterministic seed codebook (x08's every-⌊√n⌋-th
  * rule — no trained state), assigns every vector to its max-cosine cell,
  * and writes `cell=<id>/` parquet partitions; the codebook persists
  * beside the data. A search's nprobe cell selection then becomes
  * PARTITION PRUNING — directory elimination before any file IO — instead
  * of x08's full corpus scan-and-assign per query session. At 100 TB this
  * is the difference between an ANN query touching nprobe/√n of the
  * corpus's FILES versus scanning everything to recompute assignments
  * that never change.
  *
  * `append` is the incremental-index primitive (the x42 analogue for
  * vectors): new batches assign against the PERSISTED codebook and land
  * as new files in existing cell directories — no rebuild, no touch of
  * resident data. The codebook drifts from the corpus as appends
  * accumulate; x45 (Lloyd step) measures the drift and x37 (recall gate)
  * decides when a rebuild pays — the maintenance loop a production index
  * runs.
  *
  * Probe-cell selection collects the ≤ |probes|·nprobe distinct cell ids
  * to the driver to form the partition filter — deliberately driver-side,
  * same as [[GraftStore.latest]]: the list is probe-sized (not
  * corpus-sized) by construction, and a literal IN-list is what the
  * parquet source prunes directories with.
  */
class VectorStore(spark: SparkSession, dir: String) {

  private val centDir = s"$dir/centroids"

  // the FILESYSTEM of the store ROOT (not the session default — store
  // roots legitimately live on s3a/gs while defaultFS is HDFS)
  private def fsOf: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The LIVE vectors directory — pointer-resolved: after an object-store
    * compact the current generation is named by `_vectors_gen`
    * ([[graft.sources.GenDir]]); rename-swapped stores keep the classic
    * `vectors` name (no pointer — resolution falls through). */
  private def vecDir: String =
    graft.sources.GenDir.livePath(fsOf, dir, "vectors").toString

  /** Build the store from a (vec_id, embedding) corpus: derive + persist
    * the codebook, assign cells, write the partitioned layout. */
  def build(src: DataFrame): Unit =
      graft.sources.WriterLease.withLease(spark, dir) {
    invalidateVerdicts()
    // a rebuild resets the ingest protocol: stale fence watermarks or
    // staged/ready dirs from a previous store here must not leak in
    val fsys = fsOf
    val rootP = new org.apache.hadoop.fs.Path(dir)
    if (fsys.exists(rootP))
      fsys.listStatus(rootP).map(_.getPath)
        .filter(q => q.getName.startsWith("_admitted") || // floor + b<id> markers
                     q.getName.startsWith("_append_") ||
                     q.getName.startsWith("_fence_lock"))
        .foreach(q => fsys.delete(q, true))
    // a survivor generation pointer would aim the fresh build's writes
    // (and reads) at the PREVIOUS store's retired generation — reset it
    // so the classic `vectors` layout starts clean (we hold the lease)
    graft.sources.GenDir.reset(fsys, dir, "vectors")
    val cents = VectorOps.seedCents(src)
    cents.write.mode("overwrite").parquet(centDir)
    VectorOps.assignCells(src, centroids)
      .withColumnRenamed("cluster", "cell")
      .write.partitionBy("cell").mode("overwrite").parquet(vecDir)
  }

  /** Live-directory resolver for [[graft.sources.StagedAppend]] —
    * pointer-aware: a staged batch's `vectors` files must drain into the
    * CURRENT generation dir, not the classic name a compact may have
    * retired (resolution happens at publish time, the SignatureStore
    * catalog-resolution rule). */
  private def liveFor(name: String): org.apache.hadoop.fs.Path =
    if (name == "vectors") new org.apache.hadoop.fs.Path(vecDir)
    else new org.apache.hadoop.fs.Path(s"$dir/$name")

  /** Drain the staged-append protocol: publish committed-but-undrained
    * batches (crash between commit and publish); writers also discard
    * orphan stage dirs. Metadata-only when clean. A drain changes the
    * store contents, so it invalidates any cached arbitration verdict. */
  private def healAppends(dropStages: Boolean): Seq[String] = {
    val drained = graft.sources.StagedAppend.heal(spark, dir, liveFor, dropStages)
    if (drained.nonEmpty) invalidateVerdicts()
    drained
  }

  /** Incrementally index a new (vec_id, embedding) batch against the
    * persisted codebook — new files in existing cell directories only.
    *
    * `batchId` (streaming ingest) arms the [[graft.sources.AdmitFence]]
    * replay fence: a batch whose append already completed is skipped, so
    * a crash between the append and the checkpoint commit no longer
    * double-indexes the batch on replay (duplicate rows at identical
    * distances would occupy duplicate rank positions at search time and
    * could displace the k-th distinct neighbor). Batch-mode callers omit
    * it and keep plain append semantics.
    *
    * The append runs the [[graft.sources.StagedAppend]] two-phase
    * protocol (round 12): the batch's cell files stage under the store
    * root, one atomic rename commits them, the fence advances, then the
    * files move into the live `cell=<id>/` directories — a crash at ANY
    * point leaves either nothing (stage discarded, replay re-runs once)
    * or a committed batch the next read/append/compact drains to
    * completion (replay recognized by its `b<id>` token, never re-run).
    * Partial batches are never served. */
  def append(batch: DataFrame, batchId: Option[Long] = None): Unit =
      graft.sources.WriterLease.withLease(spark, dir) {
    // heal an interrupted compact first: appending into an absent vecDir
    // would fork a fresh store and orphan every resident row
    val fsys = fsOf
    recover(fsys, underLease = true) // append: NO generation sweep (reader grace)
    healAppends(dropStages = true)
    // the heal advanced the fence for any drained committed batch, so this
    // one check covers every replay path — including our own batch
    // committed by an attempt that crashed before its fence write
    if (!batchId.exists(id => graft.sources.AdmitFence.admitted(spark, dir, id))) {
      val token = batchId.map("b" + _).getOrElse("t" + java.lang.System.nanoTime())
      stageAppend(batch, token)
      graft.sources.StagedAppend.commit(spark, dir, token)
      batchId.foreach(id => graft.sources.AdmitFence.advance(spark, dir, id))
      graft.sources.StagedAppend.publish(spark, dir, token, liveFor)
      invalidateVerdicts()
    }
  }

  /** Phase 1 of the append protocol (exposed for the crash-injection
    * specs, which kill here or after the commit rename). */
  private[graft] def stageAppend(batch: DataFrame, token: String): Unit =
    VectorOps.assignCells(batch, centroids)
      .withColumnRenamed("cluster", "cell")
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"${graft.sources.StagedAppend.stagePath(dir, token)}/vectors")

  /** Collapse append generations: each `append` lands one new file per
    * touched cell directory, so a long ingest tail decays into the
    * small-files regime every other index family already guards against
    * (SignatureStore/VersionedStore/PostingsStore.compact — this closes
    * the LAST store without it). Same stage-swap shape: rewrite into a
    * sibling staging dir (one sorted file generation per cell — vec_id
    * order gives cheap id-range skipping inside a cell), atomically
    * retire-and-publish via two renames, delete the old tree; a crash
    * between the renames is healed by [[recover]] — reads, appends and
    * the next compact roll the retire back (spec-injected). The
    * codebook is untouched — compaction never changes assignments, so
    * reads through [[searchTopK]] are equal before and after
    * (VectorStoreSpec pins read-equality and the file-count collapse). */
  def compact(): Unit =
      graft.sources.WriterLease.withLease(spark, dir) {
    val fsys = fsOf
    recover(fsys, underLease = true, sweepGens = true) // heal an interrupted prior compact first
    // drain committed appends: a compact from a store missing a committed
    // pending batch would silently drop it from the rewrite
    healAppends(dropStages = true)
    val root = new org.apache.hadoop.fs.Path(vecDir)
    val gen = java.lang.System.nanoTime()
    if (graft.sources.AtomicRename.isAtomic(spark, dir)) {
      val staged = new org.apache.hadoop.fs.Path(s"$dir/vectors_compact_$gen")
      val old = new org.apache.hadoop.fs.Path(s"$dir/vectors_old_$gen")
      spark.read.parquet(root.toString)
        .repartition(col("cell"))
        .sortWithinPartitions("vec_id")
        .write.partitionBy("cell").mode("overwrite").parquet(staged.toString)
      require(fsys.rename(root, old), s"compact: could not retire $root")
      require(fsys.rename(staged, root), s"compact: could not publish $staged")
      fsys.delete(old, true)
      ()
    } else {
      // flat object store: stage a fresh GENERATION dir and flip the
      // `_vectors_gen` pointer — one small-object write, no directory
      // rename anywhere ([[graft.sources.GenDir]]); crash garbage
      // (unpublished generations, undeleted predecessors) is swept by
      // the next writer's recover
      val newGen = s"vectors_g$gen"
      spark.read.parquet(root.toString)
        .repartition(col("cell"))
        .sortWithinPartitions("vec_id")
        .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/$newGen")
      graft.sources.GenDir.publish(fsys, dir, "vectors", newGen)
    }
  }

  /** Heal the two-rename window: a compact that crashed between its
    * retire and publish renames leaves `vectors/` absent and the last
    * published tree under `vectors_old_<gen>` — roll the retire BACK
    * (rename old → vectors) and drop any orphan staging trees, so the
    * next read or compact sees exactly the pre-crash store. Single-writer
    * like compaction itself; called by every mutator and resolver. */
  private def recover(fsys: org.apache.hadoop.fs.FileSystem,
                      underLease: Boolean = false,
                      sweepGens: Boolean = false): Unit = {
    if (!graft.sources.AtomicRename.isAtomic(spark, dir)) {
      // pointer mode: the live dir is never absent (the flip is one
      // atomic small-object write), so there is no retire to roll back —
      // only crash garbage to sweep, and ONLY the lease-holding COMPACT
      // may sweep (sweepGens): a lease-free reader's sweep could race a
      // live compact's staging generation, and an APPEND sweeping would
      // collapse publish()'s one-compact-cycle reader grace to the gap
      // between a compact and the next micro-batch (r15 review finding)
      if (underLease && sweepGens) graft.sources.GenDir.sweep(fsys, dir, "vectors")
      return
    }
    val root = new org.apache.hadoop.fs.Path(vecDir)
    if (!fsys.exists(root)) {
      val dirP = new org.apache.hadoop.fs.Path(dir)
      if (fsys.exists(dirP)) {
        fsys.listStatus(dirP).map(_.getPath)
          .filter(_.getName.startsWith("vectors_old_"))
          .sortBy(_.getName.stripPrefix("vectors_old_").toLong)
          .lastOption.foreach { newest =>
            // concurrent lease-free readers can BOTH see the crash window
            // and race this roll-back — the loser's vanished source +
            // present root means the other reader completed the restore
            val rolled = graft.sources.AtomicRename
              .renameOrVanished(fsys, newest, root)
            require(rolled || fsys.exists(root),
              s"recover: could not restore $newest")
          }
      }
    }
    if (fsys.exists(new org.apache.hadoop.fs.Path(dir)))
      fsys.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath)
        .filter(p => (p.getName.startsWith("vectors_old_") ||
                      p.getName.startsWith("vectors_compact_")) && fsys.exists(root))
        .foreach(p => fsys.delete(p, true))
  }

  /** The persisted codebook (cent_id, c_emb) — √n rows. */
  def centroids: DataFrame = spark.read.parquet(centDir)

  /** The whole store as a queryable frame (cell partition column
    * included), healing an interrupted compact first (see [[recover]])
    * and draining any committed-but-unpublished append so a half-moved
    * batch is never served partially. */
  def table: DataFrame = {
    // one FS + pointer resolution per read (vecDir costs an exists+read
    // per call; heals never flip the pointer — only a lease-held compact
    // does, and a reader resolves one consistent generation)
    val fsys = fsOf
    val live = vecDir
    if (!fsys.exists(new org.apache.hadoop.fs.Path(live))) recover(fsys)
    healAppends(dropStages = false)
    spark.read.parquet(live)
  }

  /** IVF top-k over the store: probes pick their nprobe closest persisted
    * centroids, and the corpus side reads ONLY the matching cell
    * directories (partition pruning; VectorStoreSpec asserts the file-count
    * reduction). Ranking is x08's (round(cos,4) DESC, vec_id) contract —
    * output over a just-built store is row-identical to x08AnnIvf. */
  def searchTopK(probes: DataFrame, nprobe: Int = 2, k: Int = 5): DataFrame =
    searchTopKFrom(table, probes, nprobe, k)

  /** [[searchTopK]] over an already-resolved store frame — so callers
    * that bound `table` once (the auto-arbitrated search) do not repeat
    * the heal/recover filesystem scans per stage. */
  private def searchTopKFrom(t: DataFrame, probes: DataFrame,
                             nprobe: Int, k: Int): DataFrame = {
    // one probe window per search: the collected rows yield BOTH the
    // partition filter and (via a literal re-lift) the join side, so the
    // √n-row codebook is read once and the window never re-runs
    val pcRows = VectorOps.probeClusters(centroids, probes, nprobe).collect()
    val cells = pcRows.map(_.getLong(2)).distinct.sorted
    val pc = spark.createDataFrame(
      spark.sparkContext.parallelize(pcRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("probe_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p_emb",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.LongType))))
    val assigned = t
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cluster"))
    VectorOps.ivfSearchClusters(assigned, pc, k)
  }

  /** x08's declared probe set (vec_id < 10) over the store. */
  def searchContractProbes(nprobe: Int = 2, k: Int = 5): DataFrame =
    searchTopK(table.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb")),
      nprobe, k)

  // Cached arbitration verdicts keyed (k, store-content fingerprint): the
  // verdict is a property of the STORE CONTENTS (codebook + cells), not of
  // any one query — and the contents can change OUTSIDE this instance (a
  // writer process appends and publishes; this reader JVM never observes a
  // ready dir that was already drained). In-process invalidation alone
  // would serve a stale recall certification indefinitely as the corpus
  // drifts (r12 ADVICE), so the cache key IS the contents: the fence
  // watermark plus the vectors/ file-listing signature (paths, sizes,
  // mtimes). Any append/compact/build — this instance's or another
  // process's — changes the listing and forces re-certification; the same
  // mechanism is the DRIFT trigger (r12 verdict item 6): a
  // distribution-shifting append can never be served from the old verdict.
  // Cost: one recursive listing per auto-search — the same metadata class
  // as the parquet read planning the search performs anyway.
  @transient private var verdicts = Map.empty[(Int, Long), Option[Int]]

  private def invalidateVerdicts(): Unit = synchronized { verdicts = Map.empty }

  private def contentFingerprint(
      fsys: org.apache.hadoop.fs.FileSystem): Long = {
    val root = new org.apache.hadoop.fs.Path(vecDir)
    // a compact/build in ANOTHER process can retire `vectors/` (rename)
    // or remove files between hasNext and next — a vanished entry means
    // "contents changed mid-listing", so re-list instead of throwing out
    // of a pure read; bounded retries, then propagate (truly wedged)
    def listOnce(): Seq[(String, Long, Long)] = {
      val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      if (fsys.exists(root)) {
        val it = fsys.listFiles(root, true)
        while (it.hasNext) {
          val st = it.next()
          files += ((st.getPath.toString, st.getLen, st.getModificationTime))
        }
      }
      files.toSeq
    }
    // cheap state probe for the retry gate: top-level entry names+mtimes.
    // A failure with an UNCHANGED probe across attempts is a persistent
    // real error (permissions, bad mount) — rethrow like the sibling
    // vanished-source sites (renameOrVanished, StagedAppend) instead of
    // burning 5 retries of sleeps on every fingerprint
    def shallow(): Seq[(String, Long)] =
      try {
        if (!fsys.exists(root)) Nil
        else fsys.listStatus(root).toSeq
          .map(st => (st.getPath.getName, st.getModificationTime)).sorted
      } catch { case _: java.io.IOException => Nil } // itself mid-mutation
    var attempt = 0
    var lastProbe: Option[Seq[(String, Long)]] = None
    var listed: Seq[(String, Long, Long)] = null
    while (listed == null) {
      attempt += 1
      // FileNotFound OR the Linux vanished-dir EACCES (File.list()
      // returns null mid-deletion; Hadoop maps it to AccessDenied) —
      // both read as "contents changed mid-listing", but only retry
      // while the state plausibly IS changing: root vanished, or the
      // shallow probe moved since the previous failure
      try listed = listOnce()
      catch { case e: java.io.IOException =>
        val probe = shallow()
        val unchanged = fsys.exists(root) && lastProbe.contains(probe)
        if (attempt >= 5 || unchanged) throw e
        lastProbe = Some(probe)
        Thread.sleep(25L * attempt)
      }
    }
    listed.sortBy(_._1).foldLeft( // sorted: listing order is not contractual
      graft.sources.AdmitFence.upto(spark, dir) + 1125899906842597L) {
      case (h, (p, len, mt)) =>
        ((h * 31L + p.hashCode.toLong) * 31L + len) * 31L + mt
    }
  }

  /** [[searchTopK]] with nprobe ARBITRATED against the store's own
    * PERSISTED assignment — the gate re-derives nothing corpus-sized
    * (the `cell` partition column IS the cluster id, read straight off
    * the layout): a certified nprobe serves the pruned IVF search, a
    * rejection serves the exact scan over the store. The per-corpus
    * decision the r11 fidelity rehearsal prescribed, executable at the
    * serving layer where it matters. The verdict is measured ONCE per
    * store state (cached by k; mutations invalidate) — per-query
    * re-certification would cost more than the exact scan it guards
    * against. */
  def searchTopKAuto(probes: DataFrame, k: Int = 5): DataFrame = {
    val t = table // ONE heal/recover + listing for the gate and the serving
    val fsys = fsOf
    val fp = contentFingerprint(fsys) // AFTER table's heal — post-drain state
    val np = synchronized(verdicts.get((k, fp))) match {
      case Some(v) => v
      case None =>
        val v = VectorOps.x08ChooseNprobeFrom(
          t.select(col("vec_id"), col("embedding"),
            col("cell").cast("long").as("cluster")),
          centroids, k = k)._1
        synchronized {
          if (verdicts.size >= 64) verdicts = Map.empty // bound a long server
          verdicts += (k, fp) -> v
        }
        v
    }
    np match {
      case Some(w) => searchTopKFrom(t, probes, w, k)
      case None => VectorOps.exactTopK(
        t.select(col("vec_id"), col("embedding")), probes, k)
    }
  }
}
