package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** [[VectorStore]] — the IVF-cell-partitioned layout: search equivalence
  * to x08's inline path, partition pruning actually reaching the scan, and
  * incremental append against the persisted codebook. */
class VectorStoreSpec extends SparkSpecBase {

  private def freshStore(): (VectorStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("vecstore").toString
    (new VectorStore(spark, dir), dir)
  }

  private def corpus = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  test("store search is row-identical to x08's inline IVF over the same data") {
    val (store, _) = freshStore()
    store.build(corpus)
    val inline = operators.VectorOps.x08AnnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val stored = store.searchContractProbes().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(stored === inline)
  }

  test("search prunes cell directories: scan reads only the selected cells' files") {
    val (store, _) = freshStore()
    store.build(corpus)
    // a single probe's nprobe=2 cell list — the pruning mechanism itself;
    // the fixture's near-uniform probes together cover ~every cell, which
    // is the x37 story (no cluster locality), not a layout failure
    val cells = Seq(0L, store.centroids.agg(max("cent_id")).head.getLong(0))
    val pruned = store.table.filter(col("cell").isin(cells: _*))
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val (prunedFiles, totalFiles) = (filesTouched(pruned), filesTouched(store.table))
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"no file-count reduction: $prunedFiles vs $totalFiles")
    val plan = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell filter did not land as a partition filter:\n$plan")
  }

  test("append assigns against the persisted codebook; appended vectors are searchable") {
    val (store, _) = freshStore()
    // build WITHOUT the probe rows, then append them: the codebook is the
    // reduced corpus's, so this is a genuine drifted-index increment
    store.build(corpus.filter(col("vec_id") >= 10))
    val before = store.table.count()
    store.append(corpus.filter(col("vec_id") < 10))
    assert(store.table.count() === before + 10)
    // every appended vector sits in the cell the PERSISTED codebook ranks
    // closest (round(cos,4) DESC, cent_id) — re-derive driver-side
    val centArr = store.centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def dr4(v: Double): Double = java.math.BigDecimal.valueOf(v * 1e4)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e4
    val got = store.table.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"), col("cell").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getLong(2)))
    got.foreach { case (id, v, cell) =>
      val want = centArr.map { case (c, cv) => (-dr4(cos(v, cv)), c) }.min._2
      assert(cell === want, s"vec $id landed in cell $cell, codebook says $want")
    }
    // and the search still returns k rows per probe over the merged store
    val res = store.searchContractProbes().groupBy("probe_id").count().collect()
    assert(res.nonEmpty && res.forall(_.getLong(1) === 5))
  }

  test("compact collapses append generations; reads are equal; one file per cell") {
    val (store, dir) = freshStore()
    store.build(corpus.filter(col("vec_id") >= 20))
    // five appends → up to five file generations in every touched cell
    (0 until 5).foreach { k =>
      store.append(corpus.filter(col("vec_id") >= k * 4 && col("vec_id") < (k + 1) * 4))
    }
    val beforeRows = store.table.orderBy("vec_id").collect().toSeq
    val beforeSearch = store.searchContractProbes().collect().toSeq
    def dataFiles() = {
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val it = fsys.listFiles(new org.apache.hadoop.fs.Path(s"$dir/vectors"), true)
      var n = 0
      var cells = Set.empty[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) {
          n += 1
          cells += f.getParent.getName
        }
      }
      (n, cells.size)
    }
    val (filesBefore, cellsBefore) = dataFiles()
    assert(filesBefore > cellsBefore, "appends should have fragmented the cells")
    store.compact()
    val (filesAfter, cellsAfter) = dataFiles()
    assert(cellsAfter === cellsBefore, "compact must preserve the cell spec")
    assert(filesAfter === cellsAfter,
      s"one file generation per cell after compact, got $filesAfter/$cellsAfter")
    // read-equality through compact: table rows and search results identical
    assert(store.table.orderBy("vec_id").collect().toSeq === beforeRows)
    assert(store.searchContractProbes().collect().toSeq === beforeSearch)
  }

  test("ST15: streamed vector ingest equals sequential batch-mode appends") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Float], Long)] =
      df.select(col("vec_id"), col("embedding"), col("cell").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    val base = corpus.filter(col("vec_id") >= 20)
    val b1 = corpus.filter(col("vec_id") < 10)
    val b2 = corpus.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    // expected: two batch-mode appends against a fresh store
    val (bStore, _) = freshStore()
    bStore.build(base); bStore.append(b1); bStore.append(b2)
    val expected = rows(bStore.table)
    // actual: the same two batches through the ST15 foreachBatch stream
    val (sStore, sDir) = freshStore()
    sStore.build(base)
    def tup(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Seq[Float])].collect().toSeq
    val input = MemoryStream[(Long, Seq[Float])]
    val q = streaming.StreamOps.vectorIngest(
      input.toDF().toDF("vec_id", "embedding"), sDir,
      java.nio.file.Files.createTempDirectory("st15-ckpt").toString)
    input.addData(tup(b1)); q.processAllAvailable()
    input.addData(tup(b2)); q.processAllAvailable()
    q.stop()
    assert(rows(sStore.table) === expected)
  }

  test("two-rename crash window heals: reads, appends and the next compact " +
       "restore the retired generation") {
    val (store, dir) = freshStore()
    store.build(corpus.filter(col("vec_id") >= 10))
    def results() = store.searchContractProbes().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // searchContractProbes draws probes from the store itself; with the
    // <10 ids held out for the append below, pin a fixed probe set
    val before = store.table.count()
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    // crash between compaction's retire and publish renames
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/vectors_old_7")))
    fsys.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/vectors_compact_7"))
    assert(store.table.count() === before, "read must heal the retired generation")
    assert(fsys.exists(root) &&
      !fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/vectors_compact_7")))
    // crash again, then APPEND: must not fork a fresh store
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/vectors_old_8")))
    store.append(corpus.filter(col("vec_id") < 10))
    assert(store.table.count() === before + 10,
      "append after recovery must land beside the resident rows")
    val grown = results()
    // crash again, then COMPACT: must rewrite the recovered tree
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/vectors_old_9")))
    store.compact()
    assert(store.table.count() === before + 10)
    assert(results() === grown,
      "compact after the crash dropped the retired generation's rows")
  }

  test("replay fence: re-running a completed batch id appends nothing and " +
       "leaves search results unchanged") {
    val (store, _) = freshStore()
    store.build(corpus.filter(col("vec_id") >= 20))
    val b1 = corpus.filter(col("vec_id") < 10)
    val b2 = corpus.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    def results() = store.searchContractProbes().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    store.append(b1, batchId = Some(0L))
    val (n1, r1) = (store.table.count(), results())
    // the crash-and-replay: same completed batch id arrives again
    store.append(b1, batchId = Some(0L))
    assert(store.table.count() === n1, "fenced replay grew the store")
    assert(results() === r1, "fenced replay changed search results")
    // a NEW batch id is not fenced
    store.append(b2, batchId = Some(1L))
    assert(store.table.count() === n1 + b2.count())
    // batch-mode append (no id) keeps plain semantics: it appends
    store.append(b1)
    assert(store.table.count() === n1 + b2.count() + b1.count())
  }

  test("searchTopKAuto arbitrates against the PERSISTED assignment: a " +
       "clustered store certifies (pruned search), an isotropic store " +
       "rejects (exact scan) — each equal to the path the verdict names") {
    def corpusOf(center: String): org.apache.spark.sql.DataFrame =
      spark.range(400).select(col("id").as("vec_id"))
        .withColumn("embedding", expr(
          s"transform(sequence(1, 32), j -> cast($center as float))"))
    // AnnRecallSpec's clustered shape: 19 tight clusters, noise ≪ separation
    val clustered = corpusOf(
      "pmod(xxhash64(vec_id % 19, j), 2000001) / 1000000.0 - 1.0 + " +
      "0.05 * (pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0)")
    val isotropic = spark.range(2000).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        "transform(sequence(1, 32), j -> " +
        "cast(pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0 as float))"))
    def probesOf(st: VectorStore) = st.table.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    def rows5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val (cStore, _) = freshStore()
    cStore.build(clustered)
    assert(rows5(cStore.searchTopKAuto(probesOf(cStore))) ===
           rows5(cStore.searchTopK(probesOf(cStore), nprobe = 2)),
      "certified store must serve the pruned IVF search at the chosen nprobe")
    val (iStore, _) = freshStore()
    iStore.build(isotropic)
    assert(rows5(iStore.searchTopKAuto(probesOf(iStore))) ===
           rows5(operators.VectorOps.exactTopK(
             iStore.table.select(col("vec_id"), col("embedding")),
             probesOf(iStore))),
      "rejected store must serve the exact scan")
  }

  test("a distribution-shifting append — even from ANOTHER store instance " +
       "— forces re-certification: the cached verdict is keyed on store " +
       "contents, not on in-process invalidation") {
    def corpusOf(center: String, n: Int, offset: Long) =
      spark.range(n).select((col("id") + offset).as("vec_id"))
        .withColumn("embedding", expr(
          s"transform(sequence(1, 32), j -> cast($center as float))"))
    val clustered = corpusOf(
      "pmod(xxhash64(vec_id % 19, j), 2000001) / 1000000.0 - 1.0 + " +
      "0.05 * (pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0)", 400, 0L)
    val isotropic = corpusOf(
      "pmod(xxhash64(vec_id, j), 2000001) / 1000000.0 - 1.0", 2000, 10000L)
    def rows5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val (a, dir) = freshStore()
    a.build(clustered)
    def assigned() = a.table.select(col("vec_id"), col("embedding"),
      col("cell").cast("long").as("cluster"))
    val npOld = operators.VectorOps
      .x08ChooseNprobeFrom(assigned(), a.centroids, k = 5)._1
    // populate A's verdict cache on the clustered corpus
    a.searchTopKAuto(a.table.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))).count()
    // a DIFFERENT instance (stand-in for another process's writer — A's
    // in-process invalidation hooks never fire) shifts the distribution
    new VectorStore(spark, dir).append(isotropic)
    // guard: the gate's verdict over the shifted contents differs from
    // the cached one — otherwise this fixture could not detect staleness
    val npNew = operators.VectorOps
      .x08ChooseNprobeFrom(assigned(), a.centroids, k = 5)._1
    assert(npNew !== npOld,
      s"fixture lost its discrimination: verdict $npOld unchanged by the shift")
    // probe from the SHIFTED region, where the two verdicts' paths differ
    val probes = a.table.filter(col("vec_id") >= 10000L && col("vec_id") < 10010L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val fresh = npNew match {
      case Some(w) => rows5(a.searchTopK(probes, nprobe = w))
      case None => rows5(operators.VectorOps.exactTopK(
        a.table.select(col("vec_id"), col("embedding")), probes))
    }
    assert(rows5(a.searchTopKAuto(probes)) === fresh,
      "the shifted store was served from the STALE cached certification — " +
        "the verdict cache must key on store contents (fence + listing)")
  }

  test("mid-append crash BEFORE the commit rename: partial files invisible, " +
       "orphan stage discarded, replay appends exactly once") {
    val (store, dir) = freshStore()
    store.build(corpus.filter(col("vec_id") >= 10))
    val before = store.table.count()
    val b1 = corpus.filter(col("vec_id") < 10)
    // the append dies mid-stage-write
    store.stageAppend(b1, "b0")
    assert(new java.io.File(dir).listFiles
      .exists(_.getName.startsWith("_append_stage_")), "injection failed")
    assert(store.table.count() === before,
      "a reader saw the dead append's partial files")
    // the replayed append discards the orphan and lands the batch once
    store.append(b1, batchId = Some(0L))
    assert(store.table.count() === before + 10)
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.startsWith("_append_stage_")), "orphan stage not discarded")
    // and the fenced replay after convergence is still a no-op
    store.append(b1, batchId = Some(0L))
    assert(store.table.count() === before + 10)
  }

  test("mid-append crash AFTER the commit rename: the next read drains the " +
       "whole batch, fences it, and the replay is a no-op") {
    val (store, dir) = freshStore()
    store.build(corpus.filter(col("vec_id") >= 10))
    val before = store.table.count()
    val b1 = corpus.filter(col("vec_id") < 10)
    // stage + COMMIT, then die before the fence write and the publish move
    store.stageAppend(b1, "b0")
    graft.sources.StagedAppend.commit(spark, dir, "b0")
    // a plain read drains the committed batch to completion and fences it
    assert(store.table.count() === before + 10,
      "committed batch was not drained for a reader")
    assert(graft.sources.AdmitFence.admitted(spark, dir, 0L),
      "draining a committed fenced batch must advance the fence")
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.startsWith("_append_ready_")), "ready dir not cleaned")
    // the replayed append must recognize the fence and append nothing
    store.append(b1, batchId = Some(0L))
    assert(store.table.count() === before + 10,
      "replay after the commit double-appended")
    // appended rows are searchable and cell-assigned like a normal append
    val res = store.searchContractProbes().groupBy("probe_id").count().collect()
    assert(res.nonEmpty && res.forall(_.getLong(1) === 5))
  }
}
