package graft

import graft.sources.PostingsStore
import org.apache.spark.sql.functions._

/** [[PostingsStore]] — the persisted inverted index must serve exactly the
  * declared x83 BM25 rows while reading ONLY the query terms' hash
  * buckets (the inverted-index contract: query work ∝ posting lists, not
  * corpus size). */
class PostingsStoreSpec extends SparkSpecBase {

  private val queryTerms = Seq("hash", "join", "filter")

  test("store-served BM25 equals declared x83; scan reads only the query buckets") {
    val dir = java.nio.file.Files.createTempDirectory("postings").toString
    val st = new PostingsStore(spark, dir)
    st.build(Tables.documents(spark, sfDir), buckets = 64)
    val served = st.bm25(queryTerms, k = 20)
    val declared = operators.TextOps.x83Bm25(spark, sfDir)
    // row-identical: same docs, same term counts, same dround'd scores
    assert(served.count() === declared.count())
    assert(served.except(declared).isEmpty && declared.except(served).isEmpty)
    // pruning: the served plan reads only the ≤3 buckets the terms hash
    // to, out of the 64 the store wrote
    val touched = served.inputFiles.filter(_.contains("/tb="))
      .map(_.split("/tb=")(1).split("/")(0).toLong).toSet
    assert(touched.size <= queryTerms.size, s"read ${touched.size} buckets")
    val written = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).count(_.startsWith("tb="))
    assert(written > touched.size, "store too small for the pruning claim to bite")
    // term predicate reaches the parquet scan inside the pruned buckets
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("In(term"), s"term filter not pushed:\n$plan")
  }

  test("append grows the index incrementally: build(A)+append(B) serves build(A∪B)'s rows") {
    val docs = Tables.documents(spark, sfDir)
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val incDir = java.nio.file.Files.createTempDirectory("postings_inc").toString
    val inc = new PostingsStore(spark, incDir)
    inc.build(a, buckets = 32)
    inc.append(b)
    val fullDir = java.nio.file.Files.createTempDirectory("postings_full").toString
    val full = new PostingsStore(spark, fullDir)
    full.build(docs, buckets = 32)
    val servedInc = inc.bm25(queryTerms, k = 20)
    val servedFull = full.bm25(queryTerms, k = 20)
    assert(servedInc.count() === servedFull.count())
    assert(servedInc.except(servedFull).isEmpty && servedFull.except(servedInc).isEmpty)
  }

  test("a term hashing to a NEVER-WRITTEN bucket returns empty, not a read error") {
    // sparse corpus + many buckets: most tb= dirs never exist on disk
    val dir = java.nio.file.Files.createTempDirectory("postings_ghost").toString
    val st = new PostingsStore(spark, dir)
    st.build(Tables.documents(spark, sfDir).filter(col("doc_id") < 5), buckets = 512)
    val written = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("tb="))
      .map(_.stripPrefix("tb=").toLong).toSet
    assert(written.size < 512, "fixture too dense for a ghost bucket to exist")
    // find a probe term whose bucket was never written (writer's own hash)
    val ghost = (0 until 64).map(i => s"ghost_term_$i").find { t =>
      val tb = spark.range(1).select(
        pmod(xxhash64(lit(t)), lit(512L)).as("tb")).head().getLong(0)
      !written.contains(tb)
    }
    assert(ghost.isDefined, "no probe term hashed outside the written buckets")
    // the serving path must return the empty top-k, not throw
    assert(st.bm25(Seq(ghost.get)).count() === 0)
    // and a mixed query ignores the ghost-bucket term entirely
    val mixed = st.bm25(queryTerms :+ ghost.get, k = 20)
    val base = st.bm25(queryTerms, k = 20)
    assert(mixed.except(base).isEmpty && base.except(mixed).isEmpty)
  }

  test("compact collapses append's file generations; served rows and stats unchanged") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("postings_cpt").toString
    val st = new PostingsStore(spark, dir)
    st.build(docs.filter(col("doc_id") % 3 === 1), buckets = 16)
    st.append(docs.filter(col("doc_id") % 3 === 2))
    st.append(docs.filter(col("doc_id") % 3 === 0))
    def files(tb: java.io.File) =
      tb.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    val dirsBefore = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("tb="))
    assert(dirsBefore.exists(files(_).length >= 3),
      "appends should have left multiple file generations per bucket")
    val before = st.bm25(queryTerms, k = 20).collect().toSet
    // stats are additive delta rows (one per append, round 12) — the
    // MEANING compact must preserve is their sum, which it folds to 1 row
    val statsBefore = spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs"), sum("sum_len")).head()
    st.compact()
    // one file generation per bucket after
    val dirsAfter = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("tb="))
    assert(dirsAfter.nonEmpty && dirsAfter.forall(files(_).length === 1),
      s"buckets still fragmented: ${dirsAfter.map(d => files(d).length).toSeq}")
    assert(dirsAfter.map(_.getName).toSet === dirsBefore.map(_.getName).toSet,
      "compact must preserve the bucket spec")
    // read equality through the compaction; summed stats preserved
    assert(st.bm25(queryTerms, k = 20).collect().toSet === before)
    assert(spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs"), sum("sum_len")).head() === statsBefore)
    // pruning still bites: a query touches ≤ |terms| of the 16 buckets
    val touched = st.bm25(queryTerms, k = 20).inputFiles
      .filter(_.contains("/tb=")).map(_.split("/tb=")(1).split("/")(0)).toSet
    assert(touched.size <= queryTerms.size)
  }

  test("two-rename crash window heals: reads, appends and the next compact " +
       "recover the retired generation instead of forking or dropping it") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("postings_crash").toString
    val st = new PostingsStore(spark, dir)
    st.build(docs.filter(col("doc_id") % 3 === 1), buckets = 16)
    val before = st.bm25(queryTerms, k = 20).collect().toSet
    // inject the crash: compact retired postings/ -> postings_old_<gen>
    // and died before publishing the staged tree
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$dir/postings")
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/postings_old_7")))
    fsys.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/postings_compact_7")) // orphan stage
    // a read heals and serves the pre-crash rows
    assert(st.bm25(queryTerms, k = 20).collect().toSet === before)
    assert(fsys.exists(root), "recover must restore postings/")
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/postings_compact_7")),
      "recover must GC the orphan staging tree")
    // crash again, then APPEND: must not fork a fresh index
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/postings_old_8")))
    st.append(docs.filter(col("doc_id") % 3 === 2))
    val grown = st.bm25(queryTerms, k = 20).collect().toSet
    assert(grown.nonEmpty && grown != before, "append after recovery must serve old+new")
    // crash again, then COMPACT: must fold the retired generation, not partials-only
    assert(fsys.rename(root, new org.apache.hadoop.fs.Path(s"$dir/postings_old_9")))
    st.compact()
    assert(st.bm25(queryTerms, k = 20).collect().toSet === grown,
      "compact after the crash dropped the retired generation's history")
  }

  test("posture migration: an atomic-posture compact on a store carrying " +
       "surviving generation pointers resolves them instead of throwing") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("postings_mig").toString
    val st = new PostingsStore(spark, dir)
    st.build(docs.filter(col("doc_id") % 3 === 1), buckets = 16)
    val before = st.bm25(queryTerms, k = 20).collect().toSet
    // simulate the object-store life this store migrated FROM: live data
    // under generation names, classic roots absent, pointers surviving
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq("postings", "stats").foreach { base =>
      assert(fsys.rename(new org.apache.hadoop.fs.Path(s"$dir/$base"),
        new org.apache.hadoop.fs.Path(s"$dir/${base}_g5")))
      val o = fsys.create(new org.apache.hadoop.fs.Path(s"$dir/_${base}_gen"), true)
      try o.write(s"${base}_g5".getBytes("UTF-8")) finally o.close()
    }
    assert(st.bm25(queryTerms, k = 20).collect().toSet === before,
      "pointer-resolved reads broke under the migrated layout")
    // the advisor's scenario: atomic-mode compact reading the CLASSIC dir
    // here either throws (classic root absent) or forks a stale index
    st.compact()
    assert(st.bm25(queryTerms, k = 20).collect().toSet === before,
      "compact on the migrated store changed served rows")
    // appends keep working through the pointer-resolved roots
    st.append(docs.filter(col("doc_id") % 3 === 2))
    val grown = st.bm25(queryTerms, k = 20).collect().toSet
    assert(grown.nonEmpty && grown != before)
  }

  test("flat store: an append does NOT reclaim the deferred predecessor " +
       "generation — only the next compact does (reader grace, r15 review " +
       "finding); and the stats pair derives from the postings pointer") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[FlatObjectFs].getName)
    val dir = "s3a://test" +
      java.nio.file.Files.createTempDirectory("postings-flat").toString
    val fsys = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    def names() = fsys.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    val docs = Tables.documents(spark, sfDir)
    val st = new PostingsStore(spark, dir)
    st.build(docs.filter(col("doc_id") % 3 === 1), buckets = 8)
    val before = st.bm25(queryTerms, k = 20).collect().toSet
    st.compact() // pointer mode: publishes postings_g*/stats_g*, defers classic
    assert(names().exists(_.startsWith("postings_g")))
    assert(names().contains("postings"),
      "the retired classic generation must be deferred at the pointer flip")
    // an APPEND between compacts must not sweep the deferred predecessor —
    // a reader that resolved it pre-flip may still be mid-scan
    st.append(docs.filter(col("doc_id") % 3 === 2))
    assert(names().contains("postings"),
      "append's heal reclaimed the deferred generation — the reader grace " +
        "the deferred-deletion rework exists for is collapsed")
    val grown = st.bm25(queryTerms, k = 20).collect().toSet
    assert(grown.nonEmpty && grown != before)
    // the NEXT compact reclaims it (one full cycle of grace)
    st.compact()
    assert(!names().contains("postings"),
      "the second compact's sweep must reclaim the deferred classic dir")
    assert(st.bm25(queryTerms, k = 20).collect().toSet === grown)
    // damage tolerance: the bookkeeping stats pointer is NOT a query
    // input — aiming it at a nonexistent generation changes nothing
    val o = fsys.create(new org.apache.hadoop.fs.Path(s"$dir/_stats_gen"), true)
    try o.write("stats_g999999".getBytes("UTF-8")) finally o.close()
    assert(st.bm25(queryTerms, k = 20).collect().toSet === grown,
      "queries read the stats pointer — the derived-pair rule is broken")
  }

  test("an unindexed term contributes nothing; empty query intersection returns no rows") {
    val dir = java.nio.file.Files.createTempDirectory("postings2").toString
    val st = new PostingsStore(spark, dir)
    st.build(Tables.documents(spark, sfDir), buckets = 16)
    val withGhost = st.bm25(queryTerms :+ "zzz_not_a_token_zzz", k = 20)
    val base = st.bm25(queryTerms, k = 20)
    assert(withGhost.except(base).isEmpty && base.except(withGhost).isEmpty)
    assert(st.bm25(Seq("zzz_not_a_token_zzz")).count() === 0)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("mid-append crash BEFORE the commit rename: partials invisible (stats " +
       "and postings stay CONSISTENT), orphan discarded, replay exactly once") {
    val docs = Tables.documents(spark, sfDir)
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("postings-sc").toString
    val st = new PostingsStore(spark, dir)
    st.build(a, buckets = 16)
    val preCrash = rows(st.bm25(queryTerms, k = 20))
    // the append dies mid-stage-write: postings AND the stats delta sit in
    // the stage dir — the pre-r12 shape could instead crash BETWEEN the
    // live postings append and the stats write, leaving avglen wrong forever
    st.stageAppend(b, "b0")
    assert(rows(st.bm25(queryTerms, k = 20)) === preCrash,
      "a reader saw the dead append's partial files")
    // the replayed fenced append discards the orphan and lands the batch once
    st.append(b, batchId = Some(0L))
    val full = new PostingsStore(spark,
      java.nio.file.Files.createTempDirectory("postings-ref").toString)
    full.build(docs, buckets = 16)
    assert(rows(st.bm25(queryTerms, k = 20)) === rows(full.bm25(queryTerms, k = 20)),
      "recovered store diverged from a from-scratch build over A∪B")
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.startsWith("_append_stage_")), "orphan stage not discarded")
  }

  test("mid-append crash AFTER the commit rename: a reader drains postings+" +
       "stats together, the fence advances, and the replay is a no-op") {
    val docs = Tables.documents(spark, sfDir)
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("postings-cc").toString
    val st = new PostingsStore(spark, dir)
    st.build(a, buckets = 16)
    st.stageAppend(b, "b0")
    graft.sources.StagedAppend.commit(spark, dir, "b0")
    // a plain read drains the committed batch — postings and the stats
    // delta land TOGETHER, so the served scores equal a from-scratch build
    val full = new PostingsStore(spark,
      java.nio.file.Files.createTempDirectory("postings-ref2").toString)
    full.build(docs, buckets = 16)
    assert(rows(st.bm25(queryTerms, k = 20)) === rows(full.bm25(queryTerms, k = 20)),
      "drained store diverged from a from-scratch build over A∪B")
    assert(graft.sources.AdmitFence.admitted(spark, dir, 0L),
      "draining a committed fenced batch must advance the fence")
    // the replayed fenced append appends nothing (the pre-r12 caveat:
    // 'a re-appended batch doubles its tf rows' — closed)
    st.append(b, batchId = Some(0L))
    assert(rows(st.bm25(queryTerms, k = 20)) === rows(full.bm25(queryTerms, k = 20)),
      "fenced replay changed the served scores (double-appended tf rows)")
    // and compact folds the additive stats deltas back to one row
    st.compact()
    assert(rows(st.bm25(queryTerms, k = 20)) === rows(full.bm25(queryTerms, k = 20)))
    val statsFiles = new java.io.File(s"$dir/stats").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(statsFiles === 1, s"compact left $statsFiles stats files")
  }
}
