package graft

import graft.functions.MinHashLSH
import graft.sources.{AdmitFence, PostingsStore, SignatureStore, StagedAppend}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed ingest DAG under fire (r12 verdict item 2): ONE
  * application drives all three index families — SignatureStore (ST12/
  * ST13), VectorStore (ST15), PostingsStore (ST27) — through 21
  * micro-batches with seeded-random crash injection, interleaved reader
  * heals, fenced full-batch replays, and mid-run compactions, then
  * asserts tri-store exactly-once convergence. Each protocol is already
  * spec-verified in isolation; what only this suite exercises is the
  * COMPOSITION: three fence files and three staged-append protocols side
  * by side in one session, a reader heal of store A racing the replay of
  * store B, a compact draining a crashed batch another store's replay is
  * about to re-claim — the exact shape a production foreachBatch ingest
  * runs.
  *
  * Crash matrix per (batch, store), seeded rng so every run replays the
  * same kill schedule:
  *   0 clean            — the op completes, fence advances;
  *   1 stage-crash      — dies mid-stage-write (orphan stage dir, nothing
  *                        durable) → replay must append exactly once;
  *   2 commit-crash     — dies AFTER the atomic commit rename, before the
  *                        fence write and any publish → whoever touches
  *                        the store next (often a READER of a different
  *                        store family in this suite) drains and fences
  *                        it, and the replay must be a no-op;
  *   3 replay-after-ok  — the op completes, then the same batch id
  *                        arrives again (checkpoint crashed after the
  *                        append) → the fence must make it a no-op;
  *   4 fence-crash      — dies AFTER the fence write, before any publish
  *                        move → the batch is admitted but its files all
  *                        still sit in the ready dir; the next heal must
  *                        publish them to completion while the replay
  *                        (already fenced) appends nothing.
  * Every 5th batch additionally re-runs the WHOLE tri-store batch body
  * under the same batch id — the "crash between stores in the same
  * micro-batch" restart shape, where stores that already admitted the id
  * skip while any that had not yet run complete.
  *
  * Convergence oracles are order-independent closed forms: the fixture's
  * distinct docs share zero tokens (verified Jaccard 0 — never matched)
  * and dups are exact copies (J = 1.0 — always matched), so the
  * signature store must hold EXACTLY the first occurrence of every
  * unique doc, each batch's durable pairs sink exactly its dup →
  * first-occurrence edges, the vector store exactly one row per appended
  * vec_id, and the postings store must serve BM25 row-identically to a
  * from-scratch build over the union of every batch — fences, stats
  * deltas, and compactions included. */
class IngestSoakSpec extends SparkSpecBase with SigCatalogSerialized {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def textOf(uid: Long) =
    s"w${uid}a w${uid}b w${uid}c w${uid}d w${uid}e"

  private def embOf(id: Long): Seq[Float] =
    Seq.tabulate(8)(j => (((id * 31 + j * 17) % 101).toFloat - 50f) / 50f)

  private def sigDf(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, uid) => (id, textOf(uid)) }.toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
  }

  private def postDf(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, uid) => (id, textOf(uid)) }.toDF("doc_id", "text")
  }

  private def vecDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, embOf(id))).toDF("vec_id", "embedding")
  }

  test("21 crash-injected micro-batches across all three index stores " +
       "converge to exactly-once, equal to the batch-mode build") {
    triStoreSoak(identity)
  }

  test("the same tri-store soak on a FLAT OBJECT STORE (rename = " +
       "copy+delete): marker commits, PUT fences, pointer compacts — " +
       "same exactly-once oracles (r13 verdict item 4)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[FlatObjectFs].getName)
    // same seed, same kill schedule — only the filesystem posture changes
    triStoreSoak(local => s"s3a://test$local")
  }

  /** The tri-store soak body, root-mapped so the same kill schedule runs
    * on the local (atomic-rename) posture and the flat-object-store one. */
  private def triStoreSoak(rootOf: String => String): Unit = {
    val rng = new scala.util.Random(0xC13)
    val sigRoot = rootOf(tmp("soak-sig"))
    val vecRoot = rootOf(tmp("soak-vec"))
    val postRoot = rootOf(tmp("soak-post"))
    val pairsRoot = rootOf(tmp("soak-pairs"))
    val P = MinHashLSH.Params()

    // —— initial corpora ————————————————————————————————————————————
    val initialUids = (0L until 8L).map(u => (900000L + u, u))
    SignatureStore.write(spark, sigDf(initialUids), sigRoot)
    val vec = new VectorStore(spark, vecRoot)
    val initialVecIds = (700000L until 700040L)
    vec.build(vecDf(initialVecIds))
    val post = new PostingsStore(spark, postRoot)
    post.build(postDf(initialUids), buckets = 8)

    // driver-side ground truth (order-independent)
    var firstOcc = initialUids.map { case (id, u) => u -> id }.toMap
    var priorUids: Seq[Long] = initialUids.map(_._2) // dup targets: PREVIOUS batches only
    var nextUid = 8L
    var expectedSigIds = initialUids.map(_._1).toSet
    var expectedVecIds = initialVecIds.toSet
    var allRows = initialUids // for the postings reference build
    val expectedPairs = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]

    def maybeRead(): Unit = rng.nextInt(4) match {
      case 0 => spark.table("sig_docs").count() // sig reader heal
      case 1 => vec.table.count()               // vec reader heal
      case 2 => post.bm25(Seq("w0a", "w3c"), 5).count() // postings heal
      case _ => ()
    }

    def mode(): Int = Seq(0, 1, 2, 3, 4, 0)(rng.nextInt(6))

    def runSig(b: Long, batch: DataFrame, m: Int): Unit = {
      val sink = s"$pairsRoot/batch_id=$b"
      m match {
        case 1 => // dies mid-stage: orphan stage dir, nothing durable
          SignatureStore.stageAppend(spark, sigRoot, s"b$b", batch, P, None)
        case 2 | 4 => // replicate admit's pre-crash work, die after the
          // commit (mode 2) or after the fence write too (mode 4)
          SignatureStore.incrementPairs(spark, batch, 0.8)
            .write.mode("overwrite").parquet(sink)
          val pairs = spark.read
            .schema("id_a BIGINT, id_b BIGINT, j DOUBLE").parquet(sink)
          val novel = batch.join(
            pairs.select(col("id_a").as("id")).distinct(), Seq("id"), "left_anti")
          SignatureStore.stageAppend(spark, sigRoot, s"b$b", novel, P, None)
          StagedAppend.commit(spark, sigRoot, s"b$b")
          if (m == 4) AdmitFence.advance(spark, sigRoot, b) // die pre-publish
        case _ => ()
      }
      maybeRead() // a reader (any store) may drain the corpse first
      SignatureStore.admit(spark, batch, 0.8, sink, batchId = Some(b))
      if (m == 3) // checkpoint died after completion — replay is a no-op
        SignatureStore.admit(spark, batch, 0.8, sink, batchId = Some(b))
    }

    def runVec(b: Long, batch: DataFrame, m: Int): Unit = {
      m match {
        case 1 => vec.stageAppend(batch, s"b$b")
        case 2 | 4 =>
          vec.stageAppend(batch, s"b$b")
          StagedAppend.commit(spark, vecRoot, s"b$b")
          if (m == 4) AdmitFence.advance(spark, vecRoot, b) // die pre-publish
        case _ => ()
      }
      maybeRead()
      vec.append(batch, Some(b))
      if (m == 3) vec.append(batch, Some(b))
    }

    def runPost(b: Long, batch: DataFrame, m: Int): Unit = {
      m match {
        case 1 => post.stageAppend(batch, s"b$b")
        case 2 | 4 =>
          post.stageAppend(batch, s"b$b")
          StagedAppend.commit(spark, postRoot, s"b$b")
          if (m == 4) AdmitFence.advance(spark, postRoot, b) // die pre-publish
        case _ => ()
      }
      maybeRead()
      post.append(batch, Some(b))
      if (m == 3) post.append(batch, Some(b))
    }

    // —— the soak ————————————————————————————————————————————————————
    (0L until 21L).foreach { b =>
      val rows: Seq[(Long, Long)] = (0 until 5).map { i =>
        val id = b * 100L + i
        if (priorUids.nonEmpty && rng.nextInt(10) < 3) {
          val uid = priorUids(rng.nextInt(priorUids.size)) // exact dup
          expectedPairs(b) = expectedPairs.getOrElse(b, Set.empty) +
            ((id, firstOcc(uid)))
          (id, uid)
        } else {
          val uid = nextUid; nextUid += 1
          firstOcc += uid -> id
          expectedSigIds += id
          (id, uid)
        }
      }
      expectedPairs.getOrElseUpdate(b, Set.empty)
      expectedVecIds ++= rows.map(_._1)
      allRows ++= rows

      runSig(b, sigDf(rows), mode())
      runVec(b, vecDf(rows.map(_._1)), mode())
      runPost(b, postDf(rows), mode())

      // the "crash BETWEEN stores" restart: the whole micro-batch body
      // re-runs under the same id — every store must fence it
      if (b % 5L == 4L) {
        runSig(b, sigDf(rows), 0)
        runVec(b, vecDf(rows.map(_._1)), 0)
        runPost(b, postDf(rows), 0)
      }

      // mid-run maintenance, interleaved with crashed batches' corpses
      if (b == 7L) SignatureStore.compact(spark, sigRoot)
      if (b == 13L) vec.compact()
      if (b == 17L) post.compact()

      priorUids = firstOcc.keys.toSeq.sorted // next batch may dup anything seen
    }

    // —— convergence: exactly-once everywhere ————————————————————————
    val sigIds = spark.table("sig_docs").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(sigIds.length === sigIds.distinct.length,
      "sig_docs holds a double-appended doc")
    assert(sigIds.toSet === expectedSigIds,
      "sig_docs diverged from the first-occurrence set")
    val setIds = spark.table("sig_sets").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(setIds.length === setIds.distinct.length, "sig_sets double-append")
    assert(setIds.toSet === expectedSigIds)

    expectedPairs.foreach { case (b, exp) =>
      val got = spark.read.schema("id_a BIGINT, id_b BIGINT, j DOUBLE")
        .parquet(s"$pairsRoot/batch_id=$b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === exp, s"batch $b durable pairs diverged")
    }

    val vecIds = vec.table.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(vecIds.length === vecIds.distinct.length,
      "vector store holds a double-appended vec_id")
    assert(vecIds.toSet === expectedVecIds)

    // postings: serving equality against a from-scratch union build —
    // fences, additive stats deltas, and the compact all fold away
    val ref = new PostingsStore(spark, rootOf(tmp("soak-post-ref")))
    ref.build(postDf(allRows), buckets = 8)
    val dupUid = expectedPairs.values.flatten.headOption
      .map { case (_, fo) => firstOcc.collectFirst { case (u, id) if id == fo => u }.get }
      .getOrElse(0L)
    val probeTerms = Seq(s"w${dupUid}a", s"w${dupUid}c", "w0a", "w11b", "nosuchterm")
    def served(st: PostingsStore) = st.bm25(probeTerms, 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served(post) === served(ref),
      "soaked postings store diverged from the batch-mode union build")

    // all three fences sit at the last batch; no protocol corpse remains
    assert(AdmitFence.upto(spark, sigRoot) === 20L)
    assert(AdmitFence.upto(spark, vecRoot) === 20L)
    assert(AdmitFence.upto(spark, postRoot) === 20L)
    Seq(sigRoot, vecRoot, postRoot).foreach { root =>
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fsys = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val leftovers = fsys.listStatus(rootP).map(_.getPath.getName)
        .filter(n => n.startsWith("_append_") || n == "_fence_lock")
      assert(leftovers.isEmpty, s"protocol corpse survived the soak: " +
        s"$root -> ${leftovers.mkString(",")}")
    }
  }

  test("ST13 routed split-router soak: 12 crash-injected batches keep the " +
       "leak-safe split invariant — dups inherit their first occurrence's " +
       "split, splits and signatures land atomically exactly once") {
    import spark.implicits._
    val rng = new scala.util.Random(0x513)
    val sigRoot = tmp("soak-routed")
    val outRoot = tmp("soak-routed-out")
    val P = MinHashLSH.Params()

    val initialUids = (0L until 6L).map(u => (800000L + u, u))
    SignatureStore.writeRouted(spark, sigDf(initialUids), sigRoot)

    // precompute the whole batch plan so the closed-form expectations
    // (including SplitRule evaluations) exist before the crash loop runs
    var firstOcc = initialUids.map { case (id, u) => u -> id }.toMap
    var nextUid = 6L
    var priorUids: Seq[Long] = initialUids.map(_._2)
    val plan = (0L until 12L).map { b =>
      val rows = (0 until 4).map { i =>
        val id = 810000L + b * 100L + i
        if (priorUids.nonEmpty && rng.nextInt(10) < 4)
          (id, priorUids(rng.nextInt(priorUids.size)), true)
        else { val u = nextUid; nextUid += 1; firstOcc += u -> id; (id, u, false) }
      }
      priorUids = firstOcc.keys.toSeq.sorted
      b -> rows
    }
    val allIds = initialUids.map(_._1) ++ plan.flatMap(_._2.map(_._1))
    val splitOf: Map[Long, String] = allIds.toDF("id")
      .select(col("id"), graft.functions.SplitRule.of(col("id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected routed rows per batch: a dup inherits its first
    // occurrence's split (which is SplitRule of the FIRST OCC id — every
    // admitted doc was novel when admitted); a novel doc splits by its own
    def expected(rows: Seq[(Long, Long, Boolean)]) = rows.map {
      case (id, uid, true) =>
        (id, Some(firstOcc(uid)), 1, splitOf(firstOcc(uid)))
      case (id, _, false) => (id, None, 0, splitOf(id))
    }.sortBy(_._1)

    def readRouted(b: Long) = spark.read
      .schema("id BIGINT, match_id BIGINT, matched INT, split STRING")
      .parquet(s"$outRoot/batch_id=$b").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getInt(2), r.getString(3))).toSeq.sortBy(_._1)

    plan.foreach { case (b, rows) =>
      val batch = sigDf(rows.map { case (id, uid, _) => (id, uid) })
      val out = s"$outRoot/batch_id=$b"
      Seq(0, 0, 1, 2, 3, 0)(rng.nextInt(6)) match {
        case 1 => // dies mid-stage: orphan discarded by the replay
          SignatureStore.stageAppend(spark, sigRoot, s"b$b", batch, P,
            splits = Some(batch.select(col("id"),
              graft.functions.SplitRule.of(col("id")).as("split"))))
        case 2 => // dies after the commit: routed sink durable, sigs AND
          // splits committed atomically, fence unmoved — the closed form
          // IS routeAndAdmit's pre-crash state (pinned by clean batches)
          val exp = expected(rows)
          exp.map { case (id, m, f, s) => (id, m, f, s) }
            .toDF("id", "match_id", "matched", "split")
            .select(col("id"), col("match_id"), col("matched"), col("split"))
            .write.mode("overwrite").parquet(out)
          val novel = rows.collect { case (id, _, false) => id }
          SignatureStore.stageAppend(spark, sigRoot, s"b$b",
            batch.filter(col("id").isin(novel: _*)), P,
            splits = Some(novel.map(id => (id, splitOf(id)))
              .toDF("id", "split")))
          StagedAppend.commit(spark, sigRoot, s"b$b")
        case _ => ()
      }
      if (rng.nextBoolean()) spark.table("sig_splits").count() // reader heal
      val routed = SignatureStore.routeAndAdmit(spark, batch, out,
        batchId = Some(b))
      routed.count()
      if (rng.nextInt(3) == 0) // checkpoint died after completion
        SignatureStore.routeAndAdmit(spark, batch, out, batchId = Some(b)).count()
      assert(readRouted(b) === expected(rows), s"batch $b routed rows diverged")
      if (b == 6L) SignatureStore.compact(spark, sigRoot)
    }

    // exactly-once + the leak-safe invariant over the whole run
    val expectedIds = firstOcc.values.toSet
    val splitRows = spark.table("sig_splits").select("id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(splitRows.map(_._1).length === splitRows.map(_._1).distinct.length,
      "sig_splits holds a double-appended row")
    assert(splitRows.map(_._1).toSet === expectedIds,
      "sig_splits diverged from the first-occurrence set")
    splitRows.foreach { case (id, s) =>
      assert(s === splitOf(id), s"admitted doc $id carries a foreign split")
    }
    val sigIds = spark.table("sig_docs").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(sigIds.length === sigIds.distinct.length)
    assert(sigIds.toSet === expectedIds,
      "split rows and signatures did not land atomically together")
    assert(AdmitFence.upto(spark, sigRoot) === 11L)
  }
}
