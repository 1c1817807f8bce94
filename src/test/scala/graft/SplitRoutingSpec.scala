package graft

import graft.sources.SignatureStore
import org.apache.spark.sql.functions._

/** ST13's leak-safe routing contract, executed: matched docs inherit the
  * split of their first corpus match (a near-dup of an eval doc can never
  * stream into train), novel docs follow the shared md5 rule on their own
  * id, the admitted state closes the loop for later dups, and the
  * streamed form equals sequential batch-mode routing. */
class SplitRoutingSpec extends SparkSpecBase with SigCatalogSerialized {

  private lazy val toks = Tables.documents(spark, sfDir)
    .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
  private lazy val batch = toks.filter(pmod(col("id"), lit(7L)) === 0)
  private lazy val corpus = toks.filter(pmod(col("id"), lit(7L)) =!= 0)

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // independent driver-side re-derivation of SplitRule (md5-hex prefix)
  private def hashSplit(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (h < "cc") "train" else if (h < "e6") "val" else "test"
  }

  private def routedOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "matched", "split").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq

  test("matched docs inherit their first match's split; novel follow the hash rule") {
    SignatureStore.writeRouted(spark, corpus, tmp("route-store"))
    val preSplits = spark.table("sig_splits").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // corpus splits are CC-cluster-keyed: both endpoints of every corpus
    // near-dup pair already share a split (x48's batch invariant)
    val corpusPairs = graft.functions.MinHashLSH.verifiedPairs(corpus, 0.8).collect()
    corpusPairs.foreach(r =>
      assert(preSplits(r.getLong(0)) === preSplits(r.getLong(1))))
    val firstMatch = SignatureStore.incrementPairs(spark, batch, 0.8)
      .groupBy("id_a").agg(min("id_b").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(firstMatch.nonEmpty, "fixture should contain batch-vs-corpus matches")
    val routed = SignatureStore.routeAndAdmit(spark, batch, tmp("routed1")).collect()
    var nMatched = 0
    routed.foreach { r =>
      val (id, matched, split) = (r.getLong(0), r.getInt(2), r.getString(3))
      if (matched == 1) {
        nMatched += 1
        assert(r.getLong(1) === firstMatch(id), s"doc $id wrong first match")
        assert(split === preSplits(firstMatch(id)), s"doc $id did not inherit")
      } else assert(split === hashSplit(id), s"novel doc $id off the hash rule")
    }
    assert(nMatched === firstMatch.size)
    // only novel docs extend the split table (matched docs are dups — they
    // are not admitted, so nothing can ever match them later)
    assert(spark.table("sig_splits").count() ===
      preSplits.size + (routed.length - nMatched))
  }

  test("a later dup of a routed-admitted doc inherits that doc's split") {
    import spark.implicits._
    def docs(rows: (Long, String)*) =
      rows.toDF("id", "text").select(col("id"), split(col("text"), " ").as("toks"))
    SignatureStore.writeRouted(spark, docs(1L -> "alpha beta gamma delta epsilon"),
      tmp("route-loop"))
    val r1 = routedOf(SignatureStore.routeAndAdmit(spark,
      docs(10L -> "zeta eta theta iota kappa lambda"), tmp("rl1")))
    assert(r1 === Seq((10L, 0, hashSplit(10L))))
    val r2 = routedOf(SignatureStore.routeAndAdmit(spark,
      docs(20L -> "zeta eta theta iota kappa lambda"), tmp("rl2")))
    assert(r2 === Seq((20L, 1, hashSplit(10L))), "dup must inherit doc 10's split")
    assert(spark.table("sig_splits").count() === 2) // 1 + novel 10; dup 20 not recorded
  }

  test("ST13 streamed routing equals sequential batch-mode routing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val b1 = batch.filter(pmod(col("id"), lit(14L)) === 0)
    val b2 = batch.filter(pmod(col("id"), lit(14L)) =!= 0)
    SignatureStore.writeRouted(spark, corpus, tmp("route-batchmode"))
    val e1 = routedOf(SignatureStore.routeAndAdmit(spark, b1, tmp("er1")))
    val e2 = routedOf(SignatureStore.routeAndAdmit(spark, b2, tmp("er2")))
    val expectedSplits = spark.table("sig_splits").count()
    SignatureStore.writeRouted(spark, corpus, tmp("route-streamed"))
    val raw = Tables.documents(spark, sfDir).select("doc_id", "text")
    def texts(ids: org.apache.spark.sql.DataFrame) =
      raw.join(ids.select(col("id").as("doc_id")), "doc_id")
        .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val sink = tmp("st13-routed")
    val q = graft.streaming.StreamOps.splitRouting(
      input.toDF().toDF("doc_id", "text"), sink, tmp("st13-ckpt"), 0.8)
    input.addData(texts(b1)); q.processAllAvailable()
    input.addData(texts(b2)); q.processAllAvailable()
    q.stop()
    def sunk(b: Int) = spark.read
      .schema("id BIGINT, match_id BIGINT, matched INT, split STRING")
      .parquet(s"$sink/batch_id=$b")
    assert(routedOf(sunk(0)) === e1)
    assert(routedOf(sunk(1)) === e2)
    assert(spark.table("sig_splits").count() === expectedSplits)
  }

  test("replay fence: a completed routing cycle re-run under its batch id " +
       "neither grows the store nor changes the routed rows") {
    import spark.implicits._
    def docs(rows: (Long, String)*) =
      rows.toDF("id", "text").select(col("id"), split(col("text"), " ").as("toks"))
    SignatureStore.writeRouted(spark, docs(1L -> "alpha beta gamma delta epsilon"),
      tmp("route-fence"))
    val out = tmp("route-fence-out")
    val b0 = docs(50L -> "zeta eta theta iota kappa",
                  51L -> "alpha beta gamma delta epsilon")
    val r1 = routedOf(SignatureStore.routeAndAdmit(spark, b0,
      s"$out/batch_id=0", batchId = Some(0L)))
    val (docsN, splitsN) =
      (spark.table("sig_docs").count(), spark.table("sig_splits").count())
    // crash-and-replay: checkpoint never committed, same id arrives again
    val r2 = routedOf(SignatureStore.routeAndAdmit(spark, b0,
      s"$out/batch_id=0", batchId = Some(0L)))
    assert(r2 === r1, "fenced replay changed the routed rows")
    assert(spark.table("sig_docs").count() === docsN &&
           spark.table("sig_splits").count() === splitsN,
      "fenced replay grew the routed store")
    // the next id is live: a dup of the batch-0-admitted doc 50 inherits
    val r3 = routedOf(SignatureStore.routeAndAdmit(spark,
      docs(60L -> "zeta eta theta iota kappa"),
      s"$out/batch_id=1", batchId = Some(1L)))
    assert(r3.map(t => (t._1, t._2)) === Seq((60L, 1)))
    assert(r3.head._3 === r1.find(_._1 == 50L).get._3,
      "dup of a fenced-batch admit must inherit its split")
  }

  test("mid-append crash atomicity: a novel doc's SPLIT and SIGNATURES land " +
       "together or not at all — never one without the other") {
    import spark.implicits._
    def docs(rows: (Long, String)*) =
      rows.toDF("id", "text").select(col("id"), split(col("text"), " ").as("toks"))
    val root = tmp("route-atomic")
    SignatureStore.writeRouted(spark, docs(1L -> "alpha beta gamma delta epsilon"), root)
    val (docs0, splits0) =
      (spark.table("sig_docs").count(), spark.table("sig_splits").count())
    val novel = docs(70L -> "zeta eta theta iota kappa")
    // replicate routeAndAdmit's pre-crash append work: signatures AND the
    // split row staged in ONE cycle, then die BEFORE the commit rename
    SignatureStore.stageAppend(spark, root, "b0", novel,
      graft.functions.MinHashLSH.Params(),
      splits = Some(spark.createDataFrame(Seq((70L, "train"))).toDF("id", "split")))
    assert(spark.table("sig_docs").count() === docs0 &&
           spark.table("sig_splits").count() === splits0,
      "pre-commit crash leaked signatures or splits into the live tables")
    // now crash AFTER the commit: both must become visible TOGETHER via
    // any reader's drain (here: incrementPairs' heal)
    graft.sources.StagedAppend.heal(spark, root,
      name => new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name)).location),
      dropStages = false) // no committed batch yet: the stage dir survives
    graft.sources.StagedAppend.commit(spark, root, "b0")
    SignatureStore.incrementPairs(spark, novel, 0.8).count() // reader drains
    Seq("sig_docs", "sig_splits").foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table("sig_docs").count() === docs0 + 1 &&
           spark.table("sig_splits").count() === splits0 + 1,
      "post-commit drain split the atom: signatures and split diverged")
    assert(spark.table("sig_splits").filter(col("id") === 70L).head.getString(1)
      === "train")
    assert(graft.sources.AdmitFence.admitted(spark, root, 0L),
      "draining the committed routed batch must advance the fence")
  }
}
