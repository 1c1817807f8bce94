package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[VersionedStore]] — snapshot isolation, time travel, structural
  * sharing, crash-invisibility of unpublished gens, and vacuum GC.
  * Change sets are x56's snapshot algebra (MergeStoreSpec's fixtures). */
class VersionedStoreSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def oldSnap = docs.filter(col("doc_id") % 10 =!= 1)
  private def newSnap = docs.filter(col("doc_id") % 10 =!= 2)
    .withColumn("text",
      when(col("doc_id") % 10 === 3, concat(col("text"), lit(" rev2")))
        .otherwise(col("text")))
    .withColumn("n_chars",
      when(col("doc_id") % 10 === 3, col("n_chars") + 5)
        .otherwise(col("n_chars")))
  private def upserts = newSnap.filter(col("doc_id") % 10 === 1 || col("doc_id") % 10 === 3)
  private def deletes = docs.filter(col("doc_id") % 10 === 2).select("doc_id")

  private def fresh(): (VersionedStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("vstore").toString
    val st = new VersionedStore(spark, dir)
    st.write(oldSnap, nBuckets = 8)
    (st, dir)
  }

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("merge commits a new version equal to the new snapshot; v0 time-travels to the old") {
    val (st, _) = fresh()
    val v1 = st.merge(upserts, deletes)
    assert(v1 === 1L && st.currentVersion === 1L)
    same(st.read(), newSnap)
    same(st.read(Some(0L)), oldSnap)
  }

  test("snapshot isolation: a frame resolved before the merge still reads the old snapshot") {
    val (st, _) = fresh()
    val pinned = st.read() // resolves manifest v0 NOW
    st.merge(upserts, deletes)
    same(pinned, oldSnap)   // unaffected by the commit that happened after
    same(st.read(), newSnap)
  }

  test("structural sharing: untouched buckets are the SAME physical files across versions") {
    val (st, dir) = fresh()
    // confine churn to doc_id ≡ 1 (mod 10): a strict subset of 8 buckets
    st.merge(newSnap.filter(col("doc_id") % 10 === 1), deletes.limit(0))
    val m0 = new java.io.File(s"$dir/gen=0").listFiles().map(_.getName).toSet
    val m1 = new java.io.File(s"$dir/gen=1").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(m1.nonEmpty && m1.size < 8, s"changed gen must hold a strict bucket subset: $m1")
    // v1's manifest references gen=0 dirs for every untouched bucket
    val reread = st.read(Some(1L))
    same(reread, oldSnap.join(newSnap.filter(col("doc_id") % 10 === 1).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .unionByName(newSnap.filter(col("doc_id") % 10 === 1)))
    assert(m0.exists(_.startsWith("bucket=")), "gen 0 must keep its files")
  }

  test("an unpublished generation is invisible (crash before pointer swap)") {
    val (st, dir) = fresh()
    // simulate the crash: a garbage gen dir + manifest with no pointer
    oldSnap.limit(3).withColumn("bucket", lit(7L))
      .write.partitionBy("bucket").parquet(s"$dir/gen=99")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_graft_manifest/v99.manifest"),
      "7:99".getBytes("UTF-8"))
    assert(st.currentVersion === 0L)
    same(st.read(), oldSnap) // reader never sees the orphan
  }

  test("diffVersions is the exact change feed between two snapshots") {
    val (st, _) = fresh()
    st.merge(upserts, deletes)
    val feed = st.diffVersions(0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expAdded = docs.filter(col("doc_id") % 10 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expRemoved = docs.filter(col("doc_id") % 10 === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expChanged = docs.filter(col("doc_id") % 10 === 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(feed.filter(_._2 == "added").keySet === expAdded)
    assert(feed.filter(_._2 == "removed").keySet === expRemoved)
    assert(feed.filter(_._2 == "changed").keySet === expChanged)
    assert(feed.size === expAdded.size + expRemoved.size + expChanged.size,
      "unchanged docs must not appear in the feed")
  }

  test("vacuum deletes generations no retained version references") {
    val (st, dir) = fresh()
    st.merge(upserts, deletes)                       // v1
    st.merge(newSnap.filter(col("doc_id") % 10 === 3)
      .withColumn("n_chars", col("n_chars") + 1), deletes.limit(0)) // v2
    // keep=1: only v2 retained; gen 0 may still be partially referenced
    // by v2's untouched buckets — vacuum must keep exactly the live gens
    val dead = st.vacuum(keep = 1)
    val live = new VersionedStore(spark, dir).read()
    assert(live.count() > 0)
    val remaining = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).toSet
    dead.foreach(g => assert(!remaining.contains(s"gen=$g")))
    // current version still reads completely after GC
    same(live, st.read(Some(st.currentVersion)))
  }
}
