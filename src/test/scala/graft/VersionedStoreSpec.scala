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

  test("retry after a crash between the gen write and the pointer swap " +
       "converges to the same committed version") {
    val (st, dir) = fresh()
    // the real merge, crashed at the LAST possible instant: everything —
    // gen=1, v1.manifest, v1 schema — is on disk, only the `current`
    // pointer rename never happened. Simulate by rolling the pointer back.
    st.merge(upserts, deletes)
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val cur = fsys.create(
      new org.apache.hadoop.fs.Path(s"$dir/_graft_manifest/current"), true)
    try cur.write("0".getBytes("UTF-8")) finally cur.close()
    assert(st.currentVersion === 0L)
    same(st.read(), oldSnap) // the half-commit is invisible
    // the retry re-runs the same change set: it must overwrite the orphan
    // gen/manifest and commit cleanly, not double-apply or skip
    val v = st.merge(upserts, deletes)
    assert(v === 1L)
    assert(st.currentVersion === 1L)
    same(st.read(), newSnap)
    same(st.read(Some(0L)), oldSnap) // time travel intact through the retry
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

  test("additive schema evolution: new column null-fills residents; time travel keeps old shape") {
    val (st, _) = fresh()
    // v1 upserts carry a column v0 has never seen
    val evolved = upserts.withColumn("quality", col("doc_id") % 7)
    val v1 = st.merge(evolved, deletes)
    val r1 = st.read(Some(v1))
    assert(r1.columns.contains("quality"), "new column missing from v1 schema")
    // upserted rows carry values; untouched residents null-fill
    assert(r1.filter(col("doc_id") % 10 === 3 && col("quality").isNull).count() === 0)
    assert(r1.filter(col("quality").isNull).count() ===
      r1.count() - evolved.count())
    // time travel: v0 reads under ITS schema — no quality column
    assert(!st.read(Some(0L)).columns.contains("quality"),
      "v0 must keep the shape it was committed with")
    // rows themselves round-trip identically modulo the new column
    same(r1.drop("quality"), newSnap)
  }

  test("schema evolution: a later merge NOT mentioning the column keeps it (widened schema)") {
    val (st, _) = fresh()
    val v1 = st.merge(upserts.withColumn("quality", col("doc_id") % 7), deletes)
    // v2's upserts predate the column (e.g. an old writer) — the recorded
    // schema must stay widened and the v1-gen rows must keep their values
    val v2 = st.merge(
      newSnap.filter(col("doc_id") % 10 === 4)
        .withColumn("text", concat(col("text"), lit(" rev3"))),
      deletes.limit(0))
    val r2 = st.read(Some(v2))
    assert(r2.columns.contains("quality"), "widened schema lost the evolved column")
    assert(r2.filter(col("doc_id") % 10 === 3 && col("quality").isNull).count() === 0,
      "v1-gen rows lost their evolved values")
    assert(r2.filter(col("doc_id") % 10 === 4 && col("quality").isNotNull).count() === 0,
      "old-writer rows must null-fill the evolved column")
    // the change feed still works across the schema change
    val feed = st.diffVersions(v1, v2).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(feed.nonEmpty && feed.forall(_._2 == "changed"))
  }

  test("subset-bucket merge after an evolving merge keeps evolved values (mixed-gen resident read)") {
    val (st, dir) = fresh()
    // v1: evolving merge touching ONLY buckets {1,3,5,7} (doc_id%10∈{1,3},
    // no deletes) — buckets {0,2,4,6} stay on gen 0 without the column
    val v1 = st.merge(upserts.withColumn("quality", col("doc_id") % 7),
      deletes.limit(0))
    // v2: a merge whose touched buckets span BOTH generations — doc 4 is
    // in a gen-0 bucket (no quality on disk), doc 5's bucket is gen-1
    // (quality present). The resident read must use v1's recorded schema;
    // single-footer parquet inference could drop the evolved column from
    // the gen-1 survivors and the rewrite would make that loss permanent.
    val v2 = st.merge(
      newSnap.filter(col("doc_id").isin(4L, 5L))
        .withColumn("text", concat(col("text"), lit(" rev3"))),
      deletes.limit(0))
    // strict subset of buckets rewritten
    val g2 = new java.io.File(s"$dir/gen=$v2").listFiles()
      .map(_.getName).filter(_.startsWith("bucket=")).toSet
    assert(g2.nonEmpty && g2.size < 8, s"expected a strict bucket subset: $g2")
    val r2 = st.read(Some(v2))
    // every v1-upserted row still carries its evolved value — including
    // the SURVIVORS rewritten as residents of v2's touched buckets
    assert(r2.filter(col("doc_id") % 10 === 3 && col("quality").isNull).count() === 0,
      "gen-1 survivors lost their evolved column through the subset merge")
    assert(r2.filter(pmod(col("doc_id"), lit(8L)) === 5 && col("doc_id") % 10 === 3
        && col("quality").isNull).count() === 0,
      "rows co-bucketed with the merge lost quality")
    same(r2.drop("quality").filter(!col("doc_id").isin(4L, 5L)),
      st.read(Some(v1)).drop("quality").filter(!col("doc_id").isin(4L, 5L)))
  }

  test("compact collapses the snapshot into one generation; vacuum then reclaims all older gens") {
    val (st, dir) = fresh()
    val v1 = st.merge(upserts, deletes)
    val vc = st.compact()
    // read equality through the compaction; pre-compact version still travels
    same(st.read(), newSnap)
    same(st.read(Some(v1)), newSnap)
    // every bucket now maps to the compacted gen (one-gen read fan-in)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_graft_manifest/v$vc.manifest")), "UTF-8")
    assert(manifest.split("\n").forall(_.endsWith(s":$vc")), manifest)
    // vacuum(keep=1) can now reclaim EVERY older generation
    val dead = st.vacuum(keep = 1)
    val remaining = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).toSet
    assert(remaining === Set(s"gen=$vc"), s"expected one live gen, got $remaining; dead=$dead")
    same(st.read(), newSnap)
  }
}
