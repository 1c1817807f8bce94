package graft

import org.apache.hadoop.fs.Path
import graft.sources.GenDir

/** Pointer-resolved generation directories: the round-15 reader-safety
  * contract. publish() is ONE pointer write — the retired generation's
  * bytes survive until the NEXT lease-held compact's sweep, so a
  * lease-free reader that resolved the old name an instant before the
  * flip can finish its scan; and a pointer that vanishes between
  * currentName's existence probe and its open (a rebuild's reset racing
  * a read) falls back to the classic base name instead of throwing. */
class GenDirSpec extends SparkSpecBase {

  private def localFs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration).getRaw

  private def mkGen(dir: String, name: String): Unit = {
    val d = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("part-0"), name.getBytes("UTF-8"))
    ()
  }

  test("publish defers retired-generation deletion to the next sweep") {
    val dir = java.nio.file.Files.createTempDirectory("gendir").toString
    val fsys = localFs
    mkGen(dir, "postings")          // classic layout = generation 0
    assert(GenDir.currentName(fsys, dir, "postings") === "postings")
    mkGen(dir, "postings_g100")
    GenDir.publish(fsys, dir, "postings", "postings_g100")
    assert(GenDir.currentName(fsys, dir, "postings") === "postings_g100")
    // the reader-safety contract: the retired generation is still on disk
    // (a lease-free reader that resolved "postings" pre-flip is mid-scan)
    assert(fsys.exists(new Path(s"$dir/postings")),
      "publish must NOT delete the retired generation — a pre-flip " +
        "reader may still be scanning it")
    // the NEXT lease-held compact's sweep reclaims it
    GenDir.sweep(fsys, dir, "postings")
    assert(!fsys.exists(new Path(s"$dir/postings")),
      "sweep must reclaim the deferred predecessor")
    assert(fsys.exists(new Path(s"$dir/postings_g100")),
      "sweep must never touch the live generation")
    // second compact cycle: g100 -> g200, g100 deferred then swept
    mkGen(dir, "postings_g200")
    GenDir.publish(fsys, dir, "postings", "postings_g200")
    assert(fsys.exists(new Path(s"$dir/postings_g100")))
    GenDir.sweep(fsys, dir, "postings")
    assert(!fsys.exists(new Path(s"$dir/postings_g100")))
    assert(fsys.exists(new Path(s"$dir/postings_g200")))
  }

  test("a pointer vanishing between the probe and the open falls back to base") {
    val dir = java.nio.file.Files.createTempDirectory("gendir-race").toString
    mkGen(dir, "postings")
    // an FS whose open() deletes the target first — the exists-then-open
    // race (reset() during a rebuild) made deterministic
    val racy = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
        if (f.getName == "_postings_gen") delete(f, false)
        super.open(f, bufferSize)
      }
    }
    racy.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val plain = localFs
    val o = plain.create(new Path(s"$dir/_postings_gen"), true)
    try o.write("postings_g999".getBytes("UTF-8")) finally o.close()
    // the racy open throws FileNotFoundException inside currentName; the
    // documented safe fallback (classic base) must apply, not propagate —
    // the only writers that delete the pointer restore the classic layout
    assert(GenDir.currentName(racy, dir, "postings") === "postings")
  }
}
