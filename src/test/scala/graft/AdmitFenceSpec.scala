package graft

import graft.sources.AdmitFence

/** The replay fence's watermark file: atomic publish + degraded reads.
  * A torn/garbage watermark must degrade to "nothing admitted" (replay
  * runs at-least-once) instead of wedging every cycle on a parse error,
  * and advance must publish OVER an existing (even damaged) file. */
class AdmitFenceSpec extends SparkSpecBase {

  test("advance/upto round-trip and monotone overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    assert(AdmitFence.upto(spark, dir) === -1L)
    AdmitFence.advance(spark, dir, 3L)
    assert(AdmitFence.upto(spark, dir) === 3L)
    assert(AdmitFence.admitted(spark, dir, 3L))
    assert(!AdmitFence.admitted(spark, dir, 4L))
    AdmitFence.advance(spark, dir, 4L)
    assert(AdmitFence.upto(spark, dir) === 4L)
  }

  test("a garbage watermark degrades to -1 and is healed by the next advance") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    // simulate the torn write of a pre-atomic-publish store
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_upto"), "".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === -1L,
      "an empty watermark must read as 'nothing admitted', not throw")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_admitted_upto"), "12garbage".getBytes("UTF-8"))
    assert(AdmitFence.upto(spark, dir) === -1L)
    // the next completed append publishes cleanly over the damage
    AdmitFence.advance(spark, dir, 7L)
    assert(AdmitFence.upto(spark, dir) === 7L)
  }

  test("advance leaves no stray temp once published") {
    val dir = java.nio.file.Files.createTempDirectory("fence").toString
    AdmitFence.advance(spark, dir, 1L)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(names.contains("_admitted_upto"))
    assert(!names.contains("_admitted_upto.tmp"),
      s"temp watermark not cleaned up: $names")
  }
}
