package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Golden canonical hashes, in-repo (SURVEY §5.2): `sbt test` alone must
  * catch any contract query whose output drifts — without Python, DuckDB, or
  * the driver. Complements (does not replace) the oracle compare: the oracle
  * proves cross-engine agreement at verify time; these pin OUR outputs
  * between verify runs, so a refactor that silently changes results fails in
  * CI immediately (the round-1 q48 lesson: `sbt test` was green while the
  * output had drifted).
  *
  * Canonicalization mirrors tools/check.py's: columns sorted by name, floats
  * `%.12g`, nulls `∅` — then rows sorted lexicographically so ORDER-BY ties
  * can never flake the hash under different partitionings.
  *
  * Regenerate intentionally (after a DELIBERATE semantic change, validated
  * against DuckDB first) with:
  *   GRAFT_GOLDEN_REGEN=1 sbt "testOnly graft.GoldenSpec"
  */
class GoldenSpec extends SparkSpecBase {

  private val goldenDir = Paths.get("src/test/resources/golden")
  private val regen = sys.env.get("GRAFT_GOLDEN_REGEN").contains("1")

  private def canon(v: Any): String = v match {
    case null                => "∅"
    case d: Double           => if (d.isNaN) "nan" else "%.12g".format(d)
    case f: Float            => if (f.isNaN) "nan" else "%.12g".format(f.toDouble)
    case b: Array[Byte]      => b.map("%02x".format(_)).mkString
    case s: collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case other               => other.toString
  }

  private def canonicalHash(df: org.apache.spark.sql.DataFrame): (String, Long) = {
    val cols = df.columns.sorted.toSeq
    val reordered = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val rows = reordered.collect()
      .map(r => r.toSeq.map(canon).mkString(""))
      .sorted
    val md = MessageDigest.getInstance("SHA-256")
    md.update(cols.mkString("").getBytes(StandardCharsets.UTF_8))
    rows.foreach(r => md.update(("" + r).getBytes(StandardCharsets.UTF_8)))
    (md.digest().map("%02x".format(_)).mkString, rows.length.toLong)
  }

  test("every contract query matches its checked-in golden hash (sf0.001)") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    if (regen) Files.createDirectories(goldenDir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (hash, n) = canonicalHash(fn(spark, sfDir))
      val file = goldenDir.resolve(s"$name.sha256")
      if (regen) {
        Files.writeString(file, s"$hash $n\n")
      } else {
        if (!Files.exists(file)) failures += s"$name: no golden file (regen needed)"
        else {
          val Array(expHash, expN) = Files.readString(file).trim.split(" ")
          if (expHash != hash || expN.toLong != n)
            failures += s"$name: output drifted (rows $expN -> $n, hash ${expHash.take(12)} -> ${hash.take(12)})"
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
