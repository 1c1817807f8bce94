package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** x171's production candidate front end (char-3-gram MinHash bands, x02's
  * blocker) against the declared length-blocked certifier, both feeding
  * the identical Levenshtein adjudication kernel.
  *
  * Two exact pins (fixed xxhash band family → per-corpus deterministic):
  *  - kernel consistency on the declared domain: bands are
  *    language-agnostic, so a banded pair may legitimately cross
  *    languages — but every banded result row whose docs SHARE a language
  *    is inside the declared candidate domain (the ≤ 12 length gate is
  *    applied by the shared kernel, which implies bucket adjacency), and
  *    must therefore equal the declared row bit-for-bit;
  *  - structural recall: an exact-prefix duplicate pair has identical
  *    char-gram sets, identical MinHash signatures, and thus collides in
  *    EVERY band — all declared dist-0 rows must appear in the banded
  *    result.
  */
class X171BandedSpec extends SparkSpecBase {

  test("banded adjudication: same-language rows equal declared; dist-0 fully recalled") {
    val declared = TextOps.x171EditDistance(spark, sfDir).cache()
    val banded = TextOps.x171BandedEditDistance(spark, sfDir).cache()
    try {
      assert(declared.count() > 0, "fixture should contain near-dup pairs")
      val langs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
      val bandedSameLang = banded
        .join(langs.select(col("doc_id").as("doc_a"), col("lang").as("la")), "doc_a")
        .join(langs.select(col("doc_id").as("doc_b"), col("lang").as("lb")), "doc_b")
        .filter(col("la") === col("lb"))
        .select("doc_a", "doc_b", "dist", "sim")
      val inconsistent = bandedSameLang.except(declared).count()
      assert(inconsistent === 0L,
        s"$inconsistent same-language banded rows differ from the declared kernel")
      val exactDups = declared.filter(col("dist") === 0L)
      assert(exactDups.count() > 0, "fixture should contain exact-prefix dups")
      assert(exactDups.except(banded).count() === 0L,
        "a dist-0 pair (identical grams -> collides in every band) was missed")
    } finally { declared.unpersist(); banded.unpersist(); () }
  }

  test("front-end arbitration: the volume probe ranks blocking under bands " +
       "on this corpus and the arbitrated result is the declared one") {
    val (nBlock, nBand) = TextOps.x171FrontEndVolumes(spark, sfDir)
    // the round-11 measured reality: char-gram bands collide en masse on
    // the 30-word vocabulary — bands are the ~20x LARGER volume here
    assert(nBlock > 0L && nBand > nBlock,
      s"volume probe inverted: block=$nBlock band=$nBand")
    val auto = TextOps.x171AutoEditDistance(spark, sfDir)
    val declared = TextOps.x171EditDistance(spark, sfDir)
    assert(auto.except(declared).isEmpty && declared.except(auto).isEmpty,
      "arbitrated output must equal the declared path it selected")
  }
}
