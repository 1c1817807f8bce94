package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** x77's production candidate generator (LSH-blocked prefix fuzzy match)
  * against the declared brute-force certifier.
  *
  * The pin is exact, not statistical: with the FIXED xxhash band family,
  * whether a given pair collides in some band is deterministic per corpus,
  * so on the fixture these assertions are reproducible equalities.
  *  - soundness: every row the LSH path emits IS the declared row for
  *    that probe (same best_id, same dist) — i.e. lsh ⊆ declared;
  *  - coverage: the LSH path emits a row for EVERY declared row with
  *    dist ≤ maxDist (the gate) — the recall arithmetic in the scaladoc
  *    (≥14 shared grams at dist ≤ 8 ⇒ band-miss ~2e-3) made concrete.
  */
class X77LshSpec extends SparkSpecBase {

  test("LSH-blocked fuzzy ⊆ declared; covers every declared row within gate") {
    val declared = TextOps.x77Fuzzy(spark, sfDir).cache()
    val lsh = TextOps.x77FuzzyLsh(spark, sfDir, maxDist = 8).cache()
    try {
      assert(lsh.count() > 0, "fixture should contain near matches")
      // soundness: subset row-for-row
      val extra = lsh.except(declared).count()
      assert(extra === 0L, s"$extra LSH rows differ from the declared argmin")
      // coverage: exactly the declared rows within the distance gate
      val gated = declared.filter(col("dist") <= 8)
      assert(lsh.count() === gated.count(),
        "LSH path missed a declared row within the dist gate")
      assert(gated.except(lsh).count() === 0L)
    } finally { declared.unpersist(); lsh.unpersist(); () }
  }
}
