package graft

import graft.operators.TextOps

/** x42 (incremental dedup): the cross-corpus banded join must reproduce
  * exactly the full-corpus verified pair list restricted to batch×corpus
  * pairs — no misses (the band kernel is deterministic per row, so a pair's
  * collision bands are identical whether the sides were joined self- or
  * cross-wise) and no intra-side pairs (structurally impossible: the join's
  * two inputs are disjoint).
  */
class X42IncrementalSpec extends SparkSpecBase {

  test("x42 equals q53's pair list restricted to batch-corpus cross pairs") {
    val full = TextOps.q53(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // q53 emits doc_a < doc_b; reorient so the batch (id ≡ 0 mod 7) side
    // leads, drop intra-batch and intra-corpus pairs
    val expected = full.flatMap { case (a, b, j) =>
      (a % 7 == 0, b % 7 == 0) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _             => None
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = TextOps.x42IncrementalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty, "fixture should contain cross near-dup pairs")
    assert(got === expected)
    assert(got.forall { case (n, c, _) => n % 7 == 0 && c % 7 != 0 })
  }
}
