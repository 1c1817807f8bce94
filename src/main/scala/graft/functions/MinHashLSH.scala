package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate candidate generation, UDF-free.
  *
  * Everything is built from codegen'd Catalyst expressions:
  *  - per-permutation hash h_i(tok) = xxhash64(i, tok) — one 64-bit hash per
  *    (permutation, token), no java.util.Random, fully deterministic;
  *  - the MinHash signature is a single partial+final hash-aggregate with
  *    `numPerm` min() columns (one scan over the exploded token table, map-side
  *    combined — no 64× row blow-up);
  *  - bands are (bandIdx, concat of r signature slots); candidate pairs come
  *    from a self-equi-join on the band signature — a shuffled hash join on a
  *    high-cardinality key, which is the whole point: at 100 TB this replaces
  *    the O(n²) all-pairs comparison with |buckets| local joins.
  *
  * Band/row choice: with numPerm=64 and r=2 rows × b=32 bands, a pair at the
  * Jaccard threshold 0.8 is missed with probability (1 − 0.8²)³² ≈ 6e-15, so
  * the verified-pair output is effectively exact (the t2 contract judges the
  * exact-Jaccard-verified pairs, SURVEY §2.10 Q53).
  */
object MinHashLSH {
  val NumPerm = 64
  val Rows    = 2
  val Bands   = NumPerm / Rows

  /** items: (id: long, toks: array<string>) — toks treated as a SET.
    * Returns (id, mh0..mh63). */
  def signatures(items: DataFrame): DataFrame = {
    val tok = items.select(col("id"), explode(col("toks")).as("tok")).distinct()
    val mins = (0 until NumPerm).map(i => min(xxhash64(lit(i), col("tok"))).as(s"mh$i"))
    tok.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** (id, band, sig) — one row per band per item. */
  def bandSignatures(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val slots = (0 until Rows).map(r => col(s"mh${b * Rows + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws(":", slots: _*).as("sig"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct candidate pairs (id_a < id_b) sharing ≥1 band bucket. */
  def candidatePairs(items: DataFrame): DataFrame = {
    val bands = bandSignatures(signatures(items))
    bands.as("a")
      .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Candidates verified with EXACT Jaccard over the token sets; only pairs
    * with jaccard ≥ threshold survive. Output: (id_a, id_b, j = round(.,4)).
    * The token-set arrays ride along the (small) candidate list, so the
    * exact verification never touches non-candidate pairs. */
  def verifiedPairs(items: DataFrame, threshold: Double): DataFrame = {
    val sets = items.select(col("id"), array_distinct(col("toks")).as("set"))
    candidatePairs(items)
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("set_a"), col("set_b"))).cast("double"))
      .withColumn("jac", col("inter") / col("uni"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("j"))
  }
}
