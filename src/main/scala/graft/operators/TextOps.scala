package graft.operators

import graft.Tables
import graft.functions.MinHashLSH
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 text side (Q52/Q53/Q55/Q56) plus the training-data
  * pipeline extras (x-series): SimHash, char-n-gram near-dup, language-ID,
  * quality scoring, token counting, fingerprinting.
  *
  * All tokenization is `split(text, ' ')` — the documents fixture is plain
  * lowercase space-separated tokens (FIXTURES.md).
  */
object TextOps {

  private def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))

  /** Q52 exact dedup: content hash groups with deterministic survivor
    * (min doc_id). Scale: one hash-shuffle on sha256 — the canonical
    * exact-dedup at any size. */
  def q52(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
      .orderBy("h")

  /** Q53 near-dup via MinHash LSH, judged on the exact-Jaccard-verified
    * pair list (≥ 0.8 over token sets) — see [[MinHashLSH]] for the scale
    * story. Oracle computes exact all-pairs Jaccard in SQL. */
  def q53(s: SparkSession, d: String): DataFrame =
    MinHashLSH.verifiedPairs(docTokens(s, d), 0.8)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("j"))
      .orderBy("doc_a", "doc_b")

  /** Q55 text stats per (lang, source): doc-level aggregates joined with the
    * exploded-token distinct count (two partial aggs, one broadcastable). */
  def q55(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val perDoc = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 2).as("avg_chars"))
    val toks = docs
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "source")
      .agg(countDistinct("tok").as("n_distinct_tokens"))
    perDoc.join(toks, Seq("lang", "source"))
      .orderBy("lang", "source")
  }

  /** Q56 TF-IDF top-5 terms per lang.
    * score(term,lang) = total_tf · (ln((N+1)/(df+1)) + 1), formula pinned in
    * FIXTURES.md; ranking on the rounded score with term tiebreak so both
    * engines select identical rows. */
  def q56(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("lang"), col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val n = docs.groupBy(col("lang").as("n_lang")).agg(countDistinct("doc_id").as("n_docs"))
    val stats = toks.groupBy("lang", "term")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
    val w = Window.partitionBy("lang").orderBy(col("score").desc, col("term"))
    stats.join(broadcast(n), col("lang") === col("n_lang"))
      .withColumn("score",
        round(col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("term"), col("score"))
      .orderBy("lang", "rnk")
  }

  /** x01 SimHash near-dup (rows-only check: 64-bit signatures + banded
    * hamming candidates are hash-scheme-specific, so no cross-engine oracle).
    *
    * Signature: bit_j = sign of Σ_tokens (bit_j(xxhash64(tok)) ? +1 : −1),
    * computed as 64 sum() columns in ONE aggregate pass; candidate pairs via
    * 4×16-bit band buckets (hamming ≤ 3 ⇒ one band must match exactly by
    * pigeonhole over 4 bands); verified with bit_count(xor) ≤ 3. Same
    * LSH-shaped join scalability as MinHash. */
  def x01Simhash(s: SparkSession, d: String): DataFrame = {
    val tok = docTokens(s, d).select(col("id"), explode(col("toks")).as("tok")).distinct()
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val sig = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 64).map(j => when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce(_.bitwiseOR(_)))
      .select(col("id"), col("simhash"))
    // widen before the explode+self-join: the signature agg collapses to ~1
    // AQE partition, but the band join's row explosion must run cluster-wide
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val banded = sig.repartition(nPart).select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
               shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
              bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** x02 char-3-gram near-dup: same MinHash-LSH machinery over character
    * shingles instead of word tokens (catches reorder/edit near-dups that
    * token-set Jaccard misses). Oracle: exact all-pairs trigram Jaccard. */
  def x02NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val grams = Tables.documents(s, d).select(col("doc_id").as("id"),
      expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))").as("toks"))
    MinHashLSH.verifiedPairs(grams, 0.7)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("j"))
      .orderBy("doc_a", "doc_b")
  }

  /** x03 language-ID: data-derived n-gram-profile heuristic. Profile = top-20
    * tokens per lang (count desc, token tiebreak); prediction = lang whose
    * profile overlaps the doc's tokens most (score desc, lang tiebreak).
    * Output is the confusion matrix. Profiles are tiny → broadcast. */
  def x03LangId(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val wProf = Window.partitionBy("p_lang").orderBy(col("cnt").desc, col("tok"))
    val profile = toks.groupBy(col("lang").as("p_lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(wProf))
      .filter(col("r") <= 20)
      .select(col("p_lang"), col("tok"))
    val wPred = Window.partitionBy("doc_id").orderBy(col("score").desc, col("p_lang"))
    val pred = toks.select(col("doc_id"), col("lang"), col("tok")).distinct()
      .join(broadcast(profile), Seq("tok"))
      .groupBy("doc_id", "lang", "p_lang")
      .agg(count(lit(1)).as("score"))
      .withColumn("r", row_number().over(wPred))
      .filter(col("r") === 1)
    pred.groupBy(col("lang"), col("p_lang").as("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")
  }

  /** x04 quality score: 0.3·min(1, n_tok/100) + 0.3·(distinct/total) +
    * 0.4·min(1, n_chars/500), evaluated as EXACT integer arithmetic over a
    * common denominator with one final correctly-rounded IEEE division —
    * bitwise-identical on every engine (a rounded float sum of small
    * rationals sits on 4-dp knife edges and diverged between engines). */
  def x04Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(split(col("text"), " "))).cast("long"))
      .withColumn("num",
        lit(15L) * least(col("n_tok"), lit(100L)) * col("n_tok")
          + lit(1500L) * col("n_distinct")
          + lit(4L) * least(col("n_chars"), lit(500L)) * col("n_tok"))
      .select(col("doc_id"),
        (col("num").cast("double") / (col("n_tok") * 5000L).cast("double")).as("quality"))
      .orderBy("doc_id")

  /** x05 token counting: whitespace tokens + alphabetic char mass. */
  def x05TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens"),
              length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_alpha"),
              col("n_chars"))
      .orderBy("doc_id")

  /** x06 document fingerprinting: whole-content md5 prefix + a winnowing-style
    * rolling fingerprint (min over all 8-char window hashes). */
  def x06Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
              substring(md5(col("text")), 1, 16).as("fp"),
              expr("array_min(transform(sequence(1, length(text)-7), i -> substr(md5(substring(text, i, 8)), 1, 8)))").as("fp_rolling"))
      .orderBy("doc_id")
}
