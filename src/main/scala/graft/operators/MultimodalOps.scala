package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star extension): media as opaque
  * `binary` columns + typed metadata, with decode/feature-extract as
  * partition-batched functions over `Dataset[MediaRecord]`.
  *
  * The container has no image/audio codecs, so [[MultimodalOps.decodeStub]]
  * is a clearly-marked deterministic FAKE decoder; the Spark-side plumbing —
  * schema, batch shape (one decoder instance per partition, amortized
  * init), partitioning — is real and tested (MultimodalSpec). Swapping in a
  * real codec changes only the body of `decodeStub`.
  */
object MultimodalOps {

  /** Opaque payload + typed metadata — the multimodal storage schema. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], fmt: String, n_bytes: Long)
  case class MediaFeatures(media_id: Long, fmt: String, n_bytes: Long, features: Array[Float])

  /** FAKE decode: deterministic byte-histogram moments standing in for a
    * real image/audio decode. Real implementation would decode `payload`
    * with a codec; signature and batch shape stay identical. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      s0 += 1; s1 += b; s2 += b.toLong * b
      i += 1
    }
    val n = math.max(1L, s0).toDouble
    Array(s0.toFloat, (s1 / n).toFloat, math.sqrt(s2 / n).toFloat,
          (if (payload.isEmpty) 0f else (payload(0) & 0xff).toFloat))
  }

  /** documents.text re-materialized as a binary media column — the
    * driver-provided stand-in corpus for opaque payloads. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
              encode(col("text"), "utf-8").as("payload"),
              lit("text/plain").as("fmt"),
              octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: one decoder init per partition (the shape a
    * real codec needs), rows streamed through it. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec: init once here (expensive), reuse across the partition
      it.map(m => MediaFeatures(m.media_id, m.fmt, m.n_bytes, decodeStub(m.payload)))
    }
  }

  /** One sampled frame of a media payload: fixed-size byte blocks, every
    * `stride`-th block kept — the video-frame-sampling shape (decode a
    * subset of frames, never the whole stream). */
  case class FrameSample(media_id: Long, frame_idx: Long, frame_bytes: Long, checksum: Long)

  /** Frame-sample a binary payload column: one row per kept frame with its
    * byte count and checksum (the feature a real pipeline would replace
    * with a per-frame decode). flatMap shape: frames stream out of each
    * record — no payload-sized intermediate array column, and a real
    * decoder inits once per partition exactly like [[decodeAll]]. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int,
                   stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val frames = (n + frameSize - 1) / frameSize
      (0 until frames by stride).iterator.map { f =>
        val start = f * frameSize
        val end = math.min(start + frameSize, n)
        var c = 0L; var i = start
        while (i < end) { c += (m.payload(i) & 0xff); i += 1 }
        FrameSample(m.media_id, f.toLong, (end - start).toLong, c)
      }
    }
  }

  /** x19 frame sampling over BINARY payloads, 64-byte frames, every 2nd
    * frame. Declared over the ASCII slice of the corpus (lang='en' with
    * octet_length == n_chars) so the byte-level Spark computation has an
    * exact char-level DuckDB twin (`ascii()` per char) — the one multimodal
    * operator with a full cross-engine oracle. */
  def x19FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ascii = Tables.documents(s, d)
      .filter(col("lang") === "en" &&
        octet_length(encode(col("text"), "utf-8")) === col("n_chars"))
      .select(col("doc_id").as("media_id"),
              encode(col("text"), "utf-8").as("payload"),
              lit("text/plain").as("fmt"),
              octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
    sampleFrames(ascii, frameSize = 64, stride = 2).toDF()
      .orderBy("media_id", "frame_idx")
  }

  /** Exact integer byte moments — the decode output x09 declares. Longs,
    * not floats: count, sum, and sum-of-squares of the payload bytes are
    * exact integers, so the ASCII-slice DuckDB twin (`ascii()` per char)
    * matches bitwise with no FP hazard anywhere. */
  case class MediaMoments(media_id: Long, n_bytes: Long, sum_b: Long, sum_sq: Long)

  /** Partition-batched byte-moment decode — same shape as [[decodeAll]]
    * (one decoder init per partition, rows streamed through), integer
    * output. */
  def byteMoments(media: Dataset[MediaRecord]): Dataset[MediaMoments] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec: init once here (expensive), reuse across the partition
      it.map { m =>
        var s1 = 0L; var s2 = 0L; var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          s1 += b; s2 += b.toLong * b
          i += 1
        }
        MediaMoments(m.media_id, m.payload.length.toLong, s1, s2)
      }
    }
  }

  /** x09 multimodal decode, ORACLE-CHECKED (r4 verdict item, via x19's
    * ASCII-slice trick): the partition-batched binary decode runs over the
    * slice of the corpus where `octet_length(text) = n_chars` (pure ASCII,
    * so byte k IS char k), emitting exact integer byte moments that DuckDB
    * reproduces char-level with `ascii()` — the mapPartitions decoder
    * plumbing is now hash-checked end to end. The full-corpus float-feature
    * decode ([[decodeAll]] over [[mediaTable]]) stays as the non-contract
    * demo of the real codec shape (FunctionsSpec covers its determinism). */
  def x09Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ascii = Tables.documents(s, d)
      .filter(col("lang") === "en" &&
        octet_length(encode(col("text"), "utf-8")) === col("n_chars"))
      .select(col("doc_id").as("media_id"),
              encode(col("text"), "utf-8").as("payload"),
              lit("text/plain").as("fmt"),
              octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
    byteMoments(ascii).toDF().orderBy("media_id")
  }

  /** x127 binary chunk manifest — the blob-chunking layer every multimodal
    * store needs under its opaque payloads (content-addressed 64-byte
    * chunks here; production uses ~1 MB): per payload, one manifest row
    * per chunk with (offset, length, sha256 prefix). This is what makes
    * payloads dedupable at SUB-object granularity (two videos sharing an
    * intro share those chunk digests), resumable to upload, and
    * range-readable without touching the object.
    *
    * Fully declarative — no mapPartitions: chunk indices explode from a
    * `sequence`, the chunk bytes come from `substring` ON THE BINARY
    * column (codegen'd), the digest from `sha2`. Declared over the ASCII
    * slice (x19's trick) so the byte-level Spark computation has an exact
    * char-level DuckDB twin; the operator itself never assumes text.
    * Output mass is Σ⌈bytes/chunk⌉ rows — linear, no shuffle before the
    * final sort. */
  def x127ChunkManifest(s: SparkSession, d: String, chunk: Int = 64): DataFrame = {
    val ascii = Tables.documents(s, d)
      .filter(col("lang") === "en" &&
        octet_length(encode(col("text"), "utf-8")) === col("n_chars") &&
        col("n_chars") > 0)
      .select(col("doc_id").as("media_id"),
              encode(col("text"), "utf-8").as("payload"),
              col("n_chars").cast("long").as("n_bytes"))
    ascii
      .select(col("media_id"), col("payload"), col("n_bytes"),
        explode(sequence(lit(0L), expr(s"(n_bytes - 1) div $chunk"))).as("chunk_idx"))
      .select(col("media_id"), col("chunk_idx"),
        (col("chunk_idx") * chunk).as("offset"),
        least(lit(chunk).cast("long"),
          col("n_bytes") - col("chunk_idx") * chunk).as("length"),
        substring(sha2(expr(s"substring(payload, chunk_idx * $chunk + 1, $chunk)"),
          256), 1, 16).as("sha"))
      .orderBy("media_id", "chunk_idx")
  }

  /** x181 content-defined chunking audit — the VARIABLE-boundary chunker
    * x127's fixed 64-byte grid is not: boundaries fall where a rolling
    * polynomial hash of the last 8 bytes hits 0 mod 64 (expected chunk
    * ≈ 64 B; production CDC — FastCDC/restic-style — uses the identical
    * criterion at ~1 MB), so an INSERTION only reshapes the chunks it
    * touches and every later chunk keeps its digest — the shift
    * robustness that makes CDC the dedup layer under blob stores, where
    * a fixed grid re-digests the whole tail. Per source: payloads,
    * chunks, distinct chunk digests, mean chunk size, and the dedup
    * share (1 − distinct/chunks; exact duplicate payloads collapse
    * chunk-for-chunk by construction).
    *
    * Fully declarative, x127's discipline: the byte-code array is one
    * `transform` over the ASCII payload slice (x19's trick — byte ≡ char
    * on this corpus, so the DuckDB twin is exact; the operator itself
    * never assumes text), boundary positions are a `filter` over
    * `sequence`, chunks explode from the boundary list, digests are
    * md5 over `substr`. Per-payload cost is O(bytes · window); output
    * mass is Σ(bytes/64) rows; the one shuffle is the per-source fold.
    * H = Σⱼ 31ʲ·byte(i−j) ≤ 127·31⁸/30 ≈ 1.2e11 — exact in BIGINT on
    * both engines. */
  def x181CdcChunking(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(octet_length(encode(col("text"), "utf-8")) === col("n_chars")
        && col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("text"),
        col("n_chars").cast("long").as("n"))
    val coef = Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L,
      887503681L, 27512614111L)
    val hashExpr = coef.zipWithIndex.map { case (c, j) =>
      s"$c * element_at(codes, CAST(i - $j AS INT))"
    }.mkString(" + ")
    // the eager checkpoint materializes each payload's boundary list ONCE:
    // HOF aliases (codes → bnds → ends) otherwise INLINE into every
    // downstream reference — posexplode(ends) + element_at(ends, k) would
    // re-run the whole 8-term rolling hash over the payload PER CHUNK ROW
    // (lambda expressions sit outside codegen subexpression elimination;
    // measured 465 s vs 1.3 s at sf0.1)
    val bounded = docs
      .withColumn("codes",
        expr("transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"))
      .withColumn("bnds",
        expr(s"filter(sequence(CAST(1 AS BIGINT), n), i -> i >= 8 AND ($hashExpr) % 64 = 0)"))
      .withColumn("ends", expr(
        """CASE WHEN size(bnds) = 0 OR element_at(bnds, -1) <> n
          |THEN concat(bnds, array(n)) ELSE bnds END""".stripMargin))
      .select(col("doc_id"), col("source"), col("text"), col("ends"))
      .localCheckpoint(true)
    val chunked = bounded
      .select(col("doc_id"), col("source"), col("text"), col("ends"),
        posexplode(col("ends")).as(Seq("k", "e")))
      .withColumn("p",
        expr("CASE WHEN k = 0 THEN CAST(0 AS BIGINT) ELSE element_at(ends, k) END"))
      .select(col("doc_id"), col("source"), (col("e") - col("p")).as("clen"),
        md5(expr("substr(text, CAST(p + 1 AS INT), CAST(e - p AS INT))")).as("h"))
    chunked.groupBy("source")
      .agg(countDistinct("doc_id").as("n_payloads"),
        count(lit(1)).as("n_chunks"),
        countDistinct("h").as("n_distinct_chunks"),
        graft.functions.Rounding.dround(sum("clen").cast("double")
          / count(lit(1)).cast("double"), 4).as("mean_chunk_bytes"),
        graft.functions.Rounding.dround(lit(1.0)
          - countDistinct("h").cast("double")
            / count(lit(1)).cast("double"), 4).as("dedup_share"))
      .orderBy("source")
  }

  /** x184 payload byte-entropy audit — the opaque-payload quality signal
    * x04's text heuristics cannot read: per payload, the Shannon entropy
    * of its BYTE histogram (nats). The compressibility/format-anomaly
    * triage a multimodal store runs before decode: natural-language
    * bytes sit ~2.9 nats, already-compressed or encrypted payloads push
    * ln 256 ≈ 5.55, constant padding → 0 — so the column flags
    * mis-tagged formats and corrupt blobs with no codec at all.
    *
    * Shape: byte explode → (payload, byte) map-side count agg (≤ 256
    * bins per payload) → per-payload fold. H = ln n − (Σ c·ln c)/n: the
    * sums are integers until the ≤ 256-term c·ln c reduction (double
    * under x67/x18's ln-sum rounding precedent), ONE divide, round 4.
    * Byte ≡ char on the ASCII slice (x19's trick), so the DuckDB twin is
    * exact; the operator itself never assumes text. */
  def x184ByteEntropy(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(octet_length(encode(col("text"), "utf-8")) === col("n_chars")
        && col("n_chars") > 0)
      .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("n"))
    val bins = docs
      .select(col("doc_id"), col("n"),
        explode(expr("transform(split(text, ''), ch -> ascii(ch))")).as("b"))
      .groupBy("doc_id", "n", "b").agg(count(lit(1)).as("c"))
    bins.groupBy("doc_id", "n")
      .agg(count(lit(1)).as("n_distinct_bytes"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n").as("n_bytes"), col("n_distinct_bytes"),
        graft.functions.Rounding.dround(log(col("n").cast("double"))
          - col("slc") / col("n").cast("double"), 4).as("entropy"))
      .orderBy("doc_id")
  }
}
