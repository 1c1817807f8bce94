package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unit-level invariants that the DuckDB oracle cannot express: sketch
  * tolerance (Q21), banding safety (Q16), ANN recall (x08), algebraic
  * identities, and the driver smoke contract. */
class OperatorSpec extends SparkSpecBase {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle twin (none left rows-only as of round 5)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle twin: $missing")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("Q21 approx distinct within 5% of exact (HLL tolerance contract)") {
    val rows = RelationalOps.q21(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val exact = RelationalOps.q20(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === exact.keySet)
    rows.foreach { case (k, (nExact, ok)) =>
      assert(nExact === exact(k), s"$k: declared exact $nExact != q20 ${exact(k)}")
      assert(ok === 1, s"$k: HLL outside the 5% tolerance")
    }
  }

  test("x29 replication counts match an independent BigInt reference model") {
    // recompute every copy count with exact BigInt arithmetic (no Spark
    // expressions, no DECIMAL, no doubles) and compare the multiset of
    // (doc_id, copy) rows — pins the DECIMAL(38,0) plumbing to the algebra
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ks = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tt = BigInt(docs.map(_._3).sum)
    val srcs = BigInt(ks.size)
    val expected = docs.flatMap { case (id, src, _) =>
      val den = srcs * BigInt(ks(src))
      val base = tt / den
      val u = (BigInt(id) * BigInt(2654435761L)) % BigInt(4294967296L)
      val extra = if (u * den < (tt % den) * BigInt(4294967296L)) 1 else 0
      val n = (base + extra).toLong
      (1L to n).map(c => (id, c))
    }.sorted.toSeq
    val got = TextOps.x29MixtureResample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    assert(got === expected)
    // expected output token mass stays ~T: the model is a resample, not a filter
    assert(got.nonEmpty)
  }

  test("x34 sketch percentiles within the declared 5% of exact (both quantiles)") {
    RelationalOps.x34QuantileSketch(spark, sfDir).collect().foreach { r =>
      assert(r.getInt(3) === 1 && r.getInt(4) === 1,
             s"${r.getString(0)}: sketch outside tolerance")
    }
  }

  test("two-level top-k (q34/x31/x35) equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    // q34 reference: one rank window per group, no bucketing
    val w34 = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref34 = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
              row_number().over(w34).cast("long").as("rn"))
      .filter(col("rn") <= 3).orderBy("o_orderpriority", "rn")
      .collect().map(_.toSeq).toSeq
    assert(AnalyticOps.q34(spark, sfDir).collect().map(_.toSeq).toSeq === ref34)

    // x35 reference: one md5-order window per lang
    val w35 = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref35 = Tables.documents(spark, sfDir)
      .select(col("lang"),
              row_number().over(w35).cast("long").as("rnk"),
              col("doc_id"), col("source"))
      .filter(col("rnk") <= 20).orderBy("lang", "rnk")
      .collect().map(_.toSeq).toSeq
    assert(TextOps.x35FixedKSample(spark, sfDir).collect().map(_.toSeq).toSeq === ref35)

    // x43 reference: one global priority window, no bucketing
    val w43 = Window.orderBy(col("prio").desc, col("doc_id"))
    val ref43 = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("double").as("h"))
      .withColumn("prio",
        col("n_chars").cast("double") / ((col("h") + lit(0.5)) / lit(4294967296.0)))
      .select(row_number().over(w43).cast("long").as("rnk"),
              col("doc_id"), col("lang"), col("source"), col("n_chars"),
              graft.functions.Rounding.dround(col("prio"), 4).as("prio"))
      .filter(col("rnk") <= 50).orderBy("rnk")
      .collect().map(_.toSeq).toSeq
    assert(TextOps.x43WeightedSample(spark, sfDir).collect().map(_.toSeq).toSeq === ref43)
  }

  test("x43 weighting: inclusion tracks n_chars (priority-sample property)") {
    // docs in the sample should be systematically longer than the corpus
    // average — the whole point of weighting by n_chars
    val sampleAvg = TextOps.x43WeightedSample(spark, sfDir)
      .agg(avg("n_chars")).head.getDouble(0)
    val corpusAvg = Tables.documents(spark, sfDir)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"weighted sample avg $sampleAvg not above corpus avg $corpusAvg")
  }

  test("x36 chunk boundary invariants: dense indices, full-width windows, short docs") {
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextOps.x36ChunkWindows(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet === lens.keySet)
    chunks.foreach { case (doc, rows) =>
      val len = lens(doc)
      val expectedK = if (len <= 32) 0 else (len - 32 + 23) / 24
      assert(rows.map(_._2).sorted.toSeq === (0L to expectedK), s"doc $doc: chunk_idx not dense")
      if (len >= 32) assert(rows.forall(_._3 == 32), s"doc $doc: non-full window despite len=$len")
      else assert(rows.map(_._3).toSeq === Seq(len.toLong), s"doc $doc: short-doc chunk wrong")
    }
  }

  test("Q16 log-banding loses no pair vs the brute-force nested loop") {
    val prices = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val brute = (for {
      (k1, p1) <- prices; (k2, p2) <- prices
      if k1 < k2 && p2 >= p1 * 0.999 && p2 <= p1 * 1.001
    } yield 1).size.toLong
    val banded = RelationalOps.q16(spark, sfDir).head.getLong(0)
    assert(banded === brute, s"log-banded $banded != brute-force $brute")
  }

  test("Q12 full-outer counts are consistent with table cardinalities") {
    val r = RelationalOps.q12(spark, sfDir).head
    val (partOnly, liOnly, matched) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val nPart = Tables.part(spark, sfDir).count()
    val nLiKeys = Tables.lineitem(spark, sfDir).select("l_partkey").distinct().count()
    assert(partOnly + matched === nPart)
    assert(liOnly + matched === nLiKeys)
  }

  test("cosine is 1.0 on identical vectors, -1.0 on negated") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
                 (Array(1.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
      .select(round(VectorOps.cosine(col("a"), col("b")), 6).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, -1.0))
  }

  test("x08 IVF ANN recall vs exact brute-force top-5 on clustered data (>= 0.8)") {
    // IVF's recall contract assumes the corpus HAS cluster structure — on
    // isotropic random vectors (the sf fixtures; max pairwise cos ≈ 0.6)
    // any partition-based ANN is intrinsically lossy, and the old fixed
    // stride only looked good because a single centroid degenerates to
    // brute force. Plant 8 genuine clusters and require real recall.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val rnd = new scala.util.Random(42L)
    val dim = 32
    val centers = Vector.fill(8)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      val v = c.map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      org.apache.spark.sql.Row(i.toLong, v.toSeq, s"c${i % 8}")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val exact = VectorOps.q54(spark, dir).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.x08AnnIvf(spark, dir).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low on clustered corpus")
  }

  test("union/except/intersect algebraic identities") {
    val e = Tables.events(spark, sfDir).select("user_id").distinct()
    assert(e.except(e).isEmpty)
    assert(e.intersect(e).count() === e.count())
    assert(e.union(e).count() === 2 * e.count())
  }

  test("x45: one Lloyd step matches a driver-side exact-arithmetic reference") {
    // independent re-derivation of the whole contract on collected data:
    // same seed rule, same (round(cos,4) DESC, cent_id) ranking, same
    // 1e6-scaled integer mean — any drift in the distributed plan
    // (assignment ties, sum order, rounding) breaks the === below
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def dr(v: Double, p: Int): Double = {
      val m = math.pow(10, p)
      val r = JBD.valueOf(v * m).setScale(0, RM.HALF_UP).doubleValue() / m
      if (r == 0.0) v * 0.0 else r
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).sortBy(_._1)
    val stride = math.floor(math.sqrt(rows.length.toDouble)).toLong
    val cents = rows.filter(_._1 % stride == 0L)
    val assign = rows.map { case (_, v) =>
      val cid = cents.map { case (c, cv) => (dr(cos(v, cv), 4), c) }
        .minBy { case (cc, c) => (-cc, c) }._2
      (cid, v)
    }
    val expected = assign.groupBy(_._1).toSeq.map { case (cid, ms) =>
      val nm = ms.length
      val centroid = ms.head._2.indices.map { i =>
        val sv = ms.map(m => JBD.valueOf(m._2(i) * 1000000.0)
          .setScale(0, RM.HALF_UP).longValueExact()).sum
        dr(sv.toDouble / (nm * 1000000.0), 6)
      }.toArray
      val seed = cents.find(_._1 == cid).get._2
      // declared output ships the centroid as the ×1e6 integer CSV (the
      // driver's row-sort cannot order array cells) — mirror it here
      val csv = centroid.map(v => JBD.valueOf(v * 1000000.0)
        .setScale(0, RM.HALF_UP).longValueExact().toString).mkString(",")
      (cid, nm.toLong, dr(cos(seed, centroid), 4), csv)
    }.sortBy(_._1)
    val got = VectorOps.x45KmeansStep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq === expected)
  }

  test("x49: CMS two-pass heavy hitters equal the naive exact groupBy") {
    // the naive plan (full vocabulary shuffle) is the reference; the
    // sketch-screened two-pass must reproduce its row set EXACTLY —
    // CMS has no false negatives, and the exact re-count kills the
    // false positives, so any divergence is a screen bug
    val grams = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextExpressions.wordShingles(
        split(col("text"), " "), 2)).as("gram"))
    val n = grams.count()
    val naive = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= n / 800)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = TextOps.x49HeavyHitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.map(t => (t._1, t._2)).toSet === naive)
    // the verdict column must certify the sketch everywhere it reports
    assert(got.forall(_._3 == 1), "CMS estimate outside [cnt, cnt+ceil(eps*N)]")
  }

  test("x50: Bloom-screened contamination equals x17's exact output") {
    // byte-identical contract: the screen is a plan optimization only
    val exact = TextOps.x17Contamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val screened = TextOps.x50BloomContamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(screened === exact)
  }

  test("Q17 as-of union+window matches a per-row subquery formulation") {
    // independent reference implementation: correlated max-ts lookup
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("value").as("cval"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val ref = errors.join(clicks, col("user_id") === col("cu") && col("cts") <= col("ts"))
      .groupBy("event_id")
      .agg(max_by(col("cval"), col("cts")).as("lc"))
      .agg(count(lit(1)).as("n_matched"), round(sum("lc"), 4).as("sum_click"))
      .head
    val got = operators.TimeSeriesOps.q17(spark, sfDir).head
    assert(got.getLong(0) === ref.getLong(0))
    assert(math.abs(got.getDouble(1) - ref.getDouble(1)) < 1e-6)
  }

  test("x51: power step matches a driver-side exact-arithmetic reference") {
    // re-derive y = Σ (x·1)·x with the same ×1e6 BIGINT term rounding on
    // collected data — any drift in the distributed plan (term rounding,
    // sum order, the decimal norm) breaks the === below
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val rows = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val d = rows.head.length
    val y = Array.fill(d)(0L)
    rows.foreach { v =>
      // same fixed left-to-right double accumulation as the codegen dot
      var dt = 0.0; var i = 0
      while (i < d) { dt += v(i).toDouble * 1.0; i += 1 }
      i = 0
      while (i < d) {
        y(i) += JBD.valueOf(dt * v(i).toDouble * 1000000.0)
          .setScale(0, RM.HALF_UP).longValueExact()
        i += 1
      }
    }
    val n2 = y.map(v => BigInt(v) * BigInt(v)).sum
    def dr6(v: Double): Double =
      JBD.valueOf(v * 1e6).setScale(0, RM.HALF_UP).doubleValue() / 1e6
    val expected = y.zipWithIndex.map { case (ys, dim) =>
      (dim, dr6(ys.toDouble / math.sqrt(n2.toDouble)), ys)
    }.toSeq
    val got = VectorOps.x51PowerIter(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("x52: bins partition each source exactly; quartile bins are value-ordered") {
    val bins = TextOps.x52QualityBins(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val perSource = Tables.documents(spark, sfDir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bins.groupBy(_._1).foreach { case (src, bs) =>
      assert(bs.map(_._3).sum === perSource(src), s"$src: bins do not partition the source")
      // value ranges of successive bins must not interleave
      bs.sortBy(_._2).toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (lo, hi) = (pair(0), pair(1))
          assert(lo._5 <= hi._4,
            s"$src: bin ${lo._2} max ${lo._5} > bin ${hi._2} min ${hi._4}")
        }
      }
    }
  }

  test("x54: Bloom-screened novelty equals the plain exact anti-join") {
    // the screen splits shingles into sure-novel vs maybe-seen; the
    // declared output must equal the unscreened formulation row-for-row —
    // Bloom's "definitely not present" direction is sound, so any
    // divergence is a screen bug
    def sh(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(
        graft.functions.TextExpressions.wordShingles(col("t"), 3)).as("shingle"))
      .distinct()
    val docs = Tables.documents(spark, sfDir)
    val ref = sh(docs.filter(col("doc_id") < 100)).select("shingle").distinct()
    val plain = sh(docs.filter(col("doc_id") >= 100))
      .join(ref.withColumn("seen", lit(1)), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
           sum(when(col("seen").isNull, 1).otherwise(0)).cast("long").as("nov"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    val got = TextOps.x54Novelty(spark, sfDir)
      .select("doc_id", "n_shingles", "n_novel")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === plain)
  }

  test("x55: card masses reconcile with the corpus; dup docs match q52's groups") {
    val card = TextOps.x55DatasetCard(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(card.map(_.getLong(2)).sum === total, "n_docs does not partition the corpus")
    val dupFromQ52 = TextOps.q52(spark, sfDir).filter(col("n_docs") > 1)
      .agg(sum("n_docs")).head.get(0)
    val dupDocs = card.map(_.getLong(5)).sum
    assert(dupDocs === (if (dupFromQ52 == null) 0L else dupFromQ52.asInstanceOf[Long]),
      s"dup-doc mass $dupDocs disagrees with q52's duplicate groups $dupFromQ52")
  }

  test("x53: predictions cover exactly the non-seed docs with a verified seed neighbor") {
    val pairs = graft.functions.MinHashLSH.verifiedPairs(
        Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), split(col("text"), " ").as("toks")), 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (src, dst) => src % 10 != 0 && dst % 10 == 0 }
      .map(_._1).toSet
    val got = TextOps.x53LabelProp(spark, sfDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
  }
}
