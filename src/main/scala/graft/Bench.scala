package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully materialized through the noop
  * sink (count() would let Catalyst prune sorts/projections and under-report). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench", s"local[$cpus]", cpus)
    // Optional isolation: SPARK_GRAFT_ONLY=x03_langid,x05_token_count times
    // just those queries (same warmup protocol) — for separating a real
    // per-query regression from shared-run GC/JIT interference.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    // Catalog + ANALYZE before timing: every query then plans with CBO
    // stats (row counts / NDVs / min-max), as a maintained warehouse would.
    try GraftCatalog.install(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] analyze skipped: ${e.getMessage}") }
    // Warm EVERY query once on the smallest sf (50-6000 rows, seconds total)
    // so the timed run measures each plan, not its first-call codegen compile
    // + JIT — e.g. x12's SRP kernel costs ~3s of one-time compilation that a
    // single global warmup query never touches.
    queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Pipeline measurement: cluster resolution over q53's ALREADY-computed
    // pairs (materialized to parquet untimed), isolating the CC stage — the
    // declared x14 stays standalone for the oracle, but a real dedup
    // pipeline reuses the pair list and pays only this cost.
    // With SPARK_GRAFT_ONLY set, each pipeline timing row is emitted only
    // when ITS name is in the filter (no unrequested sibling measurement).
    val wantCc   = only.forall(_("x14_cc_only"))
    val wantSurv = only.forall(_("x33_survivors_only"))
    val ccOnly = if (!wantCc && !wantSurv) Nil
    else try {
      import org.apache.spark.sql.functions.{col, split}
      val pairsDir = java.nio.file.Files.createTempDirectory("x14pairs").toString
      val toks = Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
      graft.functions.MinHashLSH.verifiedPairs(toks, 0.8)
        .select("id_a", "id_b").write.mode("overwrite").parquet(pairsDir)
      val pairs = spark.read.parquet(pairsDir)
      val ccRow = if (!wantCc) Nil else {
        val t0 = System.nanoTime()
        operators.TextOps.x14DedupClustersFrom(spark, sfDir, pairs)
          .write.format("noop").mode("overwrite").save()
        Seq("x14_cc_only" -> (System.nanoTime() - t0) / 1e9)
      }
      // third pipeline stage over the second's MATERIALIZED output: CC runs
      // untimed to parquet; survivor selection alone is one window + one agg
      val survRow = if (!wantSurv) Nil else {
        val labelsDir = java.nio.file.Files.createTempDirectory("x14labels").toString
        operators.TextOps.x14DedupClustersFrom(spark, sfDir, pairs)
          .select("doc_id", "cluster_id").write.mode("overwrite").parquet(labelsDir)
        val labels = spark.read.parquet(labelsDir)
        val t2 = System.nanoTime()
        operators.TextOps.x33SurvivorsFromLabels(spark, sfDir, labels)
          .write.format("noop").mode("overwrite").save()
        Seq("x33_survivors_only" -> (System.nanoTime() - t2) / 1e9)
      }
      ccRow ++ survRow
    } catch { case e: Throwable =>
      System.err.println(s"[bench] x14_cc_only failed: ${e.getMessage}"); Nil
    }
    // Layout measurement: q10's exact contract query over the co-bucketed
    // orders/lineitem pair (write cost untimed — bucketing is a write-once
    // layout decision amortized over every subsequent join). Quantifies
    // what deleting the join Exchange+Sort is worth vs the plain q10 row.
    val q10Bucketed = if (only.exists(!_("q10_bucketed"))) Nil else try {
      import org.apache.spark.sql.functions.{col, lit, sum}
      import graft.functions.Rounding.dround
      val bktDir = java.nio.file.Files.createTempDirectory("q10bkt").toString
      sources.BucketedFacts.writePair(spark, sfDir, bktDir)
      def q = spark.table("orders_bucketed").hint("merge")
        .join(spark.table("lineitem_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("rev"))
        .orderBy(col("rev").desc, col("o_orderkey"))
        .limit(100)
      q.write.format("noop").mode("overwrite").save() // warm (codegen/JIT)
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      Seq("q10_bucketed" -> (System.nanoTime() - t0) / 1e9)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] q10_bucketed failed: ${e.getMessage}"); Nil
    }
    val qs = (results ++ ccOnly ++ q10Bucketed).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's artifact keeps only the stdout TAIL, which truncates the
    // per-query map on a 95-query run — persist the complete line to a file
    // (override path via SPARK_GRAFT_BENCH_OUT) so every round's numbers
    // survive verbatim.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props.getOrElse("user.dir", ".") + "/bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
