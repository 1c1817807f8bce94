package graft

/** Dev helper: run a subset of SparkEntry queries and show results.
  * Usage: runMain graft.Dev <sfDir> <name1,name2,...> [explain]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq.sorted
    val explain = args.length > 2 && args(2) == "explain"
    if (names == Seq("entry")) {
      // simulate the driver's smoke check: a bare session with NONE of our
      // builder configs — Tables.events must self-heal via spark.conf.set
      val bare = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
      bare.sparkContext.setLogLevel("WARN")
      val n = SparkEntry.entry(bare).count()
      println(s"entry rows=$n")
      bare.stop()
      return
    }
    if (names == Seq("stream")) {
      // drive the streaming ingest surface end-to-end: replay events through
      // the file-source stream into a day-bucketed sink, twice (same
      // checkpoint), and report sink vs batch counts
      val s = GraftSession.build("graft-dev")
      val sink = java.nio.file.Files.createTempDirectory("sink").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
      graft.streaming.StreamOps.ingest(s, sfDir, sink, ckpt).awaitTermination()
      graft.streaming.StreamOps.ingest(s, sfDir, sink, ckpt).awaitTermination()
      val sunk = s.read.parquet(sink)
      println(s"stream sink rows=${sunk.count()} days=${sunk.select("day").distinct().count()} " +
        s"batch rows=${Tables.events(s, sfDir).count()}")
      s.stop()
      return
    }
    val spark = GraftSession.build("graft-dev")
    names.foreach { n =>
      println(s"=== $n ===")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (explain) df.explain("formatted")
        df.show(10, truncate = false)
      } catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
