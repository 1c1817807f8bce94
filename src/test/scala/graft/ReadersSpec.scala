package graft

import graft.sources.Readers
import org.apache.spark.sql.functions._

/** CSV/JSONL sources: explicit-schema round-trips of real fixture tables and
  * corrupt-row quarantine. */
class ReadersSpec extends SparkSpecBase {

  test("documents round-trips through CSV with explicit schema") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("docs-csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Readers.cleanRows(Readers.csv(spark, dir, docs.schema))
    assert(back.count() === docs.count())
    val a = back.agg(sum("n_chars"), sum("doc_id")).head
    val b = docs.agg(sum("n_chars"), sum("doc_id")).head
    assert(a === b)
  }

  test("orders round-trips through JSONL with explicit schema") {
    val orders = Tables.orders(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("orders-jsonl").toString
    orders.write.mode("overwrite").json(dir)
    val back = Readers.cleanRows(Readers.jsonl(spark, dir, orders.schema))
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_orderkey")).head === orders.agg(sum("o_orderkey")).head)
    // timestamps survive the text round-trip to the second
    val tsA = back.agg(max(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))).head.getString(0)
    val tsB = orders.agg(max(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))).head.getString(0)
    assert(tsA === tsB)
  }

  test("corrupt JSONL rows are quarantined, not dropped or fatal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corrupt-jsonl").toString
    Seq(
      """{"doc_id": 1, "text": "ok"}""",
      """{"doc_id": "NOT_A_NUMBER", "text": "bad"}""",
      """{broken json""").toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = Readers.jsonl(spark, dir, schema)
    val (clean, corrupt) = Readers.quarantineSplit(df)
    assert(clean.count() === 1)
    assert(corrupt.count() === 2)
    assert(!clean.columns.contains(Readers.CorruptCol))
    df.unpersist()
  }

  test("a corrupt parquet FILE is skipped under ignoreCorruptFiles; healthy files still read") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt-pq").toString
    val docs = Tables.documents(spark, sfDir)
    docs.repartition(2).write.mode("overwrite").parquet(dir)
    // drop garbage claiming to be a parquet file into the directory —
    // the partial-write/bitrot case a 1000-node ingest meets eventually
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    // default posture is fail-fast: the job must surface the corruption
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    // opt-in skip: the healthy files' rows all arrive, the junk is logged
    val tolerated = spark.read.option("ignoreCorruptFiles", "true").parquet(dir)
    assert(tolerated.count() === docs.count())
  }
}
