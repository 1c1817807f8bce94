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
}
