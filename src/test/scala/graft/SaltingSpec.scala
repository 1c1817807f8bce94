package graft

import graft.operators.Salting
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of the big side lands on key 1 — the shape that serializes one
  // executor behind the hot key's partition in a plain shuffle join
  private def skewed = (1L to 10000L)
    .map(i => (if (i % 10 != 0) 1L else i, s"row$i")).toDF("k", "payload")
  private def dim = Seq((1L, "hot"), (20L, "cold"), (30L, "cold")).toDF("k", "label")

  test("salted join returns exactly the unsalted join's rows") {
    val plain = skewed.join(dim, "k")
    val salted = Salting.saltedJoin(skewed, dim, "k", 8, Seq(col("payload")))
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "label").except(plain).isEmpty)
    assert(plain.except(salted.select("k", "payload", "label")).isEmpty)
  }

  test("the join key carries the salt: hot key spreads across partitions") {
    // hint the shuffle path (a broadcast would hide the partitioning)
    val salted = Salting.saltedJoin(
      skewed.hint("shuffle_hash"), dim, "k", 8, Seq(col("payload")))
    val p = salted.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("_salt"), s"salt column absent from the plan:\n$p")
    val exchangeArgs = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchangeArgs.exists(l => l.contains("k#") && l.contains("_salt#")),
           s"shuffle must partition on (key, salt):\n${exchangeArgs.mkString("\n")}")
    // the hot key's rows really occupy multiple salt sub-keys
    val spread = Salting.saltedJoin(skewed, dim, "k", 8, Seq(col("payload")))
      .filter(col("k") === 1)
    val subkeys = skewed.filter(col("k") === 1)
      .select(pmod(xxhash64(col("payload")), lit(8L)).as("s"))
      .distinct().count()
    assert(subkeys === 8L, s"expected the hot key spread over 8 sub-keys, got $subkeys")
    assert(spread.count() === 9000L)
  }
}
