package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The reusable banded range-join must be EXACTLY the naive theta join —
  * banding only prunes candidates, never pairs (Q16/Q18 route through it;
  * their goldens + oracle pins stay the end-to-end check). */
class RangeJoinSpec extends SparkSpecBase {

  private def sides = {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    (o.select(col("o_orderkey").as("k1"), col("o_totalprice").as("p1")),
     o.select(col("o_orderkey").as("k2"), col("o_totalprice").as("p2")))
  }

  test("log-banded join == naive theta join (relative radius)") {
    val (l, r) = sides
    val exact = col("p2").between(col("p1") * 0.999, col("p1") * 1.001) &&
      col("k1") < col("k2")
    val naive = l.crossJoin(r).filter(exact).select("k1", "k2")
    val banded = RangeJoin.banded(l, r,
        RangeJoin.logBand(col("p1"), 0.001), RangeJoin.logBand(col("p2"), 0.001),
        exact)
      .select("k1", "k2")
    assert(banded.count() === naive.count())
    assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty)
  }

  test("linear-banded join == naive theta join (absolute radius)") {
    val (l, r) = sides
    val radius = 50.0
    val exact = abs(col("p1") - col("p2")) <= radius && col("k1") < col("k2")
    val naive = l.crossJoin(r).filter(exact).select("k1", "k2")
    val banded = RangeJoin.banded(l, r,
        RangeJoin.linearBand(col("p1"), radius), RangeJoin.linearBand(col("p2"), radius),
        exact)
      .select("k1", "k2")
    assert(banded.count() === naive.count())
    assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty)
  }
}
