package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The generic as-of join operator: hand-computed semantics, tie rules,
  * left-outer behavior, and plan shape (join-free). */
class AsOfJoinSpec extends SparkSpecBase {

  import org.apache.spark.sql.DataFrame

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 10L, 1L, 100.0),
      ("A", 20L, 2L, 200.0),
      ("A", 20L, 3L, 300.0), // same ts as id=2: higher tieBreak wins
      ("B", 15L, 4L, 400.0)
    ).toDF("k", "ts", "qid", "px")
  }

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 5L),  // before any quote → null
      ("A", 20L), // equal ts → inclusive matches id=3 (tieBreak), exclusive → id=1's px
      ("A", 25L), // after all → latest (id=3)
      ("B", 15L), // equal ts on B
      ("C", 50L)  // key with no quotes at all → null
    ).toDF("k", "ts")
  }

  test("inclusive as-of: equal-ts quote matches, highest tieBreak wins") {
    val got = AsOfJoin.lastBefore(trades, quotes, Seq("k"), "ts", "ts",
        payload = Seq("px", "qid"), inclusive = true, tieBreak = Seq("qid"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      ("A", 5L, None, None),
      ("A", 20L, Some(300.0), Some(3L)),
      ("A", 25L, Some(300.0), Some(3L)),
      ("B", 15L, Some(400.0), Some(4L)),
      ("C", 50L, None, None)))
  }

  test("exclusive as-of: equal-ts quote does NOT match") {
    val got = AsOfJoin.lastBefore(trades, quotes, Seq("k"), "ts", "ts",
        payload = Seq("px"), inclusive = false, tieBreak = Seq("qid"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      ("A", 5L, None),
      ("A", 20L, Some(100.0)), // only the ts=10 quote is strictly before
      ("A", 25L, Some(300.0)),
      ("B", 15L, None),
      ("C", 50L, None)))
  }

  test("as-of preserves every left row (left-outer semantics)") {
    val out = AsOfJoin.lastBefore(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    assert(out.count() === trades.count())
  }

  test("the plan is join-free: one shuffle on the key, window, filter") {
    val out = AsOfJoin.lastBefore(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("matches an independent per-row subquery on real events (sf0.001)") {
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val errors = e.filter(col("event_type") === "error").select("user_id", "ts")
    val got = AsOfJoin.lastBefore(errors, clicks, Seq("user_id"), "ts", "ts",
        Seq("value"), inclusive = true, tieBreak = Seq("event_id"))
      .filter(col("asof_value").isNotNull)
    // reference: correlated max_by over a range join (quadratic — test-only)
    val ref = errors.as("er").join(clicks.as("c"),
        col("er.user_id") === col("c.user_id") && col("er.ts") >= col("c.ts"))
      .groupBy(col("er.user_id").as("u"), col("er.ts").as("ets"))
      .agg(max_by(col("c.value"), struct(col("c.ts"), col("c.event_id"))).as("v"))
    assert(got.count() === ref.count())
    val a = got.agg(round(sum("asof_value"), 4)).head.getDouble(0)
    val b = ref.agg(round(sum("v"), 4)).head.getDouble(0)
    assert(a === b)
  }
}
