package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom whole-operator as-of join ([[graft.plans.AsOfMergeJoinExec]])
  * must be semantically identical to the union+window rewrite it
  * specializes — asserted over the real events fixture and over synthetic
  * edge data (ties, null keys, unmatched probes). */
class AsOfExecSpec extends SparkSpecBase {

  private def events = Tables.events(spark, sfDir)
  private def clicks = events.filter(col("event_type") === "click")
    .select("user_id", "ts", "event_id", "value")
  private def errors = events.filter(col("event_type") === "error")
    .select("user_id", "ts", "event_id")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("exec as-of equals the union+window rewrite on the events fixture") {
    for (inclusive <- Seq(true, false)) {
      val viaWindow = AsOfJoin.lastBefore(errors, clicks, Seq("user_id"),
        "ts", "ts", Seq("value"), inclusive, tieBreak = Seq("event_id"))
      val viaExec = AsOfJoin.lastBeforeExec(errors, clicks, Seq("user_id"),
        "ts", "ts", Seq("value"), inclusive, tieBreak = Seq("event_id"))
      assert(sortedRows(viaExec) == sortedRows(viaWindow), s"inclusive=$inclusive")
      assert(viaExec.count() == errors.count(), "as-of must preserve every left row")
    }
  }

  test("exec as-of plan contains the custom merge operator, no join/window") {
    val p = AsOfJoin.lastBeforeExec(errors, clicks, Seq("user_id"),
      "ts", "ts", Seq("value")).queryExecution.executedPlan.toString
    assert(p.contains("AsOfMergeJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
           !p.contains("Window"), p)
  }

  test("edge cases: ties, unmatched probes, null keys, multi-row payload") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 20L, 3.0), // tie at ts=20
      (2L, 5L, 9.0),
      (3L, 100L, 7.0)                                  // only after probe ts
    ).toDF("k", "t", "v")
    val nullKeyQuote = Seq((Option.empty[Long], 1L, 99.0)).toDF("k", "t", "v")
    val probes = Seq(
      (1L, 20L), (1L, 19L), (1L, 5L),                  // tie hit, between, before-all
      (2L, 5L),                                        // exact ts
      (3L, 50L),                                       // quote exists only later
      (4L, 10L)                                        // key with no quotes
    ).toDF("k", "t")
    val nullKeyProbe = Seq((Option.empty[Long], 10L)).toDF("k", "t")
    val q = quotes.unionByName(nullKeyQuote)
    val p = probes.unionByName(nullKeyProbe)
    for (inclusive <- Seq(true, false)) {
      // null-key rows excluded from the equivalence set: the window rewrite
      // groups nulls (SQL GROUP BY semantics) while the exec follows
      // equi-join semantics (null keys never match, like DuckDB ASOF JOIN) —
      // the exec's behavior is asserted directly below
      val viaWindow = AsOfJoin.lastBefore(p, q, Seq("k"), "t", "t", Seq("v"), inclusive)
        .filter(col("k").isNotNull)
      val viaExec = AsOfJoin.lastBeforeExec(p, q, Seq("k"), "t", "t", Seq("v"), inclusive)
        .filter(col("k").isNotNull)
      assert(sortedRows(viaExec) == sortedRows(viaWindow), s"inclusive=$inclusive")
    }
    // spot-check the inclusive semantics directly
    val got = AsOfJoin.lastBeforeExec(p, q, Seq("k"), "t", "t", Seq("v"), inclusive = true)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), Option(r.get(2)))).toSet
    assert(got.contains((Some(1L), 20L, Some(3.0))), s"tie must resolve to last right row: $got")
    assert(got.contains((Some(1L), 19L, Some(1.0))), got)
    assert(got.contains((Some(1L), 5L, None)), got)
    assert(got.contains((Some(2L), 5L, Some(9.0))), got)
    assert(got.contains((Some(3L), 50L, None)), got)
    assert(got.contains((Some(4L), 10L, None)), got)
    assert(got.contains((None, 10L, None)), "null keys must never match")
  }

  test("multi-key as-of and long (non-timestamp) time axis") {
    import spark.implicits._
    val q = Seq((1L, "a", 10L, 1.0), (1L, "b", 10L, 2.0), (2L, "a", 10L, 3.0))
      .toDF("k1", "k2", "t", "v")
    val p = Seq((1L, "a", 15L), (1L, "b", 15L), (2L, "b", 15L))
      .toDF("k1", "k2", "t")
    val viaWindow = AsOfJoin.lastBefore(p, q, Seq("k1", "k2"), "t", "t", Seq("v"))
    val viaExec = AsOfJoin.lastBeforeExec(p, q, Seq("k1", "k2"), "t", "t", Seq("v"))
    assert(sortedRows(viaExec) == sortedRows(viaWindow))
  }
}
