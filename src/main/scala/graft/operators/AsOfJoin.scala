package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic batch as-of join — the signature TSDB operator (catena-style
  * "latest point at-or-before T per series"), as a reusable API.
  *
  * Spark has no native batch as-of join; the scalable formulation used here
  * is the union+window rewrite:
  *
  *   1. tag right rows kind=0 carrying their payload, left rows kind=1 with
  *      a null payload;
  *   2. union and run ONE window per key, ordered by (ts, kind, tieBreak…),
  *      carrying `last(payload, ignoreNulls)` forward;
  *   3. keep only left rows — each now holds the payload of the latest
  *      right row at-or-before (inclusive) / strictly-before its timestamp.
  *
  * Scale story: exactly one shuffle, on the series key — same cost shape as
  * any per-series window op, O(n log n) per key partition, no pairing
  * explosion, no broadcast requirement on either side. A range-join
  * formulation is O(|L|·|R|) per key in the worst case and needs banding to
  * survive; this one does not. With both inputs stored in the bucketed
  * series layout (graft.sources.BucketedLayout) the shuffle disappears too.
  *
  * Tie semantics: on equal timestamps, inclusive=true sorts right rows
  * before left (kind 0 < 1) so a same-instant right row IS matched —
  * matching DuckDB's `ASOF JOIN … ON l.ts >= r.ts`; inclusive=false flips
  * the kind order so it is not.
  *
  * Null keys: the window formulation groups them (SQL GROUP BY semantics,
  * null probes can match null quotes); [[lastBeforeExec]] follows equi-join
  * semantics instead (null keys never match, like DuckDB ASOF JOIN). On
  * null-free keys — every contract query — the two are identical
  * (AsOfExecSpec).
  */
object AsOfJoin {

  /** @param left         probe side; all its columns are preserved
    * @param right        quote side; only `keys` + `rightTs` + `payload` are read
    * @param keys         equi-join series keys present on both sides
    * @param leftTs       left timestamp column name
    * @param rightTs      right timestamp column name
    * @param payload      right columns to attach (null when no match)
    * @param inclusive    whether a right row at exactly leftTs matches
    * @param tieBreak     extra right-side order columns breaking equal-ts ties
    *                     (the LAST in this order wins, e.g. highest event_id)
    */
  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String, payload: Seq[String],
                 inclusive: Boolean = true,
                 tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val payloadStruct = "__asof_payload"
    val kindCol = "__asof_kind"
    val tsCol = "__asof_ts"
    val tbCols = tieBreak.zipWithIndex.map { case (_, i) => s"__asof_tb$i" }
    val (rightKind, leftKind) = if (inclusive) (0, 1) else (1, 0)

    val leftCols = left.columns
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as(tsCol), lit(rightKind).as(kindCol),
            struct(payload.map(col): _*).as(payloadStruct)) ++
        tieBreak.zip(tbCols).map { case (c, a) => col(c).as(a) } ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as(tsCol), lit(leftKind).as(kindCol),
            lit(null).cast(r.schema(payloadStruct).dataType).as(payloadStruct)) ++
        tbCols.map(a => lit(null).cast(r.schema(a).dataType).as(a)) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col(tsCol), col(kindCol)) ++ tbCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn(payloadStruct, last(col(payloadStruct), ignoreNulls = true).over(w))
      .filter(col(kindCol) === leftKind)
      .select(
        leftCols.map { c => if (c == leftTs) col(tsCol).as(leftTs) else col(c) } ++
          payload.map(p => col(s"$payloadStruct.$p").as(s"asof_$p")): _*)
  }

  /** The same contract as [[lastBefore]], executed by the custom
    * whole-operator plan ([[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfMergeJoinExec]] via the injected
    * [[graft.plans.AsOfJoinStrategy]]): both sides shuffled once on the key
    * and streamed through a forward merge — no |L|+|R| union materialization
    * and no window state. Prefer this on wide payloads or when the window
    * buffer dominates; semantics are asserted equivalent in AsOfExecSpec.
    *
    * The right side is re-aliased first so fresh exprIds make self-derived
    * inputs (both sides filtered from one table — the common TSDB case)
    * unambiguous in the joined output. */
  def lastBeforeExec(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, payload: Seq[String],
                     inclusive: Boolean = true,
                     tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    import org.apache.spark.sql.graftbridge.Bridge
    val rCols = (keys ++ Seq(rightTs) ++ payload ++ tieBreak).distinct
    val r2 = right.select(rCols.map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(r2)
    def attrOf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"no column $n in ${p.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attrOf(lPlan, _)),
      keys.map(k => attrOf(rPlan, s"__r_$k")),
      attrOf(lPlan, leftTs),
      attrOf(rPlan, s"__r_$rightTs"),
      payload.map(p => attrOf(rPlan, s"__r_$p")),
      inclusive,
      tieBreak.map(t => attrOf(rPlan, s"__r_$t")))
    Bridge.dataset(left.sparkSession, node)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__r_$p").as(s"asof_$p")): _*)
  }
}
