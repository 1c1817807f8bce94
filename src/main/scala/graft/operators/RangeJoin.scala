package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable banded range-join — the "theta join without the nested loop"
  * primitive behind Q16 (value-proximity self-join) and available to any
  * query joining on `|f(l) − f(r)| ≤ radius`.
  *
  * The shape (and why it scales): a naive BETWEEN theta join plans as a
  * nested-loop/cartesian product — O(n²) and a guaranteed 100 TB death.
  * Instead both sides are bucketed into constant-width bands of the join
  * value, the LEFT side is exploded to its band ±1 (any in-radius pair then
  * shares a band id, because band width ≥ radius), and the join becomes a
  * shuffled-hash EQUI-join on the band id with the exact predicate as a
  * residual filter — linear scan + one hash shuffle at any scale.
  *
  * Band-space choice, the parameter that matters:
  *  - [[logBand]] for RELATIVE radii ("within ±0.1%"): constant-width
  *    buckets over ln(v) hold the same candidate mass at every magnitude.
  *    Linear buckets would have to be sized for the MAX value and then
  *    over-collect everywhere below it (Q16 measured ~7× fewer candidates
  *    in log space). Scale-invariant: no data-dependent width at any sf.
  *  - [[linearBand]] for ABSOLUTE radii ("within 5 units / 10 minutes"):
  *    the natural space when the radius does not scale with the value —
  *    time-proximity joins, fixed tolerances.
  *
  * Equi-key + interval predicates (Q18's shape) need no banding at all —
  * the key equality already makes the join linear; [[pointInInterval]]
  * packages that shape with the interval side broadcast.
  */
object RangeJoin {

  /** Band id in LOG space for a relative radius `rel` (pairs with
    * `r ∈ [l·(1−rel), l·(1+rel)]`). Width must exceed the maximum
    * |Δln| = −ln(1−rel); the `safety` factor keeps float rounding from
    * ever splitting an in-radius pair across non-adjacent bands. Values
    * must be positive (log). */
  def logBand(v: Column, rel: Double, safety: Double = 1.01): Column =
    floor(log(v) / lit(-math.log(1 - rel) * safety)).cast("long")

  /** Band id in LINEAR space for an absolute radius `abs`. */
  def linearBand(v: Column, absRadius: Double, safety: Double = 1.01): Column =
    floor(v / lit(absRadius * safety)).cast("long")

  /** Inner join of every (left, right) pair whose band ids differ by ≤ 1 —
    * a superset of all in-radius pairs for any band from [[logBand]] /
    * [[linearBand]] — with `exact` applied as the residual filter. The left
    * side explodes 3× (its band ±1); the right side stays 1×, so put the
    * smaller/narrower side left when the sides differ. Output columns:
    * left's then right's (the internal band column is dropped). */
  def banded(left: DataFrame, right: DataFrame,
             leftBand: Column, rightBand: Column, exact: Column): DataFrame = {
    val l = left.withColumn("__band0", leftBand)
      .withColumn("__band",
        explode(array(col("__band0") - 1, col("__band0"), col("__band0") + 1)))
      .drop("__band0")
    val r = right.withColumn("__band", rightBand)
    l.join(r, Seq("__band")).filter(exact).drop("__band")
  }

  /** Point-in-interval join on an equi-key: rows of `points` matched to
    * `intervals` where the key is equal AND `point BETWEEN lo AND hi`. The
    * equi-key already makes this a linear hash join (the interval test is a
    * residual); `intervals` is one row per key — aggregate-sized — so it is
    * broadcast and the points side never shuffles. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyEq: Column, point: Column,
                      lo: Column, hi: Column): DataFrame =
    points.join(broadcast(intervals), keyEq && point.between(lo, hi))
}
