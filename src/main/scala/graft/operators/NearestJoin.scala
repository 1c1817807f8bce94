package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-neighbor join on a 1-D numeric axis, per key — the value-axis
  * sibling of [[AsOfJoin]] (kdb's `aj`-nearest / "closest match" join):
  * for every left row, the right row minimizing |l.axis − r.axis| within
  * the same key group, ties broken by smaller right axis value, then
  * smaller right id. The matching op behind case-control pairing (x108:
  * match every treatment doc to the length-nearest control), calibration
  * transfer, nearest-grid lookup.
  *
  * Shape: one at-or-before pass per direction (toward −∞ and toward +∞,
  * the latter by mirroring the axis), then a per-row winner pick. Each
  * pass is the TWO-LEVEL scan, not a per-key window over the corpus
  * (keys are often low-cardinality here — lang, cohort — exactly the
  * q29 serialization trap):
  *
  *  1. right rows fold per (key, axis-bucket) into ONE running-max
  *     struct (axis, −id, payload) — struct ordering makes "largest
  *     axis, then smallest id" a plain `max`, so no window ORDER-tie
  *     subtleties exist anywhere;
  *  2. the bucket spine (distinct (key, bucket) of BOTH sides — an
  *     aggregate) carries `max` over strictly-earlier buckets → the
  *     carry-in each bucket inherits;
  *  3. inside each (key, bucket): union right folds + left probes, one
  *     running `max(struct)` window ordered by (axis, kind) with RANGE
  *     frame (right peers at the probe's own axis value are included —
  *     at-or-before is inclusive);
  *  4. per probe: best = greatest(carry, intra) per direction; winner by
  *     (|Δ|, axis, id).
  *
  * Both directions run inclusive: an exact-axis match surfaces in both,
  * as the same right row, and the (|Δ|, axis, id) pick collapses it.
  * Parallelism is |keys|·|buckets|; every window input is either
  * bucket-bounded or aggregate-sized. All-integer throughout. */
object NearestJoin {

  /** @param left     probe side: columns (key, axis, id) — preserved
    * @param right    pool side: columns (key, axis, id)
    * @param key      equi-group column name on both sides
    * @param axis     numeric (LONG) axis column name on both sides
    * @param id       LONG id column name on both sides (right id doubles
    *                 as the deterministic tie-break)
    * @param bucketW  axis width of the two-level buckets
    * @return left rows + (match_id, match_axis, delta); left rows with an
    *         empty key group are dropped (inner-match semantics) */
  def nearest(left: DataFrame, right: DataFrame, key: String, axis: String,
              id: String, bucketW: Long = 64L): DataFrame = {
    def pass(m: Long): DataFrame = {
      val r = right.select(col(key),
        (col(axis) * m).as("a"),
        struct((col(axis) * m).as("a"), (-col(id)).as("nid"),
          col(id).as("rid"), col(axis).as("raxis")).as("s"))
        .withColumn("bkt", expr(s"a div $bucketW"))
      val l = left.select(col(key), (col(axis) * m).as("a"), col(id).as("lid"))
        .withColumn("bkt", expr(s"a div $bucketW"))
      val folds = r.groupBy(col(key), col("bkt")).agg(max("s").as("bs"))
      val spine = l.select(col(key), col("bkt"))
        .unionByName(r.select(col(key), col("bkt"))).distinct()
        .join(folds, Seq(key, "bkt"), "left")
      val wc = Window.partitionBy(key).orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = spine.withColumn("carry", max("bs").over(wc))
        .select(col(key), col("bkt"), col("carry"))
      val wi = Window.partitionBy(col(key), col("bkt")).orderBy("a", "kind")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      r.select(col(key), col("bkt"), col("a"), lit(0).as("kind"),
          col("s"), lit(null).cast("long").as("lid"))
        .unionByName(l.select(col(key), col("bkt"), col("a"), lit(1).as("kind"),
          lit(null).cast(r.schema("s").dataType).as("s"), col("lid")))
        .withColumn("run", max("s").over(wi))
        .filter(col("kind") === 1)
        .join(broadcast(carry), Seq(key, "bkt"), "left")
        .select(col(key), col("lid"), greatest(col("run"), col("carry")).as("best"))
    }
    // fresh output names on both passes: their plans share left/right
    // lineage, and unrenamed key/id attributes would trip Catalyst's
    // ambiguous-self-join detection on the recombining joins
    val toward = pass(1L).select(col(key).as("k1"), col("lid").as("lid1"),
      col("best.rid").as("p_id"), col("best.raxis").as("p_axis"))
    val away = pass(-1L).select(col(key).as("k2"), col("lid").as("lid2"),
      col("best.rid").as("n_id"), col("best.raxis").as("n_axis"))
    left.join(toward, left(key) === col("k1") && left(id) === col("lid1"))
      .join(away, col("k2") === col("k1") && col("lid2") === col("lid1"))
      .withColumn("dp", when(col("p_id").isNotNull, abs(left(axis) - col("p_axis"))))
      .withColumn("dn", when(col("n_id").isNotNull, abs(col("n_axis") - left(axis))))
      .withColumn("take_p", col("p_id").isNotNull &&
        (col("n_id").isNull || col("dp") <= col("dn")))
      .filter(col("p_id").isNotNull || col("n_id").isNotNull)
      .select(left.columns.map(left(_)) :+
        when(col("take_p"), col("p_id")).otherwise(col("n_id")).as("match_id") :+
        when(col("take_p"), col("p_axis")).otherwise(col("n_axis")).as("match_axis") :+
        when(col("take_p"), col("dp")).otherwise(col("dn")).as("delta"): _*)
  }
}
