package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Time-series scalar/aggregate helpers beyond the §2 contract. */
object SeriesFunctions {

  /** EMA over an array of (already time-sorted) values: a single
    * `aggregate()` scan with a (ema, seeded) struct accumulator — order is
    * explicit in the array, so this is deterministic under any partitioning
    * (an unordered UDAF cannot compute EMA correctly; the array formulation
    * pins the scan order). Usage:
    * `ema(sort_array(collect_list(struct(ts, value))).getField("value"), 0.3)` —
    * or over `transform(sorted_structs, s -> s.value)`. */
  def ema(sortedValues: Column, alpha: Double): Column = {
    val a = lit(alpha)
    aggregate(
      sortedValues,
      struct(lit(0.0).as("ema"), lit(false).as("seeded")),
      (acc, x) => struct(
        when(acc.getField("seeded"), acc.getField("ema") * (lit(1.0) - a) + x * a)
          .otherwise(x).as("ema"),
        lit(true).as("seeded")),
      acc => acc.getField("ema"))
  }

  case class TsPoint(ts: Long, value: Double)

  /** Typed UDAF (Aggregator → udaf()) for latest-point-per-key: catena's hot
    * query as an order-INDEPENDENT aggregate (max-by ts), so it is correct
    * under partial/final aggregation at any parallelism; register with
    * `spark.udf.register("latest_point", udaf(LatestPointAgg))`. */
  object LatestPointAgg extends Aggregator[TsPoint, TsPoint, Double] {
    override def zero: TsPoint = TsPoint(Long.MinValue, Double.NaN)
    override def reduce(b: TsPoint, p: TsPoint): TsPoint = if (p.ts > b.ts) p else b
    override def merge(a: TsPoint, b: TsPoint): TsPoint = if (a.ts >= b.ts) a else b
    override def finish(r: TsPoint): Double = r.value
    override def bufferEncoder: Encoder[TsPoint] = Encoders.product[TsPoint]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
