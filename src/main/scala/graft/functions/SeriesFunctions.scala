package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, CaseWhen, CreateNamedStruct, Expression, LambdaFunction, Literal, Multiply, Subtract, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Time-series scalar/aggregate helpers beyond the §2 contract. */
object SeriesFunctions {

  /** FLOOR division on longs — the time-bucket contract semantics.
    *
    * Spark's `div` truncates toward zero while DuckDB's `//` (and
    * `window(ts, …)`'s bucket assignment) FLOOR — so a pre-epoch
    * timestamp would land in a different bucket across engines, and a
    * batch `div` bucketing would diverge from its Structured Streaming
    * window twin (r8 advice; latent on the 2024-epoch fixture, real for
    * any historical corpus). `x − pmod(x, d)` is the exact largest
    * multiple of d ≤ x (pmod is nonnegative for positive d), and the
    * division of an exact multiple through decimal(38,0) is exact for
    * the full long range — no double rounding anywhere. */
  def floorDiv(x: Column, d: Long): Column = {
    require(d > 0, "floorDiv divisor must be positive")
    ((x - pmod(x, lit(d))).cast("decimal(38,0)") /
      lit(java.math.BigDecimal.valueOf(d))).cast("long")
  }

  /** EMA over an array of (already time-sorted) values: a single
    * `aggregate()` scan with a (ema, seeded) struct accumulator — order is
    * explicit in the array, so this is deterministic under any partitioning
    * (an unordered UDAF cannot compute EMA correctly; the array formulation
    * pins the scan order). Usage:
    * `ema(sort_array(collect_list(struct(ts, value))).getField("value"), 0.3)` —
    * or over `transform(sorted_structs, s -> s.value)`. */
  def ema(sortedValues: Column, alpha: Double): Column =
    ema(sortedValues, lit(alpha))

  /** Column-alpha overload: wraps [[emaExpr]], so the Column API and the SQL
    * surface `ema_arr(values, alpha)` (injected by
    * [[graft.plans.GraftExtensions]]) share ONE expression tree — UDF-free,
    * an `aggregate()` fold either way. */
  def ema(sortedValues: Column, alpha: Column): Column =
    Bridge.column(emaExpr(Bridge.expression(sortedValues), Bridge.expression(alpha)))

  /** The EMA fold as raw Catalyst: ArrayAggregate over a (ema, seeded)
    * struct accumulator with unresolved lambda variables — the form the
    * analyzer resolves both when built from Columns and when produced by the
    * SQL function registry (a Column-built tree would arrive as an
    * unresolvable ColumnNodeExpression in the registry path). */
  def emaExpr(values: Expression, alpha: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x   = UnresolvedNamedLambdaVariable(Seq("x"))
    val accEma    = UnresolvedExtractValue(acc, Literal("ema"))
    val accSeeded = UnresolvedExtractValue(acc, Literal("seeded"))
    val zero = CreateNamedStruct(Seq(
      Literal("ema"), Literal(0.0), Literal("seeded"), Literal(false)))
    val step = CreateNamedStruct(Seq(
      Literal("ema"),
      CaseWhen(
        Seq((accSeeded,
          Add(Multiply(accEma, Subtract(Literal(1.0), alpha)), Multiply(x, alpha)))),
        Some(x)),
      Literal("seeded"), Literal(true)))
    val fin = UnresolvedNamedLambdaVariable(Seq("a"))
    ArrayAggregate(values, zero,
      LambdaFunction(step, Seq(acc, x)),
      LambdaFunction(UnresolvedExtractValue(fin, Literal("ema")), Seq(fin)))
  }

  /** Register the UDF/UDAF surface on a session (idempotent) — §2.11.
    *
    *  - `latest_point(ts_long, value)`: the typed Aggregator. Session-level
    *    because `Aggregator`-backed UDAFs go through `spark.udf.register`,
    *    not the extensions' expression injection.
    *  - `cos_sim_udf(a, b)`: a scalar Scala UDF with the exact fold
    *    semantics of the codegen cosine ([[VectorExpressions.vecCosine]],
    *    asserted bitwise in SqlSurfaceSpec). It exists to complete the
    *    scalar-UDF surface for users who bring their own lambdas; every
    *    ENGINE hot path stays on the codegen expression — a ScalaUDF breaks
    *    whole-stage codegen and boxes per row, which is exactly why this
    *    engine is UDF-free internally. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("latest_point", udaf(LatestPointAgg))
    spark.udf.register("cos_sim_udf", (a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i).toDouble
        i += 1
      }
      i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    })
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
