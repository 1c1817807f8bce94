package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the vector/LSH packages (SURVEY §7.3 "v2").
  *
  * The higher-order-function dot product (`aggregate(zip_with(a,b,*),0,+)`)
  * is semantically right but `ArrayAggregate`/`ZipWith` are CodegenFallback —
  * every element goes through an interpreted lambda plus boxing. For the
  * pair-wise operators (Q54 cosine top-k, x07 near-dup, x08 IVF) the dot
  * product IS the workload, so it gets a first-class `Expression` with
  * `doGenCode`: a tight primitive loop inside whole-stage codegen, no
  * allocation, no virtual calls.
  *
  * FP contract: the sum is a single double accumulator folded left-to-right
  * over `(double)a[i] * (double)b[i]` — exactly the association order of the
  * HOF formulation and of DuckDB's `list_dot_product` twin, so `round(.,4)`
  * oracle hashes are unchanged (asserted bitwise in FunctionsSpec).
  *
  * Inputs must be same-length ARRAY<FLOAT> with no null elements (the
  * embeddings fixture guarantees both; see FIXTURES.md).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two ARRAY<BIGINT> agree — the MinHash-signature
  * match counter. `matches / numPerm` is an unbiased estimate of Jaccard
  * similarity, evaluated here as a codegen'd primitive loop so that
  * estimating J over millions of candidate pairs costs ~64 long-compares
  * each, no interpreted lambdas and no per-row allocation. This is the
  * estimate-only path for corpora where an approximate Jaccard suffices
  * (the exact path is [[SortedIntersectCount]]; on THIS fixture the true
  * pair density makes exact verification affordable, so the contract query
  * uses exact — but at 100 TB an estimate-first pipeline with
  * `sigMatches/64 ≥ t+ε` can skip most exact checks).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED ARRAY<BIGINT> (distinct elements) via a
  * codegen'd two-pointer merge scan — O(|a|+|b|) primitive compares, no
  * per-row hash-set allocation. This replaces `array_intersect` (which
  * builds an OpenHashSet per pair, interpreted) in the exact-Jaccard
  * verification of [[MinHashLSH.verifiedPairs]], where millions of candidate
  * pairs each need an intersection count: token sets are pre-hashed once per
  * document (xxhash64) and pre-sorted, so the per-pair cost collapses to a
  * branch-predictable long-compare loop inside whole-stage codegen.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column-API entry: codegen'd dot product over two ARRAY<FLOAT> columns. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** cos(a,b) = dot/(|a|·|b|) with the identical expression tree shape as the
    * HOF formulation — only the dot kernel differs. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))

  /** Codegen'd per-position match count over two ARRAY<BIGINT> columns. */
  def sigMatches(a: Column, b: Column): Column =
    Bridge.column(SigMatchCount(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd merge-scan intersection count over two sorted ARRAY<BIGINT>. */
  def sortedIntersect(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** SQL surface: `SELECT vec_dot(e1, e2)`. Idempotent per session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1)))
}
