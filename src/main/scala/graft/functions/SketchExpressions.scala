package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen probes for driver-built sketches — the x49/x50/x54 hot-path
  * membership/point-query kernels that replace per-row Scala `udf`s.
  *
  * Why expressions: a `udf(s: String => ...)` costs a UTF8String→String
  * decode, boxing, and a ScalaUDF trampoline per row, and it sits in the
  * SCAN stage of corpus-sized plans (the whole point of the sketch screens
  * is to run before any shuffle). Both spark-sketch types hash the UTF-8
  * BYTES of a string key (`mightContainString` = `mightContainBinary(utf8)`,
  * `estimateCountForStringItem` = `getHashBuckets(utf8 bytes)` — verified
  * against spark-sketch 4.1.2 bytecode), so probing with
  * `UTF8String.getBytes` is bitwise-identical to the String path with zero
  * String materialization (FunctionsSpec pins kernel ≡ udf row-for-row).
  *
  * The serialized sketch rides the expression as a plain byte array: it is
  * shipped once per stage inside the (itself broadcast) task binary and
  * deserialized lazily once per executor JVM — same distribution cost as
  * the `sparkContext.broadcast` it replaces, without the per-row closure.
  *
  * equals/hashCode are overridden to compare the payload by CONTENT:
  * case-class equality on an `Array[Byte]` field is reference equality,
  * under which two logically identical probes never compare equal and
  * Catalyst canonicalization / common-subexpression elimination cannot
  * dedupe them (`fastEquals` still works on the same instance, so this is
  * a plan-matching wart, not a wrong-result hazard — fixed regardless).
  */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def equals(other: Any): Boolean = other match {
    case that: BloomMightContain =>
      child == that.child && java.util.Arrays.equals(bits, that.bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  /** Called from generated code — UTF8String in, primitive boolean out. */
  def probe(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Count-min point query over a driver-built sketch — see
  * [[BloomMightContain]] for the distribution and hash-equality story. */
case class CmsEstimate(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // content equality over the serialized sketch — see BloomMightContain
  override def equals(other: Any): Boolean = other match {
    case that: CmsEstimate =>
      child == that.child && java.util.Arrays.equals(bits, that.bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bits))

  /** Called from generated code — UTF8String in, primitive long out. */
  def probe(s: UTF8String): Long = cms.estimateCount(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object SketchExpressions {
  private def ser(write: java.io.OutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(bos)
    bos.toByteArray
  }

  def bloomMightContain(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), ser(bloom.writeTo)))

  def cmsEstimate(c: Column, cms: CountMinSketch): Column =
    Bridge.column(CmsEstimate(Bridge.expression(c), ser(cms.writeTo)))
}
