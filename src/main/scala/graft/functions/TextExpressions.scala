package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling fingerprint as ONE expression.
  *
  * Semantics (bitwise-equal to the HOF formulation it replaces, asserted in
  * FunctionsSpec):
  *   `array_min(transform(sequence(1, length(text)-window+1),
  *              i -> substr(md5(substring(text, i, window)), 1, 8)))`
  * i.e. the lexicographic minimum over all `window`-char substrings of the
  * first 8 hex chars of their md5. Fixed-width lowercase hex compares
  * lexicographically exactly like the unsigned 32-bit value it encodes, so
  * the kernel tracks a running unsigned-int minimum and formats ONCE.
  *
  * Why an expression: the HOF form materializes ~|text| interpreted lambda
  * calls, UTF8String substrings, 32-char hex strings, and a full array per
  * document, then scans it. Here the loop lives inside one eval call per
  * document — a reused MessageDigest over a sliding byte window (ASCII fast
  * path; codepoint-correct fallback otherwise), no intermediate collections.
  * CodegenFallback costs one virtual call per DOCUMENT (not per window), so
  * codegen would buy nothing.
  *
  * Returns null for strings shorter than `window` (the dense-spine oracle
  * convention: DuckDB's `generate_series` yields an empty list → NULL).
  */
case class RollingMd5Min(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_md5_min"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nChars = s.numChars()
    if (nChars < window) return null
    val md = MessageDigest.getInstance("MD5")
    var best = 0xFFFFFFFFFFFFFFFFL

    def consider(digest: Array[Byte]): Unit = {
      val v = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
              ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
      if (java.lang.Long.compareUnsigned(v, best) < 0) best = v
    }

    val bytes = s.getBytes
    if (bytes.length == nChars) {
      // ASCII: char window == byte window, slide without substring allocs
      var i = 0
      while (i <= bytes.length - window) {
        md.reset()
        md.update(bytes, i, window)
        consider(md.digest())
        i += 1
      }
    } else {
      // multibyte: codepoint-correct substring per window
      var i = 0
      while (i <= nChars - window) {
        md.reset()
        md.update(s.substring(i, i + window).getBytes)
        consider(md.digest())
        i += 1
      }
    }
    UTF8String.fromString(f"$best%08x")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMd5Min =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API: rolling-min md5 fingerprint over `window`-char substrings. */
  def rollingMd5Min(text: Column, window: Int = 8): Column =
    Bridge.column(RollingMd5Min(Bridge.expression(text), window))
}
