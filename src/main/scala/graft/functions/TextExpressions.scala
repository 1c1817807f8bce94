package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

/** Parse the first 16 lowercase-hex chars of a string into the 64-bit value
  * they encode (big-endian: first char = most significant nibble); the
  * signed Long carries the identical bit pattern.
  *
  * Purpose: SimHash needs 64 individual bits of `md5(tok)`. Extracting each
  * via `locate(substr(h, p, 1), alphabet)` costs 64 substring+search chains
  * per row; parsing once makes every bit a codegen'd shift: hex char at
  * 0-based position p is `(v >> (4*(15-p))) & 0xF`, so bit j of the
  * nibble-indexed SimHash formula is `(v >> (4*(15 - j/4) + j%4)) & 1` —
  * the same values, same oracle (FunctionsSpec asserts all 64 bits match
  * the locate-based formula on real md5 output). */
case class HexPrefixToLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hex_prefix_to_long"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var v = 0L
    var i = 0
    val n = math.min(16, s.numBytes())
    while (i < n) {
      val c = s.getByte(i)
      val nib = if (c >= '0' && c <= '9') c - '0' else (c - 'a') + 10
      v = (v << 4) | (nib & 0xFL)
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val c = ctx.freshName("c")
      val nib = ctx.freshName("nib")
      s"""
         |final int $n = java.lang.Math.min(16, $in.numBytes());
         |long $v = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $c = $in.getByte($i);
         |  final int $nib = ($c >= '0' && $c <= '9') ? ($c - '0') : (($c - 'a') + 10);
         |  $v = ($v << 4) | ($nib & 0xFL);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexPrefixToLong =
    copy(child = newChild)
}

/** Character n-grams of a string as ONE kernel call — replaces the
  * interpreted `transform(sequence(1, length(text)-n+1), i ->
  * substring(text, i, n))` HOF (per-element lambda dispatch + a sequence
  * array per row). Values are identical for strings of ≥ n chars
  * (`substringSQL` IS SQL substring; asserted in FunctionsSpec); strings
  * shorter than n yield an empty array, where the HOF form's descending
  * `sequence` would emit nonsense positions — the kernel matches the
  * DuckDB `generate_series` twin's empty-list behavior instead. */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val m = math.max(0, s.numChars() - n + 1)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) { out(i) = s.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $m = java.lang.Math.max(0, $c.numChars() - $n + 1);
         |final org.apache.spark.unsafe.types.UTF8String[] $out =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = $c.substringSQL($i + 1, $n);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** Word k-shingles of a token array, space-joined — replaces the
  * interpreted `transform(sequence(1, size(t)-k+1), i -> concat_ws(' ',
  * slice(t, i, k)))` HOF the same way [[CharGrams]] replaces character
  * slicing. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = math.max(0, arr.numElements() - k + 1)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("space", space,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val parts = ctx.freshName("parts")
      val out = ctx.freshName("out")
      s"""
         |final int $m = java.lang.Math.max(0, $a.numElements() - $k + 1);
         |final org.apache.spark.unsafe.types.UTF8String[] $out =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  final org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sp, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API: rolling-min md5 fingerprint over `window`-char substrings. */
  def rollingMd5Min(text: Column, window: Int = 8): Column =
    Bridge.column(RollingMd5Min(Bridge.expression(text), window))

  /** Column API: first-16-hex-chars → Long (bit-identical big-endian). */
  def hexPrefixToLong(hex: Column): Column =
    Bridge.column(HexPrefixToLong(Bridge.expression(hex)))

  /** Column API: character n-grams of a string. */
  def charGrams(text: Column, n: Int): Column =
    Bridge.column(CharGrams(Bridge.expression(text), n))

  /** Column API: space-joined word k-shingles of a token array. */
  def wordShingles(toks: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(toks), k))
}
