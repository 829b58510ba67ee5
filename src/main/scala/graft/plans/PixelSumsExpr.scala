package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the dHash pixel reduction: the
  * codegen'd promotion of the 36-fold composed form
  *
  * {{{
  *   array(
  *     aggregate(sequence(⌊0·n/36⌋+1, ⌊1·n/36⌋), 0L,
  *       (acc, i) -> acc + ascii(substr(text, i, 1))),
  *     ... // one per pixel
  *   )
  * }}}
  *
  * The composed form walks the string once per CHARACTER through three
  * interpreted layers — a `sequence` array materialized per pixel
  * (4·n bytes of garbage per row), a CodegenFallback lambda invocation
  * per element, and a fresh one-char UTF8String from every
  * `substr(text, i, 1)` — measured at ~17 s for the 5 000-doc sf0.1
  * corpus, the single hottest scan of the multimodal tier (it gates
  * x92/x96/x99's shared perceptual pair relation). This expression
  * produces the identical `array<bigint>` of `pixels` range sums in ONE
  * primitive pass over the UTF-8 bytes.
  *
  * Exact-equivalence contract with the composed form (PixelSumsSpec):
  *   - `substr(text, i, 1)` indexes CODEPOINTS (UTF8String chars), and
  *     `ascii` of a one-char string is `String.codePointAt(0)` — so each
  *     char contributes its codepoint value. The walk below decodes each
  *     well-formed UTF-8 sequence to the same codepoint (1–4 bytes),
  *     with a single-pass fast path when the row is pure ASCII.
  *   - Range p (0-based) covers chars ⌊p·n/36⌋+1 … ⌊(p+1)·n/36⌋, n =
  *     `length(text)` (char count). The ranges partition [1, n] for
  *     n ≥ pixels, so the pass is one pointer walk, never a re-seek.
  *   - Rows shorter than `pixels` chars return null (callers filter
  *     them out, matching the composed form's `n >= 36` guard).
  */
case class PixelSumsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
      right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pixel_sums expects (string, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(s: Any, p: Any): Any =
    PixelSumsExpr.compute(s.asInstanceOf[UTF8String], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (s, p) => s"""
      ${ev.value} = graft.plans.PixelSumsExpr.compute($s, $p);
      ${ev.isNull} = (${ev.value} == null);
    """)
    res
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object PixelSumsExpr {

  /** One pass over the UTF-8 bytes: decode each codepoint, add it to
    * the bucket whose char range contains the current char index.
    * Returns null when the string has fewer than `pixels` chars (no
    * meaningful reduction — callers filter these rows).
    */
  def compute(s: UTF8String, pixels: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char count: same leading-byte walk UTF8String.numChars performs
    val n = s.numChars().toLong
    if (n < pixels) return null
    val sums = new Array[Long](pixels)
    var p = 0
    // hi of bucket p (1-based char index, inclusive): ⌊(p+1)·n/36⌋
    var hi = ((p + 1) * n) / pixels
    var charIdx = 1L
    var i = 0
    while (i < nBytes) {
      val b0 = bytes(i)
      var cp = 0
      if (b0 >= 0) { // ASCII
        cp = b0
        i += 1
      } else if ((b0 & 0xE0) == 0xC0 && i + 1 < nBytes) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
        i += 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < nBytes) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F)
        i += 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < nBytes) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
        i += 4
      } else { // malformed byte: consume one, value as unsigned
        cp = b0 & 0xFF
        i += 1
      }
      while (charIdx > hi && p < pixels - 1) {
        p += 1
        hi = ((p + 1) * n) / pixels
      }
      sums(p) += cp
      charIdx += 1
    }
    new GenericArrayData(sums)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pixel_sums",
      exprs => PixelSumsExpr(exprs(0), exprs(1)),
      "built-in")

  /** Column-API entry point (the [[IntDotExpr.intDot]] convention). */
  def pixelSums(spark: org.apache.spark.sql.SparkSession,
      textCol: String, pixels: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"pixel_sums($textCol, $pixels)")
  }
}
