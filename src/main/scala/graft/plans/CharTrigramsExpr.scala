package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator producing every character trigram of a string in ONE
  * pass — the custom-plan promotion of
  * `explode(transform(sequence(1, len-2), i -> substr(s, i, 3)))`.
  *
  * `substr(s, i, 3)` re-seeks from byte 0 on every call (UTF-8 char
  * indexing), so the composed form is O(len²) per document — the single
  * hottest loop of the language-ID profile build. This generator walks
  * the byte array once, recording char start offsets, and emits each
  * trigram as a zero-copy-adjacent byte slice: O(len) per document,
  * UTF-8 correct, and empty for strings shorter than 3 chars (matching
  * the oracle's `generate_series(1, len-2)` semantics exactly).
  *
  * Generators sit at an explode boundary where whole-stage codegen is
  * already split, so CodegenFallback costs nothing here.
  */
case class CharTrigramsExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("g", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_trigrams expects string, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return Iterator.empty
    val bytes = s.getBytes
    // one pass: char start offsets (UTF-8 leading-byte widths)
    val starts = new java.util.ArrayList[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      starts.add(i)
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val n = starts.size
    if (n < 3) return Iterator.empty
    (0 to n - 3).iterator.map { k =>
      val from = starts.get(k)
      val until = if (k + 3 < n) starts.get(k + 3) else bytes.length
      InternalRow(UTF8String.fromBytes(bytes, from, until - from))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharTrigramsExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_trigrams",
      exprs => CharTrigramsExpr(exprs.head),
      "built-in")
}
