package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact integer dot product of two
  * `array<bigint>` columns — the codegen'd promotion of
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0, (acc, v) -> acc + v)`.
  *
  * Higher-order functions are CodegenFallback in Spark: every row of the
  * ANN candidate joins paid an interpreted two-lambda evaluation with a
  * boxed accumulator, right in the hottest loop of the similarity tier
  * (SURVEY.md §4: custom codegen'd Expression beats composed HOFs beats
  * UDF). This expression is one static JVM call on primitive longs
  * inside whole-stage codegen — no closures, no boxing, no virtual
  * dispatch per element — and keeps the surrounding stage's codegen span
  * intact instead of splitting it at a fallback boundary.
  */
case class IntDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left.dataType, right.dataType).forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntDotExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object IntDotExpr {

  /** Static + primitive so generated code calls it directly.
    *
    * Contract (enforced, not assumed — the function is registered
    * session-wide as `int_dot`, so arbitrary callers reach it): both
    * arrays must have equal length and no null elements. Violations
    * raise rather than silently returning a min-length or
    * null-slots-as-zero dot product.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"int_dot: array length mismatch ($n vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"int_dot: null array element at index $i")
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot",
      exprs => IntDotExpr(exprs(0), exprs(1)),
      "built-in")

  /** Column-API entry point — resolves through the registered function
    * (Spark 4 removed the public Column↔Expression bridge).
    */
  def intDot(spark: org.apache.spark.sql.SparkSession, a: String, b: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"int_dot($a, $b)")
  }
}
