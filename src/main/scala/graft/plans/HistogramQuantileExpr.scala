package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for `histogram_quantile(φ, les, cums, count)`
  * — the codegen'd promotion of the compositional window-function form
  * (SURVEY.md §7 step 6; semantics per the published Prometheus bucket
  * interpolation over explicit boundaries,
  * `/root/reference/prometheus.cpp:264-293` defines the bucket layout).
  *
  * Inputs per row: the series' sorted finite boundaries (`les`), their
  * cumulative counts (`cums`), the total observation count, and φ.
  * The whole quantile computation runs inside whole-stage codegen as one
  * static call — no window pass, no per-bucket rows, no shuffle beyond
  * the one building the bucket arrays. At 100 TB this turns the
  * quantile stage from (series × buckets) rows into (series) rows.
  */
case class HistogramQuantileExpr(
    phi: Expression,
    les: Expression,
    cums: Expression,
    total: Expression)
  extends QuaternaryExpression {

  override def first: Expression = phi
  override def second: Expression = les
  override def third: Expression = cums
  override def fourth: Expression = total

  /** Compose-time type contract — the analog of the reference's
    * inputTypes/outputTypes declarations (`prometheus.cpp:28-29,98-99`).
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(DoubleType, ArrayType(DoubleType), ArrayType(LongType), LongType)
    val actual = Seq(phi.dataType, les.dataType, cums.dataType, total.dataType)
    val compatible = actual.zip(expected).forall {
      case (ArrayType(a, _), ArrayType(b, _)) => a == b
      case (a, b) => a == b
    }
    if (compatible) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"histogram_quantile expects (double, array<double>, array<bigint>, bigint), got $actual")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(p: Any, l: Any, c: Any, t: Any): Any =
    HistogramQuantileExpr.compute(
      p.asInstanceOf[Double],
      l.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData],
      t.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l, c, t) =>
      s"${ev.value} = graft.plans.HistogramQuantileExpr.compute($p, $l, $c, $t);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(phi = f, les = s, cums = t, total = q)
}

object HistogramQuantileExpr {

  /** Prometheus semantics: rank = φ·count; the target bucket is the
    * smallest le whose cumulative count reaches the rank, interpolated
    * linearly (lower bound 0 before the first bucket); a rank beyond the
    * last finite bucket returns the highest finite boundary.
    * Static + JVM-primitive so generated code calls it directly.
    */
  def compute(phi: Double, les: ArrayData, cums: ArrayData, total: Long): Double = {
    val n = les.numElements()
    if (n == 0) return Double.NaN
    val rank = phi * total.toDouble
    var prevLe = 0.0
    var prevCum = 0L
    var i = 0
    while (i < n) {
      val cum = cums.getLong(i)
      val le = les.getDouble(i)
      if (cum >= rank && prevCum < rank) {
        return prevLe + (le - prevLe) * (rank - prevCum.toDouble) / (cum - prevCum).toDouble
      }
      prevLe = le
      prevCum = cum
      i += 1
    }
    les.getDouble(n - 1) // rank beyond the last finite bucket
  }

  /** SQL registration: `SELECT histogram_quantile(0.9, les, cums, n)`.
    * (Spark 4 removed the public Column↔Expression bridge, so the
    * expression is exposed through the function registry and used via
    * `expr(...)` / `spark.sql`.)
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "histogram_quantile",
      exprs => HistogramQuantileExpr(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")

  /** Column-API entry point — resolves through the registered function. */
  def histogramQuantile(spark: org.apache.spark.sql.SparkSession,
      phiExpr: String, lesCol: String, cumsCol: String, totalCol: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(
      s"histogram_quantile($phiExpr, $lesCol, $cumsCol, $totalCol)")
  }
}
