package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the engine's deterministic
  * transcendentals ([[graft.functions.DetMath]]) — `det_exp2(x)` and
  * `det_log2(x)`.
  *
  * Why an Expression and not the Column mirrors: the mirrors
  * ([[graft.functions.DetMath.exp2Col]]/`log2Col`) spell the pinned
  * step sequence as a Catalyst tree, which is perfect as a SPEC
  * artifact but exponential in size when composed (every shared
  * subterm duplicates; measured: x77's exp2∘log2 tree pushed the
  * per-document stage past the codegen limit into interpreted
  * evaluation — 4.3 s vs 0.4 s for its α = 0.5 twin). These
  * expressions compute the SAME pinned scalar sequence via ONE static
  * JVM call inside whole-stage codegen — bit-identical by construction
  * (it IS `DetMath.exp2`/`log2`), compact, and they keep the
  * surrounding codegen span intact. The SQL mirrors
  * (`DetMath.exp2Sql`/`log2Sql`) remain the oracle's side of the
  * contract; the spec pins scalar ≡ Column mirror ≡ these expressions.
  */
abstract class DetMathUnary extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects DOUBLE, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
}

case class DetExp2Expr(child: Expression) extends DetMathUnary {
  override def prettyName: String = "det_exp2"
  override protected def nullSafeEval(x: Any): Any =
    graft.functions.DetMath.exp2(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.exp2($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DetLog2Expr(child: Expression) extends DetMathUnary {
  override def prettyName: String = "det_log2"
  override protected def nullSafeEval(x: Any): Any =
    graft.functions.DetMath.log2(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.log2($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DetSinExpr(child: Expression) extends DetMathUnary {
  override def prettyName: String = "det_sin"
  override protected def nullSafeEval(x: Any): Any =
    graft.functions.DetMath.sin(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.sin($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DetCosExpr(child: Expression) extends DetMathUnary {
  override def prettyName: String = "det_cos"
  override protected def nullSafeEval(x: Any): Any =
    graft.functions.DetMath.cos(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.cos($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DetAtanExpr(child: Expression) extends DetMathUnary {
  override def prettyName: String = "det_atan"
  override protected def nullSafeEval(x: Any): Any =
    graft.functions.DetMath.atan(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.atan($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DetMathExprs {

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "det_exp2", exprs => DetExp2Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "det_log2", exprs => DetLog2Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "det_sin", exprs => DetSinExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "det_cos", exprs => DetCosExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "det_atan", exprs => DetAtanExpr(exprs.head), "built-in")
  }

  /** Column entry points — `sqlExpr` is a SQL fragment (usually a
    * column name) evaluated as the argument; resolves through the
    * registered functions (Spark 4 has no public Column↔Expression
    * bridge).
    */
  def detExp2(spark: org.apache.spark.sql.SparkSession, sqlExpr: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"det_exp2($sqlExpr)")
  }

  def detLog2(spark: org.apache.spark.sql.SparkSession, sqlExpr: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"det_log2($sqlExpr)")
  }

  // Column-composition entry points over ARBITRARY Column arguments
  // (`call_function` resolves the registered det_* functions at
  // analysis time — callers must have run [[register]] on the active
  // session). These mirror the DetMath scalar dispatch EXACTLY; the
  // PromQL front-end's det-math mode compiles through them.

  import org.apache.spark.sql.functions._

  def detExp2C(c: Column): Column = call_function("det_exp2", c)
  def detLog2C(c: Column): Column = call_function("det_log2", c)
  def detSinC(c: Column): Column = call_function("det_sin", c)
  def detCosC(c: Column): Column = call_function("det_cos", c)
  def detAtanC(c: Column): Column = call_function("det_atan", c)

  /** Column mirror of [[graft.functions.DetMath.pow]] — same branch
    * order; JVM comparison semantics (NaN compares false) match
    * Spark's, so no explicit NaN guard is needed on this side.
    */
  def detPowC(l: Column, r: Column): Column = {
    val posMag = detExp2C(r * detLog2C(l))
    val negMag = detExp2C(r * detLog2C(-l))
    when(l > 0.0, posMag)
      .when(l === 0.0, pow(lit(0.0), r))
      .when((r % lit(1.0)) === 0.0,
        when((r % lit(2.0)) === 0.0, negMag).otherwise(-negMag))
      .otherwise(lit(Double.NaN))
  }

  /** Column mirror of [[graft.functions.DetMath.atan2]]. */
  def detAtan2C(y: Column, x: Column): Column = {
    val q = detAtanC(y / x)
    val DM = graft.functions.DetMath
    when(isnan(y) || isnan(x), lit(Double.NaN))
      .when(x > 0.0, q)
      .when(x < 0.0 && y >= 0.0, q + lit(DM.Pi))
      .when(x < 0.0, q - lit(DM.Pi))
      .when(y > 0.0, lit(DM.HalfPi))
      .when(y < 0.0, lit(-DM.HalfPi))
      .otherwise(lit(0.0))
  }
}
