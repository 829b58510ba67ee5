package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's `SparkSessionExtensions` hook — the idiomatic
  * deployment path for the engine's native expressions: add
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * to the session config and `int_dot`, `char_trigrams`, and
  * `histogram_quantile` resolve in `spark.sql`/`expr(...)` on every
  * session of the application — including sessions the library never
  * sees — instead of each operator registering temp functions through
  * the internal registry at first use (the per-call `register(spark)`
  * fallbacks remain for ad-hoc sessions).
  *
  * This is the extension point SURVEY.md §2.3 names for the UDF/UDAF
  * surface (the analog of the reference's `registerExternalShards`
  * plugin entry, `/root/reference/prometheus.cpp:309-314`): functions
  * are injected at session build, analyzer-visible, codegen'd — no
  * custom Rule or Strategy is needed anywhere in the engine, the
  * expressions alone carry the custom semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("int_dot"),
      info("int_dot", "int_dot(a, b) - exact integer dot product of two array<bigint>"),
      (exprs: Seq[Expression]) => graft.plans.IntDotExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("char_trigrams"),
      info("char_trigrams", "char_trigrams(s) - all length-3 character substrings of s"),
      (exprs: Seq[Expression]) => graft.plans.CharTrigramsExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("histogram_quantile"),
      info("histogram_quantile",
        "histogram_quantile(phi, les, cums, n) - PromQL bucket interpolation"),
      (exprs: Seq[Expression]) =>
        graft.plans.HistogramQuantileExpr(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("det_exp2"),
      info("det_exp2", "det_exp2(x) - deterministic cross-engine 2^x"),
      (exprs: Seq[Expression]) => graft.plans.DetExp2Expr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("det_log2"),
      info("det_log2", "det_log2(x) - deterministic cross-engine log2(x)"),
      (exprs: Seq[Expression]) => graft.plans.DetLog2Expr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("det_sin"),
      info("det_sin", "det_sin(x) - deterministic cross-engine sin(x)"),
      (exprs: Seq[Expression]) => graft.plans.DetSinExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("det_cos"),
      info("det_cos", "det_cos(x) - deterministic cross-engine cos(x)"),
      (exprs: Seq[Expression]) => graft.plans.DetCosExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("det_atan"),
      info("det_atan", "det_atan(x) - deterministic cross-engine atan(x)"),
      (exprs: Seq[Expression]) => graft.plans.DetAtanExpr(exprs.head)))
  }
}
