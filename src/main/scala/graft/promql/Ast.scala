package graft.promql

/** AST for the PromQL subset the engine's query front-end accepts.
  *
  * The reference repo is the INGEST half of a Prometheus deployment
  * (`/root/reference/prometheus.cpp:27-93` exposes the registry for a
  * scraping server to query); the query language a user of that stack
  * runs is PromQL. This front-end lets such a user submit the same
  * query strings against the Spark engine: selectors with all four
  * matcher operators, range + offset modifiers, the aggregation
  * operators with `by`/`without` clauses, `rate`/`increase`/`delta`,
  * `histogram_quantile`, `topk`/`bottomk`/`quantile`, the exact-scalar
  * math functions, and binary arithmetic/comparison with `on(...)`
  * label matching.
  */
sealed trait Ast

/** `=`, `!=`, `=~`, `!~` label matcher. */
final case class Matcher(label: String, op: String, value: String)

/** `name{matchers}[range] offset o @ t` — `range`/`offset` in seconds,
  * `@` an absolute epoch-second evaluation instant.
  */
final case class Selector(
    name: String,
    matchers: Seq[Matcher] = Nil,
    rangeS: Option[Long] = None,
    offsetS: Option[Long] = None,
    atS: Option[Long] = None) extends Ast

object Selector {
  /** `@ start()` / `@ end()` parse to these sentinel pins; every entry
    * point resolves them via [[Ast.resolveAtEdges]] BEFORE compiling —
    * to the range query's start/end epoch for `query_range` (upstream
    * Prometheus's rule), or to "no pin" (the evaluation instant
    * itself) for instant queries, where upstream defines
    * start = end = the evaluation time.
    */
  val AtStart: Long = Long.MinValue + 1
  val AtEnd: Long = Long.MinValue + 2
}

object Ast {
  /** Replace the `@ start()`/`@ end()` sentinel pins with concrete
    * epochs (`Some` → that epoch, `None` → drop the pin, i.e. the
    * evaluation instant). Recursive over the whole expression,
    * subqueries included.
    */
  def resolveAtEdges(ast: Ast, startS: Option[Long], endS: Option[Long]): Ast = {
    def r(a: Ast): Ast = a match {
      case s: Selector => s.atS match {
        case Some(Selector.AtStart) => s.copy(atS = startS)
        case Some(Selector.AtEnd) => s.copy(atS = endS)
        case _ => s
      }
      case Agg(op, g, p, arg) => Agg(op, g, p, r(arg))
      case Func(n, p, arg) => Func(n, p, r(arg))
      case b: BinOp => b.copy(left = r(b.left), right = r(b.right))
      case n: NumLit => n
      case Subquery(inner, w, st) => Subquery(r(inner), w, st)
      case CountValues(d, arg) => CountValues(d, r(arg))
      case SmoothFunc(sf, tf, arg) => SmoothFunc(sf, tf, r(arg))
      case HistFraction(lo, hi, arg) => HistFraction(lo, hi, r(arg))
      case LabelFunc(n, args, arg) => LabelFunc(n, args, r(arg))
    }
    r(ast)
  }
}

/** `sum/avg/min/max/count [by|without (labels)] (expr)` and the
  * parameterized `topk/bottomk/quantile(param, expr)`.
  */
final case class Agg(
    op: String,
    grouping: Option[(String, Seq[String])], // ("by"|"without", labels)
    param: Option[Double],
    arg: Ast) extends Ast

/** `rate/increase/delta(sel[d])`, `histogram_quantile(φ, sel)`,
  * `abs/ceil/floor/round/sqrt(expr)`, `clamp_min/clamp_max(expr, s)`.
  */
final case class Func(name: String, param: Option[Double], arg: Ast) extends Ast

/** `l op r` with the PromQL matching modifiers:
  *  - `on(labels)` joins on exactly those labels; `ignoring(labels)`
  *    joins on all shared labels except those (and the metric name);
  *  - `groupLeft`/`groupRight` allow many-to-one / one-to-many matching
  *    with the left/right side keeping its full label set;
  *  - `boolMod` (`op bool`) turns a comparison from a filter into a
  *    0/1-valued vector.
  */
final case class BinOp(op: String, on: Option[Seq[String]], left: Ast, right: Ast,
    groupLeft: Boolean = false, ignoring: Option[Seq[String]] = None,
    groupRight: Boolean = false, boolMod: Boolean = false,
    groupCarry: Seq[String] = Nil) extends Ast

/** Scalar literal operand of an arithmetic/comparison binary op. */
final case class NumLit(v: Double) extends Ast

/** PromQL subquery `(expr)[range:step]` — the inner instant expression
  * evaluated at each step-spaced instant of the trailing range,
  * yielding a range vector consumed by a `*_over_time` function.
  */
final case class Subquery(inner: Ast, rangeS: Long, stepS: Long) extends Ast

/** `count_values("dst", expr)`: histogram of an instant vector's VALUES
  * — one output row per distinct value, labeled `dst` = the value's
  * decimal rendering, valued by the series count at that value.
  */
final case class CountValues(dst: String, arg: Ast) extends Ast

/** `double_exponential_smoothing(sel[d], sf, tf)` (the PromQL 3.x name
  * of 2.x `holt_winters`): level+trend smoothing of each series'
  * ordered window samples — the only function with TWO scalar params.
  */
final case class SmoothFunc(sf: Double, tf: Double, arg: Ast) extends Ast

/** `histogram_fraction(lo, hi, hist)` — estimated fraction of the
  * family's observations in `(lo, hi]`, by the same classic-bucket
  * linear interpolation `histogram_quantile` uses (inverted: the
  * cumulative count AT a value instead of the value at a rank).
  */
final case class HistFraction(lo: Double, hi: Double, arg: Ast) extends Ast

/** `label_replace(v, "dst", "replacement", "src", "regex")` /
  * `label_join(v, "dst", "sep", "src1", ...)` — label-rewriting
  * functions whose parameters are strings, not scalars.
  */
final case class LabelFunc(name: String, args: Seq[String], arg: Ast) extends Ast

final class PromQLParseException(msg: String) extends IllegalArgumentException(msg)
final class PromQLCompileException(msg: String) extends IllegalArgumentException(msg)
