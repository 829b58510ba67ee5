package graft.promql

/** Hand-rolled tokenizer + recursive-descent parser for the PromQL
  * subset in [[Ast]]. No dependencies, no reflection — parse errors
  * raise [[PromQLParseException]] with position context (the analog of
  * the Shards script parse stage, SURVEY.md §3 phase 1).
  *
  * Precedence (low → high): comparison (`> < >= <= == !=`) →
  * additive (`+ -`) → multiplicative (`* /`) → unary operand.
  */
object Parser {

  private val AggOps = Set("sum", "avg", "min", "max", "count",
    "stddev", "stdvar", "group")
  private val ParamAggOps = Set("topk", "bottomk", "quantile",
    "limitk", "limit_ratio")
  private val RangeFuncs = Set("rate", "increase", "delta",
    "irate", "idelta", "changes", "deriv", "resets")
  private val OverTimeFuncs = Set("sum_over_time", "avg_over_time",
    "min_over_time", "max_over_time", "count_over_time",
    "stddev_over_time", "stdvar_over_time",
    "last_over_time", "present_over_time", "absent_over_time",
    "mad_over_time",
    "ts_of_last_over_time", "ts_of_max_over_time", "ts_of_min_over_time")
  private val ScalarFuncs = Set("abs", "ceil", "floor", "round", "sqrt",
    "exp", "ln", "log2", "log10", "sgn", "absent",
    "sort", "sort_desc", "timestamp", "scalar",
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "deg", "rad",
    "hour", "minute", "day_of_week", "day_of_month",
    "month", "year", "day_of_year", "days_in_month")
  private val ClampFuncs = Set("clamp_min", "clamp_max")

  private final case class Tok(kind: String, text: String, pos: Int)

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def err(msg: String) = throw new PromQLParseException(s"$msg at position $i in: $q")
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Tok("ident", q.substring(start, i), start)
      } else if (c.isDigit) {
        val start = i
        while (i < q.length && (q(i).isDigit || q(i) == '.')) i += 1
        if (i < q.length && "smhdw".contains(q(i)) &&
            !q.substring(start, i).contains('.')) {
          val unit = q(i); i += 1
          out += Tok("duration", q.substring(start, i - 1) + unit, start)
        } else out += Tok("number", q.substring(start, i), start)
      } else if (c == '"') {
        // backslash escapes: \" \\ \n \t; any other \x passes x through
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < q.length) {
            i += 1
            sb += (q(i) match {
              case 'n' => '\n'
              case 't' => '\t'
              case other => other // covers \" and \\
            })
          } else sb += q(i)
          i += 1
        }
        if (i >= q.length) err("unterminated string")
        i += 1
        out += Tok("string", sb.toString, start)
      } else {
        val two = if (i + 1 < q.length) q.substring(i, i + 2) else ""
        if (Set("=~", "!~", "!=", "<=", ">=", "==").contains(two)) {
          out += Tok("op", two, i); i += 2
        } else if ("(){}[],=+-*/<>:@%^".contains(c)) {
          out += Tok("op", c.toString, i); i += 1
        } else err(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  private def durationSeconds(d: String): Long = {
    val n = try d.dropRight(1).toLong catch {
      case _: NumberFormatException =>
        throw new PromQLParseException(s"malformed duration '$d'")
    }
    d.last match {
      case 's' => n
      case 'm' => n * 60
      case 'h' => n * 3600
      case 'd' => n * 86400
      case 'w' => n * 604800
    }
  }

  def parse(query: String): Ast = {
    val toks = tokenize(query)
    var p = 0
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    def fail(msg: String): Nothing = {
      val at = peek.map(t => s"'${t.text}' at ${t.pos}").getOrElse("end of input")
      throw new PromQLParseException(s"$msg (found $at) in: $query")
    }
    def take(): Tok = { val t = peek.getOrElse(fail("unexpected end")); p += 1; t }
    def expect(text: String): Unit =
      if (peek.exists(_.text == text)) p += 1 else fail(s"expected '$text'")
    def at(text: String): Boolean = peek.exists(_.text == text)

    def labelList(): Seq[String] = {
      expect("(")
      val out = Seq.newBuilder[String]
      while (!at(")")) {
        val t = take()
        if (t.kind != "ident") fail("expected label name")
        out += t.text
        if (at(",")) p += 1
      }
      expect(")")
      out.result()
    }

    // accepts a leading unary minus: clamp_min(v, -5), topk(3, ...) etc.
    def number(): Double = {
      val neg = at("-")
      if (neg) p += 1
      val t = take()
      if (t.kind != "number") fail("expected number")
      val v = try t.text.toDouble catch {
        case _: NumberFormatException => fail(s"malformed number '${t.text}'")
      }
      if (neg) -v else v
    }

    def matchers(): Seq[Matcher] = {
      expect("{")
      val out = Seq.newBuilder[Matcher]
      while (!at("}")) {
        val l = take()
        // Prometheus 3.x UTF-8 names: a QUOTED label name
        // (`{"label.name"="v"}`), and a bare quoted string as sugar for
        // the metric name (`{"my.metric", k="a"}` ≡
        // `{__name__="my.metric", k="a"}`)
        if (l.kind == "string" &&
            !peek.exists(t => t.kind == "op" &&
              Set("=", "!=", "=~", "!~").contains(t.text))) {
          out += Matcher("__name__", "=", l.text)
        } else {
          if (l.kind != "ident" && l.kind != "string")
            fail("expected label name in matcher")
          val op = take()
          if (!(op.kind == "op" && Set("=", "!=", "=~", "!~").contains(op.text)))
            fail("expected matcher operator")
          val v = take()
          if (v.kind != "string") fail("expected quoted matcher value")
          out += Matcher(l.text, op.text, v.text)
        }
        if (at(",")) p += 1
      }
      expect("}")
      out.result()
    }

    def selectorTail(name: String): Ast = {
      val ms = if (at("{")) matchers() else Nil
      // `[d]` is a range selector; `[d:step]` is upstream's bare
      // subquery suffix (`signup[2d:1d]` without parentheses)
      var sqStep: Option[Long] = None
      val range = if (at("[")) {
        p += 1
        val d = take()
        if (d.kind != "duration") fail("expected duration in range selector")
        if (at(":")) {
          p += 1
          val st = take()
          if (st.kind != "duration") fail("expected step duration in subquery")
          sqStep = Some(durationSeconds(st.text))
        }
        expect("]")
        Some(durationSeconds(d.text))
      } else None
      val offset = if (peek.exists(t => t.kind == "ident" && t.text == "offset")) {
        p += 1
        // negative offsets look forward in time (PromQL with
        // --enable-feature=promql-negative-offset, now default)
        val neg = at("-")
        if (neg) p += 1
        val d = take()
        if (d.kind != "duration") fail("expected duration after offset")
        val s = durationSeconds(d.text)
        Some(if (neg) -s else s)
      } else None
      val atInstant = if (at("@")) {
        if (sqStep.isDefined)
          fail("@ after a subquery range is not supported; pin the inner selector, e.g. (m @ t)[w:s]")
        p += 1
        // `@ start()` / `@ end()` parse to sentinel pins; the entry
        // points resolve them (Ast.resolveAtEdges) — to the range
        // query's start/end epoch for query_range, or to "no pin" for
        // instant queries (upstream's start = end = eval-time rule)
        if (peek.exists(t => t.kind == "ident" &&
            (t.text == "start" || t.text == "end"))) {
          val edge = take().text
          expect("("); expect(")")
          Some(if (edge == "start") Selector.AtStart else Selector.AtEnd)
        } else {
          val t2 = take()
          if (t2.kind != "number" || t2.text.contains('.'))
            fail("expected integer epoch seconds, start(), or end() after @")
          try Some(t2.text.toLong) catch {
            case _: NumberFormatException => fail(s"malformed epoch '${t2.text}'")
          }
        }
      } else None
      sqStep match {
        case Some(st) =>
          // `m[w:s] offset o` ≡ `(m offset o)[w:s]` for a pure selector
          // inner (the offset distributes through every subquery
          // instant), so the trailing offset attaches to the inner
          Subquery(Selector(name, ms, None, offset, None), range.get, st)
        case None => Selector(name, ms, range, offset, atInstant)
      }
    }

    // upstream's postfix subquery range: `<operand>[w:s]` after a
    // function call, aggregation, or parenthesized expression
    def maybeSubquerySuffix(r: Ast): Ast =
      if (at("[")) {
        p += 1
        val d = take()
        if (d.kind != "duration") fail("expected range duration in subquery")
        expect(":")
        val st = take()
        if (st.kind != "duration") fail("expected step duration in subquery")
        expect("]")
        r match {
          case s: Selector if s.rangeS.isDefined =>
            fail("a subquery range cannot follow a range selector")
          case _ => ()
        }
        Subquery(r, durationSeconds(d.text), durationSeconds(st.text))
      } else r

    def grouping(): Option[(String, Seq[String])] =
      if (peek.exists(t => t.kind == "ident" && (t.text == "by" || t.text == "without"))) {
        val kw = take().text
        Some(kw -> labelList())
      } else None

    def operand(): Ast = {
      val t = peek.getOrElse(fail("unexpected end"))
      if (t.kind == "number") NumLit(number())
      // unary minus on a scalar literal (`x * -2`, `v > -0.5`); negating
      // a full vector expression stays out of the subset (use `* -1`)
      else if (t.text == "-") NumLit(number())
      else if (t.text == "(") { p += 1; val e = expr(); expect(")"); e }
      // bare brace selector: `{__name__=~"...", k="1"}` (cross-family)
      else if (t.text == "{") selectorTail("")
      else if (t.kind == "ident") {
        val name = take().text
        if (AggOps.contains(name)) {
          val g1 = grouping()
          expect("(")
          val arg = expr()
          expect(")")
          val g2 = if (g1.isEmpty) grouping() else None
          Agg(name, g1.orElse(g2), None, arg)
        } else if (ParamAggOps.contains(name)) {
          val g1 = grouping() // `topk by (k) (n, v)` / `quantile by (k) (φ, v)`
          expect("(")
          val param = number()
          expect(",")
          val arg = expr()
          expect(")")
          val g2 = if (g1.isEmpty) grouping() else None
          Agg(name, g1.orElse(g2), Some(param), arg)
        } else if (RangeFuncs.contains(name)) {
          expect("(")
          val sel =
            if (at("{")) selectorTail("")
            else {
              val t2 = take()
              if (t2.kind != "ident") fail(s"$name expects a range selector")
              selectorTail(t2.text)
            }
          expect(")")
          Func(name, None, sel)
        } else if (OverTimeFuncs.contains(name)) {
          expect("(")
          // a range selector `sel[d]`, a bare subquery `sel[d:step]` /
          // `fn(...)[d:step]` / `agg(...)[d:step]`, or the
          // parenthesized `(expr)[d:step]` — all upstream forms
          val arg = maybeSubquerySuffix(operand())
          expect(")")
          Func(name, None, arg)
        } else if (name == "histogram_quantile") {
          // the argument may be a bare selector (instant) or a
          // rate/increase over a bucket range — the compiler validates
          expect("(")
          val phi = number()
          expect(",")
          val arg = expr()
          expect(")")
          Func(name, Some(phi), arg)
        } else if (name == "histogram_count" || name == "histogram_sum" ||
            name == "histogram_avg" || name == "histogram_stddev" ||
            name == "histogram_stdvar") {
          // classic-bucket derived scalars of a histogram family; the
          // argument is a histogram selector or rate/increase of one —
          // the compiler validates the family kind
          expect("(")
          val arg = expr()
          expect(")")
          Func(name, None, arg)
        } else if (name == "info") {
          // info(v) — enrich v with the target_info data labels shared
          // by its identifying `instance` label (Prometheus 3.x)
          expect("(")
          val arg = expr()
          expect(")")
          Func(name, None, arg)
        } else if (name == "histogram_fraction") {
          // histogram_fraction(lo, hi, hist) — two leading scalars,
          // like the native-histogram form in Prometheus 3.x
          expect("(")
          val lo = number()
          expect(",")
          val hiV = number()
          expect(",")
          val arg = expr()
          expect(")")
          HistFraction(lo, hiV, arg)
        } else if (ScalarFuncs.contains(name)) {
          expect("(")
          val arg = expr()
          // round(v[, to_nearest]) takes an optional scale parameter
          val param =
            if (name == "round" && at(",")) { p += 1; Some(number()) } else None
          expect(")")
          Func(name, param, arg)
        } else if (ClampFuncs.contains(name)) {
          expect("(")
          val arg = expr()
          expect(",")
          val s = number()
          expect(")")
          Func(name, Some(s), arg)
        } else if (name == "clamp") {
          // clamp(v, min, max) desugars to clamp_max(clamp_min(v, min), max)
          expect("(")
          val arg = expr()
          expect(",")
          val lo = number()
          expect(",")
          val hiV = number()
          expect(")")
          Func("clamp_max", Some(hiV), Func("clamp_min", Some(lo), arg))
        } else if (name == "quantile_over_time") {
          // quantile_over_time(φ, sel[d]) — φ leads, like quantile(...)
          expect("(")
          val phi = number()
          expect(",")
          val sel =
            if (at("{")) selectorTail("")
            else {
              val t2 = take()
              if (t2.kind != "ident") fail("quantile_over_time expects a range selector")
              selectorTail(t2.text)
            }
          expect(")")
          Func(name, Some(phi), sel)
        } else if (name == "predict_linear") {
          // predict_linear(sel[d], t) — extrapolate t seconds past T
          expect("(")
          val sel =
            if (at("{")) selectorTail("")
            else {
              val t2 = take()
              if (t2.kind != "ident") fail("predict_linear expects a range selector")
              selectorTail(t2.text)
            }
          expect(",")
          val horizon = number()
          expect(")")
          Func(name, Some(horizon), sel)
        } else if (name == "double_exponential_smoothing" || name == "holt_winters") {
          // double_exponential_smoothing(sel[d], sf, tf) — 2.x alias
          // holt_winters; the only two-scalar-parameter function
          expect("(")
          val sel =
            if (at("{")) selectorTail("")
            else {
              val t2 = take()
              if (t2.kind != "ident") fail(s"$name expects a range selector")
              selectorTail(t2.text)
            }
          expect(",")
          val sf = number()
          expect(",")
          val tf = number()
          expect(")")
          SmoothFunc(sf, tf, sel)
        } else if (name == "count_values") {
          expect("(")
          val dst = take()
          if (dst.kind != "string") fail("count_values expects a quoted label name")
          expect(",")
          val arg = expr()
          expect(")")
          CountValues(dst.text, arg)
        } else if (name == "sort_by_label" || name == "sort_by_label_desc") {
          // sort_by_label(v, "lbl", ...) — order the output by the given
          // label values (then the remaining labels as tiebreak)
          expect("(")
          val arg = expr()
          val params = Seq.newBuilder[String]
          while (at(",")) {
            p += 1
            val s = take()
            if (s.kind != "string") fail(s"$name expects quoted label names")
            params += s.text
          }
          expect(")")
          LabelFunc(name, params.result(), arg)
        } else if (name == "label_replace" || name == "label_join") {
          // label_replace(v, "dst", "replacement", "src", "regex")
          // label_join(v, "dst", "sep", "src1", "src2", ...)
          expect("(")
          val arg = expr()
          val params = Seq.newBuilder[String]
          while (at(",")) {
            p += 1
            val s = take()
            if (s.kind != "string") fail(s"$name expects quoted string parameters")
            params += s.text
          }
          expect(")")
          LabelFunc(name, params.result(), arg)
        } else if (name == "time") {
          expect("(")
          expect(")")
          Func("time", None, NumLit(0))
        } else if (name == "pi") {
          expect("(")
          expect(")")
          NumLit(math.Pi)
        } else if (name == "vector") {
          expect("(")
          val s = number()
          expect(")")
          Func("vector", Some(s), NumLit(s))
        } else selectorTail(name)
      } else fail("expected expression")
    }

    // operator modifiers, in PromQL order:
    //   op [bool] [on(...)|ignoring(...)] [group_left|group_right[(lbls)]]
    def binMods(): (Option[Seq[String]], Option[Seq[String]], Boolean, Boolean,
        Boolean, Seq[String]) = {
      val bool = peek.exists(t => t.kind == "ident" && t.text == "bool")
      if (bool) p += 1
      var on: Option[Seq[String]] = None
      var ignoring: Option[Seq[String]] = None
      if (peek.exists(t => t.kind == "ident" && t.text == "on")) {
        p += 1; on = Some(labelList())
      } else if (peek.exists(t => t.kind == "ident" && t.text == "ignoring")) {
        p += 1; ignoring = Some(labelList())
      }
      val gl = peek.exists(t => t.kind == "ident" && t.text == "group_left")
      if (gl) p += 1
      val gr = !gl && peek.exists(t => t.kind == "ident" && t.text == "group_right")
      if (gr) p += 1
      // group_left(lbl, ...) — labels COPIED from the "one" side (as in
      // Prometheus, a "(" right after the modifier is always the label
      // list, never a parenthesized operand)
      val carry = if ((gl || gr) && at("(")) labelList() else Nil
      (on, ignoring, gl, gr, bool, carry)
    }

    def binTail(op: String, l: Ast, rhs: () => Ast): Ast = {
      val (on, ig, gl, gr, bool, carry) = binMods()
      BinOp(op, on, l, rhs(), gl, ig, gr, bool, carry)
    }

    // `^` binds tightest and is RIGHT-associative (PromQL)
    def powExpr(): Ast = {
      val l = operand()
      if (peek.exists(t => t.kind == "op" && t.text == "^"))
        { p += 1; binTail("^", l, () => powExpr()) }
      else l
    }

    def mulExpr(): Ast = {
      var l = powExpr()
      while (peek.exists(t =>
          (t.kind == "op" && (t.text == "*" || t.text == "/" || t.text == "%")) ||
          (t.kind == "ident" && t.text == "atan2"))) {
        l = binTail(take().text, l, () => powExpr())
      }
      l
    }

    def addExpr(): Ast = {
      var l = mulExpr()
      while (peek.exists(t => t.kind == "op" && (t.text == "+" || t.text == "-"))) {
        l = binTail(take().text, l, () => mulExpr())
      }
      l
    }

    def cmpExpr(): Ast = {
      var l = addExpr()
      while (peek.exists(t => t.kind == "op" &&
          Set(">", "<", ">=", "<=", "==", "!=").contains(t.text))) {
        l = binTail(take().text, l, () => addExpr())
      }
      l
    }

    // PromQL precedence: `or` binds loosest, then `and`/`unless`
    def andExpr(): Ast = {
      var l = cmpExpr()
      while (peek.exists(t => t.kind == "ident" &&
          (t.text == "and" || t.text == "unless"))) {
        l = binTail(take().text, l, () => cmpExpr())
      }
      l
    }

    def expr(): Ast = {
      var l = andExpr()
      while (peek.exists(t => t.kind == "ident" && t.text == "or")) {
        p += 1
        l = binTail("or", l, () => andExpr())
      }
      l
    }

    val result = expr()
    if (p != toks.length) fail("trailing input")
    result
  }
}
