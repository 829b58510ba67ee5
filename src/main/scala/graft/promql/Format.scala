package graft.promql

/** The PromQL PRETTIFIER — upstream's `/api/v1/format_query`: render an
  * [[Ast]] back to a canonical query string. The governing law (pinned
  * by `FormatSpec`) is parse-stability: `parse(format(parse(q)))` is
  * the SAME Ast as `parse(q)` for every accepted query — the canonical
  * string always means exactly what the input meant.
  *
  * Canonical choices, matching upstream's prettifier conventions:
  * durations render in the largest single unit that divides them
  * (`86400s` → `1d`); aggregations spell `op by (l) (arg)`; binary
  * operands that are themselves binary operations parenthesize (never
  * relying on precedence); 2.x aliases render under their 3.x names
  * (`holt_winters` → `double_exponential_smoothing` — the parse is
  * shared, so stability holds).
  */
object Format {

  def format(ast: Ast): String = render(ast)

  /** Seconds → the largest single PromQL unit that divides exactly. */
  private def duration(s: Long): String = {
    val neg = s < 0
    val v = math.abs(s)
    val (n, u) =
      if (v == 0) (0L, "s")
      else if (v % 604800L == 0) (v / 604800L, "w")
      else if (v % 86400L == 0) (v / 86400L, "d")
      else if (v % 3600L == 0) (v / 3600L, "h")
      else if (v % 60L == 0) (v / 60L, "m")
      else (v, "s")
    (if (neg) "-" else "") + n.toString + u
  }

  private def num(v: Double): String =
    if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  private def quoted(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""

  /** Legacy-valid label/metric identifier — anything else renders in
    * the 3.x quoted UTF-8 form the parser reads back.
    */
  private def legacyName(s: String): Boolean =
    s.nonEmpty && (s.head.isLetter || s.head == '_' || s.head == ':') &&
      s.forall(c => c.isLetterOrDigit || c == '_' || c == ':')

  private def matcher(m: Matcher): String =
    // a UTF-8 metric name matcher renders as the bare quoted-string
    // sugar ({"my.metric"}); a UTF-8 label name quotes itself
    if (m.label == "__name__" && m.op == "=" && !legacyName(m.value))
      quoted(m.value)
    else if (legacyName(m.label)) s"${m.label}${m.op}${quoted(m.value)}"
    else s"${quoted(m.label)}${m.op}${quoted(m.value)}"

  private def selector(s: Selector): String = {
    val ms =
      if (s.matchers.isEmpty) ""
      else s.matchers.map(matcher).mkString("{", ",", "}")
    val range = s.rangeS.map(r => s"[${duration(r)}]").getOrElse("")
    val off = s.offsetS.map(o => s" offset ${duration(o)}").getOrElse("")
    val at = s.atS.map {
      case Selector.AtStart => " @ start()"
      case Selector.AtEnd => " @ end()"
      case t => s" @ $t"
    }.getOrElse("")
    s"${s.name}$ms$range$off$at"
  }

  // parameter position conventions, from the parser's grammar
  private val ParamFirst = Set("histogram_quantile", "quantile_over_time")
  private val ParamLast = Set("round", "clamp_min", "clamp_max",
    "predict_linear")

  /** Binary operands that are themselves binary ops parenthesize. */
  private def operand(a: Ast): String = a match {
    case _: BinOp => s"(${render(a)})"
    case _ => render(a)
  }

  private def render(a: Ast): String = a match {
    case s: Selector => selector(s)
    case NumLit(v) => num(v)
    case Agg(op, grouping, param, arg) =>
      val g = grouping.map { case (kind, ls) =>
        s" $kind (${ls.mkString(", ")})"
      }.getOrElse("")
      val p = param.map(v => s"${num(v)}, ").getOrElse("")
      val sep = if (g.isEmpty) "" else " "
      s"$op$g$sep($p${render(arg)})"
    case Func("time", None, _) => "time()"
    case Func("vector", Some(s), _) => s"vector(${num(s)})"
    case Func(name, Some(p), arg) if ParamFirst.contains(name) =>
      s"$name(${num(p)}, ${render(arg)})"
    case Func(name, Some(p), arg) if ParamLast.contains(name) =>
      s"$name(${render(arg)}, ${num(p)})"
    case Func(name, _, arg) => s"$name(${render(arg)})"
    case SmoothFunc(sf, tf, arg) =>
      s"double_exponential_smoothing(${render(arg)}, ${num(sf)}, ${num(tf)})"
    case HistFraction(lo, hi, arg) =>
      s"histogram_fraction(${num(lo)}, ${num(hi)}, ${render(arg)})"
    case CountValues(dst, arg) =>
      s"count_values(${quoted(dst)}, ${render(arg)})"
    case LabelFunc(name, args, arg) =>
      s"$name(${render(arg)}${args.map(p => s", ${quoted(p)}").mkString})"
    case Subquery(inner, rangeS, stepS) =>
      s"(${render(inner)})[${duration(rangeS)}:${duration(stepS)}]"
    case b: BinOp =>
      val mods = Seq(
        if (b.boolMod) Some("bool") else None,
        b.on.map(ls => s"on (${ls.mkString(", ")})"),
        b.ignoring.map(ls => s"ignoring (${ls.mkString(", ")})"),
        if (b.groupLeft)
          Some("group_left" + carrySuffix(b.groupCarry)) else None,
        if (b.groupRight)
          Some("group_right" + carrySuffix(b.groupCarry)) else None
      ).flatten
      val opPart = (b.op +: mods).mkString(" ")
      s"${operand(b.left)} $opPart ${operand(b.right)}"
  }

  private def carrySuffix(carry: Seq[String]): String =
    if (carry.isEmpty) "" else s"(${carry.mkString(", ")})"

  // ---- `/api/v1/parse_query` — the Ast as upstream-shaped JSON ----

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jarr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  /** Render the Ast in the upstream parser's JSON vocabulary
    * (`vectorSelector`/`matrixSelector`/`aggregation`/`call`/
    * `binaryExpr`/`numberLiteral`/`subquery`) — the introspection shape
    * Grafana's query builder reads from `/api/v1/parse_query`. Matcher
    * types use upstream's names (`=` → `MatchEqual`, …); parameterized
    * calls carry their scalars as `numberLiteral` args in grammar
    * position.
    */
  def json(a: Ast): String = a match {
    case s: Selector =>
      val matcherType = Map("=" -> "MatchEqual", "!=" -> "MatchNotEqual",
        "=~" -> "MatchRegexp", "!~" -> "MatchNotRegexp")
      val ms = (if (s.name.nonEmpty)
          Seq(s"""{"name":"__name__","type":"MatchEqual","value":${jstr(s.name)}}""")
        else Nil) ++
        s.matchers.map(m =>
          s"""{"name":${jstr(m.label)},"type":"${matcherType(m.op)}",""" +
            s""""value":${jstr(m.value)}}""")
      val at = s.atS.map {
        case Selector.AtStart => """"startOrEnd":"start""""
        case Selector.AtEnd => """"startOrEnd":"end""""
        case t => s""""timestamp":${t * 1000L}"""
      }
      val base = Seq(
        Some(s""""name":${jstr(s.name)}"""),
        Some(s""""matchers":${jarr(ms)}"""),
        s.offsetS.map(o => s""""offset":${o * 1000L}"""),
        at).flatten
      val vs = s"""{"type":"vectorSelector",${base.mkString(",")}}"""
      s.rangeS match {
        case Some(r) =>
          s"""{"type":"matrixSelector","range":${r * 1000L},"vectorSelector":$vs}"""
        case None => vs
      }
    case NumLit(v) => s"""{"type":"numberLiteral","val":${jstr(num(v))}}"""
    case Agg(op, grouping, param, arg) =>
      val (without, labels) = grouping match {
        case Some(("without", ls)) => (true, ls)
        case Some((_, ls)) => (false, ls)
        case None => (false, Nil)
      }
      s"""{"type":"aggregation","op":${jstr(op)},"expr":${json(arg)},""" +
        s""""param":${param.map(p => json(NumLit(p))).getOrElse("null")},""" +
        s""""grouping":${jarr(labels.map(jstr))},"without":$without}"""
    case Func("time", None, _) => """{"type":"call","func":"time","args":[]}"""
    case Func("vector", Some(s), _) =>
      s"""{"type":"call","func":"vector","args":[${json(NumLit(s))}]}"""
    case Func(name, p, arg) =>
      val args =
        if (p.isEmpty) Seq(json(arg))
        else if (ParamFirst.contains(name)) Seq(json(NumLit(p.get)), json(arg))
        else Seq(json(arg), json(NumLit(p.get)))
      s"""{"type":"call","func":${jstr(name)},"args":${jarr(args)}}"""
    case SmoothFunc(sf, tf, arg) =>
      s"""{"type":"call","func":"double_exponential_smoothing",""" +
        s""""args":${jarr(Seq(json(arg), json(NumLit(sf)), json(NumLit(tf))))}}"""
    case HistFraction(lo, hi, arg) =>
      s"""{"type":"call","func":"histogram_fraction",""" +
        s""""args":${jarr(Seq(json(NumLit(lo)), json(NumLit(hi)), json(arg)))}}"""
    case CountValues(dst, arg) =>
      s"""{"type":"aggregation","op":"count_values","expr":${json(arg)},""" +
        s""""param":{"type":"stringLiteral","val":${jstr(dst)}},""" +
        s""""grouping":[],"without":false}"""
    case LabelFunc(name, args, arg) =>
      val strArgs = args.map(s => s"""{"type":"stringLiteral","val":${jstr(s)}}""")
      s"""{"type":"call","func":${jstr(name)},"args":${jarr(json(arg) +: strArgs)}}"""
    case Subquery(inner, rangeS, stepS) =>
      s"""{"type":"subquery","expr":${json(inner)},""" +
        s""""range":${rangeS * 1000L},"step":${stepS * 1000L}}"""
    case b: BinOp =>
      val card =
        if (b.groupLeft) "many-to-one"
        else if (b.groupRight) "one-to-many"
        else "one-to-one"
      val matching =
        if (b.on.isEmpty && b.ignoring.isEmpty && !b.groupLeft && !b.groupRight)
          "null"
        else s"""{"card":${jstr(card)},"on":${b.on.nonEmpty},""" +
          s""""labels":${jarr(b.on.orElse(b.ignoring).getOrElse(Nil).map(jstr))},""" +
          s""""include":${jarr(b.groupCarry.map(jstr))}}"""
      s"""{"type":"binaryExpr","op":${jstr(b.op)},"lhs":${json(b.left)},""" +
        s""""rhs":${json(b.right)},"matching":$matching,"bool":${b.boolMod}}"""
  }
}
