package graft

import graft.promql.{Format, Parser}

/** The PromQL prettifier's laws: formatting is parse-stable
  * (`parse(format(parse(q))) == parse(q)` — the canonical string means
  * exactly what the input meant) and canonical forms render exactly.
  */
class FormatSpec extends SparkTestBase {

  private def canon(q: String): String = Format.format(Parser.parse(q))

  test("canonical strings render exactly") {
    val exact = Seq(
      "sum by (k) (rate(purchase[1d]))",
      "purchase",
      "purchase{k=\"a\"}",
      "rate(purchase{k=\"a\",instance!~\"i[0-2]\"}[2h])",
      "topk(3, sum by (k) (rate(purchase[1d])))",
      "quantile(0.9, purchase)",
      "histogram_quantile(0.99, sum by (le) (rate(error[1h])))",
      "sum(purchase) / sum(click)",
      "sum by (k) (purchase) > 3",
      "clamp_min(purchase, 5)",
      "avg_over_time(signup[1d])",
      "time()",
      "sum(purchase) and on (k) sum(click)",
      "sum(purchase) / on (k) group_left sum(click)",
      "purchase > bool 3",
      "label_replace(purchase, \"dst\", \"$1\", \"k\", \"(.*)\")",
      "count_values(\"v\", purchase)",
      "absent(purchase{k=\"zzz\"})")
    for (q <- exact) assert(canon(q) === q, q)
  }

  test("non-canonical spellings canonicalize") {
    assert(canon("sum  by(k)(rate(purchase[86400s]))") ===
      "sum by (k) (rate(purchase[1d]))")
    assert(canon("rate(purchase[120m])") === "rate(purchase[2h])")
    assert(canon("purchase offset 90m") === "purchase offset 90m")
    assert(canon("holt_winters(signup[1d], 0.5, 0.5)") ===
      "double_exponential_smoothing(signup[1d], 0.5, 0.5)")
    assert(canon("clamp(purchase, 1, 9)") ===
      "clamp_max(clamp_min(purchase, 1), 9)")
  }

  test("the AST JSON renderer emits the upstream parser vocabulary") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val om = new ObjectMapper()
    def tree(q: String) = om.readTree(Format.json(Parser.parse(q)))
    val sel = tree("purchase{k=\"a\"}[1d] offset 1h")
    assert(sel.get("type").asText === "matrixSelector")
    assert(sel.get("range").asLong === 86400000L)
    val vs = sel.get("vectorSelector")
    assert(vs.get("offset").asLong === 3600000L)
    assert(vs.get("matchers").get(0).get("name").asText === "__name__")
    assert(vs.get("matchers").get(1).get("type").asText === "MatchEqual")
    val agg = tree("sum by (k) (rate(purchase[1d]))")
    assert(agg.get("type").asText === "aggregation")
    assert(agg.get("op").asText === "sum")
    assert(agg.get("grouping").get(0).asText === "k")
    assert(!agg.get("without").asBoolean)
    assert(agg.get("expr").get("func").asText === "rate")
    val bin = tree("sum(purchase) / on (k) group_left sum(click)")
    assert(bin.get("type").asText === "binaryExpr")
    assert(bin.get("matching").get("card").asText === "many-to-one")
    assert(bin.get("matching").get("on").asBoolean)
    val hq = tree("histogram_quantile(0.9, rate(error[1h]))")
    assert(hq.get("args").get(0).get("type").asText === "numberLiteral")
    assert(hq.get("args").get(0).get("val").asText === "0.9")
    val sq = tree("max_over_time((sum(purchase))[1d:6h])")
    assert(sq.get("args").get(0).get("type").asText === "subquery")
    assert(sq.get("args").get(0).get("step").asLong === 21600000L)
    // every battery shape renders VALID json (jackson parses it)
    for (q <- Seq("purchase @ start()", "count_values(\"v\", purchase)",
        "label_replace(purchase, \"d\", \"$1\", \"k\", \"(.*)\")",
        "holt_winters(signup[1d], 0.5, 0.5)", "time()", "vector(42)",
        "histogram_fraction(0, 10, error)", "purchase > bool 3"))
      assert(!tree(q).isNull, q)
  }

  test("UTF-8 quoted names: sugar desugars, quoted labels match plain ones") {
    import graft.promql.Parser
    assert(Parser.parse("""{"purchase", k="a"}""") ===
      Parser.parse("""{__name__="purchase", k="a"}"""))
    assert(Parser.parse("""purchase{"k"="a"}""") ===
      Parser.parse("""purchase{k="a"}"""))
    // a legacy-valid name inside the sugar renders back legacy-shaped
    // only through its matcher form; a UTF-8 name keeps the quoted form
    val f = graft.promql.Format.format(Parser.parse("""{"weird.metric"}"""))
    assert(f === """{"weird.metric"}""")
    // the quoted sugar evaluates identically to the bare name end to end
    val dir = fixture("events" -> {
      import spark.implicits._
      Seq(ev(0, 0, "purchase", 2.0, "a"), ev(1, 1000, "purchase", 3.0, "b"))
        .toDF(eventCols: _*)
    })
    val a = graft.promql.Engine.eval(spark, dir,
      """sum by (k) ({"purchase"})""").collect().toSeq
    val b = graft.promql.Engine.eval(spark, dir,
      "sum by (k) (purchase)").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("formatting is parse-stable across the shape battery") {
    val battery = Seq(
      "purchase{k!=\"a\"}",
      "purchase{k=~\"a|b\"}",
      "sum without (instance) (purchase)",
      "min by (k) (increase(purchase[6h]))",
      "bottomk(2, purchase)",
      "limitk(2, purchase)",
      "limit_ratio(0.5, purchase)",
      "stddev by (k) (purchase)",
      "count(purchase)",
      "group by (k) (signup)",
      "irate(purchase[1h])",
      "idelta(signup[1h])",
      "delta(signup[2h])",
      "deriv(signup[1d])",
      "predict_linear(signup[1d], 3600)",
      "quantile_over_time(0.5, purchase[1d])",
      "round(purchase, 0.5)",
      "round(purchase)",
      "abs(signup - 5)",
      "sgn(signup - 5)",
      "sqrt(purchase)",
      "exp(scalar(sum(purchase)))",
      "ln(purchase)",
      "log2(purchase)",
      "log10(purchase)",
      "floor(purchase)",
      "ceil(purchase)",
      "purchase @ 1704067200",
      "purchase offset -1h",
      "rate(purchase[1d] offset 1h)",
      "sum(rate(purchase[1d])) * 100",
      "100 * sum(rate(purchase[1d]))",
      "sum(purchase) % 7",
      "sum(purchase) - sum(click) + 1",
      "purchase unless purchase > 400",
      "purchase or click",
      "max_over_time((sum by (k) (rate(purchase[1d])))[1d:6h])",
      "avg_over_time(purchase[2d:1h])",
      "last_over_time(signup[1d])",
      "present_over_time(purchase[1d])",
      "absent_over_time(purchase{k=\"zzz\"}[1d])",
      "changes(signup[1d])",
      "resets(purchase[2d])",
      "histogram_fraction(0, 10, error)",
      "histogram_count(rate(error[1d]))",
      "histogram_sum(rate(error[1d]))",
      "histogram_avg(rate(error[1d]))",
      "label_join(purchase, \"dst\", \"-\", \"k\", \"instance\")",
      "sort_by_label(purchase, \"k\")",
      "sort_desc(purchase)",
      "timestamp(signup)",
      "scalar(sum(purchase))",
      "vector(42)",
      "day_of_week(timestamp(signup))",
      "days_in_month(timestamp(signup))",
      "purchase @ start()",
      "purchase @ end()",
      "sum by (k) (rate(purchase[1d])) / on (k) sum by (k) (rate(click[1d]))",
      "sum(purchase) / ignoring (instance) group_left sum(click)",
      "signup * on (k) group_right(instance) sum by (k) (click)",
      // Prometheus 3.x UTF-8 quoted names: bare quoted metric sugar and
      // quoted label names round-trip through the quoted form
      "{\"my.metric\"}",
      "{\"my.metric\",k=\"a\"}",
      "purchase{\"label.x\"=\"v\"}",
      "rate({\"http.req\",k=~\"a|b\"}[1d])")
    for (q <- battery) {
      val ast = Parser.parse(q)
      val f = Format.format(ast)
      assert(Parser.parse(f) === ast, s"$q -> $f")
    }
  }
}
