package graft

import graft.promql.{Api, Rules}
import graft.promql.Rules.AlertRule

/** Alert rule ANNOTATIONS/LABELS templating, `keep_firing_for`, and
  * their serving surfaces:
  *
  *  - `{{ $labels.<name> }}` / `{{ $value }}` render per alert
  *    instance; rule labels merge into (and override) the instance
  *    label set — upstream's merge order;
  *  - `keep_firing_for` holds a FIRING series in `firing` for the
  *    grace window after the condition clears (serving the last
  *    breach's value); `pending` never holds; the grid ladder and the
  *    per-offset union ladder agree exactly;
  *  - `/api/v1/alerts`, the Alertmanager notifier body, and
  *    `/api/v1/rules` carry the rendered (instance) and raw (rule)
  *    forms respectively; the config YAML round-trips the new fields.
  */
class AlertTemplateSpec extends SparkTestBase {
  import spark.implicits._

  private val dayMs = 86400000L
  private val dayS = 86400L
  private val T0 = 1704067200L

  test("renderTemplate: labels, value, spacing forms, absent labels") {
    val labels = Map("k" -> "api", "instance" -> "i1")
    assert(Rules.renderTemplate(
      "k={{ $labels.k }} on {{$labels.instance}} v={{ $value }}",
      labels, 7.25) === "k=api on i1 v=7.25")
    assert(Rules.renderTemplate("{{ $labels.missing }}!", labels, 1.0)
      === "!")
    assert(Rules.renderTemplate("no templates", labels, 1.0)
      === "no templates")
  }

  /** gauge a breaches (10.0) on day 0 and clears (1.0) on day 1;
    * gauge b breaches on day 0 and is still breaching at T = day 3.
    */
  private def kfDir = fixture("events" -> Seq(
    ev(0, 0, "signup", 10.0, "a"),
    ev(1, 1 * dayMs, "signup", 1.0, "a"),
    ev(2, 0, "signup", 10.0, "b"),
    ev(3, 3 * dayMs, "signup", 10.0, "b")
  ).toDF(eventCols: _*))

  test("keep_firing_for holds firing through the grace window, serving the last breach value") {
    val dir = kfDir
    val rule = AlertRule("KF", "sum by (k) (signup) > 5",
      forS = 0, intervalS = dayS, keepFiringForS = dayS)
    val states = Rules.alertStates(spark, dir, rule,
      Seq(0L, dayS, 2 * dayS, 3 * dayS))
      .select($"offset_s", $"label_k", $"alertstate", $"value")
      .as[(Long, String, String, Double)].collect().toSet
    assert(states === Set(
      // a fires on day 0 (offset 3d); cleared on day 1 (offset 2d) but
      // HELD firing for one more interval with the day-0 value; the
      // grace expires by offset 1d
      (3 * dayS, "a", "firing", 10.0),
      (2 * dayS, "a", "firing", 10.0),
      // b breaches at every instant (LWW carries day-0's 10.0 forward)
      (3 * dayS, "b", "firing", 10.0),
      (2 * dayS, "b", "firing", 10.0),
      (dayS, "b", "firing", 10.0),
      (0L, "b", "firing", 10.0)))
    // a longer grace holds `a` all the way to T
    val long = Rules.alertStates(spark, dir,
      rule.copy(keepFiringForS = 3 * dayS), Seq(0L))
      .filter($"label_k" === "a")
      .select($"alertstate", $"value").as[(String, Double)].collect().toSeq
    assert(long === Seq(("firing", 10.0)))
    // the collapsed firing-set face (evaluateAlerts) agrees: a held
    // series is firing NOW, serving the last breach's value
    val coll = Rules.evaluateAlerts(spark, dir,
      Seq(rule.copy(keepFiringForS = 3 * dayS)))
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(coll === Set(("a", 10.0), ("b", 10.0)))
    // PENDING never holds: with for = 1d, a's single breaching instant
    // (day 0, whose lookback predates the corpus) stays pending and the
    // grace does NOT carry it
    val pend = Rules.alertStates(spark, dir,
      rule.copy(forS = dayS, keepFiringForS = 2 * dayS),
      Seq(0L, dayS, 2 * dayS, 3 * dayS))
      .filter($"label_k" === "a")
      .select($"offset_s", $"alertstate").as[(Long, String)].collect().toSet
    assert(pend === Set((3 * dayS, "pending")))
    // misconfigured grace refuses at compose time
    intercept[graft.promql.PromQLCompileException] {
      Rules.alertStates(spark, dir,
        rule.copy(keepFiringForS = 100), Seq(0L))
    }
  }

  test("grid ladder ≡ union ladder under keep_firing_for") {
    val dir = kfDir
    def normGrid(df: org.apache.spark.sql.DataFrame) = df
      .select("alertstate", "t_s", "label_k", "value")
      .collect().map(_.toSeq).toSet
    def normUnion(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("t_s",
        (org.apache.spark.sql.functions.lit(T0 + 3 * dayS) -
          org.apache.spark.sql.functions.col("offset_s")).cast("long"))
      .select("alertstate", "t_s", "label_k", "value")
      .collect().map(_.toSeq).toSet
    val rule = AlertRule("KF", "sum by (k) (signup) > 5",
      forS = 0, intervalS = dayS, keepFiringForS = dayS)
    val grid = normGrid(Rules.alertStatesGrid(spark, dir, rule, 4, dayS))
    val union = normUnion(Rules.alertStates(spark, dir, rule,
      (0 to 3).map(_ * dayS)))
    assert(grid === union)
    assert(grid.nonEmpty)
    // and with a pending→firing ladder + grace together
    val rule2 = rule.copy(forS = dayS, keepFiringForS = dayS)
    val grid2 = normGrid(Rules.alertStatesGrid(spark, dir, rule2, 3, dayS))
    val union2 = normUnion(Rules.alertStates(spark, dir, rule2,
      (0 to 2).map(_ * dayS)))
    assert(grid2 === union2)
  }

  test("ALERTS is a selectable synthetic series: matchers, offset, no-rules guard") {
    val dir = kfDir // signup a: 10 (day 0) then 1 (day 1); b: 10, 10 (day 3)
    val rules = Seq(AlertRule("Hi", "sum by (k) (signup) > 5"))
    def sel(q: String) = graft.promql.Engine
      .eval(spark, dir, q, alertRules = rules)
      .select($"alertname", $"alertstate", $"label_k", $"value")
      .as[(String, String, String, Double)].collect().toSet
    // at T (day 3): a's LWW cleared to 1.0, b still breaching
    assert(sel("ALERTS") === Set(("Hi", "firing", "b", 10.0)))
    // offset rewinds the whole ladder: at T-3d both breach
    assert(sel("ALERTS offset 3d") ===
      Set(("Hi", "firing", "a", 10.0), ("Hi", "firing", "b", 10.0)))
    // matchers filter on the synthetic labels and the condition's own
    assert(sel("""ALERTS{alertstate="pending"}""") === Set.empty)
    assert(sel("""ALERTS{alertname="Hi", k="b"} offset 3d""") ===
      Set(("Hi", "firing", "b", 10.0)))
    assert(sel("""ALERTS{alertname!="Hi"}""") === Set.empty)
    // selecting ALERTS without standing rules is a compose-time error
    intercept[graft.promql.PromQLCompileException] {
      graft.promql.Engine.eval(spark, dir, "ALERTS").collect()
    }
  }

  test("alerts endpoint, notifier body, rules endpoint, and config YAML carry the new fields") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "api")
    ).toDF(eventCols: _*))
    val rule = AlertRule("HighPurchases", "sum by (k) (purchase) > 3",
      keepFiringForS = 0,
      labels = Map("severity" -> "page", "team" -> "{{ $labels.k }}-team"),
      annotations = Map(
        "summary" -> "k={{ $labels.k }} is high ({{ $value }})",
        "runbook" -> "https://wiki/runbooks/{{ $labels.k }}"))
    // /api/v1/alerts: rendered annotations + merged labels per instance
    val alerts = Api.alertsJson(spark, dir, Seq(rule))
    assert(alerts.contains(""""summary":"k=api is high (10.0)""""))
    assert(alerts.contains(""""runbook":"https://wiki/runbooks/api""""))
    assert(alerts.contains(""""severity":"page""""))
    assert(alerts.contains(""""team":"api-team""""))
    assert(alerts.contains(""""alertname":"HighPurchases""""))
    // notifier body: same rendering on the Alertmanager wire shape
    val body = Api.firingAlertsBody(spark, dir, Seq(rule))
    assert(body.contains(""""summary":"k=api is high (10.0)""""))
    assert(body.contains(""""severity":"page""""))
    assert(!body.contains(""""annotations":{}"""),
      "the notifier no longer sends empty annotations")
    // external_labels join the outgoing alert unless the instance
    // already carries the name (alert labels win, upstream's rule)
    val bodyExt = Api.firingAlertsBody(spark, dir, Seq(rule),
      Map("env" -> "prod", "severity" -> "ext-loses", "drop" -> ""))
    assert(bodyExt.contains(""""env":"prod""""))
    assert(bodyExt.contains(""""severity":"page""""))
    assert(!bodyExt.contains("ext-loses") && !bodyExt.contains(""""drop""""))
    // /api/v1/rules: rule-level RAW templates + keepFiringFor
    val rules = Api.rulesJson(spark, dir,
      Seq(rule.copy(keepFiringForS = 300, intervalS = 300)), Nil)
    assert(rules.contains(""""keepFiringFor":300"""))
    assert(rules.contains(""""summary":"k={{ $labels.k }} is high ({{ $value }})""""))
    assert(rules.contains(""""severity":"page""""))
    // config YAML round-trips keep_firing_for + labels + annotations
    val cfg = Api.configJson(Seq(AlertRule("KF", "sum(purchase) > 1",
      forS = 600, intervalS = 300, keepFiringForS = 86400,
      labels = Map("severity" -> "page"),
      annotations = Map("summary" -> "s={{ $value }}"))), Nil)
    assert(cfg.contains("keep_firing_for: 1d"))
    assert(cfg.contains("for: 10m"))
    assert(cfg.contains("severity: page"))
    assert(cfg.contains("summary: 's={{ $value }}'"))
  }
}
