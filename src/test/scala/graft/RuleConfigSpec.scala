package graft

import graft.promql.{Api, RuleConfig, Rules}
import graft.promql.Rules.{AlertRule, RecordingRule}

/** The rule-file round-trip law: [[RuleConfig.parse]] inverts
  * [[Api.configJson]]'s YAML renderer on every rule file the server can
  * itself describe — what makes `/-/reload` trustworthy (the file the
  * operator edits is the same grammar `/api/v1/status/config` shows).
  */
class RuleConfigSpec extends SparkTestBase {

  test("load ∘ render is the identity on the server's own YAML") {
    val alerts = Seq(
      AlertRule("High", "sum by (k) (purchase) > 3",
        forS = 2 * 86400, intervalS = 86400, keepFiringForS = 86400,
        labels = Map("severity" -> "page", "team" -> "core"),
        annotations = Map(
          "summary" -> "k={{ $labels.k }} at {{ $value }}",
          "weird" -> "has: colon {and} 'quote'")),
      AlertRule("Low", "sum by (k) (click) < 200"))
    val recs = Seq(RecordingRule("k_totals", "sum by (k) (purchase)"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val yaml = om.readTree(Api.configJson(alerts, recs))
      .path("data").path("yaml").asText
    val (a2, r2) = RuleConfig.parse(yaml)
    // the group-level interval applies to EVERY alert rule on load
    // (the renderer emits the shared evaluation interval), so the
    // interval-less Low rule comes back on the group's lattice
    assert(a2 === Seq(alerts.head, alerts(1).copy(intervalS = 86400)))
    assert(r2 === recs)
  }

  test("global external_labels round-trip with the rules") {
    val alerts = Seq(AlertRule("Low", "sum by (k) (click) < 200"))
    val ext = Map("env" -> "prod", "replica" -> "a",
      "odd" -> "has: colon")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val yaml = om.readTree(Api.configJson(alerts, Nil, ext))
      .path("data").path("yaml").asText
    assert(yaml.startsWith("global:\n  external_labels:\n"),
      "the global section leads, upstream's YAML order")
    val (a2, r2, e2) = RuleConfig.parseFull(yaml)
    assert(a2 === alerts && r2.isEmpty && e2 === ext)
    // a global-only file (no rules) parses too
    val (a3, r3, e3) = RuleConfig.parseFull(
      "global:\n  external_labels:\n    env: dev\ngroups: []\n")
    assert(a3.isEmpty && r3.isEmpty && e3 === Map("env" -> "dev"))
  }

  test("empty and minimal files parse; junk durations refuse") {
    assert(RuleConfig.parse("groups: []\n") === ((Nil, Nil)))
    val (a, r) = RuleConfig.parse(
      "groups:\n- name: g\n  rules:\n  - record: x\n    expr: sum(purchase)\n")
    assert(a.isEmpty && r === Seq(RecordingRule("x", "sum(purchase)")))
    intercept[IllegalArgumentException] {
      RuleConfig.parse(
        "groups:\n- name: g\n  rules:\n  - alert: X\n    for: soon\n")
    }
  }

  test("durations parse the renderer's vocabulary") {
    assert(RuleConfig.durS("90s") === 90L)
    assert(RuleConfig.durS("5m") === 300L)
    assert(RuleConfig.durS("2h") === 7200L)
    assert(RuleConfig.durS("1d") === 86400L)
  }
}
