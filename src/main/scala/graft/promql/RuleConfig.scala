package graft.promql

/** The rule-file READER — the inverse of [[Api.configJson]]'s YAML
  * renderer, closing the `/-/reload` loop: a server started with a
  * `ruleFile` path loads its standing rules from disk and re-reads the
  * file on `POST /-/reload` (upstream's config-reload endpoint), so
  * rule edits take effect without a restart. The grammar is exactly
  * the subset [[Api.configJson]] emits (one group, `record`/`alert`
  * rules with `expr`/`for`/`keep_firing_for`/`labels`/`annotations`,
  * durations as `Ns|Nm|Nh|Nd`), so load∘render is the identity on any
  * rule file the server can itself describe — RuleConfigSpec pins the
  * round-trip law.
  */
object RuleConfig {

  private val DurRe = "([0-9]+)(s|m|h|d)".r

  private[graft] def durS(s: String): Long = s.trim match {
    case DurRe(n, u) =>
      n.toLong * (u match {
        case "s" => 1L
        case "m" => 60L
        case "h" => 3600L
        case "d" => 86400L
      })
    case other =>
      throw new IllegalArgumentException(s"unparseable duration '$other'")
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** Parse a rule-file YAML string (the [[Api.configJson]] subset) into
    * the standing rule file. The group-level `interval` applies to
    * every alert rule (the renderer emits the alert rules' shared
    * evaluation interval); recording rules keep their default.
    */
  def parse(yaml: String): (Seq[Rules.AlertRule], Seq[Rules.RecordingRule]) = {
    val (a, r, _) = parseFull(yaml)
    (a, r)
  }

  /** [[parse]] plus the `global:` section — `external_labels` (the
    * per-server identity attached to every outbound series: federation,
    * remote-write, notifier) re-read on `/-/reload` like the rules.
    */
  def parseFull(yaml: String): (Seq[Rules.AlertRule],
      Seq[Rules.RecordingRule], Map[String, String]) = {
    var interval = 0L
    var globalMode = false
    var extMode = false
    val ext = scala.collection.mutable.LinkedHashMap[String, String]()
    val alerts = scala.collection.mutable.ArrayBuffer[Rules.AlertRule]()
    val records = scala.collection.mutable.ArrayBuffer[Rules.RecordingRule]()
    // the rule under construction (alert XOR record), plus which of its
    // two maps an indented `k: v` line currently extends
    var cur: Option[Either[Rules.AlertRule, Rules.RecordingRule]] = None
    var mapMode: Option[String] = None // "labels" | "annotations"
    def flush(): Unit = {
      cur.foreach {
        case Left(a) => alerts += a
        case Right(r) => records += r
      }
      cur = None
      mapMode = None
    }
    def field(key: String, value: String): Unit = (cur, key) match {
      case (Some(Left(a)), "expr") => cur = Some(Left(a.copy(expr = value)))
      case (Some(Left(a)), "for") =>
        cur = Some(Left(a.copy(forS = durS(value))))
      case (Some(Left(a)), "keep_firing_for") =>
        cur = Some(Left(a.copy(keepFiringForS = durS(value))))
      case (Some(Right(r)), "expr") => cur = Some(Right(r.copy(expr = value)))
      case _ => throw new IllegalArgumentException(
        s"rule field '$key' outside a rule or on the wrong rule kind")
    }
    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("\\s+$", "")
      val t = line.trim
      if (t == "groups:" || t == "groups: []") { globalMode = false; extMode = false }
      else if (t.isEmpty || t.startsWith("- name:") || t == "rules:") ()
      else if (t == "global:") { globalMode = true; extMode = false }
      else if (globalMode && t == "external_labels:") extMode = true
      else if (globalMode && extMode && line.startsWith("    ")) {
        val i = t.indexOf(':')
        require(i > 0, s"unparseable external_labels entry '$t'")
        ext.put(t.substring(0, i), unquote(t.substring(i + 1)))
      } else if (line.startsWith("      ") && mapMode.isDefined) {
        // a labels/annotations entry
        val i = t.indexOf(':')
        require(i > 0, s"unparseable map entry '$t'")
        val (k, v) = (t.substring(0, i), unquote(t.substring(i + 1)))
        cur = cur.map {
          case Left(a) if mapMode.contains("labels") =>
            Left(a.copy(labels = a.labels + (k -> v)))
          case Left(a) => Left(a.copy(annotations = a.annotations + (k -> v)))
          case other => other
        }
      } else if (t == "labels:" || t == "annotations:") {
        mapMode = Some(t.dropRight(1))
      } else if (t.startsWith("interval:")) {
        interval = durS(t.stripPrefix("interval:"))
      } else if (t.startsWith("- record:")) {
        flush()
        cur = Some(Right(Rules.RecordingRule(
          t.stripPrefix("- record:").trim, "")))
      } else if (t.startsWith("- alert:")) {
        flush()
        cur = Some(Left(Rules.AlertRule(t.stripPrefix("- alert:").trim, "")))
      } else {
        mapMode = None
        val i = t.indexOf(':')
        require(i > 0, s"unparseable rule-file line '$t'")
        field(t.substring(0, i), t.substring(i + 1).trim)
      }
    }
    flush()
    val withIv =
      if (interval <= 0) alerts.toSeq
      else alerts.toSeq.map(a => a.copy(intervalS = interval))
    (withIv, records.toSeq, ext.toMap)
  }

  /** Load a rule file from disk. */
  def load(path: String): (Seq[Rules.AlertRule], Seq[Rules.RecordingRule]) = {
    val (a, r, _) = loadFull(path)
    (a, r)
  }

  /** [[load]] plus the `global: external_labels` section. */
  def loadFull(path: String): (Seq[Rules.AlertRule],
      Seq[Rules.RecordingRule], Map[String, String]) =
    parseFull(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
