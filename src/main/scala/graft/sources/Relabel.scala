package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prometheus RELABELING — `relabel_configs` (target labels, applied
  * once per target at discovery time) and `metric_relabel_configs`
  * (every scraped sample's label set, applied before ingest): the
  * config mechanism every production Prometheus uses to prune, rename,
  * and reshape series at the scrape door. The reference's pull model
  * (`/root/reference/prometheus.cpp:73,80`) exposes series as-is; the
  * server-side half it implies is this module.
  *
  * Semantics follow the public upstream contract:
  *  - a rule reads `source_labels` joined by `separator`, matches the
  *    FULLY ANCHORED `regex` (`^(?:regex)$`), and acts:
  *    `keep`/`drop` the whole label set, `keepequal`/`dropequal`
  *    against `target_label`'s value, `replace` (expand capture groups
  *    into `replacement`, write to `target_label`; a non-matching
  *    regex leaves the set untouched), `lowercase`/`uppercase` into
  *    `target_label`, `hashmod` (md5 low 8 bytes as uint64, mod
  *    `modulus`), `labelmap` (COPY each matching label's value to the
  *    name `replacement` expands to), `labeldrop`/`labelkeep` (filter
  *    label NAMES);
  *  - rules apply in order; labels with EMPTY values are removed from
  *    the final set (upstream's empty-label rule, the same convention
  *    this engine's series identity already uses);
  *  - a dropped label set is a dropped target/sample.
  *
  * Two faces, one semantics:
  *  - [[relabelCol]]: pure column expressions over a `map<string,
  *    string>` labels column — the METRIC face, fanned out on
  *    executors inside [[ScrapeClient.parsePayloads]], identical plan
  *    batch and streaming (stateless projections bind to both);
  *  - [[relabelMap]]: the driver-side Scala twin — the TARGET face
  *    (upstream applies target relabeling once per target at service
  *    discovery, O(#targets), never per sample), and the cross-check
  *    that pins the column semantics in the spec.
  *
  * Scale shape: metric relabeling is a stateless row-local projection
  * (no shuffle, codegen regex), so it rides the scrape parse's explode
  * and prunes series BEFORE any rollup/ingest state exists — dropping
  * a high-cardinality family at the door costs nothing downstream,
  * exactly the production use.
  */
object Relabel {

  /** One relabel rule — field names mirror the upstream YAML keys. */
  final case class Rule(
      action: String = "replace",
      sourceLabels: Seq[String] = Nil,
      separator: String = ";",
      regex: String = "(.*)",
      targetLabel: String = "",
      replacement: String = "$1",
      modulus: Long = 0L) {
    require(Actions.contains(action), s"unknown relabel action '$action'")
    /** The fully anchored pattern (upstream anchors every rule). */
    def anchored: String = s"^(?:$regex)$$"
  }

  private val Actions = Set("replace", "keep", "drop", "keepequal",
    "dropequal", "lowercase", "uppercase", "hashmod", "labelmap",
    "labeldrop", "labelkeep")

  // ---- the column face ----

  /** Overwrite-put of `entries` (array<struct<key,value>>) onto `base`
    * (map) in entry order — upstream's "later write wins" on a label
    * name, expressed as a fold (maps here are tiny label sets, never
    * data-sized).
    */
  private def putAll(base: Column, entries: Column): Column =
    aggregate(entries, base, (acc, e) =>
      map_concat(
        map_filter(acc, (k, _) => k =!= e.getField("key")),
        map(e.getField("key"), e.getField("value"))))

  private def put(base: Column, key: Column, value: Column): Column =
    map_concat(map_filter(base, (k, _) => k =!= key), map(key, value))

  /** The joined source-label value of one rule (missing labels read as
    * "", upstream's rule).
    */
  private def srcOf(labels: Column, r: Rule): Column =
    if (r.sourceLabels.isEmpty) lit("")
    else concat_ws(r.separator,
      r.sourceLabels.map(l => coalesce(element_at(labels, l), lit(""))): _*)

  /** md5 low 8 bytes as an unsigned 64-bit integer mod `modulus` —
    * upstream's hashmod (`binary.BigEndian.Uint64(md5[8:]) % modulus`).
    */
  private def hashmodCol(src: Column, modulus: Long): Column =
    pmod(conv(substring(md5(src), 17, 16), 16, 10).cast("decimal(20,0)"),
      lit(modulus).cast("decimal(20,0)")).cast("long").cast("string")

  /** Apply one rule to a (possibly null = already dropped) labels map. */
  private def one(labels: Column, r: Rule): Column = {
    val src = srcOf(labels, r)
    val matched = src.rlike(r.anchored)
    val tgt = coalesce(element_at(labels, r.targetLabel), lit(""))
    val out = r.action match {
      case "keep" => when(matched, labels)
      case "drop" => when(!matched, labels)
      case "keepequal" => when(src === tgt, labels)
      case "dropequal" => when(src =!= tgt, labels)
      case "replace" =>
        val value = regexp_replace(src, r.anchored, r.replacement)
        when(matched, put(labels, lit(r.targetLabel), value))
          .otherwise(labels)
      case "lowercase" => put(labels, lit(r.targetLabel), lower(src))
      case "uppercase" => put(labels, lit(r.targetLabel), upper(src))
      case "hashmod" =>
        put(labels, lit(r.targetLabel), hashmodCol(src, r.modulus))
      case "labelmap" =>
        putAll(labels, transform(
          filter(map_entries(labels),
            e => e.getField("key").rlike(r.anchored)),
          e => struct(
            regexp_replace(e.getField("key"), r.anchored, r.replacement)
              .as("key"),
            e.getField("value").as("value"))))
      case "labeldrop" =>
        map_filter(labels, (k, _) => !k.rlike(r.anchored))
      case "labelkeep" =>
        map_filter(labels, (k, _) => k.rlike(r.anchored))
    }
    when(labels.isNull, lit(null).cast("map<string,string>")).otherwise(out)
  }

  /** The whole rule chain over a labels-map column: the relabeled map,
    * empty-valued labels removed, or NULL when a keep/drop rule dropped
    * the set — callers filter null maps (a dropped sample/target).
    */
  def relabelCol(labels: Column, rules: Seq[Rule]): Column = {
    val out = rules.foldLeft(labels)(one)
    when(out.isNull, lit(null).cast("map<string,string>"))
      .otherwise(map_filter(out, (_, v) => v =!= ""))
  }

  // ---- the driver-side twin (target relabeling + spec cross-check) ----

  /** Scala twin of [[relabelCol]] — upstream's target-relabeling face:
    * applied once per target at discovery, never per sample. `None` =
    * the target is dropped.
    */
  def relabelMap(labels: Map[String, String],
      rules: Seq[Rule]): Option[Map[String, String]] = {
    import java.util.regex.Pattern
    // anchored whole-string replaceAll: group references expand exactly
    // like the column face's regexp_replace (both are Java regex)
    def expand(p: Pattern, s: String, repl: String): String =
      if (!p.matcher(s).matches()) s else p.matcher(s).replaceAll(repl)
    val out = rules.foldLeft(Option(labels)) { (acc, r) =>
      acc.flatMap { ls =>
        val p = Pattern.compile(r.anchored)
        val src = r.sourceLabels.map(l => ls.getOrElse(l, ""))
          .mkString(r.separator)
        val matched = p.matcher(src).matches()
        val tgt = ls.getOrElse(r.targetLabel, "")
        r.action match {
          case "keep" => if (matched) Some(ls) else None
          case "drop" => if (!matched) Some(ls) else None
          case "keepequal" => if (src == tgt) Some(ls) else None
          case "dropequal" => if (src != tgt) Some(ls) else None
          case "replace" =>
            if (!matched) Some(ls)
            else Some(ls + (r.targetLabel -> expand(p, src, r.replacement)))
          case "lowercase" =>
            Some(ls + (r.targetLabel -> src.toLowerCase))
          case "uppercase" =>
            Some(ls + (r.targetLabel -> src.toUpperCase))
          case "hashmod" =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(src.getBytes("UTF-8"))
            val u = java.nio.ByteBuffer.wrap(d, 8, 8).getLong
            val m = java.lang.Long.remainderUnsigned(u, r.modulus)
            Some(ls + (r.targetLabel -> m.toString))
          case "labelmap" =>
            Some(ls ++ ls.collect {
              case (k, v) if p.matcher(k).matches() =>
                expand(p, k, r.replacement) -> v
            })
          case "labeldrop" =>
            Some(ls.filter { case (k, _) => !p.matcher(k).matches() })
          case "labelkeep" =>
            Some(ls.filter { case (k, _) => p.matcher(k).matches() })
        }
      }
    }
    out.map(_.filter(_._2.nonEmpty))
  }
}
