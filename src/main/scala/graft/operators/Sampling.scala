package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators for training-data curation:
  * stratified hash sampling, incremental dedup against a prior corpus
  * snapshot, and token-budget mixture sampling.
  *
  * All three are hash-driven rather than RNG-driven: the keep/drop
  * decision for a document is a pure function of its identity, so a
  * sample is reproducible across runs, clusters, and partitionings —
  * the property a 100 TB curation pipeline needs for auditable data
  * recipes (re-running a recipe yields the identical corpus; an
  * RNG-based `df.sample` does not survive a repartition, let alone a
  * re-run). The hash is the first 8 hex chars of md5(doc_id): fixed-
  * width lowercase hex, so a LEXICOGRAPHIC threshold compare equals the
  * numeric u32 compare in both Spark and DuckDB (binary collation),
  * keeping every query oracle-exact.
  */
object Sampling {

  /** u ∈ [0, 1) as a fixed-width hex string: uniform per doc_id. */
  private def hashHex = substring(md5(col("doc_id").cast("string")), 1, 8)

  /** Per-stratum sampling rates: downsample the over-represented
    * language, keep the tail languages whole — the canonical
    * rebalancing move. Thresholds are the rate × 2^32 in hex, so
    * `hash < threshold` keeps exactly that fraction in expectation.
    */
  private val StratumThresholds: Seq[(String, String)] = Seq(
    "en" -> "40000000", // keep 1/4
    "de" -> "c0000000", // keep 3/4
    "fr" -> "c0000000") // keep 3/4; other langs default to keep-all

  /** x31: stratified hash sample — per-language Bernoulli sampling at
    * per-stratum rates, deterministic in doc_id.
    *
    * Physical plan: ONE narrow projection+filter pass, no shuffle, no
    * RNG state; the filter sits directly over the parquet scan (only
    * doc_id/lang/n_chars are read). At 100 TB this is the cheapest
    * possible operator shape: embarrassingly parallel, rate changes
    * re-run in scan time.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val thr = StratumThresholds.foldLeft(lit("ffffffff")) {
      case (acc, (lang, hex)) => when(col("lang") === lang, lit(hex)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .filter(hashHex < thr)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val StratifiedSampleSql: String =
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      |  CASE lang WHEN 'en' THEN '40000000'
      |            WHEN 'de' THEN 'c0000000'
      |            WHEN 'fr' THEN 'c0000000'
      |            ELSE 'ffffffff' END
      |ORDER BY doc_id""".stripMargin

  /** x38: quality-weighted downsampling — the composition of the cheap
    * quality pre-filter (x10) with deterministic hash sampling (x31):
    * keep probability rises with the quality tier (score 3 → 100 %,
    * 2 → 75 %, 1 → 25 %, 0 → 6.25 %), decided per doc by the same
    * md5(doc_id) threshold compare. The "keep the best, thin the rest"
    * recipe shape: one scan, per-row expressions only, reproducible
    * under any partitioning — and because the threshold is a function
    * of the SCORE, re-running with a retrained scorer re-derives the
    * sample without touching the sampling machinery.
    */
  def qualitySample(spark: SparkSession, dir: String): DataFrame = {
    // tier 3 keeps UNCONDITIONALLY: `hash < 'ffffffff'` would drop a doc
    // whose md5 prefix is exactly ffffffff (a 2^-32 silent loss of a
    // top-tier doc), so the 100% branch bypasses the hash gate entirely.
    val thr = when(col("quality_score") === 2, lit("c0000000"))
      .when(col("quality_score") === 1, lit("40000000"))
      .otherwise(lit("10000000"))
    TextAnalysis.qualityScore(spark, dir)
      .filter(col("quality_score") === 3 || hashHex < thr)
      .select(col("doc_id"), col("quality_score"), col("n_words"))
      .orderBy(col("doc_id"))
  }

  val QualitySampleSql: String =
    s"""WITH q AS (${TextAnalysis.QualityScoreSql})
       |SELECT doc_id, quality_score, n_words
       |FROM q
       |WHERE quality_score = 3
       |   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
       |  CASE quality_score WHEN 2 THEN 'c0000000'
       |                     WHEN 1 THEN '40000000'
       |                     ELSE '10000000' END
       |ORDER BY doc_id""".stripMargin

  /** x32: incremental dedup — admit an INCOMING batch against an already
    * deduplicated prior corpus without re-processing the prior corpus.
    *
    * The prior index is fingerprint-only (one md5 per kept doc): the
    * production pattern where the index is a ~32-byte-per-doc side table
    * that grows with the corpus while incoming batches stay small. Here
    * the split is simulated on the one documents table (doc_id % 10 < 7
    * = prior, the rest = incoming).
    *
    * Physical plan: exact dedup of the incoming batch (min doc_id per
    * fingerprint — one hash aggregate over 32-byte digests), then ONE
    * anti-join against the prior index on the digest. Both sides shuffle
    * only (digest, doc_id) pairs, never text; at 100 TB the anti-join is
    * the same shape as x1's exact dedup and AQE can broadcast the
    * incoming side when a day's batch is small.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"), col("lang"))
    val prior = docs.filter(col("doc_id") % 10 < 7).select(col("fp")).distinct()
    val incoming = docs.filter(col("doc_id") % 10 >= 7)
    val withinBatch = incoming
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"))
    withinBatch.join(prior, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val IncrementalDedupSql: String =
    """WITH fps AS (
      |  SELECT doc_id, md5(text) AS fp, lang FROM documents),
      |prior AS (
      |  SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 7),
      |incoming AS (
      |  SELECT fp, MIN(doc_id) AS doc_id, MIN(lang) AS lang
      |  FROM fps WHERE doc_id % 10 >= 7 GROUP BY fp)
      |SELECT doc_id, lang, fp
      |FROM incoming
      |WHERE fp NOT IN (SELECT fp FROM prior)
      |ORDER BY doc_id""".stripMargin

  /** Per-language whitespace-token budgets for [[mixtureSample]]: the
    * target mixture a training run wants, expressed in tokens.
    */
  private val TokenBudgets: Seq[(String, Long)] = Seq(
    "en" -> 4000L, "de" -> 2000L, "fr" -> 2000L)

  /** x33: token-budget mixture sampling — fill each language's token
    * budget with a deterministic, hash-ordered prefix of its documents.
    *
    * Documents are ranked inside each language by (hash, doc_id) — an
    * unbiased but reproducible shuffle — and admitted while the RUNNING
    * token total up to and including the doc stays within the budget
    * (first-fit prefix; a doc that overshoots is skipped along with the
    * rest of the prefix, keeping the cut deterministic).
    *
    * Physical plan: one narrow pass computes exact integer token counts,
    * one shuffle partitions by lang for the running-sum window, filter,
    * output. The per-language sort is the scale cost; at 100 TB the
    * standing fix is a two-pass threshold estimate (sample the hash
    * distribution, pick the cutoff hash per lang, then a shuffle-free
    * filter like x31), trading exactness of the budget fill for a scan.
    * Languages without a budget row are excluded (budget 0).
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val budget = TokenBudgets.foldLeft(lit(0L)) {
      case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"),
        hashHex.as("h"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"), col("doc_id"))
  }

  val MixtureSampleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_tokens,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM toks)
      |SELECT doc_id, lang, n_tokens, cum_tokens
      |FROM c
      |WHERE cum_tokens <= CASE lang WHEN 'en' THEN 4000
      |                              WHEN 'de' THEN 2000
      |                              WHEN 'fr' THEN 2000 ELSE 0 END
      |ORDER BY lang, cum_tokens, doc_id""".stripMargin

  /** x47: temperature-based multilingual rebalancing — the mC4/XLM-R
    * α-sampling that flattens the language distribution toward uniform:
    * keep probability p_l = √(n_min / n_l), so each language retains
    * ~√(n_min·n_l) docs (the α = 0.5 temperature) and the smallest
    * language is kept whole. α is pinned to 0.5 BECAUSE it makes the
    * weights exact: sqrt and divide are correctly-rounded IEEE ops, so
    * `floor(p_l·2³²)` is the identical BIGINT threshold in both engines
    * (a general n^(α−1) routes through libm pow — the rows-only
    * bucket — for no curation benefit over the standard 0.5 setting).
    * The gate is the x39-proven numeric hex cast: keep iff
    * u32(md5(doc_id)[0:8]) < threshold(lang) — deterministic, RNG-free,
    * reproducible under any partitioning.
    *
    * Physical plan: one tiny per-language count aggregate broadcast
    * back onto a single scan+filter pass — rate changes re-run in scan
    * time at any corpus size. Thresholds depend on corpus-level counts
    * BY DESIGN (rebalancing is a corpus-level decision), unlike x44's
    * growth-stable split gate.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val thr = counts
      .crossJoin(broadcast(counts.agg(min(col("n_l")).as("n_min"))))
      .withColumn("thr",
        floor(sqrt(col("n_min").cast("double")) / sqrt(col("n_l").cast("double"))
          * lit(4294967296.0)).cast("long"))
      .select(col("lang"), col("thr"))
    docs.join(broadcast(thr), "lang")
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"))
      .filter(col("h") < col("thr"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val TemperatureSampleSql: String =
    """WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
      |mn AS (SELECT MIN(n_l) AS n_min FROM c),
      |t AS (SELECT lang,
      |        CAST(floor(sqrt(CAST(n_min AS DOUBLE)) / sqrt(CAST(n_l AS DOUBLE))
      |          * 4294967296.0) AS BIGINT) AS thr
      |      FROM c, mn)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN t ON d.lang = t.lang
      |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < t.thr
      |ORDER BY d.doc_id""".stripMargin

  /** x77: x47's rebalancing at ARBITRARY temperature — here the real
    * mC4 default α = 0.3 — keep rate `p_l = (n_min/n_l)^(1−α)` via the
    * deterministic [[graft.functions.DetMath]] pair:
    * `exp2((1−α)·log2(n_min/n_l))`. x47 pinned α to 0.5 because a
    * general power routed through libm `pow` (the rows-only bucket);
    * DetMath removes that constraint, so the threshold
    * `floor(p_l·2³²)` is the identical BIGINT in both engines at any
    * α and the gate stays the x39-proven md5 hex compare. Same
    * physical plan as x47: one tiny per-language aggregate broadcast
    * onto a single scan+filter.
    */
  val TemperatureAlpha = 0.3

  def temperatureSampleAlpha(spark: SparkSession, dir: String,
      alpha: Double = TemperatureAlpha): DataFrame = {
    require(alpha > 0 && alpha < 1, "temperature alpha in (0, 1)")
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    // native det_exp2/det_log2 (one codegen'd call each): the Column
    // MIRRORS of the same step sequence would tree-duplicate into a
    // plan too large for codegen once projection collapse inlined them
    // into the per-document stage (measured 4.3 s interpreted vs 0.4 s
    // for x47 at sf0.1)
    val thr = counts
      .crossJoin(broadcast(counts.agg(min(col("n_l")).as("n_min"))))
      .withColumn("ratio", col("n_min").cast("double") / col("n_l").cast("double"))
      .withColumn("xa",
        lit(1.0 - alpha) * graft.plans.DetMathExprs.detLog2(spark, "ratio"))
      .withColumn("pl", graft.plans.DetMathExprs.detExp2(spark, "xa"))
      .withColumn("thr", floor(col("pl") * lit(4294967296.0)).cast("long"))
      .select(col("lang"), col("thr"))
    docs.join(broadcast(thr), "lang")
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"))
      .filter(col("h") < col("thr"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[temperatureSampleAlpha]] — the same DetMath step
    * sequences over the same count model.
    */
  def temperatureSampleAlphaSql(alpha: Double): String = {
    import graft.functions.DetMath
    val lg = DetMath.log2Sql("ratio")
    val e2 = DetMath.exp2Sql("xa")
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
       |mn AS (SELECT MIN(n_l) AS n_min FROM c),
       |r0 AS (SELECT lang,
       |         CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE) AS ratio
       |       FROM c, mn),
       |x0 AS (SELECT lang, CAST('${1.0 - alpha}' AS DOUBLE) * $lg AS xa FROM r0),
       |t AS (SELECT lang, CAST(floor($e2 * 4294967296.0) AS BIGINT) AS thr
       |      FROM x0)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN t ON d.lang = t.lang
       |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < t.thr
       |ORDER BY d.doc_id""".stripMargin
  }

  lazy val TemperatureSampleAlphaSql: String =
    temperatureSampleAlphaSql(TemperatureAlpha)

  /** x72: per-source document cap — the "no feed dominates the mix"
    * gate that complements x47 (per-LANGUAGE rebalancing): each source
    * keeps at most 15 documents, chosen best-first by x10's quality
    * tier with the md5(doc_id) hex as the deterministic shuffle-within-
    * tier (so the survivors are a quality-stratified random-looking
    * sample, not the lowest doc_ids) and doc_id as the final total-
    * order tiebreak. One ranking window partitioned by source — the
    * shuffle key is the source, quality comes from the cached x10
    * relation, and no text moves. Rank arithmetic is exact integers;
    * the md5 hex ordering is the same ASCII comparison in both engines.
    */
  def sourceCapSample(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScore(spark, dir).select(col("doc_id"), col("quality_score"))
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val ranked = d.join(q, "doc_id")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("quality_score").desc, col("h"), col("doc_id"))))
    ranked.filter(col("rank") <= 15)
      .select(col("source"), col("rank"), col("doc_id"), col("quality_score"))
      .orderBy(col("source"), col("rank"))
  }

  val SourceCapSampleSql: String =
    s"""WITH q AS (${TextAnalysis.QualityScoreSql}),
       |r AS (
       |  SELECT d.source, d.doc_id, q.quality_score,
       |    ROW_NUMBER() OVER (PARTITION BY d.source
       |      ORDER BY q.quality_score DESC,
       |               md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rank
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id)
       |SELECT source, rank, doc_id, quality_score
       |FROM r WHERE rank <= 15
       |ORDER BY source, rank""".stripMargin
}
