package graft.operators

import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language identification,
  * quality scoring, token counting, and document fingerprinting
  * (extension tier, SURVEY.md §2.3).
  *
  * All metrics are integer counts or ratios of integer counts — computed
  * with codegen'd built-ins (split / regexp / array HOFs), no UDFs —
  * so results are deterministic and oracle-reproducible, and every
  * operator is a scan + one (or two) hash aggregates that scale linearly.
  */
object TextAnalysis {

  /** Corpus-trained n-gram language ID: build a top-20 character-trigram
    * profile per labeled language, score each document by how many of its
    * distinct trigrams appear in each profile, predict the argmax
    * (ties → alphabetical). Two aggregation passes + one broadcast join
    * of the (languages × 20)-row profile — the classic "train tiny model
    * on the cluster, broadcast it back" shape that holds at any corpus
    * size.
    */
  /** Session-scoped cache of the per-(doc, trigram) count relation. */
  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Session-scoped cache of the per-doc langId verdict (x9's output):
    * doc-count-sized, and both x9 and x29's confusion matrix read it —
    * without it the confusion matrix re-runs the profile build + score
    * join + ranking windows that sit above the gram cache.
    */
  private val langIdCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Release the session's cached gram relations (see
    * [[Metrics.unpersistEvents]] for when to call).
    */
  def unpersistGrams(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    gramCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(gramCache.remove(k)).foreach(_.unpersist())
    }
    langIdCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(langIdCache.remove(k)).foreach(_.unpersist())
    }
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = langIdCache.computeIfAbsent((spark, dir), key => {
      SessionCaches.onApplicationEnd(spark)(() => langIdCache.remove(key))
      langIdUncached(spark, dir).persist()
    })
    verdicts.orderBy(col("doc_id"))
  }

  /** Top-20 character trigrams per language from the cached per-doc
    * gram counts — the tiny broadcast profile shared by x9 (whole-doc
    * language ID) and x69 (per-half code-switch detection).
    */
  private def corpusProfile(docGramCounts: DataFrame): DataFrame =
    docGramCounts.groupBy(col("lang").as("profile_lang"), col("g"))
      .agg(sum(col("freq")).as("freq"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("profile_lang"))
        .orderBy(col("freq").desc, col("g"))))
      .filter(col("rn") <= 20)
      .select(col("profile_lang"), col("g"))

  /** Cached per-(doc, trigram) counts. lower(text) is hoisted OUT of
    * the per-trigram lambda — inside it, it re-lowercases the whole
    * document per extracted gram (O(len²)). One explode + ONE
    * aggregation, persisted per (session, sf) like the dedup signature
    * cache: all downstream consumers (corpus profile + per-doc distinct
    * grams, x9/x29/x69) read the aggregate instead of re-running the
    * trigram explode over the full corpus — the explode is the linear
    * hot spot, everything after it is ~distinct-grams-sized — and
    * repeated calls don't re-persist.
    */
  private def docGramCountsOf(spark: SparkSession, dir: String): DataFrame =
    gramCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => gramCache.remove(k))
      // one-pass native trigram generator: the substr-per-position form
      // is O(len²)/doc (each substr re-seeks the UTF-8 string); the
      // generator emits byte slices in O(len), and yields nothing for
      // <3-char texts exactly like the oracle's generate_series(1, len-2)
      graft.plans.CharTrigramsExpr.register(spark)
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), lower(col("text")).as("lt"))
        .select(col("doc_id"), col("lang"), expr("char_trigrams(lt)").as("g"))
        .groupBy(col("doc_id"), col("lang"), col("g"))
        .agg(count(lit(1)).as("freq"))
        .persist()
    })

  private def langIdUncached(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docGramCounts = docGramCountsOf(spark, dir)
    val profile = corpusProfile(docGramCounts)
    val docGrams = docGramCounts.select(col("doc_id"), col("g"))
    val scores = docGrams.join(broadcast(profile), Seq("g"))
      .groupBy(col("doc_id"), col("profile_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("profile_lang"))
    val predicted = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("profile_lang").as("predicted"), col("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(predicted, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("predicted"), lit("unknown")).as("predicted"),
        coalesce(col("score"), lit(0L)).as("score"),
        (col("lang") === coalesce(col("predicted"), lit("unknown"))).as("correct"))
  }

  val LangIdSql: String =
    """WITH grams AS (
      |  SELECT doc_id, lang, substr(lower(text), i, 3) AS g
      |  FROM documents,
      |       LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 2, 0))) AS i)),
      |profile AS (
      |  SELECT profile_lang, g FROM (
      |    SELECT lang AS profile_lang, g, COUNT(*) AS freq,
      |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rn
      |    FROM grams GROUP BY lang, g)
      |  WHERE rn <= 20),
      |docgrams AS (SELECT DISTINCT doc_id, g FROM grams),
      |scores AS (
      |  SELECT doc_id, profile_lang, COUNT(*) AS score
      |  FROM docgrams JOIN profile USING (g)
      |  GROUP BY doc_id, profile_lang),
      |predicted AS (
      |  SELECT doc_id, profile_lang AS predicted, score FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |             ORDER BY score DESC, profile_lang) AS rn
      |    FROM scores)
      |  WHERE rn = 1)
      |SELECT d.doc_id, d.lang,
      |  COALESCE(p.predicted, 'unknown') AS predicted,
      |  COALESCE(p.score, 0) AS score,
      |  d.lang = COALESCE(p.predicted, 'unknown') AS correct
      |FROM documents d LEFT JOIN predicted p ON p.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality scoring: length, mean word length, stopword ratio,
    * type-token ratio, and a composite score — the standard cheap
    * pre-filter signals of a training-data pipeline. Pure per-row
    * expressions (no shuffle at all except the final presentation sort).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stop = Stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("bigint"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> array_contains($stop, t)))").cast("bigint"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("bigint"))
      .select(
        col("doc_id"), col("n_chars"), col("n_words"),
        (col("n_chars").cast("double") / col("n_words").cast("double")).as("avg_word_len"),
        (col("n_stop").cast("double") / col("n_words").cast("double")).as("stopword_ratio"),
        (col("n_distinct").cast("double") / col("n_words").cast("double")).as("type_token_ratio"),
        (when(col("n_words") >= 20, 1).otherwise(0)
          + when(col("n_stop") > 0, 1).otherwise(0)
          + when(col("n_distinct").cast("double") / col("n_words").cast("double") > 0.5, 1)
            .otherwise(0)).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val QualityScoreSql: String = {
    val stop = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, n_chars,
       |    string_split(trim(lower(text)), ' ') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, n_chars,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS BIGINT) AS n_stop,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
       |  FROM t)
       |SELECT doc_id, n_chars, n_words,
       |  CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_len,
       |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stopword_ratio,
       |  CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS type_token_ratio,
       |  (CASE WHEN n_words >= 20 THEN 1 ELSE 0 END
       |   + CASE WHEN n_stop > 0 THEN 1 ELSE 0 END
       |   + CASE WHEN CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.5
       |          THEN 1 ELSE 0 END) AS quality_score
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / single other chars) per document, plus
    * per-language totals via a rollup-style second aggregate.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_ws_tokens", size(TextOps.tokens(col("text"))).cast("bigint"))
      .withColumn("n_bpe_tokens",
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("bigint"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).as("ws_tokens"),
        sum(col("n_bpe_tokens")).as("bpe_tokens"))
      .orderBy(col("lang"))

  val TokenCountSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(trim(lower(text)), ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Approximate-distinct sketch tier: HyperLogLog++ cardinalities per
    * language — distinct documents, sources, and word-shingle estimate —
    * alongside the exact distinct-doc count for error inspection.
    *
    * This is the sketch path a 100 TB profile pass runs INSTEAD of exact
    * distincts: `approx_count_distinct` is a fixed-size mergeable buffer
    * (map-side combined, one sketch per group crossing the shuffle),
    * where exact distinct on a high-cardinality column shuffles every
    * distinct value. Sketch values are engine-specific, so this query
    * has no DuckDB oracle (driver records a rows-only check); the spec
    * asserts the estimate lands within HLL++'s documented error of the
    * exact count.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Corpus.shingleRows(spark, dir)
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs_exact"),
        approx_count_distinct(col("doc_id")).as("n_docs_approx"),
        approx_count_distinct(col("source")).as("n_sources_approx"),
        approx_count_distinct(col("shingle")).as("n_shingles_approx"))
      .orderBy(col("lang"))

  /** x16b: DETERMINISTIC HyperLogLog — the hash-gateable twin of x16
    * (whose `approx_count_distinct` reads Spark-internal HLL++
    * registers no other engine can reproduce). Same estimator family,
    * engine-neutral primitives only:
    *  - hash = md5 (the x48 rule); register index = first 3 hex chars
    *    (p = 12, m = 4096); rank = leading-zero count of the next 32
    *    bits + 1, computed by HEX-STRING arithmetic (strip leading
    *    '0's with an anchored regex both engines parse identically,
    *    then a 4-case nibble table) — never a float;
    *  - registers sum as EXACT BIGINTs: Σ 2^(33−M_j) (+ 2³³ per empty
    *    register), so the harmonic mean has no float-accumulation
    *    order to diverge;
    *  - raw estimate = α·m²·2³³ / Z_int (ONE divide of a literal);
    *    small-range branch (E ≤ 2.5m, empty registers exist) =
    *    m·ln(m/V) through det_log2 — both branches pinned IEEE
    *    sequences, so the ESTIMATE ITSELF hash-gates, not just the
    *    registers.
    * The doc-count estimates exercise the linear-counting branch and
    * the shingle estimates the raw-HLL branch at every sf. Merge-
    * ability is the groupBy itself (register max is associative);
    * memory is m rows per group before the final fold.
    */
  private val HllM = 4096L
  private val HllAlphaM2Pow33: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    alpha * HllM * HllM * 8589934592.0 // α·m²·2³³
  }

  private def hllEstimate(spark: SparkSession, vals: DataFrame,
      salt: String): DataFrame = {
    graft.plans.DetMathExprs.register(spark)
    val nib = conv(substring(col("stripped"), 1, 1), 16, 10).cast("long")
    val reg = vals
      .withColumn("hex", md5(concat(lit(salt), col("v"))))
      .withColumn("idx", conv(substring(col("hex"), 1, 3), 16, 10).cast("long"))
      .withColumn("tail", substring(col("hex"), 4, 8))
      .withColumn("stripped", regexp_replace(col("tail"), "^0*", ""))
      .withColumn("n0", lit(8L) - length(col("stripped")).cast("long"))
      .withColumn("rank", when(col("n0") === 8L, lit(33L))
        .otherwise(lit(4L) * col("n0")
          + when(nib >= 8L, 0L).when(nib >= 4L, 1L)
            .when(nib >= 2L, 2L).otherwise(3L)
          + lit(1L)))
      .groupBy(col("lang"), col("idx")).agg(max(col("rank")).as("m_j"))
    reg.groupBy(col("lang"))
      .agg(count(lit(1)).as("occ"),
        sum(expr("shiftleft(cast(1 as bigint), cast(33 - m_j as int))"))
          .as("z_occ"))
      .withColumn("zs",
        col("z_occ") + (lit(HllM) - col("occ")) * lit(8589934592L))
      .withColumn("e_raw", lit(HllAlphaM2Pow33) / col("zs").cast("double"))
      .withColumn("v_", lit(HllM) - col("occ"))
      .withColumn("ratio", lit(HllM.toDouble) / col("v_").cast("double"))
      .withColumn("est",
        when(col("e_raw") <= lit(2.5 * HllM) && col("v_") > 0L,
          lit(HllM.toDouble) * (expr("det_log2(ratio)") * lit(PromQL.Ln2)))
          .otherwise(col("e_raw")))
      .select(col("lang"), col("est"), col("occ"))
  }

  def approxDistinctDet(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir)
    val docs = hllEstimate(spark,
      sh.select(col("lang"), col("doc_id").cast("string").as("v")).distinct(),
      "hlld|").toDF("lang", "n_docs_est", "docs_registers")
    val shingles = hllEstimate(spark,
      sh.select(col("lang"), col("shingle").as("v")).distinct(),
      "hlls|").toDF("lang", "n_shingles_est", "shingle_registers")
    val exact = sh.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs_exact"),
        countDistinct(col("shingle")).as("n_shingles_exact"))
    exact.join(docs, "lang").join(shingles, "lang")
      .select(col("lang"), col("n_docs_exact"), col("n_docs_est"),
        col("docs_registers"), col("n_shingles_exact"),
        col("n_shingles_est"), col("shingle_registers"))
      .orderBy(col("lang"))
  }

  /** Oracle twin of [[approxDistinctDet]] — identical hex-string rank
    * arithmetic, exact-integer register sums, and estimator branches.
    */
  lazy val ApproxDistinctDetSql: String = {
    val lg = graft.functions.DetMath.log2Sql("ratio")
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    def est(src: String, salt: String): String =
      s"""(
         |  WITH h AS (
         |    SELECT lang, md5(concat('$salt', v)) AS hex FROM $src),
         |  rk AS (
         |    SELECT lang,
         |      CAST(concat('0x', substr(hex, 1, 3)) AS BIGINT) AS idx,
         |      8 - length(regexp_replace(substr(hex, 4, 8), '^0*', ''))
         |        AS n0,
         |      regexp_replace(substr(hex, 4, 8), '^0*', '') AS stripped
         |    FROM h),
         |  rr AS (
         |    SELECT lang, idx,
         |      CASE WHEN n0 = 8 THEN 33
         |           ELSE 4 * n0
         |             + (CASE WHEN CAST(concat('0x', substr(stripped || '0', 1, 1))
         |                            AS BIGINT) >= 8 THEN 0
         |                     WHEN CAST(concat('0x', substr(stripped || '0', 1, 1))
         |                            AS BIGINT) >= 4 THEN 1
         |                     WHEN CAST(concat('0x', substr(stripped || '0', 1, 1))
         |                            AS BIGINT) >= 2 THEN 2
         |                     ELSE 3 END)
         |             + 1 END AS rank
         |    FROM rk),
         |  reg AS (SELECT lang, idx, MAX(rank) AS m_j FROM rr GROUP BY 1, 2),
         |  fold AS (
         |    SELECT lang, COUNT(*) AS occ,
         |      CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - m_j AS INT)) AS BIGINT)
         |        AS z_occ
         |    FROM reg GROUP BY 1),
         |  fin AS (
         |    SELECT lang, occ,
         |      z_occ + ($HllM - occ) * 8589934592 AS zs,
         |      $HllM - occ AS v_
         |    FROM fold),
         |  fin2 AS (
         |    SELECT lang, occ, v_,
         |      ${d(HllAlphaM2Pow33)} / CAST(zs AS DOUBLE) AS e_raw,
         |      ${d(HllM.toDouble)} / CAST(v_ AS DOUBLE) AS ratio
         |    FROM fin)
         |  SELECT lang,
         |    CASE WHEN e_raw <= ${d(2.5 * HllM)} AND v_ > 0
         |         THEN ${d(HllM.toDouble)} * (($lg) * ${d(PromQL.Ln2)})
         |         ELSE e_raw END AS est,
         |    occ
         |  FROM fin2)""".stripMargin
    s"""WITH sh AS (
       |  SELECT DISTINCT d.lang, sh0.doc_id, sh0.shingle
       |  FROM (${graft.functions.TextOps.shinglesSql("documents", 3)}) sh0
       |  JOIN documents d ON d.doc_id = sh0.doc_id),
       |docs_v AS (SELECT DISTINCT lang, CAST(doc_id AS VARCHAR) AS v FROM sh),
       |sh_v AS (SELECT DISTINCT lang, shingle AS v FROM sh),
       |de AS ${est("docs_v", "hlld|")},
       |se AS ${est("sh_v", "hlls|")},
       |ex AS (
       |  SELECT lang, COUNT(DISTINCT doc_id) AS n_docs_exact,
       |    COUNT(DISTINCT shingle) AS n_shingles_exact
       |  FROM sh GROUP BY 1)
       |SELECT ex.lang AS lang, n_docs_exact, de.est AS n_docs_est,
       |  de.occ AS docs_registers, n_shingles_exact,
       |  se.est AS n_shingles_est, se.occ AS shingle_registers
       |FROM ex JOIN de ON de.lang = ex.lang JOIN se ON se.lang = ex.lang
       |ORDER BY ex.lang""".stripMargin
  }

  /** Document fingerprinting (winnowing-lite): the 4 smallest distinct
    * md5 hashes of the document's word-3-gram shingles, concatenated and
    * re-hashed into one 128-bit fingerprint. Robust to local edits (a
    * changed shingle rarely displaces all 4 minima).
    *
    * Physical plan: one explode + ONE hash aggregate through the bounded
    * [[graft.functions.TopKMinAggregator]] — the ≤4-element buffer
    * combines map-side, so one tiny row per doc crosses the shuffle and
    * there is no distinct pass, no per-doc window, and no sort of the
    * exploded shingle set (round-1 plan was a global shuffle+sort; at
    * 100 TB that sort is the engine's worst bottleneck).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val top4 = udaf(graft.functions.TopKMinAggregator(4), Encoders.STRING)
    Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), md5(col("shingle")).as("h"))
      .groupBy(col("doc_id"))
      .agg(md5(top4(col("h"))).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  val FingerprintSql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, md5(shingle) AS h
       |  FROM (${TextOps.shinglesSql("documents", 3)})),
       |mins AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id, h,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
       |    FROM sh)
       |  WHERE rn <= 4)
       |SELECT doc_id,
       |  md5(list_aggregate(list_sort(list(h)), 'string_agg', '|')) AS fingerprint
       |FROM mins
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Repetition signals (Gopher-style quality filters): per document,
    * the duplicate-token fraction, the most-frequent-token fraction, and
    * the duplicate-word-3-gram fraction. Two independent map-side-
    * combinable aggregation chains (token counts; shingle counts off the
    * shared [[Corpus.shingleRows]] cache) joined on doc_id — no windows,
    * no per-doc sorts, every fraction an exact-integer ratio divided
    * once at the end.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val ta = tc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_c"))
    val sc = Corpus.shingleRows(spark, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), countDistinct(col("shingle")).as("n_sh_distinct"))
    ta.join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens").cast("double")).as("dup_token_frac"),
        (col("max_c").cast("double") / col("n_tokens").cast("double"))
          .as("top_token_frac"),
        coalesce((col("n_sh") - col("n_sh_distinct")).cast("double") /
          col("n_sh").cast("double"), lit(0.0)).as("dup_3gram_frac"))
      .orderBy(col("doc_id"))
  }

  val RepetitionSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS tok
       |  FROM documents),
       |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
       |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         COUNT(*) AS n_distinct, MAX(c) AS max_c
       |       FROM tc GROUP BY doc_id),
       |sc AS (SELECT doc_id, COUNT(*) AS n_sh,
       |         COUNT(DISTINCT shingle) AS n_sh_distinct
       |       FROM (${TextOps.shinglesSql("documents", 3)}) GROUP BY doc_id)
       |SELECT ta.doc_id AS doc_id, n_tokens,
       |  CAST(n_tokens - n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    AS dup_token_frac,
       |  CAST(max_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
       |  COALESCE(CAST(n_sh - n_sh_distinct AS DOUBLE) / CAST(n_sh AS DOUBLE),
       |    0.0) AS dup_3gram_frac
       |FROM ta LEFT JOIN sc ON sc.doc_id = ta.doc_id
       |ORDER BY doc_id""".stripMargin

  /** TF-IDF keyword extraction: top-3 tokens per document scored by
    * tf/df (document frequency weighting WITHOUT the logarithm — `ln`
    * is libm-dependent and breaks bit-reproducibility across engines;
    * the ranking it induces per document is identical since ln is
    * monotone and N is constant). Plan: one token-count aggregate, a
    * vocabulary-sized df relation joined back (broadcast-scale: df is
    * |vocabulary| rows, orders of magnitude below the corpus), one
    * ranking window partitioned by doc_id.
    */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // df is |vocabulary| rows — orders of magnitude below the corpus;
    // say so in the plan (BroadcastHashJoin) instead of relying on AQE
    val scored = tc.join(broadcast(df), Seq("tok"))
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))))
      .filter(col("rn") <= 3)
    scored.select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val TfidfKeywordsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS tok
      |  FROM documents),
      |tc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
      |scored AS (
      |  SELECT doc_id, tok, tf, df.df AS df,
      |    CAST(tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY CAST(tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC, tok) AS rn
      |  FROM tc JOIN df USING (tok))
      |SELECT doc_id, rn, tok, tf, df, score
      |FROM scored WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  /** Corpus-level heavy hitters: the 20 most frequent word-2-grams.
    * One explode + one map-side-combinable hash aggregate + a 20-row
    * ordered limit (TakeOrderedAndProject — no global sort of the gram
    * space). At 100 TB the same query swaps the exact aggregate for a
    * count-min/approx-top-k sketch; the exact form here doubles as its
    * accuracy oracle. The 2-gram explode itself is the shared
    * [[Corpus.shingleRows]] entry for n=2, so x19 and x23 pay for it
    * once per (session, sf), not once each.
    */
  def corpusNgrams(spark: SparkSession, dir: String): DataFrame =
    Corpus.shingleRows(spark, dir, 2)
      .select(col("shingle").as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(20)

  val CorpusNgramsSql: String =
    s"""SELECT shingle AS gram, COUNT(*) AS n
       |FROM (${TextOps.shinglesSql("documents", 2)})
       |GROUP BY shingle
       |ORDER BY n DESC, gram
       |LIMIT 20""".stripMargin

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-min-sketch heavy hitters: the sketch-tier twin of [[corpusNgrams]]
    * (x19). The sketch build is the distributed work — one explode + one
    * hash aggregate whose FIXED-SIZE buffer merges map-side (one
    * depth×width array per partition crosses the shuffle, vs one row per
    * distinct n-gram for the exact form). The exact top-20 then probes
    * the finished sketch (a 20-row broadcast lookup, not a hot path) so
    * the output exposes exact count, estimate, and the one-sided error.
    * Hash-gated: the sketch hashes on MD5 double-hashing (the x48 Bloom
    * idiom), so DuckDB reproduces every cell — estimates match exactly,
    * INCLUDING any collisions; the spec additionally pins the ≥-exact
    * guarantee and merge laws on random corpora.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val cms = udaf(graft.functions.CountMinAggregator(CmsDepth, CmsWidth),
      Encoders.STRING)
    // same cached 2-gram relation as the exact query — the sketch build
    // and its accuracy oracle share ONE corpus explode per (session, sf)
    val grams = Corpus.shingleRows(spark, dir, 2)
      .select(col("shingle").as("gram"))
    val sketch = grams.agg(cms(col("gram")).as("sketch"))
    val est = udf((sk: Seq[Long], g: String) =>
      graft.functions.CountMinAggregator.estimate(sk.toArray, g, CmsDepth, CmsWidth))
    corpusNgrams(spark, dir)
      .crossJoin(broadcast(sketch))
      .select(col("gram"), col("n"),
        est(col("sketch"), col("gram")).as("n_est"))
      .withColumn("overestimate", col("n_est") - col("n"))
      .orderBy(col("n").desc, col("gram"))
  }

  /** Oracle twin of [[cmsHeavyHitters]]: rebuilds the count-min cells
    * relationally — every gram's count summed into its `(d, (h1 + d·h2)
    * mod width)` cell — then probes the top-20 grams with the same MIN
    * over depth rows the Spark-side estimator takes. Exact integer sums
    * over the identical MD5-derived cell mapping, so the estimates (and
    * any collisions) hash-match bit for bit.
    */
  val CmsHeavyHittersSql: String =
    s"""WITH gc AS (
       |  SELECT shingle AS gram, COUNT(*) AS n
       |  FROM (${TextOps.shinglesSql("documents", 2)})
       |  GROUP BY shingle),
       |h AS (
       |  SELECT gram, n,
       |    CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) AS h1,
       |    CAST(concat('0x', substr(md5(gram), 9, 8)) AS BIGINT) AS h2
       |  FROM gc),
       |ds AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS d),
       |cells AS (
       |  SELECT ds.d, (h.h1 + ds.d * h.h2) % $CmsWidth AS pos, SUM(h.n) AS c
       |  FROM h CROSS JOIN ds GROUP BY 1, 2),
       |top AS (SELECT gram, n FROM gc ORDER BY n DESC, gram LIMIT 20),
       |est AS (
       |  SELECT t.gram, t.n, CAST(MIN(c.c) AS BIGINT) AS n_est
       |  FROM top t
       |  JOIN h ON h.gram = t.gram
       |  CROSS JOIN ds
       |  JOIN cells c ON c.d = ds.d AND c.pos = (h.h1 + ds.d * h.h2) % $CmsWidth
       |  GROUP BY t.gram, t.n)
       |SELECT gram, n, n_est, n_est - n AS overestimate
       |FROM est
       |ORDER BY n DESC, gram""".stripMargin

  /** Language-ID quality evaluation: the (true lang × predicted)
    * confusion matrix with per-cell accuracy — the audit a pipeline
    * runs on its classifier before trusting per-language routing, in
    * the same oracle gate as the classifier itself (like x25 for ANN).
    * One extra tiny aggregate over x9's per-doc output.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("correct", col("lang") === col("predicted"))
      .orderBy(col("lang"), col("predicted"))

  lazy val LangIdConfusionSql: String =
    s"""SELECT lang, predicted, COUNT(*) AS n_docs,
       |  lang = predicted AS correct
       |FROM ($LangIdSql)
       |GROUP BY lang, predicted
       |ORDER BY lang, predicted""".stripMargin

  val QsGamma = 1.02
  val QsWidth = 2048

  /** Quantile-sketch length profile per language: DDSketch-style
    * geometric-bucket sketches of document length (2 % relative error)
    * with the exact p50 alongside for error inspection — the quantile
    * member of the sketch tier (HLL x16, count-min x23). The sketch
    * aggregate is a fixed-size mergeable array (map-side combined,
    * one array per group per partition over the shuffle) where exact
    * `percentile` buffers every value; at 100 TB the sketch is the only
    * viable form, and this query IS its accuracy oracle. HASH-GATED:
    * bucket assignment binary-searches the shared `γ^i` power table
    * (exact containment) and the read-back is pure arithmetic over the
    * same table, so the DuckDB twin — a literal-bounds range join plus
    * the identical rank walk — reproduces every estimate bit for bit;
    * the specs additionally pin the relative-error bound and merge laws.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val qs = udaf(graft.functions.QuantileSketchAggregator(QsGamma, QsWidth),
      Encoders.scalaDouble)
    val est = udf((sk: Seq[Long], phi: Double) =>
      graft.functions.QuantileSketchAggregator.estimate(sk.toArray, phi, QsGamma))
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        qs(col("n_chars").cast("double")).as("sketch"),
        expr("percentile(n_chars, 0.5)").as("p50_exact"))
      .select(col("lang"), col("n_docs"), col("p50_exact"),
        est(col("sketch"), lit(0.5)).as("p50_est"),
        est(col("sketch"), lit(0.9)).as("p90_est"),
        est(col("sketch"), lit(0.99)).as("p99_est"))
      .withColumn("p50_rel_err",
        abs(col("p50_est") - col("p50_exact")) / col("p50_exact"))
      .orderBy(col("lang"))
  }

  /** Oracle twin of [[quantileSketch]]: the sketch cells rebuilt by a
    * range join against the shared `γ^i` literals (first row opens at
    * −∞ for the ≤1 clamp, last at +∞ for the top clamp), the estimate
    * by the identical rank walk and midpoint arithmetic. The literal
    * table stops at [[QsOracleBuckets]] buckets (γ^1199 ≈ 2×10¹⁰ —
    * no document length approaches it; the aggregator's own top clamp
    * at `width−1` = 2047 is equally unreachable).
    */
  val QsOracleBuckets = 1200

  lazy val QuantileSketchSql: String = {
    val p = graft.functions.QuantileSketchAggregator.powTable(QsGamma, QsWidth)
    def d(v: String): String = s"CAST('$v' AS DOUBLE)"
    val rows = (0 until QsOracleBuckets).map { i =>
      val jlo = if (i == 0) d("-inf") else d(p(i).toString)
      val jhi = if (i == QsOracleBuckets - 1) d("inf") else d(p(i + 1).toString)
      s"($i, $jlo, $jhi, ${d(p(i).toString)})"
    }.mkString(",")
    val gammaL = d(QsGamma.toString)
    val gp1L = d((QsGamma + 1.0).toString)
    s"""WITH bounds AS (SELECT * FROM (VALUES $rows) b(i, jlo, jhi, p)),
       |d AS (SELECT lang, n_chars, CAST(n_chars AS DOUBLE) AS x FROM documents),
       |tot AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    quantile_cont(n_chars, 0.5) AS p50_exact
       |  FROM d GROUP BY lang),
       |cells AS (
       |  SELECT d.lang, b.i, b.p, COUNT(*) AS c
       |  FROM d JOIN bounds b ON d.x >= b.jlo AND d.x < b.jhi
       |  GROUP BY 1, 2, 3),
       |cw AS (
       |  SELECT *, SUM(c) OVER (PARTITION BY lang ORDER BY i) AS cum
       |  FROM cells),
       |ph AS (SELECT * FROM (VALUES ('p50', '0.5'), ('p90', '0.9'),
       |       ('p99', '0.99')) p(nm, phi)),
       |est AS (
       |  SELECT lang, nm, (2.0 * p * $gammaL) / $gp1L AS est
       |  FROM (
       |    SELECT c.lang, ph.nm, c.p,
       |      ROW_NUMBER() OVER (PARTITION BY c.lang, ph.nm ORDER BY c.i) AS rn
       |    FROM cw c
       |    JOIN tot t ON t.lang = c.lang
       |    CROSS JOIN ph
       |    WHERE c.cum >= GREATEST(1, CAST(CEIL(CAST(ph.phi AS DOUBLE)
       |      * CAST(t.n_docs AS DOUBLE)) AS BIGINT)))
       |  WHERE rn = 1)
       |SELECT t.lang, t.n_docs, t.p50_exact,
       |  MAX(CASE WHEN e.nm = 'p50' THEN e.est END) AS p50_est,
       |  MAX(CASE WHEN e.nm = 'p90' THEN e.est END) AS p90_est,
       |  MAX(CASE WHEN e.nm = 'p99' THEN e.est END) AS p99_est,
       |  ABS(MAX(CASE WHEN e.nm = 'p50' THEN e.est END) - t.p50_exact)
       |    / t.p50_exact AS p50_rel_err
       |FROM tot t JOIN est e ON e.lang = t.lang
       |GROUP BY t.lang, t.n_docs, t.p50_exact
       |ORDER BY t.lang""".stripMargin
  }

  /** The pipeline DECISION layer: one keep/drop verdict per document
    * with the first failing reason, composed from the existing signal
    * operators — exact-dedup survivorship (x1), repetition fractions
    * (x17), and benchmark contamination (x20). This is the query an
    * actual training-data pipeline materializes as its filter manifest;
    * every input is a per-doc relation joined on doc_id (no signal is
    * recomputed — the three subtrees share the session caches), and the
    * verdict itself is pure per-row logic.
    */
  /** Session cache of the verdict manifest — exactly what a production
    * pipeline materializes (the docstring's "filter manifest"): x24
    * serves it, x70 folds it twice (drops + total), x90's heuristic
    * gate reads it, and the classifier's teacher label derives from it
    * — previously each consumer re-ran the three-way signal join.
    */
  private val verdictCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def unpersistVerdict(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    verdictCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(verdictCache.remove(k)).foreach(_.unpersist())
    }
  }

  def filterVerdict(spark: SparkSession, dir: String): DataFrame =
    verdictCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => verdictCache.remove(k))
      filterVerdictUncached(spark, dir).persist()
    })

  private def filterVerdictUncached(spark: SparkSession, dir: String): DataFrame = {
    val dedup = Dedup.exact(spark, dir).select(col("doc_id"), col("keep").as("dedup_keep"))
    val rep = repetition(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"), col("top_token_frac"))
    val contam = contamination(spark, dir)
      .select(col("doc_id"), col("contamination"))
    dedup
      .join(rep, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left") // benchmark slice itself has no row
      .na.fill(0.0, Seq("contamination"))
      .withColumn("reason",
        when(!col("dedup_keep"), "duplicate")
          .when(col("n_tokens") < 5, "too_short")
          .when(col("dup_token_frac") > 0.6, "repetitive")
          .when(col("top_token_frac") > 0.4, "dominated_by_one_token")
          .when(col("contamination") >= 0.5, "benchmark_contaminated")
          .otherwise("ok"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"),
        col("n_tokens"), col("dup_token_frac"), col("top_token_frac"),
        col("contamination"))
      .orderBy(col("doc_id"))
  }

  /** x70: the curation FUNNEL — x24's per-doc verdict rolled up into
    * the stage-by-stage survival report every dataset release leads
    * with: for each ordered gate (duplicate → too_short → repetitive →
    * dominated → contaminated), how many documents entered, were
    * dropped, and remain, with the per-stage drop rate. Because x24's
    * `reason` is the FIRST failing gate, the funnel is exact by
    * construction: entering(k) = total − Σ dropped(<k). Gates that drop
    * nothing still appear (static 5-row stage relation, left-joined),
    * so the report shape is schema-stable across corpora. Exact counts;
    * one divide per row.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val verdict = filterVerdict(spark, dir)
    val drops = verdict.groupBy(col("reason").as("stage"))
      .agg(count(lit(1)).as("dropped"))
    val stages = Seq(
      (1L, "duplicate"), (2L, "too_short"), (3L, "repetitive"),
      (4L, "dominated_by_one_token"), (5L, "benchmark_contaminated"))
      .toDF("stage_no", "stage")
    val total = verdict.agg(count(lit(1)).as("total"))
    val w = Window.orderBy(col("stage_no"))
      .rowsBetween(Window.unboundedPreceding, -1)
    stages.join(drops, Seq("stage"), "left")
      .na.fill(0L, Seq("dropped"))
      .crossJoin(broadcast(total))
      .withColumn("before", coalesce(sum(col("dropped")).over(w), lit(0L)))
      .select(col("stage_no"), col("stage"),
        (col("total") - col("before")).as("entering"),
        col("dropped"),
        (col("total") - col("before") - col("dropped")).as("remaining"),
        (col("dropped").cast("double") /
          (col("total") - col("before")).cast("double")).as("drop_rate"))
      .orderBy(col("stage_no"))
  }

  lazy val CurationFunnelSql: String =
    s"""WITH verdict AS (SELECT reason FROM ($FilterVerdictSql)),
       |drops AS (SELECT reason AS stage, COUNT(*) AS n FROM verdict GROUP BY 1),
       |stages(stage_no, stage) AS (VALUES
       |  (1, 'duplicate'), (2, 'too_short'), (3, 'repetitive'),
       |  (4, 'dominated_by_one_token'), (5, 'benchmark_contaminated')),
       |t AS (SELECT COUNT(*) AS total FROM verdict),
       |j AS (SELECT stage_no, stage, COALESCE(n, 0) AS dropped
       |      FROM stages LEFT JOIN drops USING (stage)),
       |c AS (SELECT *, COALESCE(SUM(dropped) OVER (ORDER BY stage_no
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |      FROM j)
       |SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
       |  CAST(total - before AS BIGINT) AS entering,
       |  CAST(dropped AS BIGINT) AS dropped,
       |  CAST(total - before - dropped AS BIGINT) AS remaining,
       |  CAST(dropped AS DOUBLE) / CAST(total - before AS DOUBLE) AS drop_rate
       |FROM c, t
       |ORDER BY stage_no""".stripMargin

  // lazy: references ContaminationSql, declared later in this object —
  // a plain val would interpolate null (object vals initialize in
  // declaration order)
  lazy val FilterVerdictSql: String =
    s"""WITH dedup AS (
       |  SELECT doc_id, keep AS dedup_keep FROM (${Dedup.ExactSql})),
       |rep AS (
       |  SELECT doc_id, n_tokens, dup_token_frac, top_token_frac
       |  FROM ($RepetitionSql)),
       |contam AS (SELECT doc_id, contamination FROM ($ContaminationSql)),
       |joined AS (
       |  SELECT d.doc_id AS doc_id, dedup_keep, n_tokens, dup_token_frac,
       |    top_token_frac, COALESCE(contamination, 0.0) AS contamination
       |  FROM dedup d
       |  JOIN rep USING (doc_id)
       |  LEFT JOIN contam USING (doc_id)),
       |verdict AS (
       |  SELECT *, CASE WHEN NOT dedup_keep THEN 'duplicate'
       |    WHEN n_tokens < 5 THEN 'too_short'
       |    WHEN dup_token_frac > 0.6 THEN 'repetitive'
       |    WHEN top_token_frac > 0.4 THEN 'dominated_by_one_token'
       |    WHEN contamination >= 0.5 THEN 'benchmark_contaminated'
       |    ELSE 'ok' END AS reason
       |  FROM joined)
       |SELECT doc_id, reason = 'ok' AS keep, reason, n_tokens,
       |  dup_token_frac, top_token_frac, contamination
       |FROM verdict
       |ORDER BY doc_id""".stripMargin

  /** Benchmark-contamination check: for every corpus document, the
    * fraction of its distinct word-3-grams that appear anywhere in the
    * "benchmark" set (here: the `src0` slice stands in for a held-out
    * eval suite). The benchmark n-gram set is small by nature (eval
    * suites are finite) → broadcast left-semi join against it; per-doc
    * counts are map-side combinable; no pairwise doc×doc work anywhere.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("source"), col("shingle")).distinct()
    val bench = sh.filter(col("source") === "src0").select(col("shingle")).distinct()
    val corpus = sh.filter(col("source") =!= "src0")
    val tot = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(bench), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    tot.join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"),
        (col("n_contaminated").cast("double") / col("n_shingles").cast("double")
          >= 0.5).as("flagged"))
      .orderBy(col("doc_id"))
  }

  val ContaminationSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, source,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |  FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
      |corpus AS (SELECT * FROM sh WHERE source <> 'src0'),
      |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
      |hits AS (
      |  SELECT doc_id, COUNT(*) AS n_contaminated
      |  FROM corpus WHERE shingle IN (SELECT shingle FROM bench)
      |  GROUP BY doc_id)
      |SELECT tot.doc_id AS doc_id, n_shingles,
      |  COALESCE(n_contaminated, 0) AS n_contaminated,
      |  CAST(COALESCE(n_contaminated, 0) AS DOUBLE)
      |    / CAST(n_shingles AS DOUBLE) AS contamination,
      |  CAST(COALESCE(n_contaminated, 0) AS DOUBLE)
      |    / CAST(n_shingles AS DOUBLE) >= 0.5 AS flagged
      |FROM tot LEFT JOIN hits ON hits.doc_id = tot.doc_id
      |ORDER BY doc_id""".stripMargin

  /** x41: PII detection + redaction (emails, IPv4s, phone-like digit
    * runs) — the scrubbing pass a training-data pipeline runs before
    * anything ships. Every pattern is lookaround- and
    * alternation-free, so Java regex (Spark codegen) and RE2 (the
    * DuckDB oracle) produce identical matches; the md5 of the fully
    * redacted text is IN the gate, pinning the actual three-stage
    * rewrite cross-engine — not just the counts. Counts are per
    * category over the RAW text (detection report); redaction chains
    * email → IP → phone so placeholder text is never re-matched. One
    * narrow per-row projection — no shuffle, no UDF: at 100 TB this
    * is a scan-speed rewrite job (x34's shape for text). The
    * synthetic corpus contains no PII, so counts are legitimately
    * zero at every sf; the planted-fixture spec pins the semantics.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}[.]\\d{1,3}[.]\\d{1,3}[.]\\d{1,3}\\b"
  val PhonePat = "[+]?\\d[\\d -]{7,}\\d"

  /** x48: Bloom-filter decontamination — the constant-memory scale
    * path for x20's eval-overlap check. x20 broadcasts the eval
    * shingle SET (fine while the benchmark fits in memory); here the
    * eval side collapses into a FIXED 2²⁰-bit Bloom bitset (16384
    * BIGINT words, 128 KB broadcast regardless of eval-set size), and
    * the corpus scan tests each shingle against k = 3 double-hashed
    * bit positions — the shape that survives an eval suite of any
    * size. False positives only ever OVER-flag (safe direction for
    * decontamination); at the fixture load the FP rate is ~(3n/2²⁰)³.
    *
    * Determinism/parity: positions are pure md5 arithmetic —
    * pos_j = (h1 + j·h2) mod 2²⁰ with h1/h2 the first/second 8 hex
    * chars as u32 (the x39-proven numeric hex cast) — and the bitset
    * build is bit_or of shifted BIGINTs: every step is exact integer
    * bit arithmetic, identical in both engines, so the whole operator
    * (false positives included) is oracle-exact. Words are 32-bit
    * (bit < 32 → values stay positive BIGINTs: DuckDB's checked `<<`
    * rejects the 64-bit sign bit, and positive-only words need no
    * two's-complement reasoning anywhere).
    */
  val BloomBits = 1 << 20
  val BloomWords: Int = BloomBits / 32
  val BloomK = 3

  /** The eval-set Bloom bitset of [[bloomContamination]] as its own
    * relation (ONE row, a 16384-word BIGINT list): the static side of
    * the streaming decontamination join — build once per eval-suite
    * release, broadcast into every corpus scan, batch or streaming.
    */
  def bloomBitset(spark: SparkSession, dir: String): DataFrame =
    bloomBitsetOf(Corpus.shingleRows(spark, dir)
      .filter(col("source") === "src0").select(col("shingle")))

  /** [[bloomBitset]] over ANY `shingle` relation — the benchmark slice
    * (x48), or the corpus's duplicated-shingle set (the boilerplate
    * firewall's static index).
    */
  def bloomBitsetOf(shingles: DataFrame): DataFrame = {
    val spark = shingles.sparkSession
    val hex = md5(col("shingle"))
    def pos(j: Int): Column =
      (col("_h1") + lit(j.toLong) * col("_h2")) % lit(BloomBits.toLong)
    val benchPos = shingles
      .select(col("shingle")).distinct()
      .withColumn("_h1", conv(substring(hex, 1, 8), 16, 10).cast("long"))
      .withColumn("_h2", conv(substring(hex, 9, 8), 16, 10).cast("long"))
      .select(explode(array((0 until BloomK).map(pos): _*)).as("pos"))
    val words = benchPos
      .select(expr("pos div 32").as("w"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("v"))
    spark.range(BloomWords).select(col("id").as("w"))
      .join(broadcast(words), Seq("w"), "left").na.fill(0L, Seq("v"))
      .agg(transform(sort_array(collect_list(struct(col("w"), col("v")))),
        e => e("v")).as("bits"))
  }

  /** Static index for the streaming boilerplate firewall: the corpus's
    * CROSS-document duplicated 3-gram set (x74's `dup` relation)
    * collapsed into the fixed 128 KB bloom bitset — broadcastable at
    * any corpus size, the price being bloom false positives, which
    * only over-scrub (the safe direction, as with x48).
    */
  def dupShingleBitset(spark: SparkSession, dir: String): DataFrame =
    bloomBitsetOf(Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("shingle")))

  /** STREAMING boilerplate firewall — x74's duplicate-span scrub as a
    * stream-static plan: documents arrive as `(doc_id, text)` and the
    * whole scrub evaluates ROW-LOCALLY against the broadcast
    * [[dupShingleBitset]], so the same plan runs batch or streaming in
    * append mode with no watermark and no stateful operator:
    *  1. ordered shingle hit flags via the bloom k-bit test (x48's
    *     in-row probe);
    *  2. run detection without a window function: shingle position p
    *     lies in a ≥[[ScrubMinRun]] hit run iff SOME 5-window
    *     [j, j+4] ∋ p is fully hit — two nested bounded HOF scans;
    *  3. token t is scrubbed iff a covered shingle starts in
    *     [t−2, t].
    * Output schema matches x74 (`n_tokens`/`n_kept`/`n_scrubbed`/
    * `scrubbed_md5`); the spec pins stream ≡ batch ≡ x74 on an
    * FP-free fixture. Semantics: scrubs boilerplate KNOWN to the
    * index — spans a new doc shares only with itself are admitted
    * until the index is rebuilt (the incremental-curation contract,
    * like x32's prior-snapshot dedup).
    */
  def boilerplateFirewall(docs: DataFrame, bitset: DataFrame): DataFrame = {
    val test = bloomTestExpr
    val r = ScrubMinRun
    // null-text docs are dropped, matching the batch twin's row
    // universe: x74's posexplode emits no row for a null token array,
    // while the HOF chain below would propagate nulls into a
    // null-filled output row — the stream ≡ batch law must hold on the
    // same row set
    docs.filter(col("text").isNotNull).crossJoin(broadcast(bitset))
      .withColumn("_toks", TextOps.tokens(col("text")))
      .withColumn("_sh", TextOps.shingles(col("text"), 3))
      .withColumn("_hits", expr(
        "transform(transform(_sh, s -> named_struct(" +
          "'h1', cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint), " +
          "'h2', cast(conv(substring(md5(s), 9, 8), 16, 10) as bigint)))," +
          s" h -> $test)"))
      .withColumn("_hit5", expr(
        s"transform(sequence(0, greatest(size(_hits) - $r, 0)), " +
          s"j -> j + $r <= size(_hits) AND forall(slice(_hits, j + 1, $r), x -> x))"))
      .withColumn("_covSh", expr(
        s"transform(sequence(0, greatest(size(_hits) - 1, 0)), " +
          s"p -> exists(slice(_hit5, greatest(p - ${r - 1}, 0) + 1, " +
          s"p - greatest(p - ${r - 1}, 0) + 1), x -> x))"))
      .withColumn("_kept", expr(
        "filter(transform(sequence(0, size(_toks) - 1), " +
          "t -> named_struct('t', t, 'tok', element_at(_toks, t + 1))), " +
          "s -> NOT exists(slice(_covSh, greatest(s.t - 2, 0) + 1, " +
          "s.t - greatest(s.t - 2, 0) + 1), x -> x))"))
      .select(col("doc_id"),
        size(col("_toks")).cast("bigint").as("n_tokens"),
        size(col("_kept")).cast("bigint").as("n_kept"),
        (size(col("_toks")) - size(col("_kept"))).cast("bigint").as("n_scrubbed"),
        md5(expr("array_join(transform(_kept, s -> s.tok), ' ')")).as("scrubbed_md5"))
  }

  /** Stateless per-row Bloom membership scoring of a `(doc_id, text)`
    * frame against a prebuilt [[bloomBitset]]: shingling, hashing, and
    * the k-bit tests all run as array HOFs INSIDE the row — no explode,
    * no aggregation, no state — so the same operator runs unchanged on
    * a STREAMING frame (stream-static broadcast join + projection, any
    * output mode, results emitted per micro-batch with no watermark).
    * This is the production decontamination shape: the eval bitset is
    * static, the corpus arrives continuously. Bit-identical to the
    * batch path (`StreamingSpec` pins streaming ≡ [[bloomContamination]]
    * on the same corpus).
    */
  def bloomScore(docs: DataFrame, bitset: DataFrame): DataFrame =
    bloomScored(docs, bitset)
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
        col("bloom_contamination"), col("flagged"))

  /** The k-bit bloom membership test over a lambda-bound
    * `named_struct('h1', …, 'h2', …)` variable `h` — the single
    * definition shared by every row-local bloom consumer (a silent
    * divergence here would break the firewall-vs-x74 and
    * gate-vs-x24 parity laws).
    */
  private def bloomTestExpr: String = (0 until BloomK).map { j =>
    s"(element_at(bits, cast((h.h1 + $j * h.h2) % $BloomBits div 32 as int) + 1)" +
      s" & shiftleft(1L, cast((h.h1 + $j * h.h2) % $BloomBits % 32 as int))) <> 0L"
  }.mkString(" AND ")

  /** [[bloomScore]] keeping the input columns (the streaming curation
    * gate needs `text` alongside the bloom columns without a second
    * pass over the stream).
    */
  private def bloomScored(docs: DataFrame, bitset: DataFrame): DataFrame = {
    val test = bloomTestExpr
    docs.crossJoin(broadcast(bitset))
      .withColumn("_sh", array_distinct(TextOps.shingles(col("text"), 3)))
      .withColumn("_hs", expr(
        "transform(_sh, s -> named_struct(" +
          "'h1', cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint), " +
          "'h2', cast(conv(substring(md5(s), 9, 8), 16, 10) as bigint)))"))
      .withColumn("n_shingles", size(col("_sh")).cast("bigint"))
      .withColumn("n_bloom_hits",
        expr(s"cast(size(filter(_hs, h -> $test)) as bigint)"))
      .withColumn("bloom_contamination",
        when(col("n_shingles") === 0L, lit(0.0))
          .otherwise(col("n_bloom_hits").cast("double") / col("n_shingles").cast("double")))
      .withColumn("flagged", col("bloom_contamination") >= 0.5)
      .drop("_sh", "_hs", "bits")
  }

  /** The curated corpus's digest→canonical index (x1's dedup key
    * space): one row per distinct normalized-text digest with the
    * winning doc_id. This is the STATIC side of the streaming
    * curation gate — series-count-sized, broadcastable.
    */
  def docDigestIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(trim(lower(col("text")))).as("digest"))
      .agg(min(col("doc_id")).as("canonical_id"))

  /** STREAMING curation verdict — x24's keep/drop cascade as a
    * stream-static plan (the firewall's admission gate run
    * continuously): documents arrive as `(doc_id, text)` and every
    * gate evaluates ROW-LOCALLY against broadcast static state, so
    * the same plan runs on a batch or streaming frame in append mode
    * with no watermark and no stateful operator:
    *  - `duplicate`: normalized-text digest against the static
    *    [[docDigestIndex]] — keep iff the digest is unseen or this
    *    doc IS the canonical holder;
    *  - `too_short` / `repetitive` / `dominated_by_one_token`: x24's
    *    token thresholds from HOFs over the token array (no explode,
    *    no per-doc aggregate — `max_c` is the O(distinct²) in-row
    *    count, bounded by document length);
    *  - `benchmark_contaminated`: the bloom firewall's row-local
    *    k-bit membership score against the static eval bitset (x48's
    *    streaming path; exact x20 contamination needs the corpus-side
    *    join, which a per-row gate trades away for ≥0.5-threshold
    *    parity on FP-free corpora).
    * Same cascade order and thresholds as x24
    * (`filterVerdict`); `StreamingSpec` pins stream ≡ batch on the
    * same corpus and batch ≡ x24's verdict on a bloom-FP-free
    * fixture.
    */
  def curationGate(docs: DataFrame, digestIndex: DataFrame,
      bitset: DataFrame): DataFrame = {
    val scored = bloomScored(docs, bitset)
      .withColumn("_toks", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("_toks")).cast("bigint"))
      .withColumn("_n_distinct", size(array_distinct(col("_toks"))).cast("bigint"))
      .withColumn("_max_c", expr(
        "array_max(transform(array_distinct(_toks), t -> size(filter(_toks, x -> x = t))))")
        .cast("bigint"))
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("_n_distinct")).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("top_token_frac",
        col("_max_c").cast("double") / col("n_tokens").cast("double"))
      .withColumn("_digest", md5(trim(lower(col("text")))))
    scored
      .join(broadcast(digestIndex), col("_digest") === col("digest"), "left")
      .withColumn("dedup_keep",
        col("canonical_id").isNull || col("canonical_id") === col("doc_id"))
      .withColumn("reason",
        when(!col("dedup_keep"), "duplicate")
          .when(col("n_tokens") < 5, "too_short")
          .when(col("dup_token_frac") > 0.6, "repetitive")
          .when(col("top_token_frac") > 0.4, "dominated_by_one_token")
          .when(col("bloom_contamination") >= 0.5, "benchmark_contaminated")
          .otherwise("ok"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"),
        col("n_tokens"), col("dup_token_frac"), col("top_token_frac"),
        col("bloom_contamination").as("contamination"))
  }

  def bloomContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("source"), col("shingle")).distinct()
    def withHashes(df: DataFrame): DataFrame = {
      val hex = md5(col("shingle"))
      df.withColumn("_h1", conv(substring(hex, 1, 8), 16, 10).cast("long"))
        .withColumn("_h2", conv(substring(hex, 9, 8), 16, 10).cast("long"))
    }
    val bitset = bloomBitset(spark, dir)
    // corpus side: k membership tests per shingle against the
    // broadcast bitset; a shingle is a hit iff ALL k bits are set
    val corpus = withHashes(sh.filter(col("source") =!= "src0"))
      .crossJoin(broadcast(bitset))
    val hitCol = (0 until BloomK).map { j =>
      element_at(col("bits"), (expr(s"(_h1 + $j * _h2) % ${BloomBits} div 32")
        + 1).cast("int"))
        .bitwiseAND(
          expr(s"shiftleft(1L, cast((_h1 + $j * _h2) % ${BloomBits} % 32 as int))")
        ) =!= 0L
    }.reduce(_ && _)
    val scored = corpus.withColumn("_hit", when(hitCol, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("_hit")).as("n_bloom_hits"))
    scored.select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
      (col("n_bloom_hits").cast("double") / col("n_shingles").cast("double"))
        .as("bloom_contamination"),
      (col("n_bloom_hits").cast("double") / col("n_shingles").cast("double")
        >= 0.5).as("flagged"))
      .orderBy(col("doc_id"))
  }

  val BloomContaminationSql: String = {
    def posSql(j: Int): String = s"((h1 + $j * h2) % 1048576)"
    def testSql(j: Int): String =
      s"(bits[(${posSql(j)} // 32) + 1] & (CAST(1 AS BIGINT) << CAST(${posSql(j)} % 32 AS INT))) <> 0"
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, source,
       |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |  FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
       |bp AS (
       |  SELECT ((CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT)
       |           + j * CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT))
       |          % 1048576) AS pos
       |  FROM bench, (SELECT unnest(generate_series(0, 2)) AS j)),
       |words AS (SELECT pos // 32 AS w,
       |            bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS v
       |          FROM bp GROUP BY 1),
       |dense AS (
       |  SELECT g.w, COALESCE(words.v, 0) AS v
       |  FROM (SELECT unnest(generate_series(0, 32767)) AS w) g
       |  LEFT JOIN words ON words.w = g.w),
       |bs AS (SELECT list(v ORDER BY w) AS bits FROM dense),
       |cp AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
       |    CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
       |  FROM sh WHERE source <> 'src0'),
       |scored AS (
       |  SELECT doc_id, COUNT(*) AS n_shingles,
       |    CAST(SUM(CASE WHEN ${testSql(0)} AND ${testSql(1)} AND ${testSql(2)}
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits
       |  FROM cp, bs GROUP BY doc_id)
       |SELECT doc_id, n_shingles, n_bloom_hits,
       |  CAST(n_bloom_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS bloom_contamination,
       |  CAST(n_bloom_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= 0.5 AS flagged
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** x49: contamination SPANS — the exact-substring strengthening of
    * x20's ratio: per corpus doc, the longest run of CONSECUTIVE
    * shingle positions hitting the eval set (a run of r 3-gram hits =
    * a shared substring of r+2 tokens, the signal the suffix-array
    * dedup literature flags; a high x20 ratio of scattered single
    * hits is benign in comparison). Gaps-and-islands over hit
    * positions: island = pos − row_number within doc, longest island
    * per doc. One broadcast semi-join + one per-doc window — no new
    * shuffle shape beyond x20 at any scale.
    */
  def contaminationSpans(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("source"), col("pos"), col("shingle"))
    val bench = sh.filter(col("source") === "src0")
      .select(col("shingle")).distinct()
    val corpus = sh.filter(col("source") =!= "src0")
    val hits = corpus.join(broadcast(bench), Seq("shingle"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = hits.withColumn("_grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(max(col("run")).as("longest_run"), sum(col("run")).as("n_hit"))
    val tot = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    tot.join(runs, Seq("doc_id"), "left")
      .na.fill(0L, Seq("longest_run", "n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"), col("longest_run"),
        (col("longest_run") >= 3).as("flagged_span"))
      .orderBy(col("doc_id"))
  }

  val ContaminationSpansSql: String =
    """WITH sh AS (
      |  SELECT doc_id, source, i AS pos,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |  FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
      |corpus AS (SELECT doc_id, pos, shingle FROM sh WHERE source <> 'src0'),
      |hits AS (SELECT doc_id, pos FROM corpus
      |         WHERE shingle IN (SELECT shingle FROM bench)),
      |g AS (SELECT doc_id,
      |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |      FROM hits),
      |runs AS (SELECT doc_id, grp, COUNT(*) AS run FROM g GROUP BY doc_id, grp),
      |agg AS (SELECT doc_id, CAST(MAX(run) AS BIGINT) AS longest_run,
      |          CAST(SUM(run) AS BIGINT) AS n_hit
      |        FROM runs GROUP BY doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id)
      |SELECT tot.doc_id AS doc_id, n_shingles,
      |  COALESCE(n_hit, 0) AS n_hit,
      |  COALESCE(longest_run, 0) AS longest_run,
      |  COALESCE(longest_run, 0) >= 3 AS flagged_span
      |FROM tot LEFT JOIN agg ON agg.doc_id = tot.doc_id
      |ORDER BY doc_id""".stripMargin

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    def n(pat: String) = size(regexp_extract_all(t, lit(pat), lit(0))).cast("bigint")
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      PhonePat, "<PHONE>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        n(EmailPat).as("n_emails"), n(Ipv4Pat).as("n_ips"),
        n(PhonePat).as("n_phones"),
        length(redacted).cast("bigint").as("redacted_len"),
        md5(redacted).as("redacted_md5"))
      .withColumn("clean",
        (col("n_emails") + col("n_ips") + col("n_phones")) === 0)
      .orderBy(col("doc_id"))
  }

  /** x42: context-window chunking — split each document into
    * fixed-size token windows (50 tokens, stride 40 → 10-token
    * overlap), the preprocessing step that turns documents into
    * training sequences. Pure per-row array work: `sequence` for the
    * chunk starts, `posexplode`, `slice` + `array_join` for the chunk
    * text — all codegen'd built-ins, fan-out ∝ tokens/stride, no
    * shuffle before the (optional) downstream consumer. Chunk md5s
    * are in the gate, pinning the exact text of every chunk
    * cross-engine.
    */
  val ChunkSize = 50
  val ChunkStride = 40

  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    chunkDocumentsOf(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Core of [[chunkDocuments]] over any `(doc_id, text)` frame —
    * entirely row-local (tokenize, window starts, slice, md5: all
    * codegen'd array ops, no aggregation), so the identical operator
    * runs on a STREAMING frame in Append mode with no state at all;
    * `StreamingSpec` pins streaming ≡ batch chunk md5s.
    */
  def chunkDocumentsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("bigint"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("toks"), col("n_words"),
        posexplode(expr(s"sequence(0L, n_words - 1L, ${ChunkStride}L)"))
          .as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        least(lit(ChunkSize.toLong), col("n_words") - col("s")).as("chunk_tokens"),
        md5(expr(s"array_join(slice(toks, cast(s + 1 as int), $ChunkSize), ' ')"))
          .as("chunk_md5"))

  val ChunkDocumentsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks,
       |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_words
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks, n_words, g.s AS s,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY g.s) - 1 AS chunk_idx
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, CAST(n_words AS INT) - 1, $ChunkStride)) AS s) g
       |  WHERE n_words > 0)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(LEAST($ChunkSize, n_words - s) AS BIGINT) AS chunk_tokens,
       |  md5(array_to_string(list_slice(toks, s + 1, s + $ChunkSize), ' ')) AS chunk_md5
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** x43: token-budget sequence packing — fill fixed 256-token bins
    * with documents in deterministic doc_id order WITHIN each language
    * shard (prefix-sum binning: a doc's bin = its preceding shard
    * tokens div budget — the streaming first-fit a packing worker
    * runs). The per-shard running sum is one window partitioned on the
    * shard key; at 100 TB the shard key is whatever unit feeds one
    * packing worker (per-partition packing), so the window never sees
    * more than a shard — exactly how production packers operate.
    * Reports per-bin doc count, token total, and budget utilization.
    */
  val PackBudget = 256

  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .withColumn("n_toks", size(TextOps.tokens(col("text"))).cast("bigint"))
      .withColumn("prefix", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prefix div $PackBudget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("bin_tokens"),
        (sum(col("n_toks")).cast("double") / lit(PackBudget.toDouble))
          .as("utilization"))
      .orderBy(col("lang"), col("bin"))
  }

  val TokenPackingSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |p AS (
       |  SELECT lang, n_toks,
       |    COALESCE(CAST(SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS prefix
       |  FROM d)
       |SELECT lang, prefix // $PackBudget AS bin,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS bin_tokens,
       |  CAST(CAST(SUM(n_toks) AS BIGINT) AS DOUBLE) / ${PackBudget}.0 AS utilization
       |FROM p
       |GROUP BY lang, bin
       |ORDER BY lang, bin""".stripMargin

  /** x57: n-gram typicality — a distribution-free boilerplate/noise
    * score: each document's mean corpus document-frequency over its
    * bigram occurrences, normalized by corpus size. Docs near 1 are
    * template boilerplate (every bigram appears everywhere), docs near
    * 1/N are lexical outliers (OCR junk, wrong-language slip-throughs)
    * — the two tails every curation pass trims, scored WITHOUT a
    * language model. Exact until the final division: DF counts and the
    * per-doc DF sum are BIGINTs, then two correctly-rounded divides
    * written identically in both engines (the x47 rule).
    *
    * Scale shape: one DF aggregate (map-side combinable) + one
    * gram-keyed join of occurrence rows against the DF relation + one
    * doc-keyed aggregate — all linear in token count, no broadcast of
    * anything corpus-sized; skewed high-DF grams split under AQE.
    * Short docs (< 2 tokens) have no bigrams and score 0 by definition.
    */
  def ngramTypicality(spark: SparkSession, dir: String): DataFrame = {
    val grams = Corpus.shingleRows(spark, dir, 2)
      .select(col("doc_id"), col("shingle"))
    val df = grams.distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val perDoc = grams.join(df, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("df")).as("sum_df"))
    val total = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "sum_df"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_grams"), col("sum_df"),
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("sum_df").cast("double") / col("n_grams").cast("double")
            / col("n_docs").cast("double")).as("typicality"))
      .orderBy(col("doc_id"))
  }

  val NgramTypicalitySql: String =
    s"""WITH g AS (SELECT doc_id, shingle FROM (${TextOps.shinglesSql("documents", 2)})),
       |dfq AS (
       |  SELECT shingle, COUNT(*) AS df
       |  FROM (SELECT DISTINCT doc_id, shingle FROM g) GROUP BY shingle),
       |pd AS (
       |  SELECT g.doc_id, COUNT(*) AS n_grams, CAST(SUM(df) AS BIGINT) AS sum_df
       |  FROM g JOIN dfq USING (shingle) GROUP BY g.doc_id),
       |t AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams,
       |  COALESCE(sum_df, 0) AS sum_df,
       |  CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
       |       ELSE CAST(sum_df AS DOUBLE) / CAST(n_grams AS DOUBLE)
       |            / CAST(n_docs AS DOUBLE) END AS typicality
       |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id CROSS JOIN t
       |ORDER BY d.doc_id""".stripMargin

  /** x56: shard manifest — the verifiable release artifact for the x43
    * packing: one row per (lang, bin) shard with its doc-id range,
    * exact token payload, and a CONTENT DIGEST (md5 of the ascending
    * '|'-joined doc_id list). A consumer re-derives the manifest from
    * its copy of the corpus and diffs digests to prove it holds exactly
    * the released shards — the manifest-file pattern every dataset
    * release ships, as a deterministic relation instead of a side file.
    *
    * Scale shape: same single lang-partitioned prefix-sum window as
    * x43, then one groupBy whose only wide value is the sorted doc-id
    * list of ONE shard (bounded by the token budget, not the corpus);
    * digests are 32 bytes per shard on the wire. Exact integers and
    * md5 only — hash-identical cross-engine.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .withColumn("n_toks", size(TextOps.tokens(col("text"))).cast("bigint"))
      .withColumn("prefix", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prefix div $PackBudget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("md5(array_join(transform(sort_array(collect_list(doc_id)), " +
          "x -> cast(x as string)), '|'))").as("content_md5"))
      .orderBy(col("lang"), col("bin"))
  }

  val ShardManifestSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, n_toks,
       |    COALESCE(CAST(SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS prefix
       |  FROM d)
       |SELECT lang, prefix // $PackBudget AS bin,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS shard_tokens,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id)) AS content_md5
       |FROM p
       |GROUP BY lang, bin
       |ORDER BY lang, bin""".stripMargin

  /** x44: deterministic train/val/test split — the reproducible-recipe
    * assignment every dataset release needs. The gate is the x31
    * fixed-width md5-hex threshold compare on doc_id (no RNG state, no
    * partition sensitivity): first hex byte < 'cc' → train (204/256 =
    * 79.7 %), < 'e6' → val (26/256 = 10.2 %), else test (10.2 %). A
    * doc's split never changes as the corpus grows — the property that
    * keeps eval sets uncontaminated across releases. One scan, no
    * shuffle before the final sort.
    */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h2", substring(md5(col("doc_id").cast("string")), 1, 2))
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks"),
        when(col("h2") < "cc", "train")
          .when(col("h2") < "e6", "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  val TrainValTestSplitSql: String =
    """SELECT doc_id, lang,
      |  CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** x84: split n-gram novelty — the MEMORIZATION view of eval
    * integrity, complementing x55's pair-level near-dup leakage: what
    * fraction of val/test bigrams (distinct, and by occurrence) never
    * appear in train? Near-zero novelty means the held-out splits are
    * distributionally memorized — perplexity "wins" on them are
    * leakage, not generalization; TOO-high novelty means the split
    * skewed topically and eval is off-distribution. Both tails are
    * release blockers the x51 count card cannot see.
    *
    * Exact integer counts + one correctly-rounded divide per fraction
    * → hash-exact. Scale: the shared 2-gram cache joins the x44 split
    * gate (computed in the scan, no extra pass); the train distinct
    * set is shingle-keyed — a standard big equi-join at any scale
    * (swap in an x48-style Bloom of the train set when a 128 KB
    * approximate membership is acceptable).
    */
  def splitNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir, 2)
      .select(col("doc_id"), col("shingle"))
    val split = Tables.documents(spark, dir)
      .withColumn("h2", substring(md5(col("doc_id").cast("string")), 1, 2))
      .select(col("doc_id"),
        when(col("h2") < "cc", "train")
          .when(col("h2") < "e6", "val")
          .otherwise("test").as("split"))
    val tagged = sh.join(split, "doc_id")
    val trainSet = tagged.filter(col("split") === "train")
      .select(col("shingle")).distinct()
      .withColumn("seen", lit(true))
    val eval_ = tagged.filter(col("split") =!= "train")
    val dist = eval_.select(col("split"), col("shingle")).distinct()
      .join(trainSet, Seq("shingle"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_distinct"),
        count(col("seen")).as("n_seen_distinct"))
    val occ = eval_
      .join(trainSet, Seq("shingle"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_occ"), count(col("seen")).as("n_seen_occ"))
    dist.join(occ, "split")
      .withColumn("novel_distinct_frac",
        (col("n_distinct") - col("n_seen_distinct")).cast("double")
          / col("n_distinct").cast("double"))
      .withColumn("novel_occ_frac",
        (col("n_occ") - col("n_seen_occ")).cast("double")
          / col("n_occ").cast("double"))
      .select(col("split"), col("n_distinct"), col("n_seen_distinct"),
        col("novel_distinct_frac"), col("n_occ"), col("n_seen_occ"),
        col("novel_occ_frac"))
      .orderBy(col("split"))
  }

  /** Oracle twin of [[splitNovelty]]. */
  lazy val SplitNoveltySql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, shingle
       |  FROM (${graft.functions.TextOps.shinglesSql("documents", 2)})),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
       |           THEN 'train'
       |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
       |           THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |tagged AS (SELECT sp.split, sh.shingle
       |           FROM sh JOIN sp ON sp.doc_id = sh.doc_id),
       |train AS (SELECT DISTINCT shingle FROM tagged WHERE split = 'train'),
       |ev AS (SELECT * FROM tagged WHERE split <> 'train'),
       |dist AS (
       |  SELECT d.split, COUNT(*) AS n_distinct,
       |    COUNT(t.shingle) AS n_seen_distinct
       |  FROM (SELECT DISTINCT split, shingle FROM ev) d
       |  LEFT JOIN train t ON t.shingle = d.shingle
       |  GROUP BY d.split),
       |occ AS (
       |  SELECT ev.split, COUNT(*) AS n_occ, COUNT(t.shingle) AS n_seen_occ
       |  FROM ev LEFT JOIN train t ON t.shingle = ev.shingle
       |  GROUP BY ev.split)
       |SELECT dist.split AS split, n_distinct, n_seen_distinct,
       |  CAST(n_distinct - n_seen_distinct AS DOUBLE)
       |    / CAST(n_distinct AS DOUBLE) AS novel_distinct_frac,
       |  n_occ, n_seen_occ,
       |  CAST(n_occ - n_seen_occ AS DOUBLE)
       |    / CAST(n_occ AS DOUBLE) AS novel_occ_frac
       |FROM dist JOIN occ ON occ.split = dist.split
       |ORDER BY dist.split""".stripMargin

  /** x51: the dataset-card release report — per-(language, split) doc
    * and token counts with ALL margins (per-language, per-split, grand
    * total) in ONE cube aggregation pass: the summary table every
    * dataset release publishes, composed from the x44 split gate and
    * the engine token convention. Exact integers only — no float
    * anywhere — and CUBE is a single shuffle producing every
    * granularity (the b18 rollup rule applied to the corpus tier); at
    * 100 TB this replaces 4 separate report scans with one.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h2", substring(md5(col("doc_id").cast("string")), 1, 2))
      .withColumn("split",
        when(col("h2") < "cc", "train")
          .when(col("h2") < "e6", "val").otherwise("test"))
      .withColumn("n_toks", size(TextOps.tokens(col("text"))).cast("bigint"))
      .cube(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .select(coalesce(col("lang"), lit("<all>")).as("lang"),
        coalesce(col("split"), lit("<all>")).as("split"),
        col("n_docs"), col("n_tokens"))
      .orderBy(col("lang"), col("split"))

  val DatasetCardSql: String =
    """WITH d AS (
      |  SELECT lang,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split,
      |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks
      |  FROM documents)
      |SELECT COALESCE(lang, '<all>') AS lang,
      |  COALESCE(split, '<all>') AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |FROM d
      |GROUP BY CUBE (lang, split)
      |ORDER BY lang, split""".stripMargin

  /** x54: per-language token-length percentile summary — the length
    * distribution every curation pass reads before picking truncation /
    * minimum-length thresholds (x10's gates) and the x42 chunk stride.
    * Percentiles are EXACT order statistics under the lower-index
    * convention: the value at 1-based rank `⌊p·(n−1)⌋ + 1` of the
    * (n_toks, doc_id)-sorted language partition — pure integer rank
    * arithmetic, no interpolation, no floats anywhere, so the result is
    * the same BIGINT in both engines (approx_percentile would be
    * neither exact nor cross-engine stable).
    *
    * Scale shape: one token-count scan (codegen'd split+size), one
    * shuffle on `lang` serving BOTH the rank window and the final
    * aggregate, output = |langs| rows. At 100 TB the per-language sort
    * is the cost — exactly the sort a real percentile demands; callers
    * that can tolerate error swap in the t-digest sketch tier.
    */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks"))
    val part = Window.partitionBy(col("lang"))
    val r = d
      .withColumn("rn",
        row_number().over(part.orderBy(col("n_toks"), col("doc_id"))).cast("bigint"))
      .withColumn("n", count(lit(1)).over(part))
    r.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("n_toks")).as("min_toks"),
        max(when(col("rn") === expr("(n - 1) div 2 + 1"), col("n_toks"))).as("p50_toks"),
        max(when(col("rn") === expr("(9 * (n - 1)) div 10 + 1"), col("n_toks"))).as("p90_toks"),
        max(when(col("rn") === expr("(99 * (n - 1)) div 100 + 1"), col("n_toks"))).as("p99_toks"),
        max(col("n_toks")).as("max_toks"))
      .orderBy(col("lang"))
  }

  val LengthPercentilesSql: String =
    """WITH d AS (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |r AS (
      |  SELECT lang, n_toks,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY n_toks, doc_id) AS BIGINT) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM d)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  MIN(n_toks) AS min_toks,
      |  MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN n_toks END) AS p50_toks,
      |  MAX(CASE WHEN rn = (9 * (n - 1)) // 10 + 1 THEN n_toks END) AS p90_toks,
      |  MAX(CASE WHEN rn = (99 * (n - 1)) // 100 + 1 THEN n_toks END) AS p99_toks,
      |  MAX(n_toks) AS max_toks
      |FROM r
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** x69: code-switch / mixed-language detection — x9 assigns ONE
    * language per document, which silently mislabels bilingual docs;
    * this scores the two HALVES of each document independently against
    * the same broadcast trigram profile and reports where the halves
    * disagree (the 2-segment form of per-chunk language ID; finer
    * segmentation is the same plan with more rows per doc). Split is
    * at ⌈len/2⌉ characters of the lowered text — pure integer
    * arithmetic, identical both engines; each half's prediction is the
    * deterministic x9 argmax (score desc, lang asc).
    *
    * Scale shape: one 2-row-per-doc projection (no corpus re-shuffle),
    * one trigram explode per half joined against the ~|langs|·20-row
    * broadcast profile, two thin windows — the same shapes as x9 with
    * a doubled explode constant; nothing new at 100 TB.
    */
  def langMix(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.CharTrigramsExpr.register(spark)
    val docs = Tables.documents(spark, dir)
    val profile = corpusProfile(docGramCountsOf(spark, dir))
    val halves = docs
      .select(col("doc_id"), col("lang"), lower(col("text")).as("lt"))
      .withColumn("mid", expr("cast(ceil(length(lt) / 2.0) as int)"))
      .select(col("doc_id"), col("lang"), explode(array(
        struct(lit("head").as("half"), expr("substring(lt, 1, mid)").as("ht")),
        struct(lit("tail").as("half"),
          expr("substring(lt, mid + 1, length(lt) - mid)").as("ht")))).as("h"))
      .select(col("doc_id"), col("lang"),
        col("h.half").as("half"), col("h.ht").as("ht"))
    val grams = halves
      .select(col("doc_id"), col("half"), expr("char_trigrams(ht)").as("g"))
      .distinct()
    val scores = grams.join(broadcast(profile), Seq("g"))
      .groupBy(col("doc_id"), col("half"), col("profile_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"), col("half"))
      .orderBy(col("score").desc, col("profile_lang"))
    // NOTE(r18 opt): checkpointing `pred` here was tried and measured
    // SLOWER (2.0 → 2.8 s) — the two side-joins' duplicated subtrees
    // already share their shuffles via ReuseExchange, so the
    // materialization only added a blocking action. Left lazy.
    val pred = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    def side(name: String): DataFrame = pred.filter(col("half") === name)
      .select(col("doc_id"), col("profile_lang").as(s"pred_$name"),
        col("score").as(s"${name}_score"))
    docs.select(col("doc_id"), col("lang"))
      .join(side("head"), Seq("doc_id"), "left")
      .join(side("tail"), Seq("doc_id"), "left")
      .na.fill("unknown", Seq("pred_head", "pred_tail"))
      .na.fill(0L, Seq("head_score", "tail_score"))
      .withColumn("split_agree", col("pred_head") === col("pred_tail"))
      .orderBy(col("doc_id"))
  }

  val LangMixSql: String =
    """WITH grams0 AS (
      |  SELECT doc_id, lang, substr(lower(text), i, 3) AS g
      |  FROM documents,
      |       LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 2, 0))) AS i)),
      |profile AS (
      |  SELECT profile_lang, g FROM (
      |    SELECT lang AS profile_lang, g, COUNT(*) AS freq,
      |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rn
      |    FROM grams0 GROUP BY lang, g)
      |  WHERE rn <= 20),
      |halves AS (
      |  SELECT doc_id, lang, half,
      |    CASE WHEN half = 'head' THEN substr(lt, 1, mid)
      |         ELSE substr(lt, mid + 1, length(lt) - mid) END AS ht
      |  FROM (SELECT doc_id, lang, lower(text) AS lt,
      |          CAST(ceil(length(lower(text)) / 2.0) AS INT) AS mid
      |        FROM documents),
      |       (SELECT unnest(['head', 'tail']) AS half)),
      |hgrams AS (
      |  SELECT DISTINCT doc_id, half, substr(ht, i, 3) AS g
      |  FROM halves,
      |       LATERAL (SELECT unnest(generate_series(1, greatest(length(ht) - 2, 0))) AS i)),
      |scores AS (
      |  SELECT doc_id, half, profile_lang, COUNT(*) AS score
      |  FROM hgrams JOIN profile USING (g)
      |  GROUP BY doc_id, half, profile_lang),
      |pred AS (
      |  SELECT doc_id, half, profile_lang, score FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, half
      |             ORDER BY score DESC, profile_lang) AS rn
      |    FROM scores)
      |  WHERE rn = 1)
      |SELECT d.doc_id, d.lang,
      |  COALESCE(h.profile_lang, 'unknown') AS pred_head,
      |  COALESCE(t.profile_lang, 'unknown') AS pred_tail,
      |  COALESCE(h.score, 0) AS head_score,
      |  COALESCE(t.score, 0) AS tail_score,
      |  COALESCE(h.profile_lang, 'unknown') = COALESCE(t.profile_lang, 'unknown')
      |    AS split_agree
      |FROM documents d
      |LEFT JOIN pred h ON h.doc_id = d.doc_id AND h.half = 'head'
      |LEFT JOIN pred t ON t.doc_id = d.doc_id AND t.half = 'tail'
      |ORDER BY d.doc_id""".stripMargin

  /** x59: corpus-internal duplicated-substring spans — the self-dedup
    * counterpart of x49 (which checks against a held-out eval set).
    * A 3-gram shingle is "duplicated" iff it occurs in ≥ 2 DISTINCT
    * documents (within-doc repetition is x17's signal, excluded here
    * by the distinct-doc frequency); per document, gaps-and-islands
    * over the duplicated positions yields the longest run — a run of
    * r consecutive 3-gram hits is an (r+2)-token substring shared
    * verbatim with another document, the span-level signal the
    * suffix-array dedup literature (Lee et al., "Deduplicating
    * Training Data") removes rather than dropping whole near-dup docs.
    * Flag threshold: run ≥ 5 ⇒ a ≥ 7-token verbatim shared substring
    * (deliberately stricter than x49's ≥ 3 — corpus self-overlap is
    * rampant in boilerplate; eval contamination is rare and precious).
    *
    * Scale shape: one distinct + count aggregate keyed on the shingle
    * (map-side combinable), one shingle-keyed semi-join of occurrence
    * rows against the duplicated set (corpus-sized — NEVER broadcast,
    * unlike x49's small bench side), one per-doc window + aggregate.
    * All shuffles key on content hashes or doc_id; text never moves.
    */
  def corpusDupSpans(spark: SparkSession, dir: String): DataFrame =
    corpusDupSpansOf(Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("pos"), col("shingle")))

  /** Core of [[corpusDupSpans]] over any `(doc_id, pos, shingle)`
    * occurrence relation (the property spec feeds it synthetic corpora
    * and checks the run lengths against a sequential reference).
    */
  def corpusDupSpansOf(sh: DataFrame): DataFrame = {
    val dup = sh.select(col("doc_id"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2).select(col("shingle"))
    val hits = sh.join(dup, Seq("shingle"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = hits.withColumn("_grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(max(col("run")).as("longest_dup_run"), sum(col("run")).as("n_dup"))
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(runs, Seq("doc_id"), "left")
      .na.fill(0L, Seq("longest_dup_run", "n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        col("longest_dup_run"),
        (col("longest_dup_run") >= 5).as("flagged_dup"))
      .orderBy(col("doc_id"))
  }

  val CorpusDupSpansSql: String =
    """WITH sh AS (
      |  SELECT doc_id, i AS pos,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
      |dup AS (
      |  SELECT shingle
      |  FROM (SELECT DISTINCT doc_id, shingle FROM sh)
      |  GROUP BY shingle HAVING COUNT(*) >= 2),
      |hits AS (SELECT doc_id, pos FROM sh
      |         WHERE shingle IN (SELECT shingle FROM dup)),
      |g AS (SELECT doc_id,
      |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |      FROM hits),
      |runs AS (SELECT doc_id, grp, COUNT(*) AS run FROM g GROUP BY doc_id, grp),
      |agg AS (SELECT doc_id, CAST(MAX(run) AS BIGINT) AS longest_dup_run,
      |          CAST(SUM(run) AS BIGINT) AS n_dup
      |        FROM runs GROUP BY doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
      |SELECT tot.doc_id AS doc_id, n_shingles,
      |  COALESCE(n_dup, 0) AS n_dup,
      |  COALESCE(longest_dup_run, 0) AS longest_dup_run,
      |  COALESCE(longest_dup_run, 0) >= 5 AS flagged_dup
      |FROM tot LEFT JOIN agg ON agg.doc_id = tot.doc_id
      |ORDER BY doc_id""".stripMargin

  /** x74: duplicate-span SCRUB — the transform x59 only measures
    * (suffix-array-literature boilerplate removal): every run of ≥ 5
    * consecutive corpus-duplicated 3-gram positions (= a ≥ 7-token
    * verbatim substring shared with another document) is REMOVED from
    * the token stream, in EVERY document carrying it — the
    * header/footer/license-scrub semantics; keep-one-copy semantics is
    * x28's survivor selection. Emits per doc the before/after token
    * counts and the md5 of the scrubbed text (kept tokens re-joined in
    * order), so consumers can verify the rewrite without shipping it.
    *
    * Scale shape: x59's shingle-keyed stages unchanged (dup set,
    * semi-join, gaps-and-islands); the covered-position explode is
    * ∝ scrubbed volume; the only text-bearing shuffle is the per-doc
    * token join/aggregate keyed on doc_id — unavoidable for a rewrite
    * — and what crosses the wire per doc afterwards is one 32-byte md5.
    */
  val ScrubMinRun = 5

  def spanScrub(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("pos"), col("shingle"))
    val dup = sh.select(col("doc_id"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2).select(col("shingle"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = sh.join(dup, Seq("shingle"), "left_semi")
      .withColumn("_grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"),
        count(lit(1)).as("run"))
      .filter(col("run") >= ScrubMinRun)
    // a run of shingles at positions s..e covers tokens s..e+2
    val covered = runs.select(col("doc_id"),
      explode(sequence(col("s"), col("e") + 2)).as("tok_pos")).distinct()
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("tok_pos", "tok")))
    val after = toks.join(covered, Seq("doc_id", "tok_pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("tok_pos").as("p"), col("tok").as("t")))),
          x => x.getField("t")), " ")).as("scrubbed_md5"))
    // n_tokens = the token-array size read off the scan — the explode+
    // count form re-ran the whole posexplode a second time for a number
    // the array already knows. The null-text filter preserves the
    // exploded form's row set (posexplode emits nothing for null).
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tokens"))
      .join(after, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        (col("n_tokens") - col("n_kept")).as("n_scrubbed"),
        coalesce(col("scrubbed_md5"), md5(lit(""))).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  val SpanScrubSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
       |dup AS (
       |  SELECT shingle
       |  FROM (SELECT DISTINCT doc_id, shingle FROM sh)
       |  GROUP BY shingle HAVING COUNT(*) >= 2),
       |g AS (SELECT doc_id, pos,
       |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |      FROM sh WHERE shingle IN (SELECT shingle FROM dup)),
       |runs AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) AS e
       |         FROM g GROUP BY doc_id, grp HAVING COUNT(*) >= $ScrubMinRun),
       |covered AS (
       |  SELECT DISTINCT doc_id, tok_pos
       |  FROM runs, LATERAL (SELECT unnest(generate_series(s, e + 2)) AS tok_pos)),
       |toks AS (
       |  SELECT doc_id, i - 1 AS tok_pos, toks[i] AS tok
       |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)),
       |kept AS (
       |  SELECT t.doc_id, t.tok_pos, t.tok FROM toks t
       |  WHERE NOT EXISTS (SELECT 1 FROM covered c
       |                    WHERE c.doc_id = t.doc_id AND c.tok_pos = t.tok_pos)),
       |after AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    md5(string_agg(tok, ' ' ORDER BY tok_pos)) AS scrubbed_md5
       |  FROM kept GROUP BY doc_id),
       |b AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
       |      FROM toks GROUP BY doc_id)
       |SELECT b.doc_id AS doc_id, n_tokens,
       |  COALESCE(n_kept, 0) AS n_kept,
       |  CAST(n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_scrubbed,
       |  COALESCE(scrubbed_md5, md5('')) AS scrubbed_md5
       |FROM b LEFT JOIN after USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** x60: BPE merge-candidate statistics — the counting step of
    * byte-pair-encoding tokenizer training: corpus-weighted frequencies
    * of adjacent character pairs inside words, reported as the top 20
    * merge candidates (count desc, pair asc — the first merge a BPE
    * trainer would perform is row 1). `n_words` is the number of
    * DISTINCT words containing the pair, separating "frequent because
    * one token dominates" from "frequent across the vocabulary".
    *
    * Scale shape — the reason this is Spark-shaped and not a driver
    * loop: pair GENERATION runs on the distinct-word VOCABULARY
    * (`groupBy word` first, map-side combinable, output vocab-sized ≪
    * corpus-sized), so the quadratic-ish explode of each word into its
    * pairs multiplies the vocabulary, not the corpus; the weighted
    * re-aggregation keys on the pair (tiny domain — alphabet²). A full
    * BPE trainer iterates this with a merged vocab; one iteration is
    * the oracle-checkable unit (the loop is driver-side over a
    * vocab-sized relation, the x37 pattern).
    */
  def bpePairStats(spark: SparkSession, dir: String): DataFrame =
    bpePairStatsOf(Tables.documents(spark, dir))

  /** Core of [[bpePairStats]] over any frame with a `text` column. */
  def bpePairStatsOf(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    words.filter(length(col("w")) >= 2)
      .select(col("w"), col("n"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("pair_count"),
        countDistinct(col("w")).as("n_words"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(20)
  }

  /** x65: one APPLIED BPE merge — the iteration x60 only counts.
    * The round-1 winner pair is fused into a single symbol (chr(1),
    * which cannot occur in text) across the whole vocabulary with a
    * literal left-to-right `replace` (exactly the BPE apply rule), and
    * the pair domain is recounted over the merged symbol sequences —
    * the top-10 of round 2 are the NEXT merge candidates, including
    * pairs that contain the new symbol (rendered as `[winner]` in the
    * readable `pair` column; `[` cannot occur in the corpus, so the
    * rendering is injective). Together with x60 this is a complete,
    * oracle-checkable BPE trainer step: the driver-side loop over the
    * vocab-sized relation (the x37 pattern) just repeats it.
    *
    * Scale shape: identical to x60 — both rounds run on the DISTINCT
    * vocabulary, the 1-row winner broadcasts, and the merge map
    * `w → replace(w, winner, chr(1))` is injective (chr(1) is fresh),
    * so weighted counts carry over unchanged.
    */
  def bpeMergeRound(spark: SparkSession, dir: String): DataFrame =
    bpeMergeRoundOf(Tables.documents(spark, dir))

  /** Core of [[bpeMergeRound]] over any frame with a `text` column. */
  def bpeMergeRoundOf(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    def pairsOf(ws: DataFrame): DataFrame = ws
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("n"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
    val top1 = pairsOf(words)
      .groupBy(col("pair")).agg(sum(col("n")).as("pc"))
      .orderBy(col("pc").desc, col("pair")).limit(1)
      .select(col("pair").as("merged"))
    val merged = words.crossJoin(broadcast(top1))
      .select(col("merged"),
        expr("replace(w, merged, chr(1))").as("w"), col("n"))
    pairsOf(merged.select(col("w"), col("n")))
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("pair_count"), countDistinct(col("w")).as("n_words"))
      .crossJoin(broadcast(top1))
      .select(col("merged"),
        expr("replace(pair, chr(1), concat('[', merged, ']'))").as("pair"),
        col("pair_count"), col("n_words"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(10)
  }

  /** Reserved symbol space for merged BPE symbols: round r fuses its
    * winner pair into the single char U+E000+r (Unicode private-use
    * area — cannot occur in corpus text). This replaces the former
    * chr(1..9) control-char scheme and its 9-merge ceiling: the PUA
    * alone seats 6,399 merges, which is a real sub-word vocabulary.
    * Spark's `chr()` is mod-256, so the symbol is injected as a Scala
    * string literal; the DuckDB twin's `chr()` is full-codepoint.
    */
  val BpeSymbolBase = 0xE000

  private[graft] def bpeSym(r: Int): String = (BpeSymbolBase + r).toChar.toString

  private def bpePairsOf(ws: DataFrame): DataFrame = ws
    .filter(length(col("w")) >= 2)
    .select(col("w"), col("n"),
      explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))

  /** The iterated BPE training loop shared by x66 (merge table) and x73
    * (encoder): `rounds` merges, each fusing the current winner pair
    * into its fresh PUA symbol and re-ranking. Returns the per-round
    * winner relations AND the final encoded vocabulary `(w0, w, n)` —
    * original word, merged symbol string, corpus count. The per-round
    * state is the VOCAB-sized `(w0, w, n)` relation, `localCheckpoint`ed
    * so round-N lineage stays constant-depth (the x37 law) — at 100 TB
    * the corpus is scanned ONCE (word count), and every later round
    * touches only the vocabulary.
    */
  /** Session-scoped cache of the training loop's result: x66, x73, and
    * x75 share one (merges, encoded-vocab) computation per (session,
    * sf, rounds) — the rounds × localCheckpoint loop runs once.
    */
  private val bpeStateCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), (Seq[DataFrame], DataFrame)]()

  private[graft] def bpeTrainState(spark: SparkSession, dir: String,
      rounds: Int): (Seq[DataFrame], DataFrame) =
    bpeStateCache.computeIfAbsent((spark, dir, rounds), k => {
      SessionCaches.onApplicationEnd(spark)(() => bpeStateCache.remove(k))
      bpeTrainStateUncached(spark, dir, rounds)
    })

  /** Drop this session's cached BPE training states (the backing
    * localCheckpoint blocks are swept by
    * [[graft.Graft.releaseCaches]]'s persistent-RDD pass).
    */
  def unpersistBpe(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    bpeStateCache.keySet.asScala.filter(_._1 eq spark)
      .foreach(bpeStateCache.remove(_))
    bpeDocsCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(bpeDocsCache.remove(k)).foreach(_.unpersist())
    }
  }

  private def bpeTrainStateUncached(spark: SparkSession, dir: String,
      rounds: Int): (Seq[DataFrame], DataFrame) = {
    require(rounds >= 1 && rounds <= 6399, "private-use-area symbol range")
    var words = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("w").as("w0"), col("w"), col("n"))
      .localCheckpoint()
    val merges = (1 to rounds).map { r =>
      val top1 = bpePairsOf(words)
        .groupBy(col("pair")).agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair")).limit(1)
        .select(lit(r.toLong).as("round"), col("pair").as("merged"),
          col("pair_count"))
        .localCheckpoint()
      words = words.crossJoin(broadcast(top1.select(col("merged"))))
        .select(col("w0"),
          replace(col("w"), col("merged"), lit(bpeSym(r))).as("w"), col("n"))
        .localCheckpoint()
      top1
    }
    (merges, words)
  }

  /** x66: the iterated BPE trainer's merge table. The registered 3-round
    * form is oracle-exact because the loop unrolls into SQL CTE stages
    * (the x35 pattern: fixed-round unroll checkable, arbitrary-round
    * loop is the production path); merge table rows render earlier
    * merged symbols injectively as `[k]` (`[` cannot occur in the
    * corpus).
    */
  val BpeTrainRounds = 3

  def bpeTrain(spark: SparkSession, dir: String,
      rounds: Int = BpeTrainRounds): DataFrame = {
    val (merges, _) = bpeTrainState(spark, dir, rounds)
    val rendered = (rounds to 1 by -1).foldLeft(col("merged")) { (e, k) =>
      replace(e, lit(bpeSym(k)), lit(s"[$k]"))
    }
    merges.reduce(_ unionAll _)
      .select(col("round"), rendered.as("merged"), col("pair_count"))
      .orderBy(col("round"))
  }

  /** x73: the BPE ENCODER — x66's merge table APPLIED to the corpus
    * (the step the trainer exists for). Each document's words are
    * mapped through the trained vocabulary to int token-id arrays
    * (`ArrayType(IntegerType)`): a base character encodes as its
    * codepoint, the round-r merged symbol as 256+r (a contiguous id
    * space above the byte ids, as a real byte-level BPE tokenizer
    * assigns them). Emits per doc the id sequence (dash-rendered for
    * the oracle hash), token counts, and the compression ratio over
    * raw characters — the tokenizer-quality metric that pairs with
    * x11's whitespace count. Decode is the exact inverse (expand
    * symbols in reverse round order); the spec pins the round-trip law
    * and a 12-round run past the old 9-merge ceiling.
    *
    * Scale shape: merges apply to the DISTINCT vocabulary (vocab-sized
    * relations, winner rows broadcast), never to the corpus; documents
    * then join to the encoded vocab on the word (broadcast — a token
    * vocabulary is bounded at any corpus size), so the corpus-sized
    * stages are one word explode + one per-doc aggregate, and the only
    * text that shuffles is the dash-rendered id string grouped by its
    * own doc_id.
    */
  val BpeEncodeRounds = 8

  /** Session-scoped cache of the ENCODED CORPUS under the frozen
    * 8-round tokenizer: one `(doc_id, source, n_words, n_chars, ids)`
    * row per document, persisted once per (session, sf). x73 (per-doc
    * stats), x75 (per-language rollup), and x93 (token-gram
    * decontamination) all read it, so the corpus-sized word explode +
    * broadcast vocab join + per-doc ordered fold runs ONCE per session
    * instead of three times — the in-session analog of the
    * materialized token-id table every training pipeline keeps next to
    * its corpus.
    */
  private val bpeDocsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def bpeEncodedDocs(spark: SparkSession,
      dir: String): DataFrame =
    bpeDocsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => bpeDocsCache.remove(k))
      encodedDocsUncached(spark, dir, BpeEncodeRounds).persist()
    })

  /** Silver swap for the encoded corpus (the materialized token-id
    * table a production pipeline keeps on disk): point the cache at
    * the parquet copy — x73/x75/x93 consume it unchanged.
    */
  private[graft] def seedBpeDocs(spark: SparkSession, dir: String,
      silver: DataFrame): Unit = {
    require(silver.columns.toSeq ==
      Seq("doc_id", "source", "n_words", "n_chars", "ids"),
      s"silver bpe-docs schema ${silver.columns.toSeq}")
    bpeDocsCache.put((spark, dir), silver)
    SessionCaches.onApplicationEnd(spark)(() =>
      bpeDocsCache.remove((spark, dir)))
  }

  private def encodedDocsUncached(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    val (_, vocab) = bpeTrainState(spark, dir, rounds)
    val enc = vocab.select(col("w0").as("word"),
      expr("transform(sequence(1, length(w)), i -> " +
        s"CASE WHEN ascii(substring(w, i, 1)) >= $BpeSymbolBase " +
        s"THEN 256 + ascii(substring(w, i, 1)) - $BpeSymbolBase " +
        "ELSE ascii(substring(w, i, 1)) END)").as("ids"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "word")))
      .filter(length(col("word")) >= 1)
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        expr("flatten(transform(sort_array(collect_list(struct(pos, ids))), x -> x.ids))")
          .as("ids"))
  }

  def bpeEncode(spark: SparkSession, dir: String,
      rounds: Int = BpeEncodeRounds): DataFrame = {
    // the frozen-tokenizer form reads the shared cached encoding;
    // other round counts (the spec's 12-round run) build uncached
    val docs =
      if (rounds == BpeEncodeRounds) bpeEncodedDocs(spark, dir)
      else encodedDocsUncached(spark, dir, rounds)
    docs
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        size(col("ids")).cast("long").as("n_bpe_tokens"),
        (col("n_chars").cast("double") / size(col("ids")).cast("double"))
          .as("compression"),
        array_join(transform(col("ids"), x => x.cast("string")), "-")
          .as("ids_str"))
      .orderBy(col("doc_id"))
  }

  /** x75: per-language tokenizer FERTILITY over x73's encoding — the
    * "which languages does this tokenizer underserve" audit every
    * multilingual release runs: per language, total chars / BPE tokens
    * (compression) and BPE tokens per word (fertility; high fertility =
    * the merge table was trained on someone else's script). Reuses the
    * session-cached training state, so x73+x75 together pay for ONE
    * training loop; the rollup itself is a language-keyed hash
    * aggregate over per-doc exact integers, with the two ratios divided
    * once per language row.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("compression"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))

  /** x94: the release-to-release DIFF manifest — what a dataset v2
    * publishes next to x56's shard manifest: every document classified
    * added / removed / changed / unchanged between two corpus
    * snapshots, rolled up per source with a verifiable digest of each
    * class's id set. The diff is computed HONESTLY from content
    * digests (full-outer join of per-snapshot md5 relations — the
    * simulation rule below only BUILDS the prior, it never classifies);
    * the prior snapshot is simulated on the one driver table by the
    * x32 convention: doc_id % 10 == 8 docs are missing from the prior
    * (→ added), % 10 == 9 docs are missing from the CURRENT release
    * (→ removed), % 10 == 7 docs carried a half-truncated text in the
    * prior (→ changed — the re-crawl-extended-the-page case).
    *
    * Scale: two digest projections (32 B/doc) + one full-outer
    * digest join + one per-(source, class) hash aggregate — text never
    * shuffles; the class digests make the manifest row itself
    * verifiable against either snapshot.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    // null text digests as the empty string: md5(NULL) is NULL, and a
    // NULL fp_a would route a doc present in BOTH snapshots down the
    // 'added' branch — the digest must be total for the CASE ladder
    val prior = docs.filter(col("doc_id") % 10 =!= 8)
      .select(col("doc_id"), col("source").as("source_a"),
        md5(coalesce(when(col("doc_id") % 10 === 7,
          expr("substr(text, 1, cast(length(text) div 2 as int))"))
          .otherwise(col("text")), lit(""))).as("fp_a"))
    val curr = docs.filter(col("doc_id") % 10 =!= 9)
      .select(col("doc_id"), col("source").as("source_b"),
        md5(coalesce(col("text"), lit(""))).as("fp_b"))
    prior.join(curr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("source_b"), col("source_a")).as("source"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy(col("source"), col("change"))
      .agg(count(lit(1)).as("n_docs"),
        expr("md5(array_join(transform(sort_array(collect_list(doc_id)), " +
          "x -> cast(x as string)), '|'))").as("ids_md5"))
      .orderBy(col("source"), col("change"))
  }

  val SnapshotDiffSql: String =
    """WITH prior AS (
      |  SELECT doc_id, source AS source_a,
      |    md5(COALESCE(CASE WHEN doc_id % 10 = 7
      |             THEN substr(text, 1, CAST(length(text) // 2 AS INT))
      |             ELSE text END, '')) AS fp_a
      |  FROM documents WHERE doc_id % 10 <> 8),
      |curr AS (
      |  SELECT doc_id, source AS source_b, md5(COALESCE(text, '')) AS fp_b
      |  FROM documents WHERE doc_id % 10 <> 9),
      |f AS (
      |  SELECT COALESCE(prior.doc_id, curr.doc_id) AS doc_id,
      |    COALESCE(source_b, source_a) AS source,
      |    CASE WHEN fp_a IS NULL THEN 'added'
      |         WHEN fp_b IS NULL THEN 'removed'
      |         WHEN fp_a <> fp_b THEN 'changed'
      |         ELSE 'unchanged' END AS change
      |  FROM prior FULL OUTER JOIN curr USING (doc_id))
      |SELECT source, change, COUNT(*) AS n_docs,
      |  md5(string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id)) AS ids_md5
      |FROM f
      |GROUP BY source, change
      |ORDER BY source, change""".stripMargin

  /** x98: EVAL-side contamination exposure — x20 flipped to the
    * decision it actually powers: when training data leaks an eval
    * item, the remedy at release time is usually to DROP THE EVAL ITEM
    * (the corpus is already trained on, or too expensive to re-filter),
    * so the report must be per eval doc, not per corpus doc: for every
    * `src0` (eval) document, the fraction of ITS distinct 3-gram
    * shingles that appear anywhere in the training corpus (`exposure`),
    * the number of distinct corpus documents carrying any of them
    * (`n_carriers` — the blast radius), and the `compromised` verdict
    * at exposure ≥ ½. Scale: the eval side is eval-suite-sized and
    * broadcasts; the join is shingle-keyed so cost ∝ shared content;
    * both counts are exact distinct aggregates.
    */
  def evalContamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Corpus.shingleRows(spark, dir)
      .select(col("doc_id"), col("source"), col("shingle")).distinct()
    val bench = sh.filter(col("source") === "src0")
      .select(col("doc_id").as("eval_id"), col("shingle"))
    val corpus = sh.filter(col("source") =!= "src0")
      .select(col("shingle"), col("doc_id").as("carrier"))
    val tot = bench.groupBy(col("eval_id")).agg(count(lit(1)).as("n_shingles"))
    val j = broadcast(bench).join(corpus, Seq("shingle"))
    val hits = j.groupBy(col("eval_id"))
      .agg(countDistinct(col("shingle")).as("n_hit"),
        countDistinct(col("carrier")).as("n_carriers"))
    tot.join(hits, Seq("eval_id"), "left")
      .na.fill(0L, Seq("n_hit", "n_carriers"))
      .select(col("eval_id"), col("n_shingles"), col("n_hit"), col("n_carriers"),
        (col("n_hit").cast("double") / col("n_shingles").cast("double"))
          .as("exposure"),
        (col("n_hit").cast("double") / col("n_shingles").cast("double") >= 0.5)
          .as("compromised"))
      .orderBy(col("eval_id"))
  }

  lazy val EvalContaminationSql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, source,
       |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |  FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i)),
       |bench AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE source = 'src0'),
       |corpus AS (SELECT shingle, doc_id AS carrier FROM sh WHERE source <> 'src0'),
       |tot AS (SELECT eval_id, COUNT(*) AS n_shingles FROM bench GROUP BY eval_id),
       |hits AS (
       |  SELECT eval_id, COUNT(DISTINCT b.shingle) AS n_hit,
       |    COUNT(DISTINCT carrier) AS n_carriers
       |  FROM bench b JOIN corpus c ON c.shingle = b.shingle
       |  GROUP BY eval_id)
       |SELECT tot.eval_id AS eval_id, n_shingles,
       |  COALESCE(n_hit, 0) AS n_hit, COALESCE(n_carriers, 0) AS n_carriers,
       |  (CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE))
       |    AS exposure,
       |  (CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= 0.5)
       |    AS compromised
       |FROM tot
       |LEFT JOIN hits ON hits.eval_id = tot.eval_id
       |ORDER BY tot.eval_id""".stripMargin

  /** x95: release drift — the population-stability index (PSI) between
    * the x94 snapshots, per source: token-length distributions binned
    * (width 10, capped at 20 — 21 bins), add-one smoothed shares, and
    * `PSI = Σ (q_i − p_i)·log2(q_i/p_i)` in BITS through DetMath (the
    * engine-wide no-libm rule; the classic PSI uses ln — one constant
    * factor away, stated here so thresholds translate). This is the
    * companion to x94's id-level diff: x94 says WHICH docs changed,
    * x95 says whether the SHAPE of the corpus moved (a re-crawl that
    * doubles average page length shifts every downstream filter).
    *
    * Determinism: exact bin counts, one divide per share, one divide +
    * det_log2 + multiply per term, nano-bit BIGINT term sums. Scale:
    * two skinny scans + one (source, bin) hash aggregate; the bin
    * relation is O(sources · 21).
    */
  def releaseDrift(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.DetMathExprs.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks"),
        expr("size(split(trim(lower(substr(text, 1, cast(length(text) div 2 as int)))), ' '))")
          .cast("bigint").as("n_toks_half"))
    val prior = docs.filter(col("doc_id") % 10 =!= 8)
      .select(col("source"),
        when(col("doc_id") % 10 === 7, col("n_toks_half"))
          .otherwise(col("n_toks")).as("n_toks"))
      .withColumn("bin", least(expr("n_toks div 10"), lit(20L)).cast("int"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("c_p"))
    val curr = docs.filter(col("doc_id") % 10 =!= 9)
      .withColumn("bin", least(expr("n_toks div 10"), lit(20L)).cast("int"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("c_q"))
    val tp = prior.groupBy(col("source")).agg(sum(col("c_p")).as("n_p"))
    val tq = curr.groupBy(col("source")).agg(sum(col("c_q")).as("n_q"))
    // the FULL 21-bin grid per source: absent bins still carry their
    // add-one smoothed shares (p = 1/(n_p+21) vs q = 1/(n_q+21) differ
    // whenever the snapshot totals do), so the sum really is the
    // 21-bin smoothed PSI — a sparse join would silently drop them
    val bins = spark.range(0, 21).select(col("id").cast("int").as("bin"))
    val joined = tp.join(tq, "source").crossJoin(bins)
      .join(prior, Seq("source", "bin"), "left").na.fill(0L, Seq("c_p"))
      .join(curr, Seq("source", "bin"), "left").na.fill(0L, Seq("c_q"))
      .withColumn("p", (col("c_p") + 1).cast("double") /
        (col("n_p") + lit(21L)).cast("double"))
      .withColumn("q", (col("c_q") + 1).cast("double") /
        (col("n_q") + lit(21L)).cast("double"))
      .withColumn("r", col("q") / col("p"))
      .withColumn("nano", floor(((col("q") - col("p")) *
        graft.plans.DetMathExprs.detLog2C(col("r"))) * lit(1e9) + lit(0.5)))
    joined.groupBy(col("source"))
      .agg(max(col("n_p")).as("n_prior"), max(col("n_q")).as("n_current"),
        sum(col("nano")).as("_sn"))
      .select(col("source"), col("n_prior"), col("n_current"),
        (col("_sn").cast("double") / lit(1e9)).as("psi_bits"))
      .orderBy(col("source"))
  }

  lazy val ReleaseDriftSql: String = {
    val lg = graft.functions.DetMath.log2Sql("r")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks,
       |    CAST(len(string_split(trim(lower(substr(text, 1,
       |      CAST(length(text) // 2 AS INT)))), ' ')) AS BIGINT) AS n_toks_half
       |  FROM documents),
       |prior AS (
       |  SELECT source,
       |    CAST(LEAST((CASE WHEN doc_id % 10 = 7 THEN n_toks_half
       |                     ELSE n_toks END) // 10, 20) AS INT) AS bin,
       |    COUNT(*) AS c_p
       |  FROM d WHERE doc_id % 10 <> 8 GROUP BY 1, 2),
       |curr AS (
       |  SELECT source, CAST(LEAST(n_toks // 10, 20) AS INT) AS bin,
       |    COUNT(*) AS c_q
       |  FROM d WHERE doc_id % 10 <> 9 GROUP BY 1, 2),
       |tp AS (SELECT source, CAST(SUM(c_p) AS BIGINT) AS n_p FROM prior GROUP BY 1),
       |tq AS (SELECT source, CAST(SUM(c_q) AS BIGINT) AS n_q FROM curr GROUP BY 1),
       |bins AS (SELECT CAST(unnest(generate_series(0, 20)) AS INT) AS bin),
       |j AS (
       |  SELECT g.source, g.bin,
       |    COALESCE(c_p, 0) AS c_p, COALESCE(c_q, 0) AS c_q, n_p, n_q
       |  FROM (SELECT tp.source, n_p, n_q, bin
       |        FROM tp JOIN tq ON tq.source = tp.source CROSS JOIN bins) g
       |  LEFT JOIN prior ON prior.source = g.source AND prior.bin = g.bin
       |  LEFT JOIN curr ON curr.source = g.source AND curr.bin = g.bin),
       |t AS (
       |  SELECT j.source,
       |    (CAST(c_p + 1 AS DOUBLE) / CAST(n_p + 21 AS DOUBLE)) AS p,
       |    (CAST(c_q + 1 AS DOUBLE) / CAST(n_q + 21 AS DOUBLE)) AS q,
       |    n_p, n_q
       |  FROM j),
       |n AS (
       |  SELECT source, n_p, n_q, (q / p) AS r, (q - p) AS dq FROM t),
       |s AS (
       |  SELECT source, MAX(n_p) AS n_prior, MAX(n_q) AS n_current,
       |    CAST(SUM(CAST(FLOOR(((dq * ($lg)) * 1e9) + 0.5) AS BIGINT)) AS BIGINT) AS sn
       |  FROM n GROUP BY source)
       |SELECT source, n_prior, n_current,
       |  (CAST(sn AS DOUBLE) / 1e9) AS psi_bits
       |FROM s
       |ORDER BY source""".stripMargin
  }

  /** x93: TOKEN-level decontamination — x20/x48 check word-shingle
    * overlap, but eval contamination is judged on what the MODEL sees:
    * token-id sequences under the frozen tokenizer. A paraphrase that
    * re-spaces or re-punctuates can slip a word-3-gram check yet
    * tokenize back to the same id run (and vice versa: BPE merges make
    * token grams cross word boundaries). Here every document is
    * encoded with the frozen x73 BPE (8 rounds), its ordered id
    * sequence sliced into token 5-grams (md5'd — the digest shuffles,
    * the ids don't), the `src0` slice stands in for the eval suite
    * (the x20 convention), and each corpus doc reports the fraction of
    * its DISTINCT token grams that appear anywhere in the eval set.
    *
    * Scale shape: the eval gram set is eval-suite-sized (broadcast
    * left-semi, the x20 shape); the encode is one broadcast vocab
    * join; grams are per-doc HOFs — nothing corpus² anywhere. Docs
    * shorter than 5 tokens (after vocab intersection) drop, as do
    * docs whose words never entered the trainer vocabulary.
    */
  def tokenContamination(spark: SparkSession, dir: String): DataFrame = {
    // the encode is the session-cached token-id table x73/x75 read too
    // — one corpus encode per session, not one per consumer
    val docIds = bpeEncodedDocs(spark, dir)
      .select(col("doc_id"), col("source"), col("ids"))
      .filter(size(col("ids")) >= 5)
    // Gram key: the 5 ids packed exactly into two BIGINTs (21 bits per
    // id — ids are codepoints < 2²¹ or 256+merge-round, see bpeSym) —
    // replaces the md5-of-joined-strings digest, which built a 5-way
    // string concat + md5 PER GRAM and shuffled 32-char digests where
    // 16 bytes of integers carry the same equality (the key is
    // query-internal: only hit/total counts leave, so any injective
    // packing yields identical output; the oracle keeps its md5 twin).
    val packed =
      "transform(sequence(0, size(ids) - 5), j -> struct(" +
        "((cast(ids[j] as bigint) * 2097152 + ids[j+1]) * 2097152 + ids[j+2]) as g1, " +
        "(cast(ids[j+3] as bigint) * 2097152 + ids[j+4]) as g2))"
    val grams = docIds.select(col("doc_id"), col("source"),
      explode(expr(packed)).as("g"))
      .distinct()
    val eval = grams.filter(col("source") === "src0").select(col("g")).distinct()
    val corpus = grams.filter(col("source") =!= "src0")
    val tot = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hits = corpus.join(broadcast(eval), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    tot.join(hits, Seq("doc_id"), "left").na.fill(0L, Seq("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_grams").cast("double"))
          .as("token_contamination"))
      .orderBy(col("doc_id"))
  }

  lazy val TokenContaminationSql: String =
    s"""WITH ${bpeStagesSql(BpeEncodeRounds, carryW0 = true)},
       |enc AS (
       |  SELECT w0 AS word,
       |    list_transform(generate_series(1, len(w)), i ->
       |      CASE WHEN unicode(w[i]) >= $BpeSymbolBase
       |           THEN 256 + unicode(w[i]) - $BpeSymbolBase
       |           ELSE unicode(w[i]) END) AS ids
       |  FROM words$BpeEncodeRounds),
       |docw AS (
       |  SELECT doc_id, source, i AS pos, toks[i] AS word
       |  FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
       |  WHERE len(toks[i]) >= 1),
       |seq AS (
       |  SELECT doc_id, source, flatten(list(ids ORDER BY pos)) AS ids
       |  FROM (SELECT doc_id, source, pos, ids FROM docw JOIN enc USING (word))
       |  GROUP BY doc_id, source
       |  HAVING len(flatten(list(ids ORDER BY pos))) >= 5),
       |g AS (
       |  SELECT DISTINCT doc_id, source,
       |    md5(array_to_string(list_transform(ids[jj + 1 : jj + 5],
       |      x -> CAST(x AS VARCHAR)), '-')) AS g
       |  FROM seq, LATERAL (SELECT unnest(generate_series(0, len(ids) - 5)) AS jj)),
       |ev AS (SELECT DISTINCT g FROM g WHERE source = 'src0'),
       |corp AS (SELECT doc_id, g FROM g WHERE source <> 'src0'),
       |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corp GROUP BY doc_id),
       |hits AS (
       |  SELECT c.doc_id, COUNT(*) AS n_hits
       |  FROM corp c
       |  WHERE EXISTS (SELECT 1 FROM ev e WHERE e.g = c.g)
       |  GROUP BY c.doc_id)
       |SELECT tot.doc_id AS doc_id, n_grams, COALESCE(n_hits, 0) AS n_hits,
       |  (CAST(COALESCE(n_hits, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE))
       |    AS token_contamination
       |FROM tot
       |LEFT JOIN hits ON hits.doc_id = tot.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  // lazy: BpeEncodeSql is declared later in this object (plain vals
  // initialize in declaration order; a forward reference interpolates null)
  lazy val BpeFertilitySql: String =
    s"""WITH enc AS ($BpeEncodeSql)
       |SELECT d.lang AS lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(enc.n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(enc.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(enc.n_chars) AS DOUBLE) / CAST(SUM(enc.n_bpe_tokens) AS DOUBLE)
       |    AS compression,
       |  CAST(SUM(enc.n_bpe_tokens) AS DOUBLE) / CAST(SUM(enc.n_words) AS DOUBLE)
       |    AS fertility
       |FROM enc JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY lang""".stripMargin

  /** STREAMING BPE encode — x73 with a FROZEN tokenizer (the
    * production serving shape: train once, tokenize the stream
    * forever): `merges` is the collected `(round, rawPair)` table
    * (rounds-sized, driver-held), baked into the row expression as
    * literals, so the whole encode — merge application per word, id
    * extraction, counts, compression — evaluates inside the row with
    * no join, no aggregation, no state. Output schema matches
    * [[bpeEncode]]; the spec pins stream ≡ batch x73 on the same
    * corpus and merge table.
    */
  def bpeEncodeStream(docs: DataFrame, merges: Seq[(Int, String)]): DataFrame = {
    // x73's docWords filter: empty tokens (doubled separators) never
    // encode — and sequence(1, 0) would run DESCENDING on one
    val toks = filter(TextOps.tokens(col("text")), w => length(w) >= 1)
    val encoded = transform(toks, w =>
      merges.sortBy(_._1).foldLeft(w) { case (e, (r, p)) =>
        replace(e, lit(p), lit(bpeSym(r)))
      })
    docs
      .withColumn("_toks", toks)
      // batch x73 emits NO row for a doc with zero non-empty tokens
      // (its docWords filter + inner vocab join drop it); match that,
      // and avoid a NULL 0/0 compression
      .filter(size(col("_toks")) >= 1)
      .withColumn("_enc", encoded)
      .withColumn("_ids", expr(
        "transform(_enc, w -> transform(sequence(1, length(w)), i -> " +
          s"CASE WHEN ascii(substring(w, i, 1)) >= $BpeSymbolBase " +
          s"THEN 256 + ascii(substring(w, i, 1)) - $BpeSymbolBase " +
          "ELSE ascii(substring(w, i, 1)) END))"))
      .select(col("doc_id"),
        size(col("_toks")).cast("bigint").as("n_words"),
        expr("aggregate(_toks, 0L, (a, x) -> a + length(x))").as("n_chars"),
        expr("aggregate(_ids, 0L, (a, x) -> a + size(x))").as("n_bpe_tokens"),
        (expr("aggregate(_toks, 0L, (a, x) -> a + length(x))").cast("double") /
          expr("aggregate(_ids, 0L, (a, x) -> a + size(x))").cast("double"))
          .as("compression"),
        expr("array_join(transform(_ids, a -> array_join(a, '-')), '-')")
          .as("ids_str"))
  }

  /** Decode of [[bpeEncode]]'s symbol strings: expand merged symbols in
    * REVERSE round order (later symbols may contain earlier ones, never
    * the converse). `merges` is the collected `(round, rawPair)` table.
    * Exact inverse of the training substitution — the spec pins
    * `decode(encode(w)) == w` for every vocabulary word.
    */
  private[graft] def bpeDecodeCol(encoded: Column,
      merges: Seq[(Int, String)]): Column =
    merges.sortBy(-_._1).foldLeft(encoded) { case (e, (r, pair)) =>
      replace(e, lit(bpeSym(r)), lit(pair))
    }

  /** Shared CTE prefix of the BPE oracle twins: `words0` (the weighted
    * vocabulary) plus, per round r, the winner `t{r}` and the merged
    * vocabulary `words{r}` (fusing into `chr(${BpeSymbolBase}+r)` — the
    * same PUA symbol the Spark side injects as a literal). `carryW0`
    * keeps the original word through the merge stages (the encoder
    * needs the word→encoded mapping; the trainer doesn't).
    */
  private def bpeStagesSql(rounds: Int, carryW0: Boolean): String = {
    val w0sel = if (carryW0) "w AS w0, w, " else "w, "
    val w0carry = if (carryW0) "w0, " else ""
    val head =
      s"""words0 AS (
         |  SELECT ${w0sel}COUNT(*) AS n FROM (
         |    SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
         |    FROM documents)
         |  WHERE len(w) >= 1
         |  GROUP BY w)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""t$r AS (
         |  SELECT pair, CAST(SUM(n) AS BIGINT) AS pc
         |  FROM (SELECT substr(w, i, 2) AS pair, n
         |        FROM words${r - 1}, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
         |        WHERE len(w) >= 2)
         |  GROUP BY pair ORDER BY pc DESC, pair LIMIT 1),
         |words$r AS (
         |  SELECT ${w0carry}replace(w, (SELECT pair FROM t$r), chr(${BpeSymbolBase + r})) AS w, n
         |  FROM words${r - 1})""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  val BpeTrainSql: String = {
    val rows = (1 to BpeTrainRounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, (SELECT pair FROM t$r) AS merged," +
        s" (SELECT pc FROM t$r) AS pair_count"
    }.mkString("\n  UNION ALL ")
    val rendered = (BpeTrainRounds to 1 by -1).foldLeft("merged") { (e, k) =>
      s"replace($e, chr(${BpeSymbolBase + k}), '[$k]')"
    }
    s"""WITH ${bpeStagesSql(BpeTrainRounds, carryW0 = false)},
       |m AS (
       |  $rows)
       |SELECT round, $rendered AS merged, pair_count
       |FROM m
       |ORDER BY round""".stripMargin
  }

  val BpeEncodeSql: String =
    s"""WITH ${bpeStagesSql(BpeEncodeRounds, carryW0 = true)},
       |enc AS (
       |  SELECT w0 AS word,
       |    list_transform(generate_series(1, len(w)), i ->
       |      CASE WHEN unicode(w[i]) >= $BpeSymbolBase
       |           THEN 256 + unicode(w[i]) - $BpeSymbolBase
       |           ELSE unicode(w[i]) END) AS ids
       |  FROM words$BpeEncodeRounds),
       |docw AS (
       |  SELECT doc_id, i AS pos, toks[i] AS word
       |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents),
       |       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
       |  WHERE len(toks[i]) >= 1),
       |j AS (SELECT doc_id, pos, word, ids FROM docw JOIN enc USING (word))
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(ids)) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(len(word)) AS DOUBLE) / CAST(SUM(len(ids)) AS DOUBLE) AS compression,
       |  string_agg(array_to_string(ids, '-'), '-' ORDER BY pos) AS ids_str
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val BpeMergeRoundSql: String =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) >= 1
      |  GROUP BY w),
      |top1 AS (
      |  SELECT pair AS merged FROM (
      |    SELECT substr(w, i, 2) AS pair, SUM(n) AS pc
      |    FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
      |    WHERE len(w) >= 2
      |    GROUP BY 1 ORDER BY pc DESC, pair LIMIT 1)),
      |w2 AS (
      |  SELECT replace(w, (SELECT merged FROM top1), chr(1)) AS w, n
      |  FROM words),
      |pairs2 AS (
      |  SELECT substr(w, i, 2) AS pair, w, n
      |  FROM w2, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
      |  WHERE len(w) >= 2)
      |SELECT (SELECT merged FROM top1) AS merged,
      |  replace(pair, chr(1), '[' || (SELECT merged FROM top1) || ']') AS pair,
      |  CAST(SUM(n) AS BIGINT) AS pair_count,
      |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
      |FROM pairs2
      |GROUP BY pair
      |ORDER BY pair_count DESC, pair
      |LIMIT 10""".stripMargin

  val BpePairStatsSql: String =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) >= 1
      |  GROUP BY w),
      |pairs AS (
      |  SELECT substr(w, i, 2) AS pair, w, n
      |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
      |  WHERE len(w) >= 2)
      |SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count,
      |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
      |FROM pairs
      |GROUP BY pair
      |ORDER BY pair_count DESC, pair
      |LIMIT 20""".stripMargin

  /** x64: n-gram-growth curve (the Heaps'-law measurement that sizes a
    * tokenizer/phrase-table budget): scanning the corpus in doc_id
    * order, how many DISTINCT word-3-grams have appeared after every 50
    * documents. 3-grams (not words — this fixture's word vocabulary
    * saturates at 31 by doc 8) give a non-trivial curve whose flattening
    * rate is the "how much new text is left in this source" signal
    * curation uses to decide when a crawl is exhausted. Each gram
    * contributes at its FIRST-seen doc (min over doc ids — exact,
    * order-independent), so the whole curve is one gram-keyed aggregate
    * over the SHARED shingle cache + one bucket rollup + a TWO-LEVEL
    * prefix sum over the ≤ |corpus|/50-row bucket relation — counts
    * only, no floats, and no per-checkpoint corpus rescan (the naive
    * form recounts distincts once per checkpoint).
    *
    * Two-level prefix sum: a single global `Window.orderBy` would pull
    * every bucket row through ONE partition — fine at sf0.1, ~2×10⁷
    * rows through one task at 10⁹ docs. Instead buckets prefix-sum
    * WITHIN [[VocabRange]]-sized ranges (a partitioned window — fully
    * parallel), and only the per-range TOTALS (|buckets|/1024 rows)
    * take a global ordered pass before broadcasting back as range
    * offsets: `gram_vocab = range_offset + within_range_prefix`. The
    * single-partition stage shrinks by 1024× at every scale.
    */
  val VocabBucket = 50

  /** Buckets per prefix-sum range (level-1 window partition size). */
  val VocabRange = 1024

  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val first = Corpus.shingleRows(spark, dir)
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_seen"))
    val buckets = first
      .groupBy(expr(s"first_seen div $VocabBucket").as("bucket"))
      .agg(count(lit(1)).as("new_grams"))
      .withColumn("range", expr(s"bucket div $VocabRange"))
    val wIn = Window.partitionBy(col("range")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = buckets.withColumn("in_range", sum(col("new_grams")).over(wIn))
    val wPrior = Window.orderBy(col("range"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = buckets.groupBy(col("range"))
      .agg(sum(col("new_grams")).as("range_total"))
      .withColumn("offset", coalesce(sum(col("range_total")).over(wPrior), lit(0L)))
      .select(col("range"), col("offset"))
    within.join(broadcast(offsets), "range")
      .select(((col("bucket") + 1) * VocabBucket).as("up_to_doc"),
        col("new_grams"),
        (col("offset") + col("in_range")).as("gram_vocab"))
      .orderBy(col("up_to_doc"))
  }

  val VocabGrowthSql: String =
    s"""WITH f AS (
       |  SELECT shingle, MIN(doc_id) AS first_seen
       |  FROM (${TextOps.shinglesSql("documents", 3)})
       |  GROUP BY shingle),
       |b AS (SELECT first_seen // $VocabBucket AS bucket, COUNT(*) AS new_grams
       |      FROM f GROUP BY 1)
       |SELECT (bucket + 1) * $VocabBucket AS up_to_doc, new_grams,
       |  CAST(SUM(new_grams) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gram_vocab
       |FROM b
       |ORDER BY up_to_doc""".stripMargin

  /** x76: bigram-LM perplexity filtering — the CCNet-style quality
    * signal this tier previously worked around with the log-free x57:
    * train an add-one-smoothed bigram language model ON the corpus
    * (`P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V)`, V = continuation
    * vocabulary) and score every document by its mean per-bigram
    * surprisal `−log2 P` plus the perplexity `2^bits`. High-ppl docs
    * are noise/garble, very-low-ppl docs are boilerplate — the classic
    * two-sided curation filter.
    *
    * Deterministic end to end: counts are exact integers; each
    * probability is ONE correctly-rounded divide; the log2/exp2 go
    * through [[graft.functions.DetMath]] (no libm in any output
    * value); per-doc surprisal sums ride exact BIGINT NANO-BITS —
    * `floor(bits·10⁹ + 0.5)` — because `floor` is EXACT (a decimal
    * cast is not: a surprisal landing on a half at the cast's scale
    * rounds half-up in Spark but half-to-even in DuckDB — observed on
    * this corpus). So the whole score hash-gates against the DuckDB
    * twin — unusual for an LM scorer and exactly what a reproducible
    * 100 TB curation recipe needs.
    *
    * Scale shape: the bigram relation comes off the SHARED 2-gram
    * shingle cache (x19/x23 pay for it once); the count model is two
    * vocabulary-sized hash aggregates + a 1-row V aggregate
    * (broadcast); scoring is a keyed shuffle join of bigram
    * occurrences to bigram counts — linear, no window, no driver
    * state. Docs with <2 tokens have no bigrams and drop, like x5.
    */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val bg = Corpus.shingleRows(spark, dir, 2)
      .select(col("doc_id"), col("shingle"))
    val c12 = bg.groupBy(col("shingle")).agg(count(lit(1)).as("c12"))
    val w1c = bg.select(expr("split(shingle, ' ')[0]").as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = bg.select(expr("split(shingle, ' ')[1]").as("w2"))
      .distinct().agg(count(lit(1)).as("v"))
    val scored = bg
      .join(c12, "shingle")
      .withColumn("w1", expr("split(shingle, ' ')[0]"))
      .join(w1c, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("pp",
        (col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
      // native det_log2 (codegen'd single call) — bit-identical to the
      // spec mirror DetMath.log2Col, compact in the per-bigram stage
      .withColumn("bits", -graft.plans.DetMathExprs.detLog2(spark, "pp"))
      .withColumn("nano", floor(col("bits") * lit(1e9) + lit(0.5)))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nano")).as("_sn"))
      .withColumn("bits_per_bigram",
        (col("_sn").cast("double") / lit(1e9)) / col("n_bigrams").cast("double"))
      .withColumn("ppl", graft.plans.DetMathExprs.detExp2(spark, "bits_per_bigram"))
      .select(col("doc_id"), col("n_bigrams"), col("bits_per_bigram"), col("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[perplexity]]: the same count model and the same
    * DetMath step sequences (`log2Sql`/`exp2Sql`) — every probability,
    * surprisal, decimal sum, and perplexity matches bit for bit.
    */
  lazy val PerplexitySql: String = {
    val lg = graft.functions.DetMath.log2Sql("pp")
    val e2 = graft.functions.DetMath.exp2Sql("bits_per_bigram")
    s"""WITH bg AS (
       |  SELECT doc_id, shingle FROM (${TextOps.shinglesSql("documents", 2)})),
       |c12 AS (SELECT shingle, COUNT(*) AS c12 FROM bg GROUP BY shingle),
       |w1c AS (SELECT string_split(shingle, ' ')[1] AS w1, COUNT(*) AS c1
       |        FROM bg GROUP BY 1),
       |v AS (SELECT COUNT(DISTINCT string_split(shingle, ' ')[2]) AS v FROM bg),
       |s AS (
       |  SELECT bg.doc_id,
       |    CAST(c12.c12 + 1 AS DOUBLE) / CAST(w1c.c1 + v.v AS DOUBLE) AS pp
       |  FROM bg
       |  JOIN c12 ON c12.shingle = bg.shingle
       |  JOIN w1c ON w1c.w1 = string_split(bg.shingle, ' ')[1]
       |  CROSS JOIN v),
       |b AS (SELECT doc_id, CAST(FLOOR(-($lg) * 1e9 + 0.5) AS BIGINT) AS nano
       |      FROM s),
       |a AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(nano) AS BIGINT) AS sn
       |  FROM b GROUP BY doc_id),
       |f AS (SELECT doc_id, n_bigrams,
       |        (CAST(sn AS DOUBLE) / 1e9) / CAST(n_bigrams AS DOUBLE)
       |          AS bits_per_bigram FROM a)
       |SELECT doc_id, n_bigrams, bits_per_bigram, $e2 AS ppl
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  /** x78: per-document token-distribution Shannon entropy — the
    * distribution-SHAPE quality signal complementing x17's ratio
    * heuristics and x76's LM surprisal: `H = −Σ p_w·log2 p_w` over the
    * doc's own token frequencies, plus the normalized form
    * `H / log2(n_distinct)` ∈ [0,1] (1 = perfectly diverse, → 0 =
    * dominated by few tokens — spam/keyword-stuffing reads low).
    * Deterministic by the x76 recipe: exact counts, one divide per
    * probability, DetMath log2, per-term exact nano-bit quantization
    * (`floor` — no cast-rounding ambiguity), BIGINT sums. Scale: one
    * explode + two per-doc hash aggregates; nothing corpus-global at
    * all (each doc scores against itself).
    */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val n = tc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    tc.join(n, "doc_id")
      .withColumn("p", col("c").cast("double") / col("n").cast("double"))
      .withColumn("nano",
        floor(-(col("p") * graft.plans.DetMathExprs.detLog2(spark, "p"))
          * lit(1e9) + lit(0.5)))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), max(col("n_distinct")).as("n_distinct"),
        sum(col("nano")).as("_sn"))
      .withColumn("entropy_bits", col("_sn").cast("double") / lit(1e9))
      .withColumn("nd", col("n_distinct").cast("double"))
      .withColumn("norm_entropy",
        when(col("n_distinct") > 1,
          col("entropy_bits") / graft.plans.DetMathExprs.detLog2(spark, "nd"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy_bits"), col("norm_entropy"))
      .orderBy(col("doc_id"))
  }

  /** STREAMING x78 — the entropy signal as a ROW-LOCAL plan over any
    * `(doc_id, text)` relation: a document's token distribution is a
    * pure function of its own text, so the whole score evaluates
    * inside the row (distinct tokens + per-token counts as HOFs, the
    * nano-bit surprisal fold as an integer `aggregate` — order-free,
    * so it equals the batch groupBy sum bit for bit) with no state, no
    * watermark, no shuffle. The same plan runs batch or streaming in
    * append mode; the spec pins stream ≡ batch ≡ x78. The per-row cost
    * is O(n_distinct·n_tokens) — the curation-gate regime (docs, not
    * books); the relational x78 stays the bulk-batch form.
    */
  def entropyGate(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.plans.DetMathExprs.register(spark)
    docs.filter(col("text").isNotNull)
      .withColumn("_toks", TextOps.tokens(col("text")))
      .withColumn("_d", array_distinct(col("_toks")))
      .withColumn("n_tokens", size(col("_toks")).cast("bigint"))
      .withColumn("n_distinct", size(col("_d")).cast("bigint"))
      .withColumn("_sn", expr(
        """aggregate(
          |  transform(_d, t -> cast(size(filter(_toks, x -> x = t)) as bigint)),
          |  0L,
          |  (acc, c) -> acc + floor(
          |    -((cast(c as double) / cast(n_tokens as double))
          |      * det_log2(cast(c as double) / cast(n_tokens as double)))
          |    * 1e9 + 0.5d))""".stripMargin))
      .withColumn("entropy_bits", col("_sn").cast("double") / lit(1e9))
      .withColumn("nd", col("n_distinct").cast("double"))
      .withColumn("norm_entropy",
        when(col("n_distinct") > 1, col("entropy_bits") / expr("det_log2(nd)"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy_bits"), col("norm_entropy"))
  }

  /** Oracle twin of [[tokenEntropy]] — identical DetMath step
    * sequences, nano-bit sums, and the same n_distinct guard.
    */
  lazy val TokenEntropySql: String = {
    val lgP = graft.functions.DetMath.log2Sql("p")
    val lgD = graft.functions.DetMath.log2Sql("nd")
    s"""WITH tc AS (
       |  SELECT doc_id, tok, COUNT(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS tok
       |    FROM documents)
       |  GROUP BY doc_id, tok),
       |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |        COUNT(*) AS n_distinct
       |      FROM tc GROUP BY doc_id),
       |pp AS (
       |  SELECT tc.doc_id, CAST(tc.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS p
       |  FROM tc JOIN n ON n.doc_id = tc.doc_id),
       |b AS (
       |  SELECT doc_id, CAST(FLOOR(-(p * $lgP) * 1e9 + 0.5) AS BIGINT) AS nano
       |  FROM pp),
       |a AS (
       |  SELECT b.doc_id, MAX(n.n) AS n_tokens, MAX(n.n_distinct) AS n_distinct,
       |    CAST(SUM(b.nano) AS BIGINT) AS sn
       |  FROM b JOIN n ON n.doc_id = b.doc_id
       |  GROUP BY b.doc_id),
       |f AS (
       |  SELECT doc_id, n_tokens, n_distinct,
       |    CAST(sn AS DOUBLE) / 1e9 AS entropy_bits,
       |    CAST(n_distinct AS DOUBLE) AS nd
       |  FROM a)
       |SELECT doc_id, n_tokens, n_distinct, entropy_bits,
       |  CASE WHEN n_distinct > 1 THEN entropy_bits / $lgD
       |       ELSE 0.0 END AS norm_entropy
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  /** x79: per-source distribution drift — KL(P_source ‖ P_corpus) over
    * unigram token distributions, in bits: `Σ_w p·log2(p/q)` where
    * `p = c_sw/n_s` and `q = c_w/N`. The "which feed is
    * distributionally weird" audit that complements x67 (set overlap)
    * and x76 (sequence likelihood): a high-KL source writes a
    * different language/domain than the corpus mix and skews any model
    * trained on the blend. q > 0 wherever p > 0 by construction (the
    * corpus includes the source), so the sum is always finite.
    * Deterministic by the x76 recipe: exact counts, one divide per
    * probability (and one for the ratio), DetMath log2, per-term
    * nano-bit floor quantization, BIGINT sums. Scale: two hash
    * aggregates over (source, token) and (token) — the token relation
    * shuffles once, nothing is broadcast but the 1-row corpus total.
    */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
    val sw = tok.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_sw"))
    val w = tok.groupBy(col("tok")).agg(count(lit(1)).as("c_w"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val total = w.agg(sum(col("c_w")).as("n_corpus"))
    sw.join(w, "tok").join(ns, "source").crossJoin(broadcast(total))
      .withColumn("p", col("c_sw").cast("double") / col("n_s").cast("double"))
      .withColumn("q", col("c_w").cast("double") / col("n_corpus").cast("double"))
      .withColumn("r", col("p") / col("q"))
      .withColumn("nano",
        floor(col("p") * graft.plans.DetMathExprs.detLog2(spark, "r")
          * lit(1e9) + lit(0.5)))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("nano")).as("_sn"))
      .withColumn("kl_bits", col("_sn").cast("double") / lit(1e9))
      .select(col("source"), col("n_tokens"), col("n_distinct"), col("kl_bits"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[sourceDrift]] — identical count model and DetMath
    * step sequence.
    */
  lazy val SourceDriftSql: String = {
    val lg = graft.functions.DetMath.log2Sql("r")
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(trim(lower(text)), ' ')) AS tok
       |  FROM documents),
       |sw AS (SELECT source, tok, COUNT(*) AS c_sw FROM tok GROUP BY 1, 2),
       |w AS (SELECT tok, COUNT(*) AS c_w FROM tok GROUP BY 1),
       |ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
       |tt AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_corpus FROM w),
       |pr AS (
       |  SELECT sw.source,
       |    CAST(sw.c_sw AS DOUBLE) / CAST(ns.n_s AS DOUBLE) AS p,
       |    (CAST(sw.c_sw AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
       |      / (CAST(w.c_w AS DOUBLE) / CAST(tt.n_corpus AS DOUBLE)) AS r
       |  FROM sw JOIN w ON w.tok = sw.tok
       |  JOIN ns ON ns.source = sw.source
       |  CROSS JOIN tt),
       |b AS (
       |  SELECT source, CAST(FLOOR(p * $lg * 1e9 + 0.5) AS BIGINT) AS nano
       |  FROM pr),
       |a AS (
       |  SELECT b.source, MAX(ns.n_s) AS n_tokens,
       |    COUNT(*) AS n_distinct, CAST(SUM(b.nano) AS BIGINT) AS sn
       |  FROM b JOIN ns ON ns.source = b.source
       |  GROUP BY b.source)
       |SELECT source, n_tokens, n_distinct,
       |  CAST(sn AS DOUBLE) / 1e9 AS kl_bits
       |FROM a
       |ORDER BY source""".stripMargin
  }

  /** x67: source-overlap matrix — for every unordered feed pair, the
    * number of distinct 3-gram shingles both contain and the Jaccard
    * overlap of their shingle sets. x52 reports where NEAR-dup pairs
    * concentrate; this is the set-level view that catches feeds
    * mirroring each other even when no single document pair crosses the
    * LSH threshold — the "drop the syndicated feed" decision input.
    *
    * Exact counts and ONE divide per pair (|A∩B| / (|A|+|B|−|A∩B|)) —
    * hash-exact. Scale shape: the (source, shingle) distinct relation
    * comes off the shared shingle cache; the pair fan-out is per-shingle
    * (#sources-containing)² with feeds bounded (tens at any corpus
    * size), so candidates ∝ shared content, never corpus²; per-source
    * sizes are a feed-count-row relation, broadcast into the final
    * join.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ss = Corpus.shingleRows(spark, dir)
      .select(col("source"), col("shingle")).distinct()
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = ss.select(col("shingle"), col("source").as("source_a"))
      .join(ss.select(col("shingle"), col("source").as("source_b")), Seq("shingle"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("shared"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double")).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val SourceOverlapSql: String =
    s"""WITH ss AS (
       |  SELECT DISTINCT source, shingle FROM (
       |    SELECT doc_id, source,
       |      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |    FROM (SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
       |          FROM documents),
       |         LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i))),
       |sizes AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
       |shared AS (
       |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
       |  FROM ss a JOIN ss b ON b.shingle = a.shingle AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, shared,
       |  CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.source = source_a
       |JOIN sizes sb ON sb.source = source_b
       |ORDER BY source_a, source_b""".stripMargin

  val PiiRedactSql: String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
       |    CAST(len(regexp_extract_all(text, '$Ipv4Pat')) AS BIGINT) AS n_ips,
       |    CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phones,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$EmailPat', '<EMAIL>', 'g'),
       |      '$Ipv4Pat', '<IP>', 'g'),
       |      '$PhonePat', '<PHONE>', 'g') AS red
       |  FROM documents)
       |SELECT doc_id, n_emails, n_ips, n_phones,
       |  CAST(length(red) AS BIGINT) AS redacted_len,
       |  md5(red) AS redacted_md5,
       |  (n_emails + n_ips + n_phones) = 0 AS clean
       |FROM r
       |ORDER BY doc_id""".stripMargin

  /** x80: DSIR-style importance weighting (Xie et al., NeurIPS'23 —
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its hashed-n-gram
    * features are under a TARGET distribution than under the raw
    * corpus, `log w(x) = Σ_features (log2 p̂_t[b] − log2 p̂_r[b])`.
    * Features are the shared word-bigram occurrences hashed into
    * B = 4096 buckets (the x48 md5-u32 idiom); both models are
    * add-one-smoothed bucket categoricals (target here: the English
    * slice — the "match this distribution" knob a curator points at a
    * trusted corpus). `keep = log w > 0` selects documents that look
    * more target-like than corpus-like — the deterministic analog of
    * DSIR's importance resampling (no Gumbel noise: the engine's
    * reproducible-recipe rule).
    *
    * Deterministic by the x76 recipe: exact integer counts, one
    * correctly-rounded divide per probability, DetMath log2, and the
    * per-BUCKET log-ratio quantized to exact nano-bit BIGINTs before
    * the per-doc sum — so doc scores are order-independent integer
    * sums and the whole operator hash-gates.
    *
    * Scale shape: the bucket model is TWO fixed-width hash aggregates
    * (≤ 4096 rows each) + 1-row totals — broadcast back; scoring is
    * one broadcast join over the shared bigram cache + one per-doc
    * aggregate. Linear in corpus size, no global window, no pairwise
    * work; the model side is CONSTANT (32 KB) at any corpus size —
    * the property that makes DSIR run at 100 TB.
    */
  /** The hashed-bigram occurrence relation feeding the DSIR tier. */
  private def dsirOccurrences(spark: SparkSession, dir: String): DataFrame =
    Corpus.shingleRows(spark, dir, 2)
      .select(col("doc_id"), col("lang"), col("shingle"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long"),
          lit(4096L)))

  /** The per-bucket nano-quantized log importance ratio — the single
    * model definition shared by batch x80 and the streaming gate.
    * `dense = false` keeps only corpus-occupied buckets (the batch
    * join side); `dense = true` fills all 4096 (streamed documents
    * can contain bigrams the corpus never saw — those buckets score
    * the smoothed prior `log2((n_r+B)/(n_t+B))` by the SAME pinned
    * steps with t = r0 = 0).
    */
  private def dsirBucketNanos(spark: SparkSession, dir: String,
      dense: Boolean): DataFrame = {
    val B = 4096L
    val occ = dsirOccurrences(spark, dir)
    val tgt = occ.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("t"))
    val raw = occ.groupBy(col("bucket")).agg(count(lit(1)).as("r0"))
    val totals = raw.agg(sum(col("r0")).as("n_r"))
      .crossJoin(tgt.agg(sum(col("t")).as("n_t")))
    val base =
      if (dense) spark.range(0, B).select(col("id").as("bucket"))
        .join(raw, Seq("bucket"), "left").na.fill(0L, Seq("r0"))
      else raw
    base.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("t"))
      .crossJoin(broadcast(totals))
      .withColumn("pb",
        (col("t") + 1).cast("double") / (col("n_t") + lit(B)).cast("double"))
      .withColumn("qb",
        (col("r0") + 1).cast("double") / (col("n_r") + lit(B)).cast("double"))
      .withColumn("nano", floor(
        (graft.plans.DetMathExprs.detLog2(spark, "pb")
          - graft.plans.DetMathExprs.detLog2(spark, "qb"))
          * lit(1e9) + lit(0.5)))
      .select(col("bucket"), col("nano"))
  }

  def dsirImportance(spark: SparkSession, dir: String): DataFrame = {
    val occ = dsirOccurrences(spark, dir)
    val model = dsirBucketNanos(spark, dir, dense = false)
    occ.join(broadcast(model), "bucket")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_feats"), sum(col("nano")).as("_sn"))
      .withColumn("logw_bits", col("_sn").cast("double") / lit(1e9))
      .withColumn("keep", col("_sn") > 0)
      .select(col("doc_id"), col("lang"), col("n_feats"),
        col("logw_bits"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[dsirImportance]] — identical bucket hashing,
    * count model, and DetMath step sequences.
    */
  lazy val DsirImportanceSql: String = {
    val lgP = graft.functions.DetMath.log2Sql("pb")
    val lgQ = graft.functions.DetMath.log2Sql("qb")
    s"""WITH bg0 AS (
       |  SELECT doc_id, shingle
       |  FROM (${graft.functions.TextOps.shinglesSql("documents", 2)})),
       |bg AS (
       |  SELECT bg0.doc_id, d.lang, bg0.shingle,
       |    (CAST(concat('0x', substr(md5(bg0.shingle), 1, 8)) AS BIGINT)
       |     % 4096) AS bucket
       |  FROM bg0 JOIN documents d ON d.doc_id = bg0.doc_id),
       |tgt AS (SELECT bucket, COUNT(*) AS t FROM bg WHERE lang = 'en'
       |        GROUP BY 1),
       |raw AS (SELECT bucket, COUNT(*) AS r0 FROM bg GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(SUM(r0) AS BIGINT) FROM raw) AS n_r,
       |               (SELECT CAST(SUM(t) AS BIGINT) FROM tgt) AS n_t),
       |model0 AS (
       |  SELECT raw.bucket,
       |    CAST(COALESCE(tgt.t, 0) + 1 AS DOUBLE)
       |      / CAST(tot.n_t + 4096 AS DOUBLE) AS pb,
       |    CAST(raw.r0 + 1 AS DOUBLE)
       |      / CAST(tot.n_r + 4096 AS DOUBLE) AS qb
       |  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot),
       |model AS (
       |  SELECT bucket,
       |    CAST(FLOOR((($lgP) - ($lgQ)) * 1e9 + 0.5) AS BIGINT) AS nano
       |  FROM model0),
       |a AS (
       |  SELECT bg.doc_id, bg.lang, COUNT(*) AS n_feats,
       |    CAST(SUM(model.nano) AS BIGINT) AS sn
       |  FROM bg JOIN model ON model.bucket = bg.bucket
       |  GROUP BY 1, 2)
       |SELECT doc_id, lang, n_feats,
       |  CAST(sn AS DOUBLE) / 1e9 AS logw_bits,
       |  sn > 0 AS keep
       |FROM a
       |ORDER BY doc_id""".stripMargin
  }

  /** The DSIR bucket model frozen into ONE broadcastable row — a dense
    * 4096-element `array<bigint>` of nano log-ratios (32 KB at any
    * corpus size). The STATIC side of the streaming admission gate:
    * train once on the curated corpus, broadcast to every executor,
    * score the firehose row-locally forever.
    */
  def dsirModel(spark: SparkSession, dir: String): DataFrame =
    dsirBucketNanos(spark, dir, dense = true)
      .agg(expr("transform(array_sort(collect_list(struct(bucket, nano))), " +
        "s -> s.nano)").as("model"))

  /** STREAMING DSIR admission gate — x80's per-document scoring as a
    * stateless row-local plan over a `(doc_id, text)` frame: bigram
    * extraction, md5 bucketing, and the model lookup all run as array
    * HOFs INSIDE the row (no explode, no aggregation, no state), with
    * the frozen [[dsirModel]] as a stream-static broadcast — so the
    * same operator runs unchanged on a batch or streaming frame in
    * append mode with no watermark (the bloomScore shape). The in-row
    * `aggregate` fold adds the SAME nano-bit BIGINTs x80's relational
    * groupBy sums — integer adds are order-free, so batch x80 ≡ this
    * gate ≡ its streaming run BIT-FOR-BIT (`StreamingSpec` pins all
    * three). This is the 100 TB ingest shape: admission decisions at
    * scan speed with a constant 32 KB model.
    */
  def dsirGate(docs: DataFrame, model: DataFrame): DataFrame =
    docs.crossJoin(broadcast(model))
      .withColumn("_sh", TextOps.shingles(col("text"), 2))
      .withColumn("_sn", expr(
        "aggregate(_sh, 0L, (acc, s) -> acc + element_at(model, " +
          "cast(cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) " +
          "% 4096 as int) + 1))"))
      .select(col("doc_id"),
        size(col("_sh")).cast("bigint").as("n_feats"),
        (col("_sn").cast("double") / lit(1e9)).as("logw_bits"),
        (col("_sn") > lit(0L)).as("keep"))
}
