package graft.operators

import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
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

  /** Release the session's cached gram relations (see
    * [[Metrics.unpersistEvents]] for when to call).
    */
  def unpersistGrams(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    gramCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(gramCache.remove(k)).foreach(_.unpersist())
    }
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // lower(text) is hoisted OUT of the per-trigram lambda — inside it,
    // it re-lowercases the whole document per extracted gram (O(len²)).
    // One explode + ONE aggregation to per-(doc, gram) counts, persisted
    // per (session, sf) like the dedup signature cache: both downstream
    // consumers (corpus profile + per-doc distinct grams) read the
    // aggregate instead of re-running the trigram explode over the full
    // corpus — the explode is the linear hot spot, everything after it
    // is ~distinct-grams-sized — and repeated calls don't re-persist.
    val docGramCounts = gramCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => gramCache.remove(k))
      // one-pass native trigram generator: the substr-per-position form
      // is O(len²)/doc (each substr re-seeks the UTF-8 string); the
      // generator emits byte slices in O(len), and yields nothing for
      // <3-char texts exactly like the oracle's generate_series(1, len-2)
      graft.plans.CharTrigramsExpr.register(spark)
      docs
        .select(col("doc_id"), col("lang"), lower(col("text")).as("lt"))
        .select(col("doc_id"), col("lang"), expr("char_trigrams(lt)").as("g"))
        .groupBy(col("doc_id"), col("lang"), col("g"))
        .agg(count(lit(1)).as("freq"))
        .persist()
    })
    val profile = docGramCounts.groupBy(col("lang").as("profile_lang"), col("g"))
      .agg(sum(col("freq")).as("freq"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("profile_lang"))
        .orderBy(col("freq").desc, col("g"))))
      .filter(col("rn") <= 20)
      .select(col("profile_lang"), col("g"))
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
      .orderBy(col("doc_id"))
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
}
