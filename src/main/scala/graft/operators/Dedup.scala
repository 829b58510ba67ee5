package graft.operators

import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over `documents`
  * (the driver-mandated extension tier, SURVEY.md §2.3).
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-groupBy on a 32-byte digest — shuffles digests,
  *    never full texts.
  *  - minhash LSH: shingle→minhash→band→bucket-join. Candidate
  *    generation is a self-join on band buckets, so cost is
  *    O(Σ bucket²) not O(n²); at 100 TB the band hash is the shuffle
  *    key and skewed buckets are capped by AQE skew-join splitting.
  *  - simhash: near-dup clustering by identical 32-bit signature —
  *    signature computation is a single explode+groupBy (map-side
  *    combinable); no pairwise work at all.
  *  - n-gram Jaccard: *exact* verification run only on LSH candidate
  *    pairs (composition: cheap recall stage → exact precision stage).
  *
  * Determinism: every hash is md5 (identical lowercase hex in Spark and
  * DuckDB); min/max over hex strings is binary-collation string order in
  * both engines, so signatures — and therefore buckets, pairs, and
  * Jaccard counts — are reproducible bit-for-bit from any partitioning.
  */
object Dedup {

  private val DocsSql = "SELECT doc_id, text FROM documents"

  /** Exact dedup: duplicate clusters keyed by md5 of the normalized
    * text; the surviving row of each cluster is the smallest doc_id.
    *
    * Session-cached: the verdict layer (x24/x70), the funnel (x99),
    * and the x1 gate all consume this relation, and its compute is a
    * full corpus text scan — the cached output is 4 narrow columns per
    * doc (the signature-cache sizing argument; at 100 TB the analog is
    * the materialized digest table every dedup pipeline keeps).
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    exactCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => exactCache.remove(k))
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), md5(trim(lower(col("text")))).as("text_hash"))
      val w = Window.partitionBy(col("text_hash"))
      docs
        .withColumn("cluster_id", min(col("doc_id")).over(w))
        .withColumn("cluster_size", count(lit(1)).over(w))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("cluster_id")).as("keep"))
        .orderBy(col("doc_id"))
        .persist()
    })

  private val exactCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop this session's cached exact-digest relation. */
  def unpersistExact(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    exactCache.keySet.asScala.filter(_._1 == spark).foreach { k =>
      Option(exactCache.remove(k)).foreach(_.unpersist())
    }
  }

  val ExactSql: String =
    s"""WITH h AS (SELECT doc_id, md5(trim(lower(text))) AS text_hash FROM documents)
       |SELECT doc_id,
       |  MIN(doc_id) OVER (PARTITION BY text_hash) AS cluster_id,
       |  COUNT(*) OVER (PARTITION BY text_hash) AS cluster_size,
       |  doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep
       |FROM h
       |ORDER BY doc_id""".stripMargin

  val NumPerms = 8
  val NumBands = 4 // 2 rows per band

  /** Session-scoped cache of the signature relation: x2, x3 (both join
    * sides), and x5 (via its embedded LSH stage) all consume it, so the
    * shingle explode + 8-way md5 minimum — the linear-cost hot spot of
    * the dedup tier — runs once per (session, sf) instead of once per
    * consumer. One row per doc, ~9 short strings wide: comfortably
    * memory-resident at any realistic doc count; at 100 TB the analog
    * is a materialized signatures table written once per corpus snapshot.
    */
  private val sigCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Release the session's cached signature relations (see
    * [[Metrics.unpersistEvents]] for when to call).
    */
  def unpersistSignatures(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    sigCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(sigCache.remove(k)).foreach(_.unpersist())
    }
  }

  /** Silver-table swap (SURVEY §8): seed the signatures cache with a
    * materialized per-doc minhash relation; the dedup tier keeps
    * calling [[signatures]] unchanged.
    */
  private[graft] def seedSignatures(spark: SparkSession, dir: String,
      silver: DataFrame): Unit = {
    val expect = "doc_id" +: (0 until NumPerms).map(i => s"mh$i")
    require(silver.columns.toSeq == expect,
      s"silver signatures schema ${silver.columns.toSeq} != $expect")
    sigCache.put((spark, dir), silver)
    SessionCaches.onApplicationEnd(spark)(() => sigCache.remove((spark, dir)))
  }

  /** The signatures relation for `tools/Materialize` (same cache entry
    * the operators read).
    */
  private[graft] def signaturesDf(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir)

  /** Per-document minhash signature: one row per doc with `NumPerms`
    * hex-string minima over word-3-gram shingles. A single
    * explode+groupBy — the signature aggregation is map-side
    * combinable, so shuffle volume is one row per document. The 8
    * permutations are 32-bit chunks of TWO salted md5s (projected once
    * per shingle row), not 8 independent md5 calls — a 4× cut of the
    * hash work that dominates the dedup tier's linear cost.
    */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    sigCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => sigCache.remove(k))
      val hs = TextOps.minhashHashes(col("shingle"))
      val sh = Corpus.shingleRows(spark, dir)
        .select(col("doc_id"), hs.head.as("h0"), hs(1).as("h1"))
      val aggs = (0 until NumPerms).map(i =>
        min(TextOps.minhashPermChunk(Seq(col("h0"), col("h1")), i)).as(s"mh$i"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).persist()
    })

  private val SignaturesSql: String = {
    val perms = (0 until NumPerms)
      .map(i => s"MIN(substr(h${i / 4}, ${(i % 4) * 8 + 1}, 8)) AS mh$i")
      .mkString(",\n  ")
    s"""SELECT doc_id,
       |  $perms
       |FROM (SELECT doc_id, md5('0|' || shingle) AS h0, md5('1|' || shingle) AS h1
       |      FROM (${TextOps.shinglesSql("documents", 3)}))
       |GROUP BY doc_id""".stripMargin
  }

  /** MinHash signatures as a query in their own right. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir).orderBy(col("doc_id"))

  val MinhashSignaturesSql: String =
    s"""$SignaturesSql
       |ORDER BY doc_id""".stripMargin

  /** Session-scoped cache of the LSH candidate-pair relation: x3, x5,
    * x27 (components), and x28 (survivors) all consume it, and the
    * band-bucket self-join is the dedup tier's one real shuffle join —
    * like [[sigCache]], the 100 TB analog is a materialized candidates
    * table written once per corpus snapshot.
    */
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Release the session's cached pair relations (see
    * [[Metrics.unpersistEvents]] for when to call).
    */
  def unpersistPairs(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    pairsCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(pairsCache.remove(k)).foreach(_.unpersist())
    }
    candShingleCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(candShingleCache.remove(k)).foreach(_.unpersist())
    }
    componentsCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(componentsCache.remove(k)).foreach(_.unpersist())
    }
    simhashPairsCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(simhashPairsCache.remove(k)).foreach(_.unpersist())
    }
  }

  /** MinHash + LSH near-dup candidate pairs: documents sharing any of
    * `NumBands` band buckets (band hash = md5 of its 2 signature rows),
    * scored by the fraction of matching signature components. The
    * band-bucket self-join is the scale path: candidates ∝ Σ bucket², and
    * the estimated-Jaccard filter (≥ 0.5) runs before output.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    pairsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => pairsCache.remove(k))
      minhashLshUncached(spark, dir).persist()
    })

  private def minhashLshUncached(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(spark, dir)
    // Carry the full signature array through the bucket explode so the
    // pair join needs no re-join against the signature relation; both
    // join sides read the persisted signature cache, so the expensive
    // shingle+md5 subtree is computed exactly once per (session, sf).
    val buckets = sig
      .withColumn("sig", array((0 until NumPerms).map(i => col(s"mh$i")): _*))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until NumBands).map(b =>
          concat(lit(s"$b:"),
            md5(concat_ws("|", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))))): _*))
          .as("bucket"))
    val l = buckets.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("bucket"))
    val r = buckets.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("bucket"))
    l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / NumPerms).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val MinhashLshSql: String = {
    val bandCols = (0 until NumBands)
      .map(b => s"md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS band$b").mkString(", ")
    val bucketRows = (0 until NumBands)
      .map(b => s"SELECT doc_id, '$b:' || band$b AS bucket FROM bands").mkString("\n  UNION ALL ")
    val eqSum = (0 until NumPerms)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sig AS ($SignaturesSql),
       |bands AS (SELECT doc_id, $bandCols FROM sig),
       |buckets AS ($bucketRows),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM buckets l JOIN buckets r
       |    ON l.bucket = r.bucket AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST($eqSum AS DOUBLE) / $NumPerms AS est_jaccard
       |FROM pairs
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |WHERE CAST($eqSum AS DOUBLE) / $NumPerms >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** x30: MULTI-KEY blocked LSH — the minhash band buckets composed
    * with a coarse blocking attribute (`lang`), so candidate generation
    * runs inside (lang, band, bucket) blocks. At 100 TB this is the
    * difference between bucketing the whole corpus and bucketing each
    * language shard: Σ bucket² shrinks by the language mix's
    * concentration (cross-language collisions — pure false candidates,
    * since the exact verify stage would reject them — never enter the
    * self-join), and the composite key spreads the shuffle across
    * strictly more, strictly smaller buckets. Same signature cache as
    * x3; the lang attribute rides the bucket explode, so no extra join
    * against `documents` on the pair side.
    */
  def minhashLshBlocked(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(spark, dir)
    val langs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val buckets = sig.join(langs, "doc_id")
      .withColumn("sig", array((0 until NumPerms).map(i => col(s"mh$i")): _*))
      .select(col("doc_id"), col("lang"), col("sig"),
        explode(array((0 until NumBands).map(b =>
          concat(col("lang"), lit(s"|$b:"),
            md5(concat_ws("|", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))))): _*))
          .as("bucket"))
    val l = buckets.select(col("doc_id").as("doc_a"), col("lang"),
      col("sig").as("sig_a"), col("bucket"))
    val r = buckets.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("bucket"))
    l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("lang"),
        (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / NumPerms).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val MinhashLshBlockedSql: String = {
    val bandCols = (0 until NumBands)
      .map(b => s"md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS band$b").mkString(", ")
    val bucketRows = (0 until NumBands)
      .map(b => s"SELECT doc_id, lang, lang || '|$b:' || band$b AS bucket FROM bands")
      .mkString("\n  UNION ALL ")
    val eqSum = (0 until NumPerms)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sig AS ($SignaturesSql),
       |bands AS (
       |  SELECT sig.doc_id AS doc_id, d.lang AS lang, $bandCols
       |  FROM sig JOIN documents d ON d.doc_id = sig.doc_id),
       |buckets AS ($bucketRows),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.lang AS lang
       |  FROM buckets l JOIN buckets r
       |    ON l.bucket = r.bucket AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, lang,
       |  CAST($eqSum AS DOUBLE) / $NumPerms AS est_jaccard
       |FROM pairs
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |WHERE CAST($eqSum AS DOUBLE) / $NumPerms >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val SimhashBits = 32

  /** SimHash near-dup clustering: a 32-bit signature per document
    * (bit j = sign of Σ_tokens ±1 weighted by bit j of the token's md5),
    * clusters = identical signatures. Bit extraction is pure integer
    * arithmetic on hex nibbles — engine-independent.
    *
    * Physical plan: ONE token explode + ONE hash aggregate computing all
    * 32 bit-weights as parallel codegen'd sum columns (per-j substr
    * index and divisor are compile-time constants), then a scalar
    * sign-combine into the bigint signature. No 32× row fan-out and no
    * second shuffle — the round-1 form exploded tokens × 32 bits; this
    * shape ships one 32-column row per doc per partition map-side.
    */
  private val simhashCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop this session's cached simhash signature relation. */
  def unpersistSimhash(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    simhashCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(simhashCache.remove(k)).foreach(_.unpersist())
    }
  }

  /** The `(doc_id, simhash)` signature relation shared by x4 (identical-
    * signature clustering) and x62 (banded Hamming near-dup) — computed
    * once per (session, sf), 12 bytes per doc in memory.
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    simhashCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => simhashCache.remove(k))
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .withColumn("h", md5(col("tok")))
      val weightAggs = (0 until SimhashBits).map { j =>
        sum(expr(
          s"CASE WHEN ((instr('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)" +
            s" div ${1 << (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END")).as(s"w$j")
      }
      toks.groupBy(col("doc_id"))
        .agg(weightAggs.head, weightAggs.tail: _*)
        .select(col("doc_id"),
          (0 until SimhashBits).map(j =>
            when(col(s"w$j") > 0, lit(1L << j)).otherwise(0L))
            .reduce(_ + _).as("simhash"))
        .persist()
    })

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(spark, dir)
    val w = Window.partitionBy(col("simhash"))
    sig.withColumn("cluster_id", min(col("doc_id")).over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("simhash"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  val SimhashSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(trim(lower(text)), ' '))) AS h
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, h, j,
       |    strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS nib
       |  FROM toks, LATERAL (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS j)),
       |wts AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN (nib // CAST(pow(2, j % 4) AS INT)) % 2 = 1
       |             THEN 1 ELSE -1 END) AS weight
       |  FROM bits GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN weight > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |             ELSE 0 END) AS BIGINT) AS simhash
       |  FROM wts GROUP BY doc_id)
       |SELECT doc_id, simhash,
       |  MIN(doc_id) OVER (PARTITION BY simhash) AS cluster_id,
       |  COUNT(*) OVER (PARTITION BY simhash) AS cluster_size
       |FROM sig
       |ORDER BY doc_id""".stripMargin

  /** x62: banded SimHash near-duplicate PAIRS (Manku, Jain & Sarma,
    * WWW'07 — the Google web-crawl dedup design): two documents are
    * near-dups iff their 32-bit simhashes differ in ≤ 3 bits. By
    * pigeonhole, any such pair agrees EXACTLY on at least one of the 4
    * disjoint 8-bit bands, so candidate generation is a band-value
    * equi-join (candidates ∝ Σ bucket², never all pairs — the same
    * blocking law as x3's minhash LSH but over a 1-word signature), and
    * the verify step is one codegen'd `bit_count(xor)` per candidate.
    * Complements x4 (identical signatures only) with the tolerance that
    * catches single-edit rewrites, and feeds the same x27 component
    * machinery if clustering is wanted downstream.
    *
    * Everything is integer arithmetic on md5 nibbles — hash-exact
    * cross-engine. Scale shape: the signature relation is 12 bytes/doc
    * (cached, shared with x4); bands shuffle 4 rows/doc of 3 ints; the
    * self-join keys on (band, value) with AQE splitting skewed buckets;
    * the Hamming filter runs inside the join's codegen stage.
    */
  val SimhashBands = 4
  val SimhashHamMax = 3

  /** Session-scoped cache of the banded simhash pair relation — the
    * independent detector's candidate set is read by x4, x62's degree
    * audit, and x82's sensitivity ground truth (which references it
    * FOUR times in one plan: pairs, doc slice, intersection, spine),
    * so the band self-join runs once per (session, corpus) instead of
    * per reference. 100 TB analog: the materialized candidates table,
    * like [[pairsCache]].
    */
  private val simhashPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    simhashPairsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => simhashPairsCache.remove(k))
      simhashNearDupOf(simhashSignatures(spark, dir)).persist()
    })

  /** Core of [[simhashNearDup]] over any `(doc_id, simhash)` relation
    * (the property spec feeds it random signatures and checks the
    * banded pair set equals brute-force all-pairs at Hamming ≤ 3 —
    * the pigeonhole completeness guarantee).
    */
  def simhashNearDupOf(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("b"))
      .withColumn("bv", expr(s"(simhash div cast(pow(256, b) as bigint)) % 256"))
    val a = bands.select(col("b"), col("bv"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val bb = bands.select(col("b"), col("bv"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(bb, Seq("b", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("hamming",
        expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .filter(col("hamming") <= SimhashHamMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val SimhashNearDupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(trim(lower(text)), ' '))) AS h
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, h, j,
       |    strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS nib
       |  FROM toks, LATERAL (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS j)),
       |wts AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN (nib // CAST(pow(2, j % 4) AS INT)) % 2 = 1
       |             THEN 1 ELSE -1 END) AS weight
       |  FROM bits GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN weight > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |             ELSE 0 END) AS BIGINT) AS simhash
       |  FROM wts GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, simhash, b,
       |    (simhash // CAST(pow(256, b) AS BIGINT)) % 256 AS bv
       |  FROM sig, (SELECT unnest(generate_series(0, ${SimhashBands - 1})) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |    a.simhash AS sig_a, c.simhash AS sig_b
       |  FROM bands a JOIN bands c ON c.b = a.b AND c.bv = a.bv
       |    AND a.doc_id < c.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sig_a, sig_b)) <= $SimhashHamMax
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Row-local simhash of a `text` column — bit-identical to
    * [[simhashSignatures]]'s aggregate form (the bit-weight sums are
    * integer, so fold order cannot change them) but computed entirely
    * INSIDE the row as array HOFs: no explode, no aggregation, no
    * state. This is what lets the identical operator run on a
    * STREAMING frame (x63's firewall) — per-doc signatures need no
    * shuffle at all, batch or streaming.
    */
  val SimhashRowExpr: String =
    s"""aggregate(
       |  transform(split(trim(lower(text)), ' '), t -> md5(t)),
       |  array_repeat(0, $SimhashBits),
       |  (acc, h) -> zip_with(acc, sequence(0, ${SimhashBits - 1}), (a, j) ->
       |    a + (CASE WHEN ((instr('0123456789abcdef',
       |        substr(h, cast(j div 4 as int) + 1, 1)) - 1)
       |        div shiftleft(1, cast(j % 4 as int))) % 2 = 1
       |      THEN 1 ELSE -1 END)),
       |  acc -> aggregate(zip_with(acc, sequence(0, ${SimhashBits - 1}), (w, j) ->
       |    CASE WHEN w > 0 THEN shiftleft(cast(1 as bigint), cast(j as int))
       |         ELSE cast(0 as bigint) END),
       |    cast(0 as bigint), (s, v) -> s + v))""".stripMargin

  /** x63: near-duplicate DEGREE — the per-document quarantine report
    * derived from x62's pair relation: how many corpus partners sit at
    * Hamming ≤ 3, the closest distance, and the nearest partner id
    * (ties → smallest id). Degree-0 docs are the retainable core; a
    * high-degree doc is template spam that x28-style survivor picking
    * should collapse. Same band-blocked shapes as x62; the symmetrized
    * edge list doubles pair rows (still ∝ matches, not corpus²).
    */
  def neardupDegree(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(spark, dir)
    val pairs = simhashNearDup(spark, dir)
    val sym = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("hamming"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("hamming")))
    val deg = sym.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_neardups"),
        min(col("hamming")).as("min_hamming"),
        min_by(col("partner"), struct(col("hamming"), col("partner"))).as("nearest_partner"))
    sig.select(col("doc_id")).join(deg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_neardups"))
      .na.fill(-1L, Seq("min_hamming", "nearest_partner"))
      .orderBy(col("doc_id"))
  }

  val NeardupDegreeSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(trim(lower(text)), ' '))) AS h
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, h, j,
       |    strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS nib
       |  FROM toks, LATERAL (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS j)),
       |wts AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN (nib // CAST(pow(2, j % 4) AS INT)) % 2 = 1
       |             THEN 1 ELSE -1 END) AS weight
       |  FROM bits GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN weight > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |             ELSE 0 END) AS BIGINT) AS simhash
       |  FROM wts GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, simhash, b,
       |    (simhash // CAST(pow(256, b) AS BIGINT)) % 256 AS bv
       |  FROM sig, (SELECT unnest(generate_series(0, ${SimhashBands - 1})) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |    a.simhash AS sig_a, c.simhash AS sig_b
       |  FROM bands a JOIN bands c ON c.b = a.b AND c.bv = a.bv
       |    AND a.doc_id < c.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= $SimhashHamMax),
       |sym AS (
       |  SELECT doc_a AS doc_id, doc_b AS partner, hamming FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_id, doc_a AS partner, hamming FROM pairs),
       |deg AS (
       |  SELECT doc_id, COUNT(*) AS n_neardups,
       |    MIN(hamming) AS min_hamming,
       |    MAX(CASE WHEN rn = 1 THEN partner END) AS nearest_partner
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |          ORDER BY hamming, partner) AS rn FROM sym)
       |  GROUP BY doc_id)
       |SELECT s.doc_id,
       |  COALESCE(n_neardups, 0) AS n_neardups,
       |  COALESCE(min_hamming, -1) AS min_hamming,
       |  COALESCE(nearest_partner, -1) AS nearest_partner
       |FROM sig s LEFT JOIN deg ON deg.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Streaming near-dup FIREWALL: incoming `(doc_id, text)` docs are
    * simhashed ROW-LOCALLY ([[SimhashRowExpr]]), band-exploded, and
    * stream-static joined against the corpus band relation — each
    * micro-batch emits the incoming doc's Hamming ≤ 3 partners before
    * the doc is admitted, which is exactly the production shape:
    * the corpus index is static (rebuilt per snapshot), the candidate
    * docs arrive continuously. `dropDuplicates` collapses multi-band
    * matches of the same pair (bounded ≤ 4 duplicates per pair; a
    * production deployment bounds the state with an ingest-time
    * watermark). `StreamingSpec` pins streaming ≡ the batch pair
    * relation on the same corpus.
    */
  def simhashFirewall(docs: DataFrame, corpusSig: DataFrame): DataFrame = {
    val staticBands = corpusSig.select(col("doc_id").as("partner"),
        col("simhash").as("sig_b"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("b"))
      .withColumn("bv", expr(s"(sig_b div cast(pow(256, b) as bigint)) % 256"))
    docs.withColumn("sig_a", expr(SimhashRowExpr))
      .select(col("doc_id"), col("sig_a"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("b"))
      .withColumn("bv", expr(s"(sig_a div cast(pow(256, b) as bigint)) % 256"))
      .join(staticBands, Seq("b", "bv"))
      .filter(col("partner") =!= col("doc_id"))
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .filter(col("hamming") <= SimhashHamMax)
      .select(col("doc_id"), col("partner"), col("hamming"))
      .dropDuplicates("doc_id", "partner")
  }

  /** Connected components over an undirected edge list `(doc_a, doc_b)`:
    * hash-min label propagation with POINTER-JUMPING, iterated to
    * fixpoint. Each round does (a) one join + min-aggregate pulling the
    * smallest label across every edge (one hop), then (b) one self-join
    * replacing each label by its OWN current label (`l(v) := l(l(v))`),
    * which doubles the reach per round — convergence in O(log diameter)
    * rounds, the standard large-graph CC recurrence. Rounds run until no
    * label changes, so arbitrarily long duplicate chains close (the
    * fixed 3-round unroll this replaces only reached 3 hops from each
    * component's min vertex). `localCheckpoint` after every round
    * truncates lineage — the iteration-N plan does not re-grow the
    * whole history, which is what makes the loop viable on a real
    * cluster. Deterministic: every step is a min over vertex ids.
    */
  private[graft] def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("doc_a"), col("doc_b"))
      .unionAll(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = sym.select(col("doc_a").as("v")).distinct()
      .withColumn("component_id", col("v"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("v", "doc_b"), Seq("doc_b"))
        .select(col("doc_a").as("v"), col("component_id"))
      val minStep = labels.unionAll(viaNeighbor)
        .groupBy(col("v")).agg(min(col("component_id")).as("component_id"))
      // pointer-jump: labels are vertex ids, so every component_id is
      // itself a labeled vertex — follow it one step
      val parents = minStep.select(col("v").as("_p"), col("component_id").as("_pc"))
      // the previous-label join rides INSIDE the checkpointed round so
      // the convergence test is a scan of the checkpoint, not its own
      // shuffle-join action (halves the per-round job count)
      val jumped = minStep.join(parents, col("component_id") === col("_p"), "left")
        .select(col("v"), coalesce(col("_pc"), col("component_id")).as("component_id"))
        .join(labels.withColumnRenamed("component_id", "_prev"), Seq("v"))
        .withColumn("_chg", col("component_id") =!= col("_prev"))
        .select(col("v"), col("component_id"), col("_chg"))
        .localCheckpoint()
      val changed = jumped.filter(col("_chg")).limit(1).count()
      labels = jumped.select(col("v"), col("component_id"))
      converged = changed == 0L
    }
    labels
  }

  /** Session-scoped cache of the component labels: x27 and x28 share
    * the converged propagation (survivor selection no longer re-runs
    * the whole loop).
    */
  private val componentsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Transitive near-duplicate clusters: connected components over the
    * LSH candidate-pair graph (doc A ~ B ~ C lands A and C in one
    * cluster even though they never shared a bucket — the step actual
    * dedup pipelines run between candidate generation and survivor
    * selection). The propagation runs on the pairs-sized edge list —
    * never the corpus — via [[connectedComponents]]; the oracle computes
    * the same fixpoint with a recursive transitive-closure CTE.
    */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame =
    componentLabels(spark, dir)
      .select(col("v").as("doc_id"), col("component_id"))
      .withColumn("is_root", col("doc_id") === col("component_id"))
      .orderBy(col("doc_id"))

  private def componentLabels(spark: SparkSession, dir: String): DataFrame =
    componentsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => componentsCache.remove(k))
      connectedComponents(minhashLsh(spark, dir).select(col("doc_a"), col("doc_b")))
        .persist()
    })

  lazy val DedupComponentsSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ($MinhashLshSql)),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs),
       |reach(v, r) AS (
       |  SELECT doc_a AS v, doc_a AS r FROM edges
       |  UNION
       |  SELECT e.doc_a AS v, p.r
       |  FROM edges e JOIN reach p ON p.v = e.doc_b)
       |SELECT v AS doc_id, MIN(r) AS component_id,
       |  v = MIN(r) AS is_root
       |FROM reach
       |GROUP BY v
       |ORDER BY doc_id""".stripMargin

  /** Survivor selection — the final step of the dedup chain (candidates
    * → verification → components → ONE kept doc per cluster): the
    * longest document of each near-dup component survives (tie → lowest
    * doc_id). One ranking window partitioned on the component key over
    * the components-sized relation; everything upstream is shared with
    * x27/x3 via the session caches.
    */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    // read the cached labels directly (no presentation sort in the way)
    val comps = componentLabels(spark, dir)
      .select(col("v").as("doc_id"), col("component_id"))
    val len = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("component_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    comps.join(len, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("component_id"), col("n_chars"),
        (col("rk") === 1).as("survivor"))
      .orderBy(col("doc_id"))
  }

  lazy val SurvivorsSql: String =
    s"""WITH comps AS (
       |  SELECT doc_id, component_id FROM ($DedupComponentsSql)),
       |j AS (
       |  SELECT c.doc_id AS doc_id, component_id, d.n_chars AS n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY component_id
       |                       ORDER BY d.n_chars DESC, c.doc_id) AS rk
       |  FROM comps c JOIN documents d ON d.doc_id = c.doc_id)
       |SELECT doc_id, component_id, n_chars, rk = 1 AS survivor
       |FROM j
       |ORDER BY doc_id""".stripMargin

  /** x97: QUALITY-AWARE survivor selection — the same dedup chain as
    * x28 but with the production policy knob turned: keep the HIGHEST
    * x10-quality copy of each near-dup component (ties → longest →
    * lowest id) instead of the longest. Duplicate clusters routinely
    * contain one clean copy and several truncated/boilerplate-wrapped
    * ones, and "longest" then keeps the wrapper; ranking on the
    * quality tier keeps the clean one. Every row also carries BOTH
    * policies' verdicts and a `policy_changed` flag, so the audit
    * quantifies exactly how much the knob matters on this corpus
    * before anyone flips it. Same scale shape as x28: one components
    * relation (shared cache) + one quality join + two ranking windows
    * over the components-sized slice.
    */
  def bestCopySurvivors(spark: SparkSession, dir: String): DataFrame = {
    val comps = componentLabels(spark, dir)
      .select(col("v").as("doc_id"), col("component_id"))
    val qual = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"), col("n_chars"))
    val wq = Window.partitionBy(col("component_id"))
      .orderBy(col("quality_score").desc, col("n_chars").desc, col("doc_id"))
    val wl = Window.partitionBy(col("component_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    comps.join(qual, Seq("doc_id"))
      .withColumn("survivor_quality", row_number().over(wq) === 1)
      .withColumn("survivor_length", row_number().over(wl) === 1)
      .select(col("doc_id"), col("component_id"), col("quality_score"),
        col("n_chars"), col("survivor_quality"), col("survivor_length"),
        (col("survivor_quality") =!= col("survivor_length")).as("policy_changed"))
      .orderBy(col("doc_id"))
  }

  lazy val BestCopySurvivorsSql: String =
    s"""WITH comps AS (
       |  SELECT doc_id, component_id FROM ($DedupComponentsSql)),
       |q AS (SELECT doc_id, quality_score, n_chars
       |      FROM (${TextAnalysis.QualityScoreSql})),
       |j AS (
       |  SELECT c.doc_id AS doc_id, component_id, quality_score, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY component_id
       |      ORDER BY quality_score DESC, n_chars DESC, c.doc_id) AS rq,
       |    ROW_NUMBER() OVER (PARTITION BY component_id
       |      ORDER BY n_chars DESC, c.doc_id) AS rl
       |  FROM comps c JOIN q ON q.doc_id = c.doc_id)
       |SELECT doc_id, component_id, quality_score, n_chars,
       |  rq = 1 AS survivor_quality, rl = 1 AS survivor_length,
       |  (rq = 1) <> (rl = 1) AS policy_changed
       |FROM j
       |ORDER BY doc_id""".stripMargin

  /** x99: the dedup-cascade FUNNEL — x70's survival report specialized
    * to the dedup stack: every document falls at its FIRST failing
    * gate (exact md5 twin → minhash near-dup non-survivor → perceptual
    * dHash cluster non-canonical) or survives all three; per ordered
    * stage the report carries docs dropped, TOKENS dropped (the
    * storage/training-cost savings a release actually quotes),
    * documents entering, and documents remaining. Stages that drop
    * nothing still appear (static stage relation, the x70 rule).
    * Perceptual canonicals are each dHash component's min doc_id
    * (components via the same label-propagation loop as x27; the
    * oracle runs the recursive-closure twin over the same pair SQL).
    * Scale: three digest/pair relations all ∝ matches (shared session
    * caches), one corpus-wide classification join on doc_id, one
    * 3-row aggregate.
    */
  def dedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks"))
    val k1 = exact(spark, dir).select(col("doc_id"), col("keep").as("k1"))
    val k2 = survivors(spark, dir).select(col("doc_id"), col("survivor").as("k2"))
    val k3 = connectedComponents(
        Multimodal.phashNeardup(spark, dir).select(col("doc_a"), col("doc_b")))
      .select(col("v").as("doc_id"), (col("v") === col("component_id")).as("k3"))
    val cls = toks.join(k1, Seq("doc_id"))
      .join(k2, Seq("doc_id"), "left").na.fill(true, Seq("k2"))
      .join(k3, Seq("doc_id"), "left").na.fill(true, Seq("k3"))
      .select(col("n_toks"),
        when(!col("k1"), "exact")
          .when(!col("k2"), "near")
          .when(!col("k3"), "perceptual")
          .otherwise("kept").as("stage"))
    // ONE pass over the classified corpus: the per-stage aggregate
    // keeps the `kept` group so the total falls out of the same ≤4-row
    // result — the old separate `cls.agg(count)` re-evaluated the
    // whole tokenize+join pipeline a second time (measured as the
    // query's own cost doubled)
    val counts = cls.groupBy(col("stage"))
      .agg(count(lit(1)).as("dropped_docs"),
        sum(col("n_toks")).as("dropped_tokens"))
      .collect()
    val total = counts.map(_.getLong(1)).sum
    val byStage = counts.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stages = spark.createDataFrame(Seq(
      (1, "exact"), (2, "near"), (3, "perceptual"))).toDF("stage_order", "stage")
    val dropped = spark.createDataFrame(
      Seq("exact", "near", "perceptual").map { s =>
        val (d, t) = byStage.getOrElse(s, (0L, 0L))
        (s, d, t)
      }).toDF("stage", "dropped_docs", "dropped_tokens")
    val w = Window.orderBy(col("stage_order"))
      .rowsBetween(Window.unboundedPreceding, -1)
    stages.join(dropped, Seq("stage"))
      .withColumn("entered", lit(total) - coalesce(sum(col("dropped_docs")).over(w), lit(0L)))
      .withColumn("remaining", col("entered") - col("dropped_docs"))
      .select(col("stage_order"), col("stage"), col("dropped_docs"),
        col("dropped_tokens"), col("entered"), col("remaining"))
      .orderBy(col("stage_order"))
  }

  lazy val DedupFunnelSql: String =
    s"""WITH e AS (SELECT doc_id, keep AS k1 FROM ($ExactSql)),
       |s AS (SELECT doc_id, survivor AS k2 FROM ($SurvivorsSql)),
       |p AS (
       |  SELECT doc_id, is_root AS k3 FROM (
       |    WITH RECURSIVE pairs AS (
       |      SELECT doc_a, doc_b FROM (${Multimodal.PhashNeardupSql})),
       |    edges AS (
       |      SELECT doc_a, doc_b FROM pairs
       |      UNION ALL
       |      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs),
       |    reach(v, r) AS (
       |      SELECT doc_a AS v, doc_a AS r FROM edges
       |      UNION
       |      SELECT e.doc_a AS v, q.r
       |      FROM edges e JOIN reach q ON q.v = e.doc_b)
       |    SELECT v AS doc_id, v = MIN(r) AS is_root
       |    FROM reach GROUP BY v)),
       |d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |cls AS (
       |  SELECT n_toks,
       |    CASE WHEN NOT k1 THEN 'exact'
       |         WHEN NOT COALESCE(s.k2, true) THEN 'near'
       |         WHEN NOT COALESCE(p.k3, true) THEN 'perceptual'
       |         ELSE 'kept' END AS stage
       |  FROM d
       |  JOIN e USING (doc_id)
       |  LEFT JOIN s USING (doc_id)
       |  LEFT JOIN p USING (doc_id)),
       |dr AS (
       |  SELECT stage, COUNT(*) AS dropped_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS dropped_tokens
       |  FROM cls WHERE stage <> 'kept' GROUP BY stage),
       |st AS (SELECT * FROM (VALUES (1, 'exact'), (2, 'near'), (3, 'perceptual'))
       |       AS t(stage_order, stage)),
       |tot AS (SELECT COUNT(*) AS total FROM cls),
       |f AS (
       |  SELECT stage_order, st.stage AS stage,
       |    COALESCE(dropped_docs, 0) AS dropped_docs,
       |    COALESCE(dropped_tokens, 0) AS dropped_tokens
       |  FROM st LEFT JOIN dr ON dr.stage = st.stage)
       |SELECT stage_order, stage, dropped_docs, dropped_tokens,
       |  total - CAST(COALESCE(SUM(dropped_docs) OVER (ORDER BY stage_order
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS entered,
       |  total - CAST(COALESCE(SUM(dropped_docs) OVER (ORDER BY stage_order
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    - dropped_docs AS remaining
       |FROM f CROSS JOIN tot
       |ORDER BY stage_order""".stripMargin

  /** Exact n-gram Jaccard verification of the LSH candidate pairs:
    * |A∩B| / |A∪B| over distinct word-3-gram sets. Runs only on pairs
    * that shared a band bucket — the two-stage recall→precision
    * composition that makes exact similarity affordable at scale.
    */
  /** Session-scoped cache of the candidate-doc distinct-shingle slice
    * (x5's three-consumer intermediate); evicted with the other caches.
    */
  private val candShingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Session-scoped cache of x82's GROUND-doc distinct-shingle slice —
    * the simhash-pair twin of [[candShingleCache]] (the ground docs are
    * a different set than the minhash candidates; that difference IS
    * the sensitivity audit). Without it the semi-join + distinct
    * re-evaluated once per consumer (counts + both intersection sides).
    */
  private val groundShingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Shared exact-overlap statistics per LSH candidate pair:
    * `(doc_a, doc_b, n_inter, n_a, n_b)` over distinct 3-gram shingle
    * sets — x5 derives Jaccard from it, x68 containment.
    */
  private def candidatePairStats(spark: SparkSession, dir: String): DataFrame = {
    // The candidate relation is the pairs-cache entry itself (persisted
    // in minhashLsh) — a projection on top of it serves from the same
    // InMemoryRelation, so no extra persist here.
    val candidates = minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    // Only documents that appear in a candidate pair matter downstream
    // (counts are consumed per-pair) — semi-join the corpus down to them
    // BEFORE the shingle explode, so the exact-verification stage costs
    // O(candidate docs), not O(corpus). The pair set is tiny by
    // construction → broadcast semi-join, no shuffle of the corpus.
    val candDocs = candidates.select(col("doc_a").as("doc_id"))
      .unionAll(candidates.select(col("doc_b").as("doc_id"))).distinct()
    // the distinct shingle relation feeds three consumers (per-doc counts
    // + both sides of the intersection join) — cache the tiny
    // candidate-only slice per (session, sf) like the other dedup
    // relations (evicted at application end, never orphaned)
    val sh = candShingleCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => candShingleCache.remove(k))
      Corpus.shingleRows(spark, dir)
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("shingle"))
        .distinct()
        .persist()
    })
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val interCount = candidates.join(a, "doc_a").join(b, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    candidates
      .join(interCount, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    candidatePairStats(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** x68: exact CONTAINMENT per LSH candidate pair (Broder's second
    * resemblance measure): C(A,B) = |A∩B| / |A| and its mirror — the
    * asymmetric signal Jaccard dilutes when one document is a fragment
    * of a longer one (a fully-quoted post inside a digest scores
    * C ≈ 1 with a low Jaccard). `contained_doc` names the side whose
    * shingle set is (nearly) inside the other (ties → doc_a);
    * `contained` fires at max-containment ≥ 0.8 — near-uniform over
    * x3's HIGH-similarity candidates by construction (this fixture:
    * all 25), discriminative when fed weaker candidate sets; the
    * per-pair containments and direction are the operative output.
    * Same candidate-slice relations as x5 — the exact-verification
    * stage stays O(candidate docs) at any corpus size.
    */
  def containment(spark: SparkSession, dir: String): DataFrame =
    candidatePairStats(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_inter"),
        (col("n_inter").cast("double") / col("n_a").cast("double")).as("cont_a"),
        (col("n_inter").cast("double") / col("n_b").cast("double")).as("cont_b"))
      .withColumn("contained_doc",
        when(col("cont_a") >= col("cont_b"), col("doc_a")).otherwise(col("doc_b")))
      .withColumn("contained", greatest(col("cont_a"), col("cont_b")) >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))

  val NgramJaccardSql: String =
    s"""WITH cand AS (SELECT doc_a, doc_b FROM ($MinhashLshSql)),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (${TextOps.shinglesSql("documents", 3)})),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT cand.doc_a, cand.doc_b, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN sh a ON a.doc_id = cand.doc_a
       |  JOIN sh b ON b.doc_id = cand.doc_b AND b.shingle = a.shingle
       |  GROUP BY cand.doc_a, cand.doc_b)
       |SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
       |  CAST(COALESCE(n_inter, 0) AS DOUBLE)
       |    / CAST(ca.n + cb.n - COALESCE(n_inter, 0) AS DOUBLE) AS jaccard
       |FROM cand
       |LEFT JOIN inter ON inter.doc_a = cand.doc_a AND inter.doc_b = cand.doc_b
       |JOIN cnt ca ON ca.doc_id = cand.doc_a
       |JOIN cnt cb ON cb.doc_id = cand.doc_b
       |ORDER BY 1, 2""".stripMargin

  val ContainmentSql: String =
    s"""WITH cand AS (SELECT doc_a, doc_b FROM ($MinhashLshSql)),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (${TextOps.shinglesSql("documents", 3)})),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT cand.doc_a, cand.doc_b, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN sh a ON a.doc_id = cand.doc_a
       |  JOIN sh b ON b.doc_id = cand.doc_b AND b.shingle = a.shingle
       |  GROUP BY cand.doc_a, cand.doc_b),
       |s AS (
       |  SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
       |    ca.n AS n_a, cb.n AS n_b,
       |    CAST(COALESCE(n_inter, 0) AS BIGINT) AS n_inter,
       |    CAST(COALESCE(n_inter, 0) AS DOUBLE) / CAST(ca.n AS DOUBLE) AS cont_a,
       |    CAST(COALESCE(n_inter, 0) AS DOUBLE) / CAST(cb.n AS DOUBLE) AS cont_b
       |  FROM cand
       |  LEFT JOIN inter ON inter.doc_a = cand.doc_a AND inter.doc_b = cand.doc_b
       |  JOIN cnt ca ON ca.doc_id = cand.doc_a
       |  JOIN cnt cb ON cb.doc_id = cand.doc_b)
       |SELECT doc_a, doc_b, n_a, n_b, n_inter, cont_a, cont_b,
       |  CASE WHEN cont_a >= cont_b THEN doc_a ELSE doc_b END AS contained_doc,
       |  GREATEST(cont_a, cont_b) >= 0.8 AS contained
       |FROM s
       |ORDER BY doc_a, doc_b""".stripMargin

  /** x52: near-duplicate SOURCE attribution — the curation report that
    * tells you WHERE the duplication comes from: the x3 LSH pair list
    * rolled up to an (ordered) source-pair matrix with pair counts and
    * the mean estimated Jaccard. Cross-source cells (source_lo ≠
    * source_hi) are mirror/scrape overlap between feeds; the diagonal
    * is within-feed duplication — the signal that decides which source
    * to drop or down-weight in the next mixture.
    *
    * Scale shape: the pair relation is ≪ corpus by construction (LSH
    * candidates), so both lookups of `source` are joins of the tiny
    * pair side against a 2-column projection of `documents` — AQE
    * broadcasts the pair side and the corpus never shuffles; the final
    * rollup groups ≤ |sources|² rows. Mean Jaccard stays exact: the
    * 8-permutation estimate is always k/8, so summing `8·est` as
    * BIGINT and dividing once keeps the mean a single correctly-
    * rounded IEEE divide in both engines (the x47 rule — no float
    * accumulation anywhere).
    */
  def neardupSourceAttribution(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        (col("est_jaccard") * NumPerms).cast("bigint").as("perm_hits"))
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"),
        col("perm_hits"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("perm_hits")).as("sum_hits"))
      .select(col("source_lo"), col("source_hi"),
        (col("source_lo") === col("source_hi")).as("within_source"),
        col("n_pairs"),
        (col("sum_hits").cast("double") /
          (col("n_pairs") * NumPerms).cast("double")).as("mean_est_jaccard"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  val NeardupSourceAttributionSql: String =
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, CAST(est_jaccard * $NumPerms AS BIGINT) AS perm_hits
       |  FROM ($MinhashLshSql)),
       |s AS (SELECT doc_id, source FROM documents),
       |j AS (
       |  SELECT least(sa.source, sb.source) AS source_lo,
       |    greatest(sa.source, sb.source) AS source_hi, perm_hits
       |  FROM pairs p
       |  JOIN s sa ON sa.doc_id = p.doc_a
       |  JOIN s sb ON sb.doc_id = p.doc_b)
       |SELECT source_lo, source_hi, source_lo = source_hi AS within_source,
       |  COUNT(*) AS n_pairs,
       |  CAST(CAST(SUM(perm_hits) AS BIGINT) AS DOUBLE)
       |    / CAST(COUNT(*) * $NumPerms AS DOUBLE) AS mean_est_jaccard
       |FROM j
       |GROUP BY source_lo, source_hi
       |ORDER BY source_lo, source_hi""".stripMargin

  /** x55: split-leakage audit — near-duplicate pairs that STRADDLE the
    * x44 train/val/test boundary. Exact dedup runs before splitting,
    * but near-duplicates survive it, and a train↔test near-dup pair is
    * eval leakage: the held-out doc is effectively in the training set.
    * This is the release gate every curation pipeline runs after
    * assignment — the x3 pair list joined to the x44 hash gate, one
    * row per candidate pair with both splits and the leak verdict
    * (`leaky` = the splits differ; train↔test is the fatal cell).
    *
    * Scale shape: identical to x52 — the pair side is ≪ corpus and
    * broadcasts against a 1-expression projection of `documents`
    * (the split gate is computed in the scan, no x44 materialization
    * needed); the corpus never shuffles. Deterministic end to end:
    * the gate is the x44 md5-threshold compare, est_jaccard is k/8.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val split = Tables.documents(spark, dir)
      .withColumn("h2", substring(md5(col("doc_id").cast("string")), 1, 2))
      .select(col("doc_id"),
        when(col("h2") < "cc", "train")
          .when(col("h2") < "e6", "val").otherwise("test").as("split"))
    minhashLsh(spark, dir)
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("est_jaccard"),
        (col("split_a") =!= col("split_b")).as("leaky"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val SplitLeakageSql: String =
    s"""WITH pairs AS (SELECT doc_a, doc_b, est_jaccard FROM ($MinhashLshSql)),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT doc_a, doc_b, sa.split AS split_a, sb.split AS split_b,
       |  est_jaccard, sa.split <> sb.split AS leaky
       |FROM pairs
       |JOIN sp sa ON sa.doc_id = doc_a
       |JOIN sp sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** x82: LSH sensitivity audit — the "did our banding miss near-dups"
    * calibration every production dedup pass needs before trusting its
    * recall. Ground truth comes from the INDEPENDENT detector (x4's
    * simhash banding); for each ground pair we compute the exact
    * 3-gram Jaccard s, the analytic minhash-LSH detection probability
    * under the x3 configuration (b = 4 bands × r = 2 rows:
    * `P = 1 − (1 − s²)⁴`), and whether x3's candidate generation
    * actually surfaced the pair. Low-P pairs x3 missed are EXPECTED
    * misses (the S-curve working as designed); high-P misses would be
    * implementation bugs — the audit separates the two.
    *
    * Determinism: the banding formula is evaluated as PINNED MULTIPLY
    * CHAINS (s² = s·s, q = 1 − s², q⁴ = (q·q)·(q·q)) — no `pow`, so
    * no libm and the whole operator hash-gates. Scale: ground pairs ∝
    * simhash band buckets, Jaccard verification is the x5 shape
    * (candidate-doc slice of the shared shingle cache, keyed joins),
    * the x3 flag one equi-join — everything ∝ matches, never corpus².
    */
  def lshSensitivity(spark: SparkSession, dir: String): DataFrame = {
    val ground = simhashNearDup(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val groundDocs = ground.select(col("doc_a").as("doc_id"))
      .unionAll(ground.select(col("doc_b").as("doc_id"))).distinct()
    val sh = groundShingleCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => groundShingleCache.remove(k))
      Corpus.shingleRows(spark, dir)
        .join(broadcast(groundDocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("shingle")).distinct()
        .persist()
    })
    // Exact per-pair intersection via per-doc shingle ARRAYS
    // (array_intersect of distinct sets — same integer |A∩B| as the
    // join+count form): the previous shape joined every ground pair
    // against BOTH endpoint shingle lists and shuffled the
    // pairs×shingles fan-out into a count aggregate; this one shuffles
    // each ground doc's shingles once (into its array) and the pair
    // relation twice, all ∝ matches. Output bit-identical (same
    // integer counts, same divide).
    val arrs = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("arr"), count(lit(1)).as("n"))
    val found = minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
      .withColumn("found_by_minhash", lit(true))
    ground
      .join(arrs.select(col("doc_id").as("doc_a"), col("arr").as("_aa"),
        col("n").as("n_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("arr").as("_ab"),
        col("n").as("n_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("_aa"), col("_ab"))).cast("long"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .withColumn("s2", col("jaccard") * col("jaccard"))
      .withColumn("q", lit(1.0) - col("s2"))
      .withColumn("q2", col("q") * col("q"))
      .withColumn("p_detect", lit(1.0) - col("q2") * col("q2"))
      .join(found, Seq("doc_a", "doc_b"), "left")
      .na.fill(false, Seq("found_by_minhash"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("p_detect"), col("found_by_minhash"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle twin of [[lshSensitivity]] — the same ground relation,
    * exact-Jaccard joins, and pinned multiply chain.
    */
  lazy val LshSensitivitySql: String =
    s"""WITH ground AS (SELECT doc_a, doc_b FROM ($SimhashNearDupSql)),
       |cand AS (SELECT doc_a, doc_b FROM ($MinhashLshSql)),
       |sh AS (SELECT DISTINCT doc_id, shingle
       |       FROM (${graft.functions.TextOps.shinglesSql("documents", 3)})),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT g.doc_a, g.doc_b, COUNT(*) AS n_inter
       |  FROM ground g
       |  JOIN sh a ON a.doc_id = g.doc_a
       |  JOIN sh b ON b.doc_id = g.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT g.doc_a, g.doc_b,
       |    CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
       |      / CAST(ca.n + cb.n - COALESCE(i.n_inter, 0) AS DOUBLE) AS jaccard
       |  FROM ground g
       |  JOIN cnt ca ON ca.doc_id = g.doc_a
       |  JOIN cnt cb ON cb.doc_id = g.doc_b
       |  LEFT JOIN inter i ON i.doc_a = g.doc_a AND i.doc_b = g.doc_b),
       |p1 AS (SELECT *, jaccard * jaccard AS s2 FROM j),
       |p2 AS (SELECT *, 1.0 - s2 AS q FROM p1),
       |p3 AS (SELECT *, q * q AS q2 FROM p2)
       |SELECT p3.doc_a AS doc_a, p3.doc_b AS doc_b, jaccard,
       |  1.0 - q2 * q2 AS p_detect,
       |  (c.doc_a IS NOT NULL) AS found_by_minhash
       |FROM p3 LEFT JOIN cand c
       |  ON c.doc_a = p3.doc_a AND c.doc_b = p3.doc_b
       |ORDER BY p3.doc_a, p3.doc_b""".stripMargin

  // ------------------------------------------------------------------
  // x96 — fixed-point damped centrality over the near-dup graph
  // ------------------------------------------------------------------

  /** Damping in percent and rounds — exact integers so every rank stays
    * a BIGINT nano-unit and all three engines' arithmetic is identical.
    */
  val CentralityDampPct = 85L
  val CentralityRounds = 3
  private val CentralityInitNano = 1000000000L
  private val CentralityTeleportNano = 150000000L

  /** x96: which documents sit at the CENTER of the near-dup graph —
    * the template-hub view the pair/degree audits (x62/x63) can't
    * give: a boilerplate template that seeded hundreds of variants
    * accumulates rank from its whole neighborhood, while a doc in an
    * isolated duplicate pair stays near the teleport floor. PageRank's
    * damped iteration in FIXED-POINT arithmetic: ranks are nano-unit
    * BIGINTs, each round sends `(r_j · 85) div (100 · deg_j)` along
    * every edge (integer division — exact, order-free sums) and adds
    * the 0.15 teleport, unrolled [[CentralityRounds]] times for the
    * oracle (the x37b recipe; the dampened walk contracts, so 3 rounds
    * separate hubs from leaves). Nodes = docs in x92's perceptual
    * near-dup pairs — the DENSE duplication graph (x3's ≥0.5-Jaccard
    * pairs are isolated twins on this corpus: every component is a
    * 2-node fixed point; the dHash graph has real template clusters);
    * edges symmetric.
    *
    * Scale: the graph is the LSH pair relation (∝ matches, never
    * corpus²); each round is one keyed join + one hash aggregate over
    * (doc_id, BIGINT) rows; rank mass is bounded by init+teleport so
    * the BIGINTs stay far inside 2⁶³ at any corpus size.
    */
  def neardupCentrality(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Multimodal.phashNeardup(spark, dir).select(col("doc_a"), col("doc_b"))
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // The walk references the degree relation twice per round (damping
    // divisor + teleport floor) and the edge list once per round — left
    // inline, the 3-round unrolled plan recomputed deg 7× and sym 3×
    // from the pair cache (measured: most of the query's stages).
    // localCheckpoint materializes each ONCE; both are edge/node-sized
    // (∝ matches), so the checkpoint is small at any corpus scale.
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val symDeg = sym.join(deg, Seq("src")).localCheckpoint()
    var r = deg.select(col("src").as("doc_id"),
      lit(CentralityInitNano).as("rank_nano"))
    (1 to CentralityRounds).foreach { _ =>
      val contribs = symDeg
        .join(r.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"),
          expr(s"(rank_nano * $CentralityDampPct) div (100 * deg)").as("c"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("in_nano"))
      r = deg.select(col("src").as("doc_id"))
        .join(contribs, Seq("doc_id"), "left")
        .na.fill(0L, Seq("in_nano"))
        .select(col("doc_id"),
          (lit(CentralityTeleportNano) + col("in_nano")).as("rank_nano"))
    }
    r.join(deg.select(col("src").as("doc_id"), col("deg")), "doc_id")
      .select(col("doc_id"), col("deg").as("degree"), col("rank_nano"),
        (col("rank_nano").cast("double") / lit(1e9)).as("rank"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin of [[neardupCentrality]] — the walk unrolled
    * [[CentralityRounds]] times as integer CTEs.
    */
  lazy val NeardupCentralitySql: String = {
    val rounds = (1 to CentralityRounds).map { k =>
      s"""c$k AS (
         |  SELECT dst AS doc_id, CAST(SUM((rank_nano * $CentralityDampPct)
         |    // (100 * deg)) AS BIGINT) AS in_nano
         |  FROM sym
         |  JOIN r${k - 1} ON r${k - 1}.doc_id = sym.src
         |  JOIN deg ON deg.src = sym.src
         |  GROUP BY dst),
         |r$k AS (
         |  SELECT deg.src AS doc_id,
         |    $CentralityTeleportNano + COALESCE(in_nano, 0) AS rank_nano
         |  FROM deg LEFT JOIN c$k ON c$k.doc_id = deg.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM (${Multimodal.PhashNeardupSql})),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
       |r0 AS (SELECT src AS doc_id, CAST($CentralityInitNano AS BIGINT) AS rank_nano
       |       FROM deg),
       |$rounds
       |SELECT r$CentralityRounds.doc_id AS doc_id, deg.deg AS degree,
       |  CAST(rank_nano AS BIGINT) AS rank_nano,
       |  (CAST(rank_nano AS DOUBLE) / 1e9) AS rank
       |FROM r$CentralityRounds
       |JOIN deg ON deg.src = r$CentralityRounds.doc_id
       |ORDER BY doc_id""".stripMargin
  }
}
