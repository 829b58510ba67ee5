package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DetMath, TextOps}
import graft.plans.DetMathExprs
import graft.sources.Tables

/** x85/x86 — a TRAINED model-based quality filter, the canonical
  * curation stage the heuristic tier (x10/x17/x24) and the LM tier
  * (x76/x80) bracket but don't cover: fastText-style classifier
  * filtering (LLaMA's Wikipedia-reference classifier, FineWeb-Edu's
  * educational scorer) distilled to its reproducible core — logistic
  * regression over cheap deterministic surface features, trained by
  * fixed-round batch gradient descent INSIDE the engine, then applied
  * as a per-document admission gate.
  *
  * The supervision is distillation-shaped, exactly like the production
  * recipe (an expensive teacher labels, a cheap student generalizes):
  * the teacher is the FULL x24 filter-verdict stack — exact-hash
  * dedup + repetition gates + benchmark-contamination, several of
  * which see corpus-global evidence (duplicate twins, eval-set
  * n-grams) — and the student sees only five per-document surface
  * features (bias, capped length, type-token ratio, top-token
  * fraction, mean word length). The student learns the teacher's
  * content gates (short/repetitive/dominated) and is structurally
  * blind to its global ones (a duplicate LOOKS fine) — the measured
  * ~95 % agreement with a ~65 % majority class is genuine
  * generalization, not label lookup.
  *
  * Determinism (the whole point — a 100 TB curation run must be
  * re-runnable bit-for-bit, and a classifier gate that drifts with
  * partitioning silently changes the training set):
  *  - every feature is a ratio of EXACT integer character/token counts
  *    (correctly-rounded IEEE divides in pinned order);
  *  - the sigmoid routes through [[graft.functions.DetMath]] exp2
  *    (`σ(m) = 1 / (1 + 2^(−m·log₂e))`) — no libm anywhere;
  *  - per-round gradients ride exact nano-unit BIGINTs
  *    (`floor(g·10⁹ + 0.5)`, the x76 idiom), so the gradient SUM is
  *    order-independent and the weight trajectory is invariant under
  *    any partitioning/merge order;
  *  - the weight update (η = 4, exact binary) is a pinned multiply/
  *    divide/subtract chain of correctly-rounded ops, identical on the
  *    JVM (driver), in the Spark plan, and in the DuckDB oracle.
  * Both queries therefore HASH-GATE: the oracle RE-TRAINS the model as
  * machine-generated round-unrolled CTEs (the x37b/x40b technique) and
  * must reproduce every weight of every round and every per-document
  * score bit-for-bit.
  *
  * Scale shape: the teacher label and the features are computed once
  * into a SKINNY cached relation (7 doubles/doc — text is read once
  * and never again); each of the [[Rounds]] passes is ONE
  * map-side-combining hash aggregate producing a 6-value row; driver
  * state is the d-vector of weights (O(d), like x35's K centroids).
  * Inference embeds the trained weights as plan LITERALS — a pure
  * scalar projection, no join, no broadcast, no state; it streams
  * (row-local, any output mode). Gradient-sum exactness holds to 2⁵³
  * nano-units; past ~9·10¹⁵ doc-units both engines round the BIGINT→
  * double cast identically, so the gate stays cross-engine exact even
  * there.
  */
object Classifier {

  val Rounds = 12
  /** Exact binary double — η·g needs one correctly-rounded multiply.
    * Chosen by sweep: η = 4, 12 rounds reaches ~95 % teacher agreement
    * on this corpus (η = 8 overshoots and oscillates; 0.5 undertrains).
    */
  val LearningRate = 4.0
  /** log₂e, correctly rounded; `2^(x·log₂e) = e^x`. */
  val Log2E = 1.4426950408889634
  val FeatureNames: Seq[String] =
    Seq("f0_bias", "f1_length", "f2_ttr", "f3_topfrac", "f4_wordlen")
  private val D = FeatureNames.length

  /** The feature relation is the family's expensive input (it embeds
    * the full x24 teacher stack + the top-token aggregate) and x85/x86/
    * x87/x90 all consume it — computed and localCheckpoint'ed once per
    * (session, sf).
    */
  private val featuresCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Skinny per-document training relation `(doc_id, y, f0..f4)`:
    * teacher bit y = x24's `keep`, student features from exact integer
    * counts — capped token count, type-token ratio, top-token
    * fraction, mean word length. All divides pinned so Spark and the
    * SQL twin agree bit-for-bit.
    */
  def features(spark: SparkSession, dir: String): DataFrame =
    featuresCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => featuresCache.remove(k))
      featuresUncached(spark, dir).localCheckpoint()
    })

  private def featuresUncached(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(
        col("doc_id"),
        length(expr("replace(trim(text), ' ', '')")).cast("bigint").as("nsp"),
        TextOps.tokens(col("text")).as("toks"))
      .withColumn("ntok", size(col("toks")).cast("bigint"))
      .withColumn("nd", size(array_distinct(col("toks"))).cast("bigint"))
      .filter(col("ntok") >= 1)
    // top token count: one explode + two map-side-combining aggregates
    val mx = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mx"))
    val teacher = TextAnalysis.filterVerdict(spark, dir)
      .select(col("doc_id"),
        when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
    base.join(mx, "doc_id").join(teacher, "doc_id")
      .select(
        col("doc_id"), col("y"),
        lit(1.0).as("f0"),
        (least(col("ntok"), lit(200L)).cast("double") / lit(100.0)).as("f1"),
        (col("nd").cast("double") / col("ntok").cast("double")).as("f2"),
        (col("mx").cast("double") / col("ntok").cast("double")).as("f3"),
        ((col("nsp").cast("double") / col("ntok").cast("double")) / lit(10.0)).as("f4"))
  }

  /** Margin `w·x` as a left-associated pinned fold — the SQL twin
    * parenthesizes identically.
    */
  private def marginCol(w: Array[Double]): Column =
    (0 until D).map(j => lit(w(j)) * col(s"f$j")).reduceLeft(_ + _)

  /** `σ(m)` through the native det_exp2 (codegen'd single call). */
  private def sigmoidCol(m: Column): Column =
    lit(1.0) / (lit(1.0) + DetMathExprs.detExp2C(-(m * lit(Log2E))))

  /** Trained trajectories are pure values of (session, sf) — cached so
    * the family (x85/x86/x87/x90 and the spec laws) trains once per
    * session instead of once per query. O(Rounds·d) doubles of driver
    * memory per entry.
    */
  private val trainCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Seq[Array[Double]]]()

  /** Run the fixed-round GD loop; returns the weight vector AFTER each
    * round (length [[Rounds]]). Driver traffic is one 6-value row per
    * round; the update arithmetic mirrors the SQL twin op-for-op.
    */
  def train(spark: SparkSession, dir: String): Seq[Array[Double]] =
    trainCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => trainCache.remove(k))
      trainUncached(spark, dir)
    })

  private def trainUncached(spark: SparkSession, dir: String): Seq[Array[Double]] = {
    DetMathExprs.register(spark)
    val f = features(spark, dir)
    var w = Array.fill(D)(0.0)
    (1 to Rounds).map { _ =>
      val p = sigmoidCol(marginCol(w))
      val aggs = (0 until D).map { j =>
        sum(floor(((p - col("y")) * col(s"f$j")) * lit(1e9) + lit(0.5))).as(s"s$j")
      } :+ count(lit(1)).as("n")
      val row = f.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n")
      w = Array.tabulate(D) { j =>
        val g = row.getAs[Long](s"s$j").toDouble / 1.0e9
        w(j) - LearningRate * (g / n.toDouble)
      }
      w
    }
  }

  /** x85: the training trajectory — one row per (round, feature) with
    * the post-round weight (Rounds·d rows). The hash gate pins the
    * ENTIRE optimization path, not just the final model, so a drifting
    * gradient anywhere fails loudly.
    */
  def classifierTrain(spark: SparkSession, dir: String): DataFrame = {
    val hist = train(spark, dir)
    val rows = hist.zipWithIndex.flatMap { case (w, i) =>
      FeatureNames.zipWithIndex.map { case (fn, j) => (i + 1, fn, w(j)) }
    }
    spark.createDataFrame(rows).toDF("round", "feature", "weight")
      .orderBy(col("round"), col("feature"))
  }

  /** x86: the admission gate — every document scored by the trained
    * model (weights embedded as literals: a stateless scalar
    * projection that runs unchanged on a stream), with the
    * distillation verdict columns: `score` = σ(w·x), `keep` = score ≥
    * ½, `teacher_keep` the x24 bit, `agree` the agreement flag.
    */
  def classifierGate(spark: SparkSession, dir: String): DataFrame = {
    val w = train(spark, dir).last
    val p = sigmoidCol(marginCol(w))
    features(spark, dir)
      .withColumn("score", p)
      .select(
        col("doc_id"), col("score"),
        (col("score") >= 0.5).as("keep"),
        (col("y") === 1.0).as("teacher_keep"),
        ((col("score") >= 0.5) === (col("y") === 1.0)).as("agree"))
      .orderBy(col("doc_id"))
  }

  /** STREAMING admission gate — [[classifierGate]]'s scoring as a
    * stateless row-local plan over any `(doc_id, text)` frame: every
    * feature evaluates as in-row HOFs (the top-token count via a
    * distinct-token filter scan instead of the batch explode+groupBy —
    * exact integers either way), the trained weights are literals, and
    * nothing aggregates — so the identical plan runs batch or
    * streaming (append mode, no watermark, no state), emitting
    * admission decisions at scan speed. `StreamingSpec` pins batch
    * gate ≡ this plan ≡ its streamed run bit-for-bit. This is the
    * production deployment of the trained filter: train once (x85),
    * freeze the d weights, gate the firehose.
    */
  def classifierGateStream(docs: DataFrame, w: Array[Double]): DataFrame = {
    DetMathExprs.register(docs.sparkSession)
    val scored = docs
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .withColumn("_nsp", length(expr("replace(trim(text), ' ', '')")).cast("bigint"))
      .withColumn("_toks", TextOps.tokens(col("text")))
      .withColumn("_ntok", size(col("_toks")).cast("bigint"))
      .filter(col("_ntok") >= 1)
      .withColumn("_nd", size(array_distinct(col("_toks"))).cast("bigint"))
      .withColumn("_mx", expr(
        "array_max(transform(array_distinct(_toks), " +
          "t -> size(filter(_toks, x -> x = t))))").cast("bigint"))
      .withColumn("f0", lit(1.0))
      .withColumn("f1", least(col("_ntok"), lit(200L)).cast("double") / lit(100.0))
      .withColumn("f2", col("_nd").cast("double") / col("_ntok").cast("double"))
      .withColumn("f3", col("_mx").cast("double") / col("_ntok").cast("double"))
      .withColumn("f4",
        (col("_nsp").cast("double") / col("_ntok").cast("double")) / lit(10.0))
      .withColumn("score", sigmoidCol(marginCol(w)))
    scored.select(col("doc_id"), col("score"), (col("score") >= 0.5).as("keep"))
  }

  /** The four admission gates of the ensemble audit, by SHORT name —
    * alphabetical order fixes the pair enumeration in both engines.
    */
  private val EnsembleGates = Seq(
    "classifier" -> "k_classifier",
    "dsir" -> "k_dsir",
    "entropy" -> "k_entropy",
    "heuristic" -> "k_heuristic")

  /** x90: the filter-ensemble agreement audit — the release-decision
    * view over four independent curation philosophies: the heuristic
    * verdict stack (x24), the DSIR English-importance gate (x80), the
    * trained classifier (x86), and the token-entropy shape gate (x78,
    * normalized entropy > 0.96). For every unordered gate pair the
    * fraction of documents they agree on; the diagonal rows carry each
    * gate's own keep rate. This is the table a dataset release leads
    * with: two filters at 0.5 agreement are measuring different
    * things, a gate keeping 0 % (DSIR's English-target weight on this
    * corpus) is maximally aggressive and the audit SAYS so before it
    * silently empties a mixture.
    *
    * Determinism: every input bit is already hash-gated; agreement
    * counts are exact integers; one divide per rate. Shape: one inner
    * join of four thin (doc_id, bool) relations, then 10
    * constant-size aggregates over the SAME cached join — nothing
    * corpus-global beyond the 10-row output.
    */
  def filterEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val h = TextAnalysis.filterVerdict(spark, dir)
      .select(col("doc_id"), col("keep").as("k_heuristic"))
    val ds = TextAnalysis.dsirImportance(spark, dir)
      .select(col("doc_id"), col("keep").as("k_dsir"))
    val c = classifierGate(spark, dir)
      .select(col("doc_id"), col("keep").as("k_classifier"))
    val e = TextAnalysis.tokenEntropy(spark, dir)
      .select(col("doc_id"), (col("norm_entropy") > lit(0.96)).as("k_entropy"))
    val j = c.join(ds, "doc_id").join(e, "doc_id").join(h, "doc_id")
      .localCheckpoint()
    val frames = for {
      (ga, ca) <- EnsembleGates
      (gb, cb) <- EnsembleGates if ga <= gb
    } yield {
      val agreeCond = if (ga == gb) col(ca) else col(ca) === col(cb)
      j.agg(sum(when(agreeCond, 1L).otherwise(0L)).as("n_agree"),
          count(lit(1)).as("n_docs"))
        .select(lit(ga).as("gate_a"), lit(gb).as("gate_b"),
          col("n_agree"), col("n_docs"),
          (col("n_agree").cast("double") / col("n_docs").cast("double"))
            .as("agree_rate"))
    }
    frames.reduce(_ unionAll _).orderBy(col("gate_a"), col("gate_b"))
  }

  lazy val FilterEnsembleSql: String = {
    val pairs = for {
      (ga, ca) <- EnsembleGates
      (gb, cb) <- EnsembleGates if ga <= gb
    } yield {
      val cond = if (ga == gb) ca else s"$ca = $cb"
      s"""SELECT '$ga' AS gate_a, '$gb' AS gate_b,
         |  CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  COUNT(*) AS n_docs,
         |  (CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE)) AS agree_rate
         |FROM j""".stripMargin
    }
    s"""WITH h AS (SELECT doc_id, keep AS k_heuristic
       |  FROM (${TextAnalysis.FilterVerdictSql})),
       |ds AS (SELECT doc_id, keep AS k_dsir
       |  FROM (${TextAnalysis.DsirImportanceSql})),
       |c AS (SELECT doc_id, keep AS k_classifier FROM ($ClassifierGateSql)),
       |e AS (SELECT doc_id, norm_entropy > 0.96 AS k_entropy
       |  FROM (${TextAnalysis.TokenEntropySql})),
       |j AS MATERIALIZED (
       |  SELECT c.doc_id, k_classifier, k_dsir, k_entropy, k_heuristic
       |  FROM c
       |  JOIN ds ON ds.doc_id = c.doc_id
       |  JOIN e ON e.doc_id = c.doc_id
       |  JOIN h ON h.doc_id = c.doc_id)
       |${pairs.mkString("\nUNION ALL\n")}
       |ORDER BY gate_a, gate_b""".stripMargin
  }

  // ------------------------------------------------------------------
  // Oracle twins: the whole training loop as machine-generated
  // round-unrolled CTEs (the x37b/x40b technique) — DuckDB re-trains
  // the model and must land on bit-identical weights and scores.
  // ------------------------------------------------------------------

  /** `base`/`mx`/`teacher`/`feat` CTE bodies (shared by both oracles).
    * The teacher CTE embeds x24's full oracle (dedup + repetition +
    * contamination) — the student's label IS the production verdict.
    */
  private def featCtes: String =
    s"""base AS (
       |  SELECT doc_id,
       |    CAST(length(replace(trim(text), ' ', '')) AS BIGINT) AS nsp,
       |    string_split(trim(lower(text)), ' ') AS toks
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 1),
       |base2 AS (
       |  SELECT *, CAST(len(toks) AS BIGINT) AS ntok,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS nd
       |  FROM base WHERE len(toks) >= 1),
       |mx AS (
       |  SELECT doc_id, MAX(c) AS mx FROM (
       |    SELECT doc_id, tok, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(toks) AS tok FROM base2)
       |    GROUP BY doc_id, tok)
       |  GROUP BY doc_id),
       |teacher AS (
       |  SELECT doc_id, CASE WHEN keep THEN CAST(1.0 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM (${TextAnalysis.FilterVerdictSql})),
       |feat AS MATERIALIZED (
       |  SELECT b.doc_id AS doc_id, y,
       |    CAST(1.0 AS DOUBLE) AS f0,
       |    (CAST(LEAST(ntok, 200) AS DOUBLE) / 100.0) AS f1,
       |    (CAST(nd AS DOUBLE) / CAST(ntok AS DOUBLE)) AS f2,
       |    (CAST(mx.mx AS DOUBLE) / CAST(ntok AS DOUBLE)) AS f3,
       |    ((CAST(nsp AS DOUBLE) / CAST(ntok AS DOUBLE)) / 10.0) AS f4
       |  FROM base2 b
       |  JOIN mx ON mx.doc_id = b.doc_id
       |  JOIN teacher ON teacher.doc_id = b.doc_id)""".stripMargin

  private def mSql(wRefs: Seq[String]): String =
    (0 until D).map(j => s"(${wRefs(j)} * f$j)").reduceLeft((a, b) => s"($a + $b)")

  private def pSql(m: String): String = {
    val e = DetMath.exp2Sql(s"(-($m * CAST('1.4426950408889634' AS DOUBLE)))")
    s"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + $e))"
  }

  /** CTE chain `w0, r1, w1, …, r{Rounds}, w{Rounds}` implementing the
    * unrolled loop. MATERIALIZED per the x40b lesson (stops DuckDB's
    * exponential CTE inlining across rounds).
    */
  private def trainCtes: String = {
    val sb = new StringBuilder
    sb ++= s",\nw0 AS (SELECT ${(0 until D).map(j => s"CAST(0.0 AS DOUBLE) AS w$j").mkString(", ")})"
    (1 to Rounds).foreach { r =>
      val wRefs = (0 until D).map(j => s"w${r - 1}.w$j")
      val p = pSql(mSql(wRefs))
      val sums = (0 until D).map { j =>
        s"CAST(SUM(CAST(FLOOR((((p - y) * f$j) * 1e9) + 0.5) AS BIGINT)) AS BIGINT) AS s$j"
      }.mkString(",\n    ")
      sb ++=
        s""",
           |r$r AS MATERIALIZED (
           |  SELECT $sums,
           |    COUNT(*) AS n
           |  FROM (SELECT feat.*, $p AS p FROM feat CROSS JOIN w${r - 1})),""".stripMargin
      val upd = (0 until D).map { j =>
        s"(w${r - 1}.w$j - ($LearningRate * ((CAST(r$r.s$j AS DOUBLE) / 1e9) / CAST(r$r.n AS DOUBLE)))) AS w$j"
      }.mkString(",\n    ")
      sb ++=
        s"""
           |w$r AS MATERIALIZED (
           |  SELECT $upd
           |  FROM r$r CROSS JOIN w${r - 1})""".stripMargin
    }
    sb.toString
  }

  lazy val ClassifierTrainSql: String = {
    val unions = (1 to Rounds).flatMap { r =>
      (0 until D).map { j =>
        s"SELECT $r AS round, '${FeatureNames(j)}' AS feature, w$j AS weight FROM w$r"
      }
    }.mkString("\n  UNION ALL ")
    s"""WITH $featCtes$trainCtes
       |SELECT round, feature, weight FROM (
       |  $unions)
       |ORDER BY round, feature""".stripMargin
  }

  lazy val ClassifierGateSql: String = {
    val wRefs = (0 until D).map(j => s"w$Rounds.w$j")
    val p = pSql(mSql(wRefs))
    s"""WITH $featCtes$trainCtes
       |SELECT doc_id, p AS score, p >= 0.5 AS keep, y = 1.0 AS teacher_keep,
       |  (p >= 0.5) = (y = 1.0) AS agree
       |FROM (SELECT feat.*, $p AS p FROM feat CROSS JOIN w$Rounds)
       |ORDER BY doc_id""".stripMargin
  }

  /** x87: calibration audit of the trained gate — the reliability
    * diagram every threshold choice rests on (FineWeb-Edu picks its
    * educational-score cut from exactly this curve): scores binned
    * into deciles, per bin the document count, the mean predicted
    * score, the empirical teacher-keep rate, and the gap. A
    * well-calibrated bin has gap ≈ 0; a filter whose 0.7-bin keeps
    * only 40 % of teacher-good docs is lying about its threshold.
    *
    * Determinism: the bin index is one multiply + floor; the mean
    * score rides the nano-bit BIGINT sum (order-free); the teacher
    * rate is an exact integer count ratio; `gap` one subtract. One
    * hash aggregate over the gate's projection — nothing corpus-global
    * beyond the (constant-size) 10-bin relation.
    */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val g = classifierGate(spark, dir)
    g.withColumn("bin", least(floor(col("score") * lit(10.0)), lit(9.0)).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("score") * lit(1e9) + lit(0.5))).as("_sn"),
        sum(when(col("teacher_keep"), 1L).otherwise(0L)).as("_tk"))
      .select(
        col("bin"), col("n"),
        ((col("_sn").cast("double") / lit(1e9)) / col("n").cast("double")).as("mean_score"),
        (col("_tk").cast("double") / col("n").cast("double")).as("teacher_rate"),
        (((col("_sn").cast("double") / lit(1e9)) / col("n").cast("double"))
          - (col("_tk").cast("double") / col("n").cast("double"))).as("gap"))
      .orderBy(col("bin"))
  }

  lazy val CalibrationSql: String =
    s"""WITH gate AS ($ClassifierGateSql),
       |b AS (
       |  SELECT CAST(LEAST(FLOOR(score * 10.0), 9.0) AS INTEGER) AS bin,
       |    CAST(FLOOR((score * 1e9) + 0.5) AS BIGINT) AS sn,
       |    CASE WHEN teacher_keep THEN 1 ELSE 0 END AS tk
       |  FROM gate),
       |a AS (
       |  SELECT bin, COUNT(*) AS n, CAST(SUM(sn) AS BIGINT) AS sn,
       |    CAST(SUM(tk) AS BIGINT) AS tk
       |  FROM b GROUP BY bin)
       |SELECT bin, n,
       |  ((CAST(sn AS DOUBLE) / 1e9) / CAST(n AS DOUBLE)) AS mean_score,
       |  (CAST(tk AS DOUBLE) / CAST(n AS DOUBLE)) AS teacher_rate,
       |  (((CAST(sn AS DOUBLE) / 1e9) / CAST(n AS DOUBLE))
       |    - (CAST(tk AS DOUBLE) / CAST(n AS DOUBLE))) AS gap
       |FROM a
       |ORDER BY bin""".stripMargin
}
