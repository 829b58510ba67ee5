package graft

import graft.operators.Metrics
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) driven by raw ScalaCheck
  * generators with fixed seeds (the scalatest/scalacheck bridge is not on
  * the offline classpath): counter permutation independence, histogram
  * bucket laws, gauge order independence.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._


  private val increments: Gen[List[Double]] =
    Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, Gen.choose(0, 5000).map(_ / 100.0)))

  /** 5 deterministic generated cases per property (each runs Spark jobs). */
  private def cases(): Seq[List[Double]] =
    (1 to 5).flatMap(i => increments.apply(Gen.Parameters.default, Seed(42L + i)))

  test("counter snapshot is independent of event permutation") {
    for (vals <- cases()) {
      val perm = new scala.util.Random(7).shuffle(vals)
      def snap(vs: List[Double]): Double = {
        val dir = fixture("events" -> vs.zipWithIndex.map { case (v, i) =>
          ev(i.toLong, i * 1000L, "click", v, "p")
        }.toDF(eventCols: _*))
        Metrics.counterSnapshot(spark, dir).select("value").as[Double].head()
      }
      assert(snap(vals) === snap(perm), s"case $vals")
    }
  }

  test("histogram: cumulative buckets non-decreasing, bounded by _count, sum exact") {
    for (vals <- cases()) {
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, 0, "error", v, "h")
      }.toDF(eventCols: _*))
      val rows = Metrics.histogramSnapshot(spark, dir)
        .orderBy("le").select("cum_count", "count", "sum")
        .as[(Long, Long, Double)].collect()
      val cums = rows.map(_._1)
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, s"case $vals")
      assert(cums.forall(_ <= vals.size), s"case $vals")
      val expected = vals.map(BigDecimal(_)).sum.toDouble
      assert(rows.forall(r => math.abs(r._3 - expected) < 1e-9), s"case $vals")
    }
  }

  test("histogram_quantile stays within [0, max finite boundary] on any input") {
    for (vals <- cases()) {
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, 0, "error", v, "q")
      }.toDF(eventCols: _*))
      for (q <- graft.operators.PromQL.histogramQuantile(spark, dir)
          .select("q").as[Double].collect()) {
        assert(q >= 0.0 && q <= graft.model.MetricEvent.Buckets.max, s"case $vals -> $q")
      }
      // native expression agrees on every generated case, not just fixtures
      val native = graft.operators.Metrics.histogramQuantileNative(spark, dir)
        .select("q").as[Double].collect().toSeq
      val comp = graft.operators.PromQL.histogramQuantile(spark, dir)
        .select("q").as[Double].collect().toSeq
      assert(native === comp, s"case $vals")
    }
  }

  test("front-end resets matches an independent wrapped-cumulative reference") {
    for (vals <- cases()) {
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, i * 1000L, "purchase", v, "r")
      }.toDF(eventCols: _*))
      val got = graft.promql.Engine.eval(spark, dir, "resets(purchase[1h])")
        .select("value").as[Double].head()
      // independent reference: cumulative cents mod 10000, decreases
      // between consecutive samples (all pairs in-window here)
      val cents = vals.map(v => math.round(v * 100))
      val wrapped = cents.scanLeft(0L)(_ + _).tail.map(_ % 10000L)
      val expected = wrapped.zip(wrapped.drop(1)).count { case (a, b) => b < a }.toDouble
      assert(got === expected, s"case $vals")
    }
  }

  test("salted counter aggregation equals the unsalted snapshot exactly") {
    for (vals <- cases()) {
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, i * 1000L, "click", v, s"s${i % 3}")
      }.toDF(eventCols: _*))
      val plain = Metrics.counterSnapshot(spark, dir)
        .select("label_k", "value").as[(String, Double)].collect().toMap
      val salted = graft.operators.PromQL.counterSnapshotSalted(spark, dir)
        .select("label_k", "value").as[(String, Double)].collect().toMap
      assert(plain === salted, s"case $vals")
    }
  }

  test("TopKMinAggregator: any reduce/merge tree equals brute-force k smallest distinct") {
    val agg = graft.functions.TopKMinAggregator(4)
    val strs: Gen[List[String]] = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 15).map(i => f"v$i%02d")))
    for (i <- 1 to 20) {
      val vals = strs.apply(Gen.Parameters.default, Seed(100L + i)).get
      val expected = vals.distinct.sorted.take(4).mkString("|")
      // sequential reduce
      val seq = agg.finish(vals.foldLeft(agg.zero)(agg.reduce))
      assert(seq === expected, s"seq case $vals")
      // arbitrary split + merge (both orders) — partial aggregation law
      val (l, r) = vals.splitAt(vals.length / 2)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bl, br)) === expected, s"merge case $vals")
      assert(agg.finish(agg.merge(br, bl)) === expected, s"merge-swap case $vals")
    }
  }

  test("kmeans assignment equals an independent Lloyd reference on random vectors") {
    val rnd = new scala.util.Random(42)
    for (iter <- 1 to 2) {
      val n = 10 + rnd.nextInt(8)
      def vec(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
      val rows = (0L until n.toLong).map(i => (i, vec(), 1)) ++
        Seq((100L, vec(), 1), (101L, vec(), 1), (102L, vec(), 1))
      val dir = fixture("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
      // independent Lloyd reference on the same integer quantization,
      // with the SAME IEEE expression order (dp / sqrt / sqrt) as the
      // operator so assignment scores are bit-identical
      val q = rows.map { case (id, v, _) =>
        id -> v.map(x => math.round(x.toDouble * 10000)) }.toMap
      def dot(a: Array[Long], b: Array[Long]): Long =
        a.lazyZip(b).map(_ * _).sum
      def cos(a: Array[Long], b: Array[Long]): Double =
        dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble) / math.sqrt(dot(b, b).toDouble)
      def assign(cents: Seq[(Int, Array[Long])]): Map[Long, Int] =
        q.map { case (id, v) =>
          id -> cents.map { case (cid, c) => (cid, cos(v, c)) }
            .minBy { case (cid, s) => (-s, cid) }._1
        }
      val seeds = Seq(0 -> q(100L), 1 -> q(101L), 2 -> q(102L))
      val a1 = assign(seeds)
      val cents1 = a1.groupBy(_._2).toSeq.map { case (cid, members) =>
        val sums = Array.fill(64)(0L)
        members.keys.foreach(id =>
          q(id).zipWithIndex.foreach { case (x, d) => sums(d) += x })
        cid -> sums
      }
      val expected = assign(cents1)
      val got = graft.operators.Similarity.semanticDedup(spark, dir)
        .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
      assert(got === expected, s"case $iter")
    }
  }

  test("holt_winters matches the sequential reference on random series") {
    for (i <- 1 to 5) {
      val vals = Gen.choose(2, 12)
        .flatMap(n => Gen.listOfN(n, Gen.choose(0, 5000).map(_ / 100.0)))
        .apply(Gen.Parameters.default, Seed(200L + i)).get
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, t) =>
        ev(t.toLong, t * 1000L, "signup", v, "hw")
      }.toDF(eventCols: _*))
      var s = vals.head
      var b = vals(1) - vals.head
      vals.drop(1).foreach { y =>
        val sNew = 0.5 * y + 0.5 * (s + b)
        b = 0.3 * (sNew - s) + 0.7 * b
        s = sNew
      }
      val got = graft.operators.PromQL.holtWinters(spark, dir)
        .select("smoothed").as[Double].head()
      assert(got === s, s"case $vals")
    }
  }

  test("linear regression slope matches a least-squares reference on random gauges") {
    for (i <- 1 to 5) {
      val vals = Gen.choose(2, 10)
        .flatMap(n => Gen.listOfN(n, Gen.choose(0, 5000).map(_ / 100.0)))
        .apply(Gen.Parameters.default, Seed(300L + i)).get
      // distinct x positions (seconds) within one day
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, t) =>
        ev(t.toLong, t * 60000L, "signup", v, "lr")
      }.toDF(eventCols: _*))
      val xs = vals.indices.map(_ * 60.0)
      val n = vals.size
      val sx = xs.sum; val sy = vals.sum
      val sxy = xs.zip(vals).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val got = graft.operators.PromQL.linearRegression(spark, dir)
        .select("deriv").as[Double].head()
      assert(math.abs(got - slope) < 1e-9, s"case $vals: got $got want $slope")
    }
  }

  test("repetition fractions are in [0,1]; zero dup iff all tokens distinct") {
    val gen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 5).map(i => s"w$i")))
    for (i <- 1 to 8) {
      val toks = gen.apply(Gen.Parameters.default, Seed(400L + i)).get
      val dir = fixture("documents" -> Seq(
        (0L, toks.mkString(" "), "en", "src", toks.mkString(" ").length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      val r = graft.operators.TextAnalysis.repetition(spark, dir)
        .select("dup_token_frac", "top_token_frac", "dup_3gram_frac")
        .as[(Double, Double, Double)].head()
      assert(r._1 >= 0.0 && r._1 <= 1.0 && r._2 > 0.0 && r._2 <= 1.0 &&
        r._3 >= 0.0 && r._3 <= 1.0, s"case $toks -> $r")
      assert((r._1 == 0.0) === (toks.distinct.size == toks.size), s"case $toks")
    }
  }

  test("count-min: estimates never undercount; merge law holds on any split") {
    val agg = graft.functions.CountMinAggregator(4, 64)
    val gen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 12).map(i => s"g$i")))
    for (i <- 1 to 10) {
      val keys = gen.apply(Gen.Parameters.default, Seed(500L + i)).get
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // sequential reduce
      val seq = agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
      exact.foreach { case (k, n) =>
        val e = graft.functions.CountMinAggregator.estimate(seq, k, 4, 64)
        assert(e >= n, s"case $keys: $k est $e < exact $n")
      }
      // arbitrary split + merge equals sequential (partial-agg law)
      val (l, r) = keys.splitAt(keys.length / 3)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged.toSeq === seq.toSeq, s"merge case $keys")
    }
  }

  test("quantile sketch: relative error bounded by gamma-1; merge law holds") {
    val gamma = 1.02
    val agg = graft.functions.QuantileSketchAggregator(gamma, 2048)
    val gen = Gen.choose(10, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(2, 100000).map(_.toDouble)))
    for (i <- 1 to 8) {
      val xs = gen.apply(Gen.Parameters.default, Seed(600L + i)).get
      val sk = xs.foldLeft(agg.zero)(agg.reduce)
      for (phi <- Seq(0.5, 0.9, 0.99)) {
        val est = graft.functions.QuantileSketchAggregator.estimate(sk, phi, gamma)
        val sorted = xs.sorted
        val exact = sorted(math.max(0, math.ceil(phi * xs.size).toInt - 1))
        assert(math.abs(est - exact) / exact <= (gamma - 1) + 1e-9,
          s"case $i phi=$phi est=$est exact=$exact")
      }
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged.toSeq === sk.toSeq, s"merge case $i")
    }
  }

  test("gauge: order-independent given distinct timestamps") {
    for (vals <- cases()) {
      val stamped = vals.zipWithIndex
      val shuffled = new scala.util.Random(11).shuffle(stamped)
      def last(vs: List[(Double, Int)]): Double = {
        val dir = fixture("events" -> vs.zipWithIndex.map { case ((v, t), i) =>
          ev(i.toLong, t * 1000L, "signup", v, "g")
        }.toDF(eventCols: _*))
        Metrics.gaugeSnapshot(spark, dir).select("value").as[Double].head()
      }
      assert(last(stamped) === last(shuffled), s"case $vals")
    }
  }

  test("front-end function laws on random gauge series") {
    import graft.promql.Engine
    for ((vals, ci) <- cases().zipWithIndex) {
      val dir = fixture("events" -> vals.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, i * 60000L, "signup", v, "g")
      }.toDF(eventCols: _*))
      def one(q: String): Double =
        Engine.eval(spark, dir, q).select($"value").as[Double].head()
      // quantile_over_time lies within [min, max] of the window; the
      // 0 and 1 quantiles ARE min and max
      val (lo, hi) = (vals.min, vals.max)
      val med = one("quantile_over_time(0.5, signup[1d])")
      assert(med >= lo - 1e-9 && med <= hi + 1e-9, s"case $ci median $med")
      assert(one("quantile_over_time(0, signup[1d])") === lo, s"case $ci q0")
      assert(one("quantile_over_time(1, signup[1d])") === hi, s"case $ci q1")
      // stddev² == stdvar (both through the same exact cents moments)
      val sd = one("stddev(signup)") // single series: 0
      val sv = one("stdvar(signup)")
      assert(math.abs(sd * sd - sv) <= 1e-12, s"case $ci stddev/stdvar")
      // round to a multiple: result is a multiple of `to`, within to/2
      // (ties toward +Inf) of the input
      val lastV = vals.last
      val r = one("round(signup, 0.25)")
      assert(math.abs(r / 0.25 - math.rint(r / 0.25)) < 1e-9, s"case $ci round multiple")
      assert(r - lastV <= 0.125 + 1e-9 && lastV - r < 0.125 + 1e-9, s"case $ci round near")
      // sgn ∈ {-1, 0, 1}; group == 1; present_over_time == 1
      assert(Set(-1.0, 0.0, 1.0).contains(one("sgn(signup - 25)")), s"case $ci sgn")
      assert(one("group(signup)") === 1.0, s"case $ci group")
      assert(one("present_over_time(signup[1d])") === 1.0, s"case $ci present")
      // last_over_time over the full window is the instant LWW value
      assert(one("last_over_time(signup[1d])") === lastV, s"case $ci last")
    }
  }

  test("x59: dup-span runs match a sequential gaps-and-islands reference") {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpusGen: Gen[List[List[String]]] =
      Gen.choose(4, 8).flatMap(n => Gen.listOfN(n,
        Gen.choose(3, 15).flatMap(m => Gen.listOfN(m, Gen.oneOf(vocab)))))
    def runLengths(ps: List[Int]): List[Int] =
      ps.foldLeft(List.empty[(Int, Int)]) {
        case ((start, last) :: rest, p) if p == last + 1 => (start, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => e - s + 1 }
    for (ci <- 1 to 5) {
      val docs = corpusGen.apply(Gen.Parameters.default, Seed(90L + ci)).get
      val sh = docs.zipWithIndex.flatMap { case (toks, d) =>
        toks.sliding(3).filter(_.size == 3).zipWithIndex.map { case (g, p) =>
          (d.toLong, p, g.mkString(" "))
        }.toList
      }
      val got = graft.operators.TextAnalysis.corpusDupSpansOf(
        sh.toDF("doc_id", "pos", "shingle"))
        .select("doc_id", "n_shingles", "n_dup", "longest_dup_run")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val dupSet = sh.map(t => (t._1, t._3)).distinct.groupBy(_._2)
        .collect { case (s, occ) if occ.map(_._1).distinct.size >= 2 => s }.toSet
      for ((d, rows) <- sh.groupBy(_._1)) {
        val hits = rows.filter(r => dupSet(r._3)).map(_._2).sorted.toList
        val runs = runLengths(hits)
        val want = (rows.size.toLong,
          hits.size.toLong,
          if (runs.isEmpty) 0L else runs.max.toLong)
        assert(got(d) === want, s"case $ci doc $d")
      }
    }
  }

  test("x62: banded simhash pairs equal brute-force all-pairs at Hamming <= 3") {
    val sigGen: Gen[List[Long]] =
      Gen.choose(20, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, (1L << 32) - 1)))
    for (ci <- 1 to 5) {
      // skew toward collisions: half the signatures are 1-3 bit
      // perturbations of the first few
      val base = sigGen.apply(Gen.Parameters.default, Seed(170L + ci)).get
      val sigs = base.zipWithIndex.map { case (s, i) =>
        if (i % 2 == 1) base(i / 4) ^ (1L << (i % 32)) else s
      }
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "simhash")
      val got = graft.operators.Dedup.simhashNearDupOf(df)
        .select("doc_a", "doc_b", "hamming")
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.size
        h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if h <= graft.operators.Dedup.SimhashHamMax
      } yield (i.toLong, j.toLong, h.toLong)).toSet
      assert(got === want, s"case $ci")
    }
  }

  test("x60: BPE pair stats match a sequential recount (incl. within-word repeats)") {
    val wordGen: Gen[String] =
      Gen.choose(1, 5).flatMap(l => Gen.listOfN(l, Gen.choose('a', 'e')).map(_.mkString))
    val corpusGen: Gen[List[String]] =
      Gen.choose(3, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(1, 12).flatMap(m => Gen.listOfN(m, wordGen).map(_.mkString(" ")))))
    for (ci <- 1 to 5) {
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(130L + ci)).get
      val got = graft.operators.TextAnalysis.bpePairStatsOf(texts.toDF("text"))
        .select("pair", "pair_count", "n_words")
        .as[(String, Long, Long)].collect().toList
      val wordCounts = texts.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      // each occurrence of a pair inside a word adds the word's corpus
      // count; a word with the pair twice ("aaa" -> "aa","aa") pays twice
      // into pair_count but once into n_words
      val occ = wordCounts.toList.filter(_._1.length >= 2).flatMap { case (w, n) =>
        (0 until w.length - 1).map(j => (w.substring(j, j + 2), w, n))
      }
      val want = occ.groupBy(_._1).map { case (p, os) =>
        (p, os.map(_._3).sum, os.map(_._2).distinct.size.toLong)
      }.toList.sortBy { case (p, c, _) => (-c, p) }.take(20)
      assert(got === want, s"case $ci")
    }
  }

  test("x66: iterated BPE merge table matches a sequential multi-round trainer") {
    // bpeTrain reads documents from a dir; build tiny fixture corpora
    val wordGen: Gen[String] =
      Gen.choose(1, 5).flatMap(l => Gen.listOfN(l, Gen.choose('a', 'd')).map(_.mkString))
    val corpusGen: Gen[List[String]] =
      Gen.choose(3, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(2, 12).flatMap(m => Gen.listOfN(m, wordGen).map(_.mkString(" ")))))
    def pairCounts(words: Map[String, Long]): Map[String, Long] =
      words.toList.filter(_._1.length >= 2).flatMap { case (w, n) =>
        (0 until w.length - 1).map(j => (w.substring(j, j + 2), n))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    for (ci <- 1 to 3) {
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(250L + ci)).get
      val dir = fixture("documents" -> texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "src1", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = graft.operators.TextAnalysis.bpeTrain(spark, dir, rounds = 3)
        .as[(Long, String, Long)].collect().toList
      var words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = (1 to 3).map { r =>
        val pcs = pairCounts(words)
        val (winner, pc) = pcs.toList.minBy { case (p, c) => (-c, p) }
        // U+E000+r is the fused symbol for round r
        def sym(k: Int) = (0xE000 + k).toChar.toString
        words = words.map { case (w, n) => (w.replace(winner, sym(r)), n) }
        val display = winner.replace(sym(3), "[3]")
          .replace(sym(2), "[2]").replace(sym(1), "[1]")
        (r.toLong, display, pc)
      }.toList
      assert(got === want, s"case $ci")
    }
  }

  test("x73: BPE decode round-trips the encoded vocab, 12 rounds past the old ceiling") {
    import org.apache.spark.sql.functions.{col, length}
    val dir = "/root/testdata/sf0.001"
    val rounds = 12 // > 9: impossible under the former chr(1..9) scheme
    val (merges, vocab) =
      graft.operators.TextAnalysis.bpeTrainState(spark, dir, rounds)
    val mergeRows = merges.map(_.select("round", "merged")
      .as[(Long, String)].head())
    assert(mergeRows.map(_._1) === (1L to rounds.toLong))
    // every round found a real (distinct) winner — the trainer did not
    // degenerate past round 9
    assert(mergeRows.map(_._2).distinct.size === rounds)
    // decode law: expanding symbols in reverse round order reproduces
    // the original word, for EVERY vocabulary word
    val decoded = vocab.select(col("w0"),
      graft.operators.TextAnalysis.bpeDecodeCol(col("w"),
        mergeRows.map { case (r, p) => (r.toInt, p) }).as("d"))
    assert(decoded.filter(col("w0") =!= col("d")).count() === 0L)
    // merges only ever shorten: |encode(w)| <= |w|
    assert(vocab.filter(length(col("w")) > length(col("w0"))).count() === 0L)
  }

  test("x74: span scrub matches a sequential reference on random corpora") {
    val wordGen: Gen[String] =
      Gen.choose(1, 3).flatMap(l => Gen.listOfN(l, Gen.choose('a', 'c')).map(_.mkString))
    val corpusGen: Gen[List[String]] =
      Gen.choose(4, 7).flatMap(n => Gen.listOfN(n,
        Gen.choose(8, 20).flatMap(m => Gen.listOfN(m, wordGen).map(_.mkString(" ")))))
    def md5hex(t: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (ci <- 1 to 5) {
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(310L + ci)).get
      val dir = fixture("documents" -> texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "src1", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = graft.operators.TextAnalysis.spanScrub(spark, dir)
        .as[(Long, Long, Long, Long, String)].collect().toList.sortBy(_._1)
      // sequential reference
      val docToks = texts.map(_.split(" ").toList)
      val docSh = docToks.map(ts => ts.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toList)
      val dup = docSh.zipWithIndex.flatMap { case (sh, i) => sh.distinct.map((_, i)) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val want = docToks.zip(docSh).zipWithIndex.map { case ((ts, sh), i) =>
        val hitPos = sh.zipWithIndex.collect { case (g, p) if dup(g) => p }
        // maximal runs of consecutive hit positions, length >= 5
        val runs = hitPos.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }.filter(_.size >= graft.operators.TextAnalysis.ScrubMinRun)
        val covered = runs.flatMap(r => r.min to (r.max + 2)).toSet
        val kept = ts.zipWithIndex.collect { case (t, p) if !covered(p) => t }
        (i.toLong, ts.size.toLong, kept.size.toLong,
          (ts.size - kept.size).toLong, md5hex(kept.mkString(" ")))
      }
      assert(got === want, s"case $ci")
    }
  }

  test("x65: applied BPE merge matches a sequential two-round trainer") {
    val wordGen: Gen[String] =
      Gen.choose(1, 5).flatMap(l => Gen.listOfN(l, Gen.choose('a', 'd')).map(_.mkString))
    val corpusGen: Gen[List[String]] =
      Gen.choose(3, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(2, 12).flatMap(m => Gen.listOfN(m, wordGen).map(_.mkString(" ")))))
    def pairOcc(words: Map[String, Long]): List[(String, String, Long)] =
      words.toList.filter(_._1.length >= 2).flatMap { case (w, n) =>
        (0 until w.length - 1).map(j => (w.substring(j, j + 2), w, n))
      }
    for (ci <- 1 to 5) {
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(210L + ci)).get
      val got = graft.operators.TextAnalysis.bpeMergeRoundOf(texts.toDF("text"))
        .select("merged", "pair", "pair_count", "n_words")
        .as[(String, String, Long, Long)].collect().toList
      val words = texts.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val winner = pairOcc(words).groupBy(_._1).view.mapValues(_.map(_._3).sum)
        .toList.minBy { case (p, c) => (-c, p) }._1
      // Java String.replace is the same left-to-right non-overlapping
      // substitution as SQL replace
      val merged = words.map { case (w, n) => (w.replace(winner, "\u0001"), n) }
      val want = pairOcc(merged).groupBy(_._1).map { case (p, os) =>
        (winner, p.replace("\u0001", s"[$winner]"),
          os.map(_._3).sum, os.map(_._2).distinct.size.toLong)
      }.toList.sortBy { case (_, p, c, _) => (-c, p) }.take(10)
      assert(got === want, s"case $ci")
    }
  }

  test("XOR chunk codec: lossless on random walks over the full double domain") {
    import graft.sources.XorChunk
    def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
    val rnd = new scala.util.Random(1234)
    for (c <- 1 to 60) {
      val n = 1 + rnd.nextInt(300)
      var t = math.abs(rnd.nextLong()) % (1L << 45)
      val samples = (0 until n).map { _ =>
        t += (rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rnd.nextInt(1000).toLong
          case 2 => rnd.nextInt(1 << 20).toLong
          case _ => math.abs(rnd.nextLong()) % (1L << 41)
        })
        // any bit pattern is a legal sample: NaN payloads (staleness
        // markers), ±Inf, subnormals, signed zero — all must survive
        val v = rnd.nextInt(5) match {
          case 0 => 0.0
          case 1 => rnd.nextInt(100).toDouble
          case 2 => rnd.nextDouble() * 1e12
          case 3 => java.lang.Double.longBitsToDouble(rnd.nextLong())
          case _ => Double.NaN
        }
        (t, v)
      }
      val back = XorChunk.decode(XorChunk.encode(samples))
      assert(back.map { case (a, b) => (a, bits(b)) } ===
        samples.toVector.map { case (a, b) => (a, bits(b)) }, s"case $c n=$n")
    }
  }

  test("remote-read wire codecs: encode ∘ walk is the identity on random inputs") {
    import graft.sources.{RemoteRead, RemoteWrite}
    import graft.sources.RemoteRead.{Matcher, ReadQuery}
    val rnd = new scala.util.Random(99)
    for (c <- 1 to 40) {
      val qs = (0 to rnd.nextInt(3)).map { _ =>
        ReadQuery(math.abs(rnd.nextLong()) % (1L << 50),
          math.abs(rnd.nextLong()) % (1L << 50),
          (0 to rnd.nextInt(3)).map(_ => Matcher(rnd.nextInt(4),
            "lbl" + rnd.nextInt(5),
            rnd.alphanumeric.take(rnd.nextInt(12)).mkString)))
      }
      val accepted =
        if (rnd.nextBoolean()) Seq(0L)
        else Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(2).toLong)
      val bytes = RemoteRead.encodeRequest(qs, accepted)
      assert(RemoteRead.walkRequest(bytes) === qs, s"case $c")
      assert(RemoteRead.acceptedTypes(bytes) === accepted, s"case $c")
      // streamed frames: random per-query series sets round-trip
      // through chunking at a random budget (values finite — the NaN
      // domain is the XOR property's job; Series equality uses ==)
      val results = (0 to rnd.nextInt(2)).map { _ =>
        (0 until rnd.nextInt(3)).map { s =>
          var t = math.abs(rnd.nextLong()) % (1L << 44)
          RemoteWrite.Series(
            Vector("__name__" -> s"m$s", "k" -> rnd.nextInt(4).toString),
            (0 until (1 + rnd.nextInt(260))).map { _ =>
              t += rnd.nextInt(100000).toLong
              (rnd.nextDouble() * 1e6 - 5e5, t)
            }.toVector)
        }.toSeq
      }
      val decoded = RemoteRead.walkStreamed(RemoteRead.encodeStreamed(
        results, samplesPerChunk = 1 + rnd.nextInt(130)))
      val want = results.zipWithIndex.flatMap { case (qr, i) =>
        qr.map(s => (i.toLong, s))
      }
      assert(decoded === want, s"case $c (streamed)")
    }
  }
}
