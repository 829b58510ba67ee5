package graft

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** Extension-tier unit semantics on hand-built fixtures: dedup finds the
  * planted duplicates, cosine ranks the constructed neighbours, text
  * stats match hand counts, multimodal plumbing round-trips bytes.
  */
class ExtensionSpec extends SparkTestBase {
  import spark.implicits._

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private def doc(id: Long, text: String, lang: String = "en") =
    (id, text, lang, "src", text.length.toLong)

  test("exact dedup clusters identical normalized texts") {
    val dir = fixture("documents" -> Seq(
      doc(0, "alpha beta gamma"),
      doc(1, "ALPHA beta GAMMA"), // same after normalization
      doc(2, "something else entirely")).toDF(docCols: _*))
    val rows = Dedup.exact(spark, dir)
      .select($"doc_id", $"cluster_id", $"keep").as[(Long, Long, Boolean)]
      .collect().toSet
    assert(rows === Set((0L, 0L, true), (1L, 0L, false), (2L, 2L, true)))
  }

  test("minhash LSH surfaces a near-duplicate pair, jaccard confirms it") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    // only the last token differs → 27 of each doc's 28 shingles shared
    val nearDup = (1 to 30).map(i => if (i == 30) "changed" else s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"z$i").mkString(" ")
    val dir = fixture("documents" -> Seq(
      doc(0, base), doc(1, nearDup), doc(2, other)).toDF(docCols: _*))
    val pairs = Dedup.minhashLsh(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
    val j = Dedup.ngramJaccard(spark, dir).select("jaccard").as[Double].head()
    assert(math.abs(j - 27.0 / 29.0) < 1e-9)
  }

  test("documents shorter than the shingle width are skipped, not crashed") {
    val dir = fixture("documents" -> Seq(
      doc(0, "ab"),                 // 1 token: no 3-gram shingles
      doc(1, "one two"),            // 2 tokens: still none
      doc(2, (1 to 10).map(i => s"t$i").mkString(" "))).toDF(docCols: _*))
    val sigs = Dedup.minhashSignatures(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(sigs === Seq(2L)) // only the shingle-able doc has a signature
    assert(Dedup.minhashLsh(spark, dir).count() === 0)
    val fps = TextAnalysis.fingerprint(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(fps === Seq(2L))
  }

  test("pii redaction counts and rewrites emails, IPs, and phone numbers") {
    val dir = fixture("documents" -> Seq(
      doc(0, "contact bob.smith+x@example.co.uk or 10.0.0.1 now"),
      doc(1, "call +1 555 123 4567 tomorrow"),
      doc(2, "clean text only")).toDF(docCols: _*))
    val rows = TextAnalysis.piiRedact(spark, dir)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones",
        $"redacted_md5", $"clean")
      .as[(Long, Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0L)._2 === 1L && rows(0L)._3 === 1L && rows(0L)._4 === 0L)
    assert(rows(0L)._5 === md5Of("contact <EMAIL> or <IP> now"))
    assert(rows(1L)._4 === 1L && !rows(1L)._6)
    assert(rows(1L)._5 === md5Of("call <PHONE> tomorrow"))
    assert(rows(2L)._6 && rows(2L)._5 === md5Of("clean text only"))
  }

  test("chunking windows overlap by stride; packing fills bins in doc order") {
    // 90 tokens → chunk starts 0, 40, 80 → lengths 50, 50, 10
    val ninety = (1 to 90).map(i => s"w$i").mkString(" ")
    val dir = fixture("documents" -> Seq(
      doc(0, ninety),
      doc(1, "a b c"), // 3 tokens → one chunk of 3
      doc(2, (1 to 40).map(i => s"t$i").mkString(" "))).toDF(docCols: _*))
    val chunks = TextAnalysis.chunkDocuments(spark, dir)
      .select($"doc_id", $"chunk_idx", $"chunk_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(chunks === Seq((0L, 0L, 50L), (0L, 1L, 50L), (0L, 2L, 10L),
      (1L, 0L, 3L), (2L, 0L, 40L)))
    // overlap law: chunk 1 of doc 0 starts at token 41 (stride 40)
    val md5s = TextAnalysis.chunkDocuments(spark, dir)
      .filter($"doc_id" === 0L).select($"chunk_md5").as[String].collect()
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s(1) === md5Of((41 to 90).map(i => s"w$i").mkString(" ")))
    // packing: same lang, doc order 0(90) → 1(3) → 2(40); budget 256
    // prefixes 0, 90, 93 → all bin 0; totals 133 tokens
    val bins = TextAnalysis.tokenPacking(spark, dir)
      .select($"bin", $"n_docs", $"bin_tokens", $"utilization")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(bins === Seq((0L, 3L, 133L, 133.0 / 256.0)))
  }

  test("binary block-dup pairs docs sharing aligned 64-byte blocks only") {
    val base = ("block content " * 10).take(128) // two full aligned blocks
    val dir = fixture("documents" -> Seq(
      doc(0, base + " and a different tail here"),
      doc(1, base + " with another ending entirely"),
      doc(2, "completely unrelated text with no shared block content at all")
    ).toDF(docCols: _*))
    val rows = Multimodal.binaryBlockDup(spark, dir)
      .select($"d1", $"d2", $"shared_blocks", $"containment")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 1, s"expected exactly the planted pair: ${rows.toSeq}")
    assert(rows.head._1 === 0L && rows.head._2 === 1L)
    assert(rows.head._3 === 2L) // both aligned base blocks shared
    assert(rows.head._4 > 0.5)  // 2 of min(3, 3) blocks
  }

  test("contamination spans flag a copied run but not scattered single hits") {
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val dir = fixture("documents" -> Seq(
      row(0, "alpha beta gamma delta epsilon zeta eta", "src0"),
      // 5 copied tokens = a run of 3 consecutive 3-gram hits → flagged
      row(1, "xx alpha beta gamma delta epsilon yy zz ww vv", "src1"),
      // the same eval tokens SCATTERED: no two adjacent → runs of 1
      row(2, "alpha beta gamma qq rr delta epsilon zeta ss tt", "src1")
    ).toDF(docCols: _*))
    val m = TextAnalysis.contaminationSpans(spark, dir)
      .select($"doc_id", $"longest_run", $"flagged_span")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) === ((3L, true)), s"copied span not flagged: $m")
    assert(m(2L)._1 < 3L && !m(2L)._2, s"scattered hits over-flagged: $m")
  }

  test("bloom decontamination flags planted overlap and never under-flags vs exact") {
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val dir = fixture("documents" -> Seq(
      row(0, "alpha beta gamma delta epsilon zeta", "src0"), // the eval doc
      row(1, "alpha beta gamma delta epsilon zeta", "src1"), // full overlap
      row(2, "one two three four five six seven", "src1")    // fresh text
    ).toDF(docCols: _*))
    val bloom = TextAnalysis.bloomContamination(spark, dir)
      .select($"doc_id", $"n_bloom_hits", $"flagged")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(bloom(1L)._2, "full-overlap doc not flagged")
    assert(!bloom(2L)._2, "fresh doc flagged")
    // a Bloom filter can only OVER-count: hits >= the exact x20 count
    val exact = TextAnalysis.contamination(spark, dir)
      .select($"doc_id", $"n_contaminated").as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) =>
      assert(bloom(id)._1 >= n, s"doc $id bloom under-counts")
    }
  }

  test("temperature sampling keeps the smallest language whole, thins the largest toward sqrt") {
    // 400 'en' docs vs 100 'de' docs: expected keeps ≈ sqrt(100·400)
    // = 200 for en (p = 0.5), all 100 for de (p = 1)
    val docs = (0L until 400L).map(i => doc(i, s"english text $i", "en")) ++
      (400L until 500L).map(i => doc(i, s"german text $i", "de"))
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val kept = Sampling.temperatureSample(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("de") === 100, s"smallest language thinned: $byLang")
    assert(byLang("en") > 160 && byLang("en") < 240,
      s"en share off sqrt target 200: $byLang")
    // determinism: same corpus, same sample
    val again = Sampling.temperatureSample(spark, dir)
      .select($"doc_id").as[Long].collect()
    assert(again.toSeq === kept.map(_._1).toSeq)
  }

  test("dataset card margins are consistent: cells sum to every <all> total") {
    val docs = (0L until 120L).map(i =>
      doc(i, s"tokens for doc number $i here", if (i % 3 == 0) "de" else "en"))
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val card = TextAnalysis.datasetCard(spark, dir)
      .select($"lang", $"split", $"n_docs", $"n_tokens")
      .as[(String, String, Long, Long)].collect()
    val cells = card.filter(r => r._1 != "<all>" && r._2 != "<all>")
    def total(lang: String, split: String) =
      card.find(r => r._1 == lang && r._2 == split).get
    // grand total and both margin families must equal their cell sums
    assert(total("<all>", "<all>")._3 === 120L)
    assert(total("<all>", "<all>")._4 === cells.map(_._4).sum)
    for (l <- Seq("en", "de")) {
      val mine = cells.filter(_._1 == l)
      assert(total(l, "<all>")._3 === mine.map(_._3).sum)
      assert(total(l, "<all>")._4 === mine.map(_._4).sum)
    }
    for (s <- Seq("train", "val", "test")) {
      val mine = cells.filter(_._2 == s)
      assert(total("<all>", s)._3 === mine.map(_._3).sum)
    }
    // the split gate matches x44's assignment exactly
    val split = TextAnalysis.trainValTestSplit(spark, dir)
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    split.foreach { case (s, n) => assert(total("<all>", s)._3 === n) }
  }

  test("neardup source attribution separates cross-feed from within-feed pairs") {
    val mk = (p: String) => (1 to 30).map(i => s"$p$i").mkString(" ")
    val nearDup = (p: String) =>
      (1 to 30).map(i => if (i == 30) "changed" else s"$p$i").mkString(" ")
    val rows = Seq(
      (0L, mk("w"), "en", "feedA", 100L), (1L, nearDup("w"), "en", "feedB", 100L),
      (2L, mk("z"), "en", "feedC", 100L), (3L, nearDup("z"), "en", "feedC", 100L),
      (4L, (200 to 230).map(i => s"q$i").mkString(" "), "en", "feedA", 100L))
    val dir = fixture("documents" -> rows.toDF(docCols: _*))
    val attr = Dedup.neardupSourceAttribution(spark, dir)
      .select($"source_lo", $"source_hi", $"within_source", $"n_pairs", $"mean_est_jaccard")
      .as[(String, String, Boolean, Long, Double)].collect()
    assert(attr.map(r => (r._1, r._2, r._3, r._4)).toSet ===
      Set(("feedA", "feedB", false, 1L), ("feedC", "feedC", true, 1L)))
    assert(attr.forall(_._5 >= 0.5))
    // conservation: the matrix accounts for every LSH pair exactly once
    assert(attr.map(_._4).sum === Dedup.minhashLsh(spark, dir).count())
  }

  test("cluster margins are positive, per-cell bottom-3, and agree with the assignment") {
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val dir = fixture("embeddings" -> Seq(
      (1L, jitter(a, 1), 1), (2L, jitter(a, 2), 1), (3L, jitter(a, 3), 1),
      (4L, jitter(b, 4), 2), (5L, jitter(b, 5), 2), (6L, jitter(b, 6), 2),
      (100L, a, 1), (101L, b, 2)
    ).toDF("vec_id", "embedding", "label"))
    val audit = Similarity.clusterMarginAudit(spark, dir)
      .select($"vec_id", $"cell", $"runner_up", $"margin")
      .as[(Long, Int, Int, Double)].collect()
    // ≤3 rows per cell, runner-up is a different cell, and with two
    // orthogonal planted directions every margin is decisively large
    assert(audit.groupBy(_._2).forall(_._2.length <= 3))
    assert(audit.forall(r => r._2 != r._3))
    assert(audit.forall(_._4 > 0.5))
    val assigned = Similarity.kmeansAssignments(spark, dir)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    audit.foreach(r => assert(assigned(r._1) === r._2))
  }

  test("ngram typicality matches hand counts; boilerplate outranks unique text") {
    val dir = fixture("documents" -> Seq(
      doc(0, "the cat sat"), doc(1, "the cat ran"), doc(2, "the cat hid"),
      doc(3, "zeb qux worp"), doc(4, "solo")).toDF(docCols: _*))
    val got = TextAnalysis.ngramTypicality(spark, dir)
      .select($"doc_id", $"n_grams", $"sum_df", $"typicality")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // DF("the cat") = 3, DF of every other bigram = 1, N = 5 docs
    assert(got(0L) === ((0L, 2L, 4L, 4.0 / 2.0 / 5.0)))
    assert(got(3L) === ((3L, 2L, 2L, 2.0 / 2.0 / 5.0)))
    assert(got(4L) === ((4L, 0L, 0L, 0.0))) // too short for bigrams
    assert(got(0L)._4 > got(3L)._4) // boilerplate tail above unique tail
  }

  test("split leakage flags exactly the near-dup pairs whose splits differ") {
    val mk = (p: String) => (1 to 30).map(i => s"$p$i").mkString(" ")
    val nearDup = (p: String) =>
      (1 to 30).map(i => if (i == 30) "changed" else s"$p$i").mkString(" ")
    // enough planted pairs that the hash gate puts at least one pair on
    // each side of the leaky/clean divide is not guaranteed — assert
    // against the independently-computed x44 gate instead
    val rows = (0L until 6L).flatMap { k =>
      Seq((2 * k, mk(s"w${k}_"), "en", "src", 100L),
        (2 * k + 1, nearDup(s"w${k}_"), "en", "src", 100L))
    }
    val dir = fixture("documents" -> rows.toDF(docCols: _*))
    val leaks = Dedup.splitLeakage(spark, dir)
      .select($"doc_a", $"doc_b", $"split_a", $"split_b", $"leaky")
      .as[(Long, Long, String, String, Boolean)].collect()
    // every planted pair surfaces, nothing else
    assert(leaks.map(r => (r._1, r._2)).toSet ===
      (0L until 6L).map(k => (2 * k, 2 * k + 1)).toSet)
    val split = TextAnalysis.trainValTestSplit(spark, dir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    leaks.foreach { r =>
      assert(r._3 === split(r._1) && r._4 === split(r._2))
      assert(r._5 === (r._3 != r._4))
    }
  }

  test("shard manifest digests are order-stable and verify against a rebuild") {
    val docs = (0L until 40L).map(i =>
      (i, (1 to 50).map(j => s"t$j").mkString(" "), if (i % 2 == 0) "en" else "de", "src", 100L))
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val m1 = TextAnalysis.shardManifest(spark, dir)
      .select($"lang", $"bin", $"n_docs", $"shard_tokens", $"min_doc", $"max_doc", $"content_md5")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    // 20 docs x 50 tokens per lang → ceil-ish packing into 256-token bins
    assert(m1.map(_._4).sum === 40L * 50)
    m1.foreach(r => assert(r._5 <= r._6))
    // the digest is a pure function of shard membership: a reshuffled
    // rewrite of the same corpus reproduces every digest
    val dir2 = fixture("documents" ->
      docs.reverse.toDF(docCols: _*).repartition(7))
    val m2 = TextAnalysis.shardManifest(spark, dir2)
      .select($"lang", $"bin", $"n_docs", $"shard_tokens", $"min_doc", $"max_doc", $"content_md5")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(m1.sortBy(r => (r._1, r._2)).toSeq === m2.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("length percentiles match an independent order-statistic computation") {
    val docs = (0L until 90L).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      val n = ((i * 37) % 23 + 1).toInt // scrambled lengths 1..23
      (i, (1 to n).map(j => s"t$j").mkString(" "), lang, "src", 100L)
    }
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val got = TextAnalysis.lengthPercentiles(spark, dir)
      .select($"lang", $"n_docs", $"min_toks", $"p50_toks", $"p90_toks", $"p99_toks", $"max_toks")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (lang <- Seq("de", "en")) {
      val lens = docs.filter(_._3 == lang)
        .map(d => d._2.split(" ").length.toLong).sorted
      val n = lens.length
      def pct(num: Long, den: Long) = lens((num * (n - 1) / den).toInt)
      val r = got(lang)
      assert(r._2 === n.toLong)
      assert(r._3 === lens.head)
      assert(r._4 === pct(1, 2))
      assert(r._5 === pct(9, 10))
      assert(r._6 === pct(99, 100))
      assert(r._7 === lens.last)
    }
  }

  test("train/val/test split is growth-stable and near the declared shares") {
    val docs = (0L until 400L).map(i => doc(i, s"text for document $i"))
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val full = TextAnalysis.trainValTestSplit(spark, dir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // shares near 204/26/26 out of 256 (md5 is uniform on ids)
    val n = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 280 && n("train") < 350, s"train share off: $n")
    assert(n("val") > 15 && n("test") > 15, s"val/test share off: $n")
    // growth stability: the same doc keeps its split in a smaller corpus
    val dirHalf = fixture("documents" ->
      docs.take(200).toDF(docCols: _*))
    val half = TextAnalysis.trainValTestSplit(spark, dirHalf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    half.foreach { case (id, s) => assert(full(id) === s, s"doc $id moved splits") }
  }

  test("simhash clusters identical token multisets") {
    val dir = fixture("documents" -> Seq(
      doc(0, "red green blue"),
      doc(1, "red green blue"),
      doc(2, "purple orange teal white black cyan")).toDF(docCols: _*))
    val rows = Dedup.simhash(spark, dir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    assert(rows === Set((0L, 0L), (1L, 0L), (2L, 2L)))
  }

  test("cosine top-k ranks an identical vector first") {
    val v = Array.tabulate(64)(i => 0.1f + (i % 7) * 0.05f)
    val near = v.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val dir = fixture("embeddings" -> Seq(
      (0L, v, 1), (10L, v.clone(), 1), (11L, near, 1), (12L, far, 2)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.cosineTopK(spark, dir)
      .select($"neighbor_id", $"rank", $"cosine").as[(Long, Int, Double)].collect()
    assert(rows.head._1 === 10L && math.abs(rows.head._3 - 1.0) < 1e-9)
    assert(rows(1)._1 === 11L && rows(1)._3 > 0.999)
    assert(rows.last._1 === 12L && rows.last._3 < 0.5)
  }

  test("kmeans separates two planted clusters; semantic dedup keeps each core's champion") {
    // Two orthogonal directions; members are small perturbations. Seeds
    // 100/101 sit on the directions (cid 0/1); seeds 102-107 are absent,
    // so K collapses to 2 — the operator tolerates missing seed ids.
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val dir = fixture("embeddings" -> Seq(
      (1L, jitter(a, 1), 1), (2L, jitter(a, 2), 1), (3L, jitter(a, 3), 1),
      (4L, jitter(b, 4), 2), (5L, jitter(b, 5), 2), (6L, jitter(b, 6), 2),
      (100L, a, 1), (101L, b, 2)
    ).toDF("vec_id", "embedding", "label"))
    val clusters = Similarity.kmeansClusters(spark, dir)
      .select($"cell", $"n_members", $"champion_id").as[(Int, Long, Long)].collect()
    assert(clusters.map(_._1).toSeq === Seq(0, 1))
    assert(clusters.forall(_._2 === 4L))
    val kept = Similarity.semanticDedup(spark, dir)
      .filter($"keep").select($"cell", $"vec_id").as[(Int, Long)].collect()
    // every member cosine ≈ 1 → the whole cell is semantic core → one
    // survivor per cell, and it is the cluster champion
    assert(kept.length === 2)
    assert(kept.toMap === clusters.map(c => c._1 -> c._3).toMap)
  }

  test("cluster purity reports the planted majority label and language per cell") {
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val embDir = Seq(
      (1L, jitter(a, 1), 1), (2L, jitter(a, 2), 1), (3L, jitter(a, 3), 1),
      (4L, jitter(b, 4), 2), (5L, jitter(b, 5), 2), (6L, jitter(b, 6), 2),
      (100L, a, 1), (101L, b, 2)).toDF("vec_id", "embedding", "label")
    // paired docs: cell 0 is en-majority (3 of 4), cell 1 uniformly de
    val docs = Seq(
      (1L, "t", "en", "src", 1L), (2L, "t", "en", "src", 1L),
      (3L, "t", "fr", "src", 1L), (100L, "t", "en", "src", 1L),
      (4L, "t", "de", "src", 1L), (5L, "t", "de", "src", 1L),
      (6L, "t", "de", "src", 1L), (101L, "t", "de", "src", 1L))
      .toDF(docCols: _*)
    val dir = fixture("embeddings" -> embDir, "documents" -> docs)
    val rows = Similarity.clusterPurity(spark, dir)
      .select($"cell", $"n_members", $"top_label", $"label_purity", $"top_lang", $"lang_purity")
      .as[(Int, Long, Int, Double, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (0, 4L, 1, 1.0, "en", 0.75),
      (1, 4L, 2, 1.0, "de", 1.0)))
  }

  test("embedding outliers surface the least-central vector per label") {
    val a = Array.fill(64)(1.0f)
    def jitter(id: Int): Array[Float] =
      a.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    // half-flipped vector: far from the all-ones cluster's centroid
    val odd = Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)
    val dir = fixture("embeddings" -> Seq(
      (0L, jitter(0), 1), (1L, jitter(1), 1), (2L, jitter(2), 1),
      (3L, jitter(3), 1), (9L, odd, 1)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.embeddingOutliers(spark, dir)
      .select($"vec_id", $"rank", $"cosine").as[(Long, Int, Double)].collect()
    assert(rows.length === 5)
    assert(rows.head._1 === 9L && rows.head._2 === 1) // the planted outlier
    assert(rows.head._3 < rows(1)._3 - 0.1)           // clearly separated
    assert(rows.tail.forall(_._3 > 0.9))              // core members central
  }

  test("embedding covariance numerators match the direct formula") {
    // two simple vectors: dims 0/1 carry (0.1, 0.3) and (0.2, 0.5),
    // quantized to (1000, 3000) and (2000, 5000); the rest are zero
    val v1 = Array.tabulate(64)(i => if (i == 0) 0.1f else if (i == 1) 0.3f else 0.0f)
    val v2 = Array.tabulate(64)(i => if (i == 0) 0.2f else if (i == 1) 0.5f else 0.0f)
    val dir = fixture("embeddings" -> Seq(
      (0L, v1, 1), (1L, v2, 1)).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.embeddingCovariance(spark, dir)
      .select($"i", $"j", $"n", $"cov_num").as[(Int, Int, Long, Long)].collect()
    assert(rows.length === 64 * 65 / 2)
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    // cov_num(i, j) = n·Σqi·qj − Σqi·Σqj on the quantized integers
    assert(m((0, 0)) === 2L * (1000L * 1000 + 2000L * 2000) - 3000L * 3000)
    assert(m((0, 1)) === 2L * (1000L * 3000 + 2000L * 5000) - 3000L * 8000)
    assert(m((1, 1)) === 2L * (3000L * 3000 + 5000L * 5000) - 8000L * 8000)
    assert(m((2, 63)) === 0L)
    assert(rows.forall(_._3 === 2L))
  }

  test("kmeansRounds(2) reproduces the hand-written 2-round twin (generator cross-check)") {
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val dir = fixture("embeddings" -> Seq(
      (1L, jitter(a, 1), 1), (2L, jitter(a, 2), 1), (3L, jitter(a, 3), 1),
      (4L, jitter(b, 4), 2), (5L, jitter(b, 5), 2), (6L, jitter(b, 6), 2),
      (100L, a, 1), (101L, b, 2)
    ).toDF("vec_id", "embedding", "label"))
    // the generated 2-round unrolling must agree with the hand-written
    // x35 path row for row — the generator's correctness law; on this
    // converging fixture the 3-round registered form agrees too (a
    // converged assignment is a fixpoint of the loop body)
    val twin = Similarity.kmeansClusters(spark, dir).collect().map(_.toSeq).toSeq
    assert(Similarity.kmeansRounds(spark, dir, rounds = 2)
      .collect().map(_.toSeq).toSeq === twin)
    assert(Similarity.kmeansRounds(spark, dir)
      .collect().map(_.toSeq).toSeq === twin)
    // the generated SQL text unrolls exactly `rounds` score/assign pairs
    assert(Similarity.kmeansRoundsSql(2).contains("a2 AS") &&
      !Similarity.kmeansRoundsSql(2).contains("s3 AS"))
    assert(Similarity.KmeansRoundsSql.contains(s"a${Similarity.KmeansGateRounds} AS"))
  }

  test("converged kmeans equals the 2-round twin when 2 rounds suffice") {
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val dir = fixture("embeddings" -> Seq(
      (1L, jitter(a, 1), 1), (2L, jitter(a, 2), 1), (3L, jitter(a, 3), 1),
      (4L, jitter(b, 4), 2), (5L, jitter(b, 5), 2), (6L, jitter(b, 6), 2),
      (100L, a, 1), (101L, b, 2)
    ).toDF("vec_id", "embedding", "label"))
    val twin = Similarity.kmeansClusters(spark, dir).collect().map(_.toSeq)
    val conv = Similarity.kmeansConverged(spark, dir).collect().map(_.toSeq)
    assert(conv.toSeq === twin.toSeq)
    // maxRounds caps the loop even if it were to oscillate
    val capped = Similarity.kmeansConverged(spark, dir, maxRounds = 1)
      .select($"cell").as[Int].collect()
    assert(capped.sorted.toSeq === Seq(0, 1))
  }

  /** Planted-cluster fixture for the k-means|| tests: two orthogonal
    * directions, `n` jittered members each. vec_id 100 (required: it is
    * x39's deterministic first candidate) sits exactly on direction a.
    */
  private def plantedDir(n: Int): String = {
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def jitter(v: Array[Float], id: Int): Array[Float] =
      v.zipWithIndex.map { case (x, i) => x + ((id * 31 + i) % 5) * 0.01f }
    val rows = (1 to n).map(i => (i.toLong, jitter(a, i), 1)) ++
      (1 to n).map(i => (200L + i, jitter(b, 200 + i), 2)) :+
      ((100L, a, 1))
    fixture("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
  }

  test("kmeans|| init: weights partition the corpus, candidates span both planted clusters") {
    val n = 12
    val dir = plantedDir(n)
    val cands = Similarity.kmeansParallelInit(spark, dir)
      .select($"cand_id", $"round", $"weight").as[(Long, Int, Long)].collect()
    // round 0 is exactly the deterministic first candidate
    assert(cands.filter(_._2 == 0).map(_._1).toSeq === Seq(100L))
    assert(cands.forall(c => c._2 >= 0 && c._2 <= Similarity.KppRounds))
    // every corpus point is attracted to exactly one candidate
    assert(cands.map(_._3).sum === 2L * n + 1L)
    // oversampling must have reached the far (b) cluster: some candidate
    // carries weight from it, i.e. a candidate with id > 200 exists
    assert(cands.exists(_._1 > 200L))
  }

  test("localWeightedSeeds matches an exhaustive reference and spans planted groups") {
    // independent reference: same selection law, separately coded as an
    // explicit exhaustive argmin over (−weight·minDist, id) tuples
    def refGreedy(cands: Array[(Long, Long, Array[Long], Long)], k: Int)
        : Seq[Long] = {
      def dist(x: (Long, Long, Array[Long], Long),
          y: (Long, Long, Array[Long], Long)): Long = {
        val dp = x._3.zip(y._3).map { case (p, q) => p * q }.sum
        val cos = dp.toDouble / math.sqrt(x._4.toDouble) / math.sqrt(y._4.toDouble)
        math.max(math.floor((1.0 - cos) * 1048576.0).toLong, 0L)
      }
      var chosen = List(cands.sortBy(c => (-c._2, c._1)).head)
      while (chosen.size < k && chosen.size < cands.length) {
        val rest = cands.filter(c => !chosen.exists(_._1 == c._1))
        val scored = rest.map(c => (c, -c._2 * chosen.map(dist(c, _)).min))
        val best = scored.sortBy { case (c, s) => (s, c._1) }.head._1
        chosen = chosen :+ best
      }
      chosen.map(_._1)
    }
    def unit(seed: Int): Array[Long] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(1000L + rnd.nextInt(9000).toLong)
    }
    def n2(q: Array[Long]): Long = q.map(x => x * x).sum
    // 10 candidates in 3 planted orthant groups; weights comparable
    // across groups so farthest-point spread (not weight mass) decides
    val groups = Seq(
      (0 until 4).map { i => val q = unit(i); (10L + i, 5L + i, q, n2(q)) },
      (0 until 3).map { i => val q = unit(100 + i).map(-_); (20L + i, 6L + i, q, n2(q)) },
      (0 until 3).map { i =>
        val q = unit(200 + i).zipWithIndex.map { case (x, j) => if (j % 2 == 0) x else -x }
        (30L + i, 5L + i, q, n2(q))
      })
    val cands = groups.flatten.toArray
    val mine = Similarity.localWeightedSeeds(cands, 3).map(_._1).toSeq
    assert(mine === refGreedy(cands, 3))
    // farthest-point on 3 orthogonal groups picks one seed per group
    assert(mine.map(id => groups.indexWhere(_.exists(_._1 == id))).toSet === Set(0, 1, 2))
    // k larger than the candidate set returns every candidate once
    val all = Similarity.localWeightedSeeds(cands, 99).map(_._1)
    assert(all.length === cands.length && all.distinct.length === all.length)
  }

  test("kmeans|| pipeline and kpp-seeded converged kmeans never mix planted clusters") {
    val n = 12
    val dir = plantedDir(n)
    // orthogonal planted directions: a cell mixing the two would have
    // cosine-to-centroid ≈ 0.7 for its minority members, so min_cos ≥ 0.9
    // for every cell proves the partition respects the planted structure
    for (df <- Seq(Similarity.kmeansParallelClusters(spark, dir),
        Similarity.kmeansConverged(spark, dir, kppSeeds = true))) {
      val cells = df.select($"cell", $"n_members", $"min_cos")
        .as[(Int, Long, Double)].collect()
      assert(cells.map(_._2).sum === 2L * n + 1L)
      assert(cells.length <= Similarity.KmeansK)
      cells.foreach { case (cell, _, minCos) =>
        assert(minCos >= 0.9, s"cell $cell mixes planted clusters (min_cos $minCos)")
      }
    }
  }

  test("int8 quantization bounds values to ±127 and error to half a quantum") {
    val v = Array.tabulate(64)(i => -0.4f + (i % 9) * 0.1f) // mixed signs
    val axis = Array.tabulate(64)(i => if (i == 3) -0.8f else 0.0f)
    val dir = fixture("embeddings" -> Seq(
      (0L, v, 1), (1L, axis, 2)).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.int8Quantization(spark, dir)
      .select($"vec_id", $"amax", $"q8_min", $"q8_max", $"max_err_i")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, amax, q8min, q8max, maxErr) =>
      assert(q8min >= -127L && q8max <= 127L, s"vec $id int8 range")
      // round-to-nearest: |127·q − q8·amax| ≤ amax/2
      assert(maxErr * 2 <= amax, s"vec $id error beyond half quantum")
    }
    // the single-axis vector quantizes exactly: its only nonzero element
    // IS the scale (q8 = −127), everything else is 0 → zero error
    val axisRow = Similarity.int8Quantization(spark, dir)
      .filter($"vec_id" === 1L)
      .select($"q8_min", $"max_err_i", $"sq_err_sum")
      .as[(Long, Long, Long)].head()
    assert(axisRow === ((-127L, 0L, 0L)))
  }

  test("quality score counts words, stopwords and distinct types") {
    val dir = fixture("documents" -> Seq(
      doc(0, "the cat sat on the mat")).toDF(docCols: _*))
    val r = TextAnalysis.qualityScore(spark, dir)
      .select("n_words", "stopword_ratio", "type_token_ratio")
      .as[(Long, Double, Double)].head()
    assert(r._1 === 6L)
    assert(math.abs(r._2 - 3.0 / 6.0) < 1e-9) // the, on, the
    assert(math.abs(r._3 - 5.0 / 6.0) < 1e-9) // "the" repeats
  }

  test("token count: regex tokens split punctuation, whitespace does not") {
    val dir = fixture("documents" -> Seq(
      doc(0, "hello, world! x2")).toDF(docCols: _*))
    val r = TextAnalysis.tokenCount(spark, dir)
      .select("ws_tokens", "bpe_tokens").as[(Long, Long)].head()
    assert(r._1 === 3L) // hello, | world! | x2
    assert(r._2 === 6L) // hello , world ! x 2
  }

  test("fingerprint is stable under duplication and distinct across texts") {
    val t1 = (1 to 20).map(i => s"a$i").mkString(" ")
    val t2 = (1 to 20).map(i => s"b$i").mkString(" ")
    val dir = fixture("documents" -> Seq(
      doc(0, t1), doc(1, t1), doc(2, t2)).toDF(docCols: _*))
    val fps = TextAnalysis.fingerprint(spark, dir)
      .select($"doc_id", $"fingerprint").as[(Long, String)].collect().toMap
    assert(fps(0L) === fps(1L))
    assert(fps(0L) !== fps(2L))
  }

  test("multimodal frame sampling round-trips payload bytes per partition batch") {
    val text = "x" * 200 // 200 ascii bytes → frames at offsets 0, 64, 128, 192
    val dir = fixture("documents" -> Seq(doc(0, text)).toDF(docCols: _*))
    val r = Multimodal.frameSample(spark, dir)
      .select("n_bytes", "n_frames", "frame_first", "frame_sum")
      .as[(Long, Int, Long, Long)].head()
    assert(r._1 === 200L)
    assert(r._2 === 4)
    assert(r._3 === 'x'.toLong)
    assert(r._4 === 4 * 'x'.toLong)
  }

  test("multimodal frame sampling yields 0 frames with null stats on empty payload") {
    val dir = fixture("documents" -> Seq(doc(0, "")).toDF(docCols: _*))
    val r = Multimodal.frameSample(spark, dir)
      .select("n_bytes", "n_frames", "frame_first", "frame_last", "frame_sum")
      .collect().head
    assert(r.getLong(0) === 0L)
    assert(r.getInt(1) === 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("int_dot expression computes exact integer dot products in codegen") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),       // 4+10+18 = 32
      (Array(-2L, 7L), Array(3L, -1L)),             // -6-7 = -13
      (Array.empty[Long], Array.empty[Long])        // 0
    ).toDF("a", "b")
    graft.plans.IntDotExpr.register(spark)
    val out = df.select(org.apache.spark.sql.functions.expr("int_dot(a, b)").as("d"))
      .as[Long].collect().toSeq
    assert(out === Seq(32L, -13L, 0L))
    // compose-time type contract: non-long arrays are rejected at analysis
    val bad = Seq((Array(1.0, 2.0), Array(1L))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(org.apache.spark.sql.functions.expr("int_dot(a, b)")).collect()
    }
  }

  test("approx distinct sketch lands within HLL++ error of the exact count") {
    val dir = fixture("documents" -> (0 until 200).map(i =>
      doc(i.toLong, s"unique document number $i with shared filler words")).toDF(docCols: _*))
    val r = TextAnalysis.approxDistinct(spark, dir)
      .select("n_docs_exact", "n_docs_approx").as[(Long, Long)].head()
    assert(r._1 === 200L)
    // default rsd 5%: allow 3 sigma
    assert(math.abs(r._2 - 200L) <= 30, s"approx ${r._2} too far from 200")
  }

  test("deterministic md5-HLL (x16b) estimates within sketch error on both branches") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.approxDistinctDet(spark, dir)
      .select($"lang", $"n_docs_exact", $"n_docs_est",
        $"n_shingles_exact", $"n_shingles_est")
      .as[(String, Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, de, dEst, se, sEst) =>
      // m = 4096 → rsd ≈ 1.6 % raw, linear counting tighter; allow 6 %
      assert(math.abs(dEst - de) / de <= 0.06, s"$lang docs: $dEst vs $de")
      assert(math.abs(sEst - se) / se <= 0.06, s"$lang shingles: $sEst vs $se")
    }
  }

  test("char_trigrams generator matches substr semantics incl. multi-byte UTF-8") {
    graft.plans.CharTrigramsExpr.register(spark)
    val df = Seq("abcd", "héllo", "ab", "").toDF("s")
    val out = df.select($"s", org.apache.spark.sql.functions.expr("char_trigrams(s)").as("g"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out.filter(_._1 == "abcd").map(_._2) === Seq("abc", "bcd"))
    // é is 2 bytes — slices must respect char boundaries
    assert(out.filter(_._1 == "héllo").map(_._2) === Seq("hél", "éll", "llo"))
    assert(!out.exists(r => r._1 == "ab" || r._1 == ""))
  }

  test("repetition: dup-token and top-token fractions match hand counts") {
    // "a a a b" → 4 tokens, 2 distinct → dup 0.5; top token a: 3/4
    val dir = fixture("documents" -> Seq(
      doc(0, "a a a b")).toDF(docCols: _*))
    val r = TextAnalysis.repetition(spark, dir)
      .select($"n_tokens", $"dup_token_frac", $"top_token_frac", $"dup_3gram_frac")
      .as[(Long, Double, Double, Double)].collect()
    // shingles: "a a a","a a b" distinct → dup_3gram 0.0
    assert(r.toSeq === Seq((4L, 0.5, 0.75, 0.0)))
  }

  test("tfidf ranks doc-exclusive tokens above corpus-wide ones") {
    val dir = fixture("documents" -> Seq(
      doc(0, "shared rareword rareword"),
      doc(1, "shared other tokens here")).toDF(docCols: _*))
    val top = TextAnalysis.tfidfKeywords(spark, dir)
      .filter($"doc_id" === 0 && $"rn" === 1)
      .select($"tok", $"tf", $"df", $"score")
      .as[(String, Long, Long, Double)].collect()
    // rareword: tf=2, df=1 → score 2.0 beats shared (tf=1, df=2 → 0.5)
    assert(top.toSeq === Seq(("rareword", 2L, 1L, 2.0)))
  }

  test("corpus ngrams: the planted frequent bigram tops the ranking") {
    val dir = fixture("documents" -> Seq(
      doc(0, "hot pair hot pair hot pair"),
      doc(1, "cold gram")).toDF(docCols: _*))
    val top = TextAnalysis.corpusNgrams(spark, dir)
      .select($"gram", $"n").as[(String, Long)].collect()
    assert(top.head === (("hot pair", 3L)))
  }

  test("contamination flags docs sharing shingles with the benchmark slice") {
    val bench = (1 to 10).map(i => s"b$i").mkString(" ")
    val half = ((1 to 6).map(i => s"b$i") ++ (1 to 6).map(i => s"c$i")).mkString(" ")
    val clean = (1 to 10).map(i => s"z$i").mkString(" ")
    val dir = fixture("documents" -> Seq(
      (0L, bench, "en", "src0", bench.length.toLong),
      (1L, half, "en", "src1", half.length.toLong),
      (2L, clean, "en", "src2", clean.length.toLong)).toDF(docCols: _*))
    val rows = TextAnalysis.contamination(spark, dir)
      .select($"doc_id", $"n_contaminated", $"flagged")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1: shingles b1..b6 region overlaps benchmark ("b1 b2 b3".. "b4 b5 b6");
    // 4 of its 10 shingles are benchmark shingles → not flagged at 0.5
    assert(!rows.contains(0L))          // benchmark slice itself excluded
    assert(rows(1L)._1 === 4L && !rows(1L)._2)
    assert(rows(2L) === ((0L, false)))
  }

  test("resize fits dims into 64x64 and stride-samples the payload bytes") {
    val text = ("x" * 500) + ("y" * 12) // 512 bytes → stride 2, 256 sampled
    val dir = fixture("documents" -> Seq(doc(0, text)).toDF(docCols: _*))
    val r = graft.operators.Multimodal.resize(spark, dir)
      .select($"dst_w", $"dst_h", $"n_src_bytes", $"stride", $"n_dst_bytes", $"dst_md5")
      .as[(Long, Long, Long, Long, Long, String)].collect().head
    assert(r._3 === 512L && r._4 === 2L && r._5 === 256L)
    assert(r._1 <= 64L && r._2 <= 64L && math.max(r._1, r._2) === 64L)
    // positions 0,2,..,498 are 'x' (250), 500..510 even are 'y' (6)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("x" * 250 + "y" * 6).getBytes).map("%02x".format(_)).mkString
    assert(r._6 === expected)
  }

  test("byte histogram counts byte classes and the lowercase fraction") {
    val dir = fixture("documents" -> Seq(doc(0, "ab1 C!")).toDF(docCols: _*))
    val r = graft.operators.Multimodal.byteHistogram(spark, dir)
      .select($"n_bytes", $"n_lower", $"n_digit", $"n_space", $"n_other", $"lower_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(r === ((6L, 2L, 1L, 1L, 2L, 2.0 / 6.0)))
  }

  test("dedup components close the transitive chain A~B~C into one cluster") {
    // A and B share 29 of 30 tokens; B and C share 29 of 30; A and C
    // differ in two tokens — likely bucket-joined only via B
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 30).map(i => if (i == 30) "xx" else s"w$i").mkString(" ")
    val c = (1 to 30).map(i => if (i == 30) "xx" else if (i == 1) "yy" else s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"z$i").mkString(" ")
    val dir = fixture("documents" -> Seq(
      doc(0, a), doc(1, b), doc(2, c), doc(3, other)).toDF(docCols: _*))
    val comps = graft.operators.Dedup.dedupComponents(spark, dir)
      .select($"doc_id", $"component_id").as[(Long, Long)].collect().toMap
    // all three near-dups collapse to the min doc_id; the unrelated doc
    // has no candidate pair at all and is absent
    assert(comps === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("connected components converge on a 12-vertex chain (beyond any fixed unroll)") {
    // path 0-1-2-...-11 has diameter 11: a fixed 3-round one-hop
    // propagation would split it; the fixpoint loop must close it
    val chain = (0L until 11L).map(i => (i, i + 1))
    val extra = Seq((20L, 21L), (21L, 22L)) // separate 3-vertex component
    val edges = (chain ++ extra).toDF("doc_a", "doc_b")
    val labels = graft.operators.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (0L to 11L).foreach(v => assert(labels(v) === 0L, s"vertex $v"))
    Seq(20L, 21L, 22L).foreach(v => assert(labels(v) === 20L, s"vertex $v"))
    assert(labels.size === 15)
  }

  test("x76: bigram perplexity matches an independent count-model reference") {
    import graft.functions.DetMath
    val dir = fixture("documents" -> Seq(
      doc(0, "the cat sat"), doc(1, "the cat ran"), doc(2, "the dog sat"),
      doc(3, "zz")).toDF(docCols: _*)) // doc 3: <2 tokens -> no row
    val rows = graft.operators.TextAnalysis.perplexity(spark, dir)
      .select($"doc_id", $"n_bigrams", $"bits_per_bigram", $"ppl")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // independent reference: recount the model by hand on the fixture
    val docs = Map(0L -> "the cat sat", 1L -> "the cat ran", 2L -> "the dog sat")
    val bigrams = docs.view.mapValues(t =>
      t.split(" ").sliding(2).map(_.mkString(" ")).toSeq).toMap
    val all = bigrams.values.flatten.toSeq
    val c12 = all.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = all.groupBy(_.split(" ")(0)).view.mapValues(_.size).toMap
    val v = all.map(_.split(" ")(1)).distinct.size
    for ((id, bs) <- bigrams) {
      val bits = bs.map { b =>
        -DetMath.log2((c12(b) + 1).toDouble / (c1(b.split(" ")(0)) + v).toDouble)
      }
      // the engine quantizes each surprisal to exact nano-bits (floor
      // is exact — no cross-engine rounding-mode ambiguity)
      val mean = bits.map(x => math.floor(x * 1e9 + 0.5).toLong).sum / 1e9 / bs.size
      val (n, bpb, ppl) = rows(id)
      assert(n === bs.size.toLong, s"doc $id")
      assert(math.abs(bpb - mean) < 1e-11, s"doc $id: $bpb vs $mean")
      assert(ppl === DetMath.exp2(bpb), s"doc $id ppl")
    }
    // sub-2-token doc emits no row; repeated bigrams score cheaper than
    // one-off bigrams ("the cat" seen twice vs "dog sat" once)
    assert(!rows.contains(3L))
    assert(rows(0L)._2 < rows(2L)._2,
      "doc of more-frequent bigrams must score lower surprisal")
  }

  test("x77: arbitrary-alpha temperature thresholds match the closed form; smallest language kept whole") {
    import graft.functions.DetMath
    val docs = (0L until 640L).map { i =>
      val lang = if (i < 512) "en" else if (i < 624) "de" else "sw"
      doc(i, s"document body $i", lang)
    }
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val kept = graft.operators.Sampling.temperatureSampleAlpha(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // smallest language: ratio 1 -> log2 = 0 exactly -> threshold 2^32
    assert(by("sw") === 16)
    // expected keep rates (n_min/n_l)^(1-alpha); md5 uniform -> 4 sigma
    def expect(nl: Int): Double =
      DetMath.exp2(0.7 * DetMath.log2(16.0 / nl)) * nl
    for ((l, nl) <- Seq("en" -> 512, "de" -> 112)) {
      val e = expect(nl)
      val sd = math.sqrt(e * (1 - e / nl))
      assert(math.abs(by(l) - e) <= 4 * sd + 1, s"$l kept ${by(l)} expected ~$e")
    }
    // deterministic: the decision is a pure function of doc_id and counts
    val again = graft.operators.Sampling.temperatureSampleAlpha(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(again.toSeq === kept.toSeq)
    // alpha=0.9 keeps more of the big language than alpha=0.3 (flatter
    // sampling needs LESS downsampling as alpha -> 1)
    val hot = graft.operators.Sampling.temperatureSampleAlpha(spark, dir, alpha = 0.9)
      .select($"lang").as[String].collect().count(_ == "en")
    assert(hot > by("en"))
  }

  test("x78: token entropy is 0 for constant docs, ~log2(k) for uniform, monotone in diversity") {
    val dir = fixture("documents" -> Seq(
      doc(0, "a a a a a a"),              // constant -> H = 0
      doc(1, "a b c d e f g h"),          // uniform over 8 -> H ~ 3 bits
      doc(2, "a a a a a a a b"),          // skewed 2-token
      doc(3, "a b")).toDF(docCols: _*))   // uniform over 2 -> H ~ 1 bit
    val m = graft.operators.TextAnalysis.tokenEntropy(spark, dir)
      .select($"doc_id", $"n_tokens", $"n_distinct", $"entropy_bits", $"norm_entropy")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(0L)._4 === 0.0 && m(0L)._5 === 0.0)
    assert(math.abs(m(1L)._4 - 3.0) < 1e-8 && math.abs(m(1L)._5 - 1.0) < 1e-8)
    assert(math.abs(m(3L)._4 - 1.0) < 1e-8)
    // skew lowers entropy below the uniform bound log2(2) = 1
    assert(m(2L)._4 > 0.0 && m(2L)._4 < 1.0 && m(2L)._5 < 1.0)
    assert(m(1L)._2 === 8L && m(1L)._3 === 8L)
  }

  test("x79: KL source drift is ~0 for corpus-typical sources, positive for divergent ones") {
    // srcA and srcB share the corpus-dominant distribution; srcC writes
    // a disjoint vocabulary -> large positive KL
    val docs =
      (0L until 8L).map(i => (i, "the cat sat on the mat", "en", s"src${i % 2}", 22L)) :+
      ((8L, "zq zq xw xw vv vv", "en", "src2", 17L))
    val dir = fixture("documents" ->
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val m = graft.operators.TextAnalysis.sourceDrift(spark, dir)
      .select($"source", $"kl_bits").as[(String, Double)].collect().toMap
    // KL is non-negative up to the 1e-9 quantization
    m.values.foreach(v => assert(v >= -1e-6, s"negative KL: $m"))
    // identical-distribution sources sit near zero; the disjoint-vocab
    // source diverges by bits
    assert(m("src0") < 0.5 && m("src1") < 0.5)
    assert(m("src2") > 1.0, s"divergent source must read high: $m")
    assert(m("src2") > m("src0") && m("src2") > m("src1"))
  }

  test("cms heavy hitters: estimates match exact counts on a sparse fixture") {
    val dir = fixture("documents" -> Seq(
      doc(0, "hot pair hot pair hot pair"),
      doc(1, "cold gram")).toDF(docCols: _*))
    val rows = TextAnalysis.cmsHeavyHitters(spark, dir)
      .select($"gram", $"n", $"n_est", $"overestimate")
      .as[(String, Long, Long, Long)].collect()
    // few distinct grams, width 1024 → no collisions: estimate == exact
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 === r._2 && r._4 === 0L, s"collision-free fixture: $r")
    }
    assert(rows.head._1 === "hot pair" && rows.head._2 === 3L)
  }

  test("stratified sample keeps the hash-threshold fraction per language") {
    val docs = (0L until 400L).map(i =>
      doc(i, s"document number $i body", if (i % 2 == 0) "en" else "sw"))
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val kept = graft.operators.Sampling.stratifiedSample(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val en = kept.count(_._2 == "en")
    val sw = kept.count(_._2 == "sw")
    // sw has no threshold row → keep-all; en keeps ~1/4 (md5 is uniform;
    // 200 Bernoulli(0.25) draws stay within ±4σ ≈ ±25 of 50)
    assert(sw === 200)
    assert(en > 25 && en < 75, s"en kept $en of 200 at rate 0.25")
    // determinism: the decision is a pure function of doc_id
    val again = graft.operators.Sampling.stratifiedSample(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(again.toSeq === kept.toSeq)
  }

  test("quality sample keeps every top-tier doc; decision is a pure doc_id function") {
    import graft.operators.Sampling
    val good = (1 to 30).map(i => s"word$i").mkString(" ") +
      " the of and in is on" // ≥20 words, stopwords, diverse → score 3
    val bad = "dup dup dup dup dup" // short, no stopwords, repetitive → score 0
    val dir = fixture("documents" ->
      ((0L until 20L).map(i => doc(i, good)) ++
       (100L until 120L).map(i => doc(i, bad))).toDF(docCols: _*))
    val kept = Sampling.qualitySample(spark, dir)
      .select($"doc_id", $"quality_score").as[(Long, Int)].collect().toMap
    // tier 3 keeps 100% regardless of hash
    assert((0L until 20L).forall(kept.contains))
    assert(kept.filter(_._1 < 20L).values.forall(_ === 3))
    // tier 0 thins to ~6%: strictly fewer than the good tier survive
    assert(kept.keys.count(_ >= 100L) < 20)
    // deterministic: a second evaluation yields the identical sample
    val again = Sampling.qualitySample(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === kept.keySet)
  }

  test("incremental dedup admits only fingerprints absent from the prior index") {
    // doc 3 (incoming: 3 % 10 >= 7 is false)… use ids 7,8,17 as incoming
    val dir = fixture("documents" -> Seq(
      doc(0, "prior text alpha"),   // prior (0 % 10 < 7)
      doc(1, "prior text beta"),    // prior
      doc(7, "prior text alpha"),   // incoming, dup of prior 0 → dropped
      doc(8, "fresh text gamma"),   // incoming, novel → kept
      doc(17, "fresh text gamma"),  // incoming, dup WITHIN batch → folded into 8
      doc(18, "fresh text delta")   // incoming, novel → kept
    ).toDF(docCols: _*))
    val kept = graft.operators.Sampling.incrementalDedup(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(8L, 18L))
  }

  test("mixture sample fills each language budget with a deterministic hash prefix") {
    val docs = (0L until 300L).map { i =>
      val lang = i % 3 match { case 0 => "en"; case 1 => "de"; case _ => "xx" }
      doc(i, (1 to 40).map(j => s"tok${i}_$j").mkString(" "), lang) // 40 tokens each
    }
    val dir = fixture("documents" -> docs.toDF(docCols: _*))
    val rows = graft.operators.Sampling.mixtureSample(spark, dir)
      .select($"lang", $"n_tokens", $"cum_tokens")
      .as[(String, Long, Long)].collect()
    val byLang = rows.groupBy(_._1)
    // xx has no budget row → excluded entirely
    assert(!byLang.contains("xx"))
    // en budget 4000 / 40-token docs → exactly 100 docs, cum exactly 4000;
    // de budget 2000 → 50 docs
    assert(byLang("en").length === 100 && byLang("en").map(_._2).sum === 4000L)
    assert(byLang("de").length === 50 && byLang("de").map(_._2).sum === 2000L)
    // running totals never exceed the budget
    assert(rows.forall { case (l, _, c) => c <= (if (l == "en") 4000L else 2000L) })
  }

  test("langid emits no trigrams for sub-3-char texts (oracle parity guard)") {
    val dir = fixture("documents" -> Seq(
      doc(0, "ab"),                        // <3 chars: zero trigrams
      doc(1, "plenty of regular text here")).toDF(docCols: _*))
    val rows = TextAnalysis.langId(spark, dir)
      .select($"doc_id", $"score")
      .as[(Long, Long)].collect().toMap
    // doc 0 contributes no grams → unmatched → score 0 ("unknown");
    // doc 1 matches its own language profile
    assert(rows === Map(0L -> 0L, 1L -> rows(1L)))
    assert(rows(1L) > 0L)
  }

  test("x74: span scrub removes exactly the shared boilerplate run, everywhere") {
    // docs 0/1 share a 7-token prefix (5 consecutive dup shingles = the
    // scrub threshold); their tails are distinct; doc 2 is untouched
    val pre = "terms of service apply to this document"
    val dir = fixture("documents" -> Seq(
      doc(0, s"$pre alpha beta gamma delta"),
      doc(1, s"$pre epsilon zeta eta theta"),
      doc(2, "completely unrelated content with fresh words")).toDF(docCols: _*))
    val rows = TextAnalysis.spanScrub(spark, dir)
      .select($"doc_id", $"n_tokens", $"n_kept", $"n_scrubbed", $"scrubbed_md5")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq === Seq(
      (0L, 11L, 4L, 7L), (1L, 11L, 4L, 7L), (2L, 6L, 6L, 0L)))
    // the scrubbed text is the tail alone; the untouched doc's md5 is
    // its own normalized text
    def h(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0)._5 === h("alpha beta gamma delta"))
    assert(rows(1)._5 === h("epsilon zeta eta theta"))
    assert(rows(2)._5 === h("completely unrelated content with fresh words"))
    // structural law + x59 agreement: a doc is scrubbed iff x59 flags it
    val flagged = TextAnalysis.corpusDupSpans(spark, dir)
      .select($"doc_id", $"flagged_dup").as[(Long, Boolean)].collect().toMap
    rows.foreach { r => assert((r._4 > 0) === flagged(r._1), s"doc ${r._1}") }
  }
}
