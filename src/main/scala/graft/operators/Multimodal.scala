package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension tier, SURVEY.md §2.3): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extract / frame-sample as
  * partition-batched transforms.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC FAKE (header-derived pseudo-dimensions);
  * everything around it — the binary column, the metadata struct schema,
  * the mapPartitions batching (the Scala analog of `mapInPandas`: one
  * iterator per partition, amortizing per-batch codec setup), and the
  * partitioning — is real, tested plumbing that a real codec drops into.
  */
object Multimodal {

  /** The `documents` table with a synthesized binary payload column —
    * the stand-in for an image/audio blob ingested alongside text.
    */
  def withBinaryPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("content", encode(col("text"), "UTF-8").cast("binary"))

  /** Metadata "decode" expressed in pure column ops (oracle-checkable):
    * byte length, an 8-byte header fingerprint, and fake
    * width/height/format derived deterministically from the md5 of the
    * payload — the shape a real image-header parse would produce.
    */
  def decodeMetadata(spark: SparkSession, dir: String): DataFrame =
    withBinaryPayload(spark, dir)
      .withColumn("h", md5(col("content")))
      .select(
        col("doc_id"),
        length(col("content")).cast("bigint").as("n_bytes"),
        lower(hex(encode(expr("substr(text, 1, 8)"), "UTF-8"))).as("header_hex"),
        expr("instr('0123456789abcdef', substr(h, 1, 1)) * 64").as("fake_width"),
        expr("instr('0123456789abcdef', substr(h, 2, 1)) * 64").as("fake_height"),
        expr("element_at(array('png','jpeg','webp','gif'), " +
          "cast(instr('0123456789abcdef', substr(h, 3, 1)) % 4 as int) + 1)").as("fake_format"))
      .orderBy(col("doc_id"))

  val DecodeMetadataSql: String =
    """WITH b AS (
      |  SELECT doc_id, text, encode(text) AS content, md5(text) AS h
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(octet_length(content) AS BIGINT) AS n_bytes,
      |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
      |  strpos('0123456789abcdef', substr(h, 1, 1)) * 64 AS fake_width,
      |  strpos('0123456789abcdef', substr(h, 2, 1)) * 64 AS fake_height,
      |  (['png','jpeg','webp','gif'])[strpos('0123456789abcdef', substr(h, 3, 1)) % 4 + 1] AS fake_format
      |FROM b
      |ORDER BY doc_id""".stripMargin

  /** Output schema of the partition-batched feature extractor. Scalars
    * only (first/last/sum of sampled frames) so the oracle compare is
    * array-free; the full frame array stays inside the pipeline.
    */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("n_frames", IntegerType),
    StructField("frame_first", LongType),
    StructField("frame_last", LongType),
    StructField("frame_sum", LongType)))

  /** Partition-batched decode/frame-sample — the `mapInPandas` analog:
    * each partition's rows stream through one iterator, so a real codec
    * would be initialized once per partition (not per row) and could
    * batch rows into whatever the library wants. The "decode" here
    * samples every 64th byte position as a fake frame offset:
    * STUB — replace `fakeFrames` with the real codec call.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(FeatureSchema)
    withBinaryPayload(spark, dir)
      .select(col("doc_id"), col("content"))
      .mapPartitions { rows =>
        // per-partition setup would happen here (codec init, buffers)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = fakeFrames(bytes)
          // empty payload → 0 frames with null first/last/sum, matching
          // the oracle's frame_bytes[1] / list_sum([]) NULL semantics
          if (frames.isEmpty) Row(id, bytes.length.toLong, 0, null, null, null)
          else Row(id, bytes.length.toLong, frames.length,
            frames.head, frames.last, frames.sum)
        }
      }(enc)
      .orderBy(col("doc_id"))
  }

  /** STUB decode: deterministic fake "frames" = byte values sampled every
    * 64 positions. A real implementation would hand `bytes` to a codec.
    *
    * Shared assumption with [[FrameSampleSql]]: the oracle samples every
    * 64th CHARACTER (`ascii(substr(text, i, 1))`) while this side samples
    * every 64th BYTE — identical iff the corpus is ASCII (true for all
    * driver testdata, verified: octet_length == length at every sf). A
    * real codec consumes bytes, so the byte-side semantics are the ones
    * that survive the stub's replacement.
    */
  private def fakeFrames(bytes: Array[Byte]): Array[Long] =
    bytes.indices.by(64).map(i => (bytes(i) & 0xffL)).toArray

  val FrameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    list_transform(generate_series(1, length(text), 64),
      |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS frame_bytes
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  CAST(len(frame_bytes) AS INT) AS n_frames,
      |  frame_bytes[1] AS frame_first,
      |  frame_bytes[len(frame_bytes)] AS frame_last,
      |  CAST(list_sum(frame_bytes) AS BIGINT) AS frame_sum
      |FROM f
      |ORDER BY doc_id""".stripMargin

  /** Output schema of the partition-batched resize transform. */
  val ResizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("src_w", LongType),
    StructField("src_h", LongType),
    StructField("dst_w", LongType),
    StructField("dst_h", LongType),
    StructField("n_src_bytes", LongType),
    StructField("stride", LongType),
    StructField("n_dst_bytes", LongType),
    StructField("dst_md5", StringType)))

  /** Resize: fit each payload's (fake-header) dimensions into a 64×64
    * box preserving aspect ratio, and produce the "resized" payload by
    * stride-subsampling the bytes (target ≈ 256 bytes). The dimension
    * plan is pure integer arithmetic; the byte resample runs in the
    * partition-batched iterator exactly like [[frameSample]] — a real
    * image scaler drops in for the stride loop. The oracle reproduces
    * EVERYTHING including the md5 of the resampled bytes (ASCII corpus:
    * byte k = character k+1), so the mapPartitions path itself is
    * hash-verified, not just row-counted.
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(ResizeSchema)
    withBinaryPayload(spark, dir)
      .withColumn("h", md5(col("content")))
      .select(col("doc_id"), col("content"),
        expr("instr('0123456789abcdef', substr(h, 1, 1)) * 64").cast("bigint").as("src_w"),
        expr("instr('0123456789abcdef', substr(h, 2, 1)) * 64").cast("bigint").as("src_h"))
      .mapPartitions { rows =>
        // per-partition setup point (a real scaler/codec initializes here)
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val sw = r.getLong(2)
          val sh = r.getLong(3)
          val maxEdge = math.max(sw, sh)
          val dw = math.max(1L, sw * 64 / maxEdge)
          val dh = math.max(1L, sh * 64 / maxEdge)
          val stride = math.max(1L, bytes.length.toLong / 256L)
          val sampled = bytes.indices.by(stride.toInt).map(bytes(_)).toArray
          digest.reset()
          val md5hex = digest.digest(sampled).map("%02x".format(_)).mkString
          Row(id, sw, sh, dw, dh, bytes.length.toLong, stride,
            sampled.length.toLong, md5hex)
        }
      }(enc)
      .orderBy(col("doc_id"))
  }

  val ResizeSql: String =
    """WITH b AS (
      |  SELECT doc_id, text, md5(text) AS h,
      |    CAST(length(text) AS BIGINT) AS n
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, text, n,
      |    CAST(strpos('0123456789abcdef', substr(h, 1, 1)) * 64 AS BIGINT) AS src_w,
      |    CAST(strpos('0123456789abcdef', substr(h, 2, 1)) * 64 AS BIGINT) AS src_h,
      |    greatest(1, n // 256) AS stride
      |  FROM b),
      |sampled AS (
      |  SELECT doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_dst_bytes,
      |    md5(string_agg(substr(text, CAST(i AS INT), 1), '' ORDER BY i)) AS dst_md5
      |  FROM dims, LATERAL (SELECT unnest(generate_series(1, n, stride)) AS i)
      |  GROUP BY doc_id)
      |SELECT d.doc_id AS doc_id, src_w, src_h,
      |  greatest(1, src_w * 64 // greatest(src_w, src_h)) AS dst_w,
      |  greatest(1, src_h * 64 // greatest(src_w, src_h)) AS dst_h,
      |  n AS n_src_bytes, stride,
      |  COALESCE(n_dst_bytes, 0) AS n_dst_bytes,
      |  COALESCE(dst_md5, md5('')) AS dst_md5
      |FROM dims d LEFT JOIN sampled s ON s.doc_id = d.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Output schema of the byte-class feature extractor. */
  val ByteHistogramSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("n_lower", LongType),
    StructField("n_digit", LongType),
    StructField("n_space", LongType),
    StructField("n_other", LongType),
    StructField("lower_frac", DoubleType)))

  /** Feature extraction over the binary payload: byte-class histogram
    * (lowercase / digit / space / other) + the lowercase fraction —
    * REAL per-byte computation (no stub) in the same partition-batched
    * iterator shape, which is where an embedding model or DSP feature
    * bank would run. One pass over each payload, no shuffle before the
    * final sort; the oracle mirrors the byte classes with character
    * classes (ASCII corpus).
    */
  def byteHistogram(spark: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(ByteHistogramSchema)
    withBinaryPayload(spark, dir)
      .select(col("doc_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var lower = 0L; var digit = 0L; var space = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i)
            if (b >= 'a' && b <= 'z') lower += 1
            else if (b >= '0' && b <= '9') digit += 1
            else if (b == ' ') space += 1
            i += 1
          }
          val n = bytes.length.toLong
          val other = n - lower - digit - space
          val frac: Any = if (n == 0) null else lower.toDouble / n.toDouble
          Row(id, n, lower, digit, space, other, frac)
        }
      }(enc)
      .orderBy(col("doc_id"))
  }

  val ByteHistogramSql: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space
      |  FROM documents)
      |SELECT doc_id, n_bytes, n_lower, n_digit, n_space,
      |  n_bytes - n_lower - n_digit - n_space AS n_other,
      |  CASE WHEN n_bytes = 0 THEN NULL
      |       ELSE CAST(n_lower AS DOUBLE) / CAST(n_bytes AS DOUBLE) END AS lower_frac
      |FROM f
      |ORDER BY doc_id""".stripMargin

  val ByteEntropySchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("n_distinct", LongType),
    StructField("entropy_bits", DoubleType),
    StructField("padded", BooleanType)))

  /** x81: byte-entropy payload screen — the codec-free corrupt/padded
    * detector for binary columns: per-payload Shannon entropy over the
    * 256-symbol byte alphabet, `H = −Σ_b p_b·log2 p_b`. Near-zero
    * entropy means a constant-padded, truncated-to-filler, or
    * all-one-tone payload (the classic symptom of a broken
    * decode/transcode upstream); natural media sits high. The `padded`
    * flag (H < 1 bit) is the drop gate a multimodal curation pass runs
    * BEFORE spending decode cycles.
    *
    * Shape: the x22 partition-batched iterator — a 256-cell count
    * array per payload inside `mapPartitions`, payload bytes never
    * shuffle. Determinism: each probability is one correctly-rounded
    * divide, log2 is [[graft.functions.DetMath.log2]] (the same pinned
    * scalar the oracle mirrors in SQL), and per-symbol terms quantize
    * to exact nano-bit BIGINTs before summing — ascending byte order
    * in the JVM, order-free integer SUM in the oracle: identical.
    * Parity note: the oracle iterates CHARACTERS of the text stand-in
    * (`string_split(text, '')`) vs the JVM's payload BYTES — equal
    * because the fixture payload is the documented ASCII stand-in
    * (x22's rule); real multibyte payloads would only shift the oracle,
    * not the engine.
    */
  def byteEntropy(spark: SparkSession, dir: String): DataFrame =
    byteEntropyGate(withBinaryPayload(spark, dir))
      .orderBy(col("doc_id"))

  /** The x81 scorer WITHOUT the presentation sort — a stateless
    * per-partition map over any `(doc_id, content | text)` frame, so
    * the SAME plan runs on a STREAMING frame in append mode (no
    * aggregation, no watermark, no state): the pre-decode admission
    * gate evaluated as payloads arrive. `StreamingSpec` pins batch
    * x81 ≡ this gate ≡ its streaming run bit-for-bit (the per-symbol
    * nano terms sum in ascending byte order inside one row — no
    * cross-row order to perturb).
    */
  def byteEntropyGate(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(ByteEntropySchema)
    val withContent =
      if (docs.columns.contains("content")) docs
      else docs.withColumn("content", encode(col("text"), "UTF-8").cast("binary"))
    withContent
      .select(col("doc_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val counts = new Array[Long](256)
          var i = 0
          while (i < bytes.length) { counts(bytes(i) & 0xFF) += 1; i += 1 }
          val n = bytes.length.toLong
          var distinct = 0L
          var nanoSum = 0L
          var b = 0
          while (b < 256) {
            val c = counts(b)
            if (c > 0) {
              distinct += 1
              val p = c.toDouble / n.toDouble
              val l = graft.functions.DetMath.log2(p)
              nanoSum += Math.floor(-(p * l) * 1e9 + 0.5).toLong
            }
            b += 1
          }
          val h = nanoSum.toDouble / 1e9
          Row(id, n, distinct, h, h < 1.0)
        }
      }(enc)
  }

  /** Oracle twin of [[byteEntropy]] — per-character counts and the
    * identical DetMath step sequence.
    */
  lazy val ByteEntropySql: String = {
    val lg = graft.functions.DetMath.log2Sql("p")
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c
       |  FROM documents),
       |cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
       |nn AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n FROM cc GROUP BY 1),
       |t AS (
       |  SELECT cc.doc_id,
       |    CAST(cc.cnt AS DOUBLE) / CAST(nn.n AS DOUBLE) AS p
       |  FROM cc JOIN nn ON nn.doc_id = cc.doc_id),
       |b AS (
       |  SELECT doc_id,
       |    CAST(FLOOR(-(p * ($lg)) * 1e9 + 0.5) AS BIGINT) AS nano
       |  FROM t),
       |a AS (
       |  SELECT b.doc_id, COUNT(*) AS n_distinct,
       |    CAST(SUM(b.nano) AS BIGINT) AS sn
       |  FROM b GROUP BY 1)
       |SELECT a.doc_id, nn.n AS n_bytes, a.n_distinct,
       |  CAST(a.sn AS DOUBLE) / 1e9 AS entropy_bits,
       |  CAST(a.sn AS DOUBLE) / 1e9 < 1.0 AS padded
       |FROM a JOIN nn ON nn.doc_id = a.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  /** x50: block-hash near-duplicate detection over the binary payload —
    * the codec-free image/audio dedup pass (chunk the blob into fixed
    * 64-byte blocks, md5 each, pairs of payloads sharing ≥1 distinct
    * block hash are near-dup candidates ranked by containment =
    * shared / min(blocks)). This is how binary dedup actually ships
    * when decoding everything is too expensive: exact on aligned
    * copies, robust to appended/truncated tails, content-type-blind.
    *
    * Scale shape: the self-join shuffles 32-byte digests keyed by block
    * hash (x1's digest-only rule) — candidates ∝ Σ bucket² like the
    * LSH tier, never all-pairs; the payload itself never crosses the
    * wire. Parity: block boundaries are BYTE offsets; the fixture
    * payload is the documented UTF-8 text stand-in (ASCII), so the
    * oracle's VARCHAR substr sees the identical bytes and md5 agrees.
    */
  def binaryBlockDup(spark: SparkSession, dir: String): DataFrame = {
    val blocks = withBinaryPayload(spark, dir)
      .select(col("doc_id"), col("content"),
        explode(sequence(lit(0L),
          floor((length(col("content")) - 1) / 64).cast("long"))).as("b"))
      .select(col("doc_id"),
        md5(expr("substring(content, cast(1 + 64 * b as int), 64)")).as("h"))
      .distinct()
    val nb = blocks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_blocks"))
    val pairs = blocks.select(col("doc_id").as("d1"), col("h"))
      .join(blocks.select(col("doc_id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared_blocks"))
    pairs
      .join(nb.select(col("doc_id").as("d1"), col("n_blocks").as("n1")), Seq("d1"))
      .join(nb.select(col("doc_id").as("d2"), col("n_blocks").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("shared_blocks"), col("n1"), col("n2"),
        (col("shared_blocks").cast("double") /
          least(col("n1"), col("n2")).cast("double")).as("containment"))
      .orderBy(col("d1"), col("d2"))
  }

  val BinaryBlockDupSql: String =
    """WITH blocks AS (
      |  SELECT DISTINCT doc_id,
      |    md5(substr(text, CAST(1 + 64 * b AS INT), 64)) AS h
      |  FROM (SELECT doc_id, text FROM documents),
      |       LATERAL (SELECT unnest(generate_series(0,
      |         CAST(floor((len(text) - 1) / 64) AS BIGINT))) AS b)),
      |nb AS (SELECT doc_id, COUNT(*) AS n_blocks FROM blocks GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_blocks
      |  FROM blocks a JOIN blocks b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, shared_blocks, x.n_blocks AS n1, y.n_blocks AS n2,
      |  CAST(shared_blocks AS DOUBLE)
      |    / CAST(least(x.n_blocks, y.n_blocks) AS DOUBLE) AS containment
      |FROM pairs
      |JOIN nb x ON x.doc_id = d1
      |JOIN nb y ON y.doc_id = d2
      |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------------
  // x92 — perceptual-hash (dHash) near-dup for the binary tier
  // ------------------------------------------------------------------

  /** dHash geometry: the payload is reduced to a 4×9 grid of 36
    * "pixels" (equal byte-range sums — the stub's stand-in for resized
    * grayscale; a real codec's luma grid drops in here, exactly like
    * [[frameSample]]'s fake frames), and each of the 32 bits compares
    * horizontally adjacent pixels — difference hash (dHash), the
    * classic perceptual fingerprint: robust to re-encoding and uniform
    * brightness shifts, 4 bytes per image at any scale. 32 bits keeps
    * the tier's sign-safe BIGINT packing (x4's convention).
    */
  val DHashRows = 4
  val DHashCols = 9
  val DHashPixels: Int = DHashRows * DHashCols
  val DHashBits: Int = DHashRows * (DHashCols - 1)
  val DHashBandBits = 8
  val DHashMaxHamming = 6

  /** Per-payload dHash: pixel sums as in-row HOFs over exact byte
    * ranges (`lo_p = ⌊p·n/36⌋+1 … hi_p = ⌊(p+1)·n/36⌋` — non-empty for
    * every p once n ≥ 36; shorter payloads are dropped, they have no
    * meaningful 4×9 reduction), then 32 adjacent-pixel comparisons
    * packed into one BIGINT. Byte values read as `ascii` over
    * characters — the corpus-is-ASCII assumption shared with (and
    * documented at) [[frameSample]]'s oracle.
    */
  def dhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    // One-pass native pixel reduction (graft.plans.PixelSumsExpr) — the
    // codegen'd promotion of the 36-fold aggregate(sequence(...),
    // ascii(substr(text, i, 1))) composed form, which paid a sequence
    // array + interpreted lambda + one-char UTF8String per CHARACTER
    // (~17 s for the sf0.1 corpus; this scan gates the x92/x96/x99
    // shared pair relation). Bit-identical by PixelSumsSpec.
    val sig = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      // BIGINT n before the px ranges' p·n products: an Int-typed
      // length would overflow at docs past ~61M chars (35·n > 2³¹) —
      // ANSI Spark would throw where the BIGINT-cast oracle computes
      // fine (PixelSumsExpr carries the same long arithmetic)
      .select(col("doc_id"), col("text"), length(col("text")).cast("bigint").as("n"))
      .filter(col("n") >= DHashPixels)
      .withColumn("px",
        graft.plans.PixelSumsExpr.pixelSums(spark, "text", DHashPixels))
    val hash = (0 until DHashBits).map { b =>
      val r = b / (DHashCols - 1)
      val c = b % (DHashCols - 1)
      val pi = r * DHashCols + c
      when(element_at(col("px"), pi + 1) > element_at(col("px"), pi + 2),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    sig.select(col("doc_id"), hash.as("dhash"))
  }

  /** x92: perceptual near-dup pairs — the multimodal twin of x4's
    * simhash dedup: candidate pairs BLOCK on any shared 8-bit band of
    * the dHash (4 bands; a pair within Hamming ≤ 6 of 32 must agree on
    * ≥ 1 whole band only if its flipped bits cluster — like all banded
    * LSH, recall is the S-curve, audited the x82 way), then exact
    * `bit_count(xor)` Hamming on the 4-byte signatures, emitting only
    * the pairs at ≤ [[DHashMaxHamming]]. The Hamming filter runs
    * BEFORE the multi-band dedup, so the distinct pass sees only the
    * near-dup slice, never the full candidate fan-out (template-heavy
    * corpora skew band buckets; measured 842k candidates → 95k
    * survivors at sf0.1 — an 8.9× cut ahead of the shuffle). Scale:
    * candidates ∝ Σ band-bucket²; only (doc_id, 8-byte hash) rows
    * shuffle — payloads never do.
    */
  /** x92's pair relation feeds x96's centrality walk too — cached per
    * (session, sf) like the dedup tier's pair caches.
    */
  private val phashPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Release the session's cached perceptual pair relation. */
  def unpersistPhashPairs(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    phashPairsCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(phashPairsCache.remove(k)).foreach(_.unpersist())
    }
  }

  def phashNeardup(spark: SparkSession, dir: String): DataFrame =
    phashPairsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => phashPairsCache.remove(k))
      phashNeardupUncached(spark, dir).persist()
    })

  private def phashNeardupUncached(spark: SparkSession, dir: String): DataFrame = {
    val sig = dhashSignatures(spark, dir)
    val bands = sig.select(col("doc_id"), col("dhash"),
      explode(array((0 until DHashBits / DHashBandBits).map { k =>
        struct(lit(k).as("band_k"),
          shiftright(col("dhash"), k * DHashBandBits)
            .bitwiseAND(lit(255L)).as("band_v"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("dhash"),
        col("b.band_k").as("band_k"), col("b.band_v").as("band_v"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_k") === col("b.band_k") &&
          col("a.band_v") === col("b.band_v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.dhash ^ b.dhash)").as("hamming"))
      .filter(col("hamming") <= DHashMaxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  lazy val PhashNeardupSql: String = {
    val px = (0 until DHashPixels).map { p =>
      s"list_sum(list_transform(generate_series(CAST(($p * n) // $DHashPixels AS INT) + 1, " +
        s"CAST((${p + 1} * n) // $DHashPixels AS INT)), i -> ascii(substr(text, i, 1))))"
    }.mkString("[", ", ", "]")
    val hash = (0 until DHashBits).map { b =>
      val r = b / (DHashCols - 1)
      val c = b % (DHashCols - 1)
      val pi = r * DHashCols + c
      s"CASE WHEN px[${pi + 1}] > px[${pi + 2}] THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.reduceLeft((a, b) => s"$a + $b")
    val bandK = DHashBits / DHashBandBits - 1
    s"""WITH d AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= $DHashPixels),
       |p AS (SELECT doc_id, $px AS px FROM d),
       |sig AS (SELECT doc_id, CAST($hash AS BIGINT) AS dhash FROM p),
       |bands AS (
       |  SELECT doc_id, dhash, k AS band_k, (dhash >> (k * $DHashBandBits)) & 255 AS band_v
       |  FROM sig, LATERAL (SELECT unnest(generate_series(0, $bandK)) AS k))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.dhash, b.dhash)) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band_k = b.band_k AND a.band_v = b.band_v
       | AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= $DHashMaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
