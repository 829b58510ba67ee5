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
}
