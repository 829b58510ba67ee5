package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.plans.PixelSumsExpr]] — the native one-pass dHash pixel
  * reduction — to the composed form it replaced:
  * `array(aggregate(sequence(⌊p·n/36⌋+1, ⌊(p+1)·n/36⌋), 0L,
  * (acc, i) -> acc + ascii(substr(text, i, 1))) …)`.
  * The x92/x96/x99 hash gates all flow through this expression, so the
  * equivalence must hold char-for-char, including multibyte codepoints
  * (substr indexes codepoints; ascii returns codePointAt(0)).
  */
class PixelSumsSpec extends SparkTestBase {

  private val Pixels = graft.operators.Multimodal.DHashPixels

  private def composedPx(pixels: Int): String =
    (0 until pixels).map { p =>
      s"aggregate(sequence(cast(($p * n) div $pixels as int) + 1, " +
        s"cast((${p + 1} * n) div $pixels as int)), 0L, " +
        "(acc, i) -> acc + ascii(substr(text, i, 1)))"
    }.mkString("array(", ", ", ")")

  private def check(texts: Seq[String], pixels: Int = Pixels): Unit = {
    import spark.implicits._
    graft.plans.PixelSumsExpr.register(spark)
    val df = texts.toDF("text")
      .select(col("text"), length(col("text")).cast("bigint").as("n"))
      .filter(col("n") >= pixels)
      .select(
        expr(composedPx(pixels)).as("composed"),
        expr(s"pixel_sums(text, $pixels)").as("native"))
    val rows = df.collect()
    assert(rows.length ==
      texts.count(t => t.codePointCount(0, t.length) >= pixels))
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"composed=${r.getSeq[Long](0)} native=${r.getSeq[Long](1)}")
    }
  }

  test("native pixel sums == composed HOF on ASCII corpus shapes") {
    val rnd = new scala.util.Random(42)
    val texts = (1 to 50).map { i =>
      val n = 36 + rnd.nextInt(400)
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    check(texts)
  }

  test("boundary lengths: exactly 36, 37, 71, 72 chars") {
    check(Seq(36, 37, 71, 72).map(n => ("ab" * n).take(n)))
  }

  test("multibyte codepoints contribute their codepoint value") {
    // 2-byte (é U+00E9), 3-byte (€ U+20AC), 4-byte (𝄞 U+1D11E) mixed in
    val t = ("héllo€wörld𝄞" * 8) + ("x" * 20)
    check(Seq(t))
  }

  test("rows shorter than the pixel count filter out (null reduction)") {
    import spark.implicits._
    graft.plans.PixelSumsExpr.register(spark)
    val r = Seq("short").toDF("text")
      .select(expr(s"pixel_sums(text, $Pixels)").as("px")).collect()
    assert(r.head.isNullAt(0))
  }

  test("dhashSignatures over a documents fixture is unchanged in shape") {
    import spark.implicits._
    val docs = (1L to 20L).map { i =>
      (i, ("doc %04d ".format(i) + ("lorem ipsum " * (i.toInt + 2))).trim)
    }.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val dir = fixture("documents" -> docs)
    val sigs = graft.operators.Multimodal.dhashSignatures(spark, dir)
      .orderBy("doc_id").collect()
    assert(sigs.length == 20)
    // signatures are 32-bit packed: all within [0, 2^32)
    sigs.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0L && h < (1L << 32), s"dhash out of 32-bit range: $h")
    }
  }
}
