package graft.operators

import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped cache of the exploded word-3-gram shingle relation
  * `(doc_id, lang, source, shingle)` — the single most repeated subtree
  * of the text tier. Minhash signatures (x2/x3), fingerprinting (x12),
  * the approximate-distinct profile (x16), and the Jaccard verifier
  * (x5) all start from this explode; without sharing, each pays the
  * full corpus scan + tokenize + explode again.
  *
  * At 100 TB the analog is a materialized silver table (doc → shingle)
  * written once per corpus snapshot and read by every downstream dedup/
  * profile job — exactly how large-scale pipelines amortize shingling.
  * Here it is an in-memory columnar cache per (session, sf); entries
  * are dropped at application end via [[SessionCaches]].
  */
object Corpus {

  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), DataFrame]()

  /** Release the session's cached shingle relations (see
    * [[Metrics.unpersistEvents]] for when to call).
    */
  def unpersistShingles(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    shingleCache.keySet.asScala.filter(_._1 eq spark).foreach { k =>
      Option(shingleCache.remove(k)).foreach(_.unpersist())
    }
  }

  /** Silver-table swap (SURVEY §8): seed the n-gram cache entry with a
    * materialized doc→shingle relation; every consumer keeps calling
    * [[shingleRows]] unchanged.
    */
  private[graft] def seedShingles(spark: SparkSession, dir: String, n: Int,
      silver: DataFrame): Unit = {
    val expect = Seq("doc_id", "lang", "source", "pos", "shingle")
    require(silver.columns.toSeq == expect,
      s"silver shingle schema ${silver.columns.toSeq} != $expect")
    shingleCache.put((spark, dir, n), silver)
    SessionCaches.onApplicationEnd(spark)(() => shingleCache.remove((spark, dir, n)))
  }

  /** The default word-3-gram relation (minhash, fingerprint, Jaccard,
    * contamination, HLL profile).
    */
  def shingleRows(spark: SparkSession, dir: String): DataFrame =
    shingleRows(spark, dir, 3)

  /** One row per (document, word-n-gram occurrence) with its 0-based
    * in-document position; duplicate shingles are kept — consumers that
    * need the distinct set apply their own `.distinct()` (column
    * pruning on the cached relation makes unused lang/source/pos
    * columns free for consumers that don't read them). Keyed by
    * (session, sf, n) so DIFFERENT gram widths each get one shared
    * explode: the 2-gram entry feeds both heavy-hitter queries (exact
    * x19 + count-min x23), the 3-gram entry the dedup/profile tier and
    * the position-aware contamination spans (x49).
    */
  def shingleRows(spark: SparkSession, dir: String, n: Int): DataFrame =
    shingleCache.computeIfAbsent((spark, dir, n), k => {
      SessionCaches.onApplicationEnd(spark)(() => shingleCache.remove(k))
      Tables.documents(spark, dir)
        .select(Seq(col("doc_id"), col("lang"), col("source"),
          posexplode(TextOps.shingles(col("text"), n)).as(Seq("pos", "shingle"))): _*)
        .persist()
    })
}
