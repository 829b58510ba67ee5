package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators.
  *
  * Everything here is built from codegen'd built-ins (split/transform/
  * md5/…) — no Scala UDFs — so the hot path stays inside whole-stage
  * codegen, and every hash is md5 (lowercase hex in both Spark and
  * DuckDB) so the oracle can reproduce signatures byte-for-byte.
  */
object TextOps {

  /** Single-space tokens of a normalized (lowercased, trimmed) text —
    * mirrors DuckDB `string_split(.., ' ')` exactly for oracle parity.
    */
  def tokens(text: Column): Column =
    split(trim(lower(text)), " ")

  /** Word n-gram shingles: `n` consecutive tokens joined by a space.
    * Documents shorter than `n` tokens produce no shingles.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    filter(
      transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
        i => when(i + n <= size(t), concat_ws(" ", slice(t, i + 1, lit(n))))),
      s => s.isNotNull)
  }

  /** SQL twin of [[shingles]] producing one row per (row of `rel`,
    * shingle). `rel` must expose `doc_id` and `text`.
    */
  def shinglesSql(rel: String, n: Int): String =
    s"""SELECT doc_id, toks[i] ${(2 to n).map(j => s"|| ' ' || toks[i+${j - 1}]").mkString(" ")} AS shingle
       |FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM $rel),
       |     LATERAL (SELECT unnest(generate_series(1, len(toks) - ${n - 1})) AS i)""".stripMargin

  /** The `i`-th minhash "permutation", chunked (one-permutation-hashing
    * style): two salted md5s per shingle, each split into four 8-hex-char
    * (32-bit) chunks → 8 permutation values from 2 hash calls instead
    * of 8. Hex-string min over fixed-width lowercase chunks is binary
    * collation in both engines, so signatures stay oracle-exact.
    * `hashes` must be the pre-projected `Seq(md5('0|'||s), md5('1|'||s))`
    * columns (projected ONCE per row — don't inline the md5 into each
    * aggregate or it evaluates per permutation).
    */
  def minhashPermChunk(hashes: Seq[Column], i: Int): Column =
    substring(hashes(i / 4), (i % 4) * 8 + 1, 8)

  /** The two salted per-shingle hashes feeding [[minhashPermChunk]]. */
  def minhashHashes(shingle: Column): Seq[Column] =
    Seq(md5(concat(lit("0|"), shingle)), md5(concat(lit("1|"), shingle)))
}
