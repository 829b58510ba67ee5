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

  /** The `i`-th minhash "permutation": min over shingles of
    * `md5(i || '|' || shingle)` — hex-string min, identical in both
    * engines (lowercase hex, binary collation).
    */
  def minhashPerm(shingle: Column, i: Int): Column =
    md5(concat(lit(s"$i|"), shingle))
}
