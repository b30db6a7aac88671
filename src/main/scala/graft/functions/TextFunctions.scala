package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text helpers for the LLM-pipeline operators (§2.C), expressed entirely
  * with builtin higher-order functions so every step stays inside
  * whole-stage codegen — no UDFs, no RDDs.
  *
  * The reference stack stores free-text observation blobs alongside the
  * CRC facts (i2b2 `observation_blob`); these helpers give the engine the
  * text-side analytics a training-data pipeline needs on such corpora.
  */
object TextFunctions {

  /** Whitespace tokens. The generator emits single-space-joined words, so
    * a plain split matches DuckDB's string_split exactly.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles of a token-array column (expr-level so
    * it can be spliced into larger HOF pipelines). 0-based array indexing.
    */
  def shingles3(tokensCol: String): Column = expr(
    s"""CASE WHEN size($tokensCol) >= 3 THEN
       |  array_distinct(transform(sequence(0, size($tokensCol) - 3),
       |    i -> concat($tokensCol[i], ' ', $tokensCol[i+1], ' ', $tokensCol[i+2])))
       |ELSE array() END""".stripMargin)

  /** MinHash signature: sig[i] = min over shingles of xxhash64(shingle, i).
    * One pass over the shingle array per hash; k hashes total.
    */
  def minhashSig(shinglesCol: String, k: Int): Column = expr(
    s"transform(sequence(0, ${k - 1}), i -> array_min(transform($shinglesCol, s -> xxhash64(s, i))))")

  /** LSH band buckets over a minhash signature: bands of `rows` hashes,
    * bucket id = xxhash64(band, sig-slice...). Returns array of buckets,
    * one per band.
    */
  def lshBands(sigCol: String, bands: Int, rows: Int): Column = {
    val slices = (0 until rows).map(r => s"$sigCol[$rows * b + $r]").mkString(", ")
    expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, $slices))")
  }

  /** 64-bit SimHash over a token array: bit j is the sign of the sum over
    * tokens of ±1 by bit j of xxhash64(token). Frequency-weighted because
    * repeated tokens contribute once per occurrence.
    */
  def simhash64(tokensCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, j) ->
       |  acc + IF(aggregate($tokensCol, 0, (a2, t) ->
       |      a2 + IF((shiftright(xxhash64(t), j) & 1) = 1, 1, -1)) > 0,
       |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin)

  /** Count of tokens contained in a fixed stopword list. */
  def stopwordHits(tokensCol: String, stopwords: Seq[String]): Column = {
    val list = stopwords.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($tokensCol, t -> t IN ($list)))")
  }

  /** Small public stopword lists used by the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "uno", "una", "en"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))
}
