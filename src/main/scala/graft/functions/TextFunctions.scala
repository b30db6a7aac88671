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

  /** ALL word 3-gram occurrences (t13's repetition signal needs the
    * multiplicity the dedup family's distinct shingler drops).
    */
  def shingles3All(tokensCol: String): Column = expr(
    s"""CASE WHEN size($tokensCol) >= 3 THEN
       |  transform(sequence(0, size($tokensCol) - 3),
       |    i -> concat($tokensCol[i], ' ', $tokensCol[i+1], ' ', $tokensCol[i+2]))
       |ELSE array() END""".stripMargin)

  /** ALL word bigram occurrences (the t17 language-model signal needs
    * multiplicity, like shingles3All).
    */
  def bigramsAll(tokensCol: String): Column = expr(
    s"""CASE WHEN size($tokensCol) >= 2 THEN
       |  transform(sequence(0, size($tokensCol) - 2),
       |    i -> concat($tokensCol[i], ' ', $tokensCol[i+1]))
       |ELSE array() END""".stripMargin)

  /** MinHash as codegen'd aggregates over an exploded (doc, base-hash)
    * frame: the variable-length shingle is xxhash64'd ONCE; each of the k
    * family members is a seeded re-hash of that fixed 8-byte value, and
    * each signature slot is a plain `min` aggregate — fully code-
    * generated with map-side partial aggregation, versus the higher-order
    * `transform`/`array_min` formulation whose lambdas evaluate
    * interpreted per element (measured ~10x slower at sf0.1).
    */
  def minhashAggs(baseHash: Column, k: Int): Seq[Column] =
    (0 until k).map(j => min(xxhash64(baseHash, lit(j))).as(s"mh$j"))

  /** Reassemble the signature array after a minhashAggs groupBy. */
  def minhashSigCols(k: Int): Column =
    array((0 until k).map(j => col(s"mh$j")): _*)

  /** LSH band buckets over a minhash signature: bands of `rows` hashes,
    * bucket id = xxhash64(band, sig-slice...). Returns array of buckets,
    * one per band.
    */
  def lshBands(sigCol: String, bands: Int, rows: Int): Column = {
    val slices = (0 until rows).map(r => s"$sigCol[$rows * b + $r]").mkString(", ")
    expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, $slices))")
  }

  /** SimHash per-bit counters as codegen'd aggregates over an exploded
    * (doc, token-hash) frame: bit j's counter sums ±1 by bit j of the
    * token hash. Frequency-weighted because repeated tokens contribute
    * once per occurrence. Same explode-instead-of-lambda rationale as
    * minhashAggs.
    */
  def simhashAggs(tokenHash: Column): Seq[Column] =
    (0 until 64).map { j =>
      sum(when(shiftright(tokenHash, j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"sb$j")
    }

  /** Fold the 64 sign counters into the 64-bit SimHash value. */
  def simhashFromCounters: Column = expr(
    (0 until 64).map(j => s"IF(sb$j > 0, shiftleft(CAST(1 AS BIGINT), $j), 0L)")
      .mkString(" + "))

  /** Loop-codegen'd space-padded ascii-window sum ([[AsciiWindowSum]]):
    * value-identical to the unrolled
    * `Σ ascii(substring(rpad(substring(str, pos, len), len, ' '), i, 1))`
    * chain with ZERO per-row allocations (the chain allocates ~len + 2
    * UTF8Strings per row — the m04 GC-pressure mode).
    */
  def asciiWindowSum(str: Column, pos: Column, len: Int): Column =
    org.apache.spark.sql.GraftSql.column(AsciiWindowSum(
      org.apache.spark.sql.GraftSql.expression(str),
      org.apache.spark.sql.GraftSql.expression(pos),
      org.apache.spark.sql.GraftSql.expression(lit(len))))

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
