package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using builtin
  * higher-order functions (zip_with + aggregate) — codegen-friendly, no
  * UDFs.
  *
  * Determinism: dot products accumulate in DECIMAL(38,12), not double.
  * Each float×float product is exact in double; casting it to decimal
  * rounds it to a canonical 12-decimal value (ties are impossible — a
  * dyadic rational can't land exactly on a 10^-12 midpoint), and decimal
  * addition is associative, so the sum is identical on every engine and
  * every partitioning — the DuckDB oracle and a 1000-executor cluster
  * compute bit-equal cosines.
  */
object VectorFunctions {

  /** Exact-decimal dot product of two array<float>/array<double> columns,
    * returned as double.
    */
  def dotDet(a: String, b: String): Column = expr(
    s"""CAST(aggregate(
       |  zip_with($a, $b, (x, y) ->
       |    CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,12))),
       |  CAST(0 AS DECIMAL(38,12)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(38,12))) AS DOUBLE)""".stripMargin)

  /** Deterministic cosine similarity: dotDet / sqrt(normA * normB). All
    * three operands are engine-identical doubles, so the quotient is too.
    */
  def cosineDet(a: String, b: String): Column =
    dotDet(a, b) / sqrt(dotDet(a, a) * dotDet(b, b))

  /** Matching DuckDB SQL for dotDet/cosineDet, for oracle queries that
    * unnest embeddings to (id, i, x) rows: exact decimal sum of products.
    */
  def sqlDotDet(prod: String): String =
    s"CAST(SUM(CAST(($prod) AS DECIMAL(38,12))) AS DOUBLE)"

  /** Sign-LSH bucket codes for a vector column: `tables` independent
    * hash tables, each an `nbits`-bit code of random-hyperplane signs.
    * Hyperplanes are seeded-deterministic (java.util.Random is a spec'd
    * LCG) and baked in as literals — zero per-row hash overhead; the
    * bucketing is a pure zip_with/aggregate pipeline.
    */
  def lshBuckets(vec: String, dim: Int, tables: Int, nbits: Int, seed: Long): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(tables, nbits, dim)(rnd.nextGaussian())
    val codes = (0 until tables).map { t =>
      (0 until nbits).map { b =>
        val arr = planes(t)(b)
          .map(v => s"CAST('${java.lang.Double.toString(v)}' AS DOUBLE)")
          .mkString(", ")
        s"IF(aggregate(zip_with($vec, array($arr), (x, h) -> CAST(x AS DOUBLE) * h), " +
          s"CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0, ${1L << b}L, 0L)"
      }.mkString(" + ")
    }.map(code => s"($code)").mkString(", ")
    expr(s"array($codes)")
  }
}
