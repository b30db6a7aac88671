package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C p01 — the training-data pipeline END TO END.
  *
  * Individual operators are necessary but not sufficient: what a corpus
  * team actually runs is their composition — quality-filter, dedup at
  * two granularities, split, report. p01 is that composition as ONE
  * declarative query over the per-stage operators, proving they compose
  * (shared doc_id keys, compatible schemas) and giving the gate an
  * oracle for the pipeline RESULT, not just its parts.
  *
  * Stage contract (decisions computed on the FULL corpus, intersected
  * at the end — the industrial shape, where each stage emits a keep
  * list and the final materialization applies them all):
  *   1. quality: keep docs with t02 quality >= 0.5;
  *   2. exact dedup: keep d01's min-id representative per content hash;
  *   3. near-dup dedup: drop non-representative members of d06's
  *      connected components;
  *   4. split: t05's content-addressed train/val/test rule;
  *   5. report: (split, lang) doc and token totals.
  *
  * Scale shape: stages 1-3 are the already-audited operator plans; the
  * composition adds two broadcast-size semi/anti joins (keep lists are
  * tiny relative to the corpus) and one final aggregate — no new
  * shuffle on the fact side beyond the operators' own.
  */
object Pipeline {

  def p01(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"))
    // the UNSORTED stage cores: composing the gate-facing operators
    // would bake their verify-path orderBys into the plan as global
    // range-shuffle sorts of intermediates the joins then discard
    val quality = TextAnalysis.t02Core(s, d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val exactKeep = Dedup.d01Core(s, d).select(col("keep_id").as("doc_id"))
    val nearDrop = Dedup.d06Core(s, d)
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    docs
      .join(quality, "doc_id")
      .filter(col("quality") >= 0.5)
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .withColumn("split", TextAnalysis.splitOf(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .transform(Gate.ordered("split", "lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_pipeline_e2e" -> (p01 _)
  )

  /** The oracle composes the SAME stage fragments the per-operator
    * oracles use (T02_SCORED_SQL, D06_CTES/D02_SQL, SPLIT_CASE_SQL) —
    * one definition per stage on each side.
    */
  val oracle: Map[String, String] = Map(
    "p01_pipeline_e2e" ->
      s"""WITH RECURSIVE ${Dedup.D06_CTES},
         |q AS (SELECT doc_id, n_tokens, quality
         |  FROM ${TextAnalysis.T02_SCORED_SQL} sc),
         |d01keep AS (SELECT keep_id AS doc_id
         |  FROM ${Dedup.D01_GROUPS_SQL} g),
         |kept AS (
         |  SELECT d.doc_id, d.lang, q.n_tokens,
         |   ${TextAnalysis.SPLIT_CASE_SQL} AS split
         |  FROM documents d JOIN q USING (doc_id)
         |  WHERE q.quality >= 0.5
         |   AND d.doc_id IN (SELECT doc_id FROM d01keep)
         |   AND d.doc_id NOT IN (
         |    SELECT doc_id FROM d06 WHERE doc_id <> keep_id))
         |SELECT split, lang, COUNT(*) AS n_docs,
         | CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
