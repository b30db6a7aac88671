package graft.operators

import graft.Tables._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C s01–s02 — similarity search over the `embeddings` table.
  *
  * s01 is the exact brute-force baseline (one scan, TakeOrderedAndProject
  * top-k — no full sort, no shuffle of the fact). s02 is the scale path:
  * sign-LSH bucket pruning so the scan only scores vectors sharing a
  * bucket with the query in at least one hash table.
  */
object Similarity {

  private val K = 10
  private val QUERY_VEC = 0L
  // 16 tables × 4 bits: on *random* 64-dim data (worst case for LSH —
  // nothing is actually close) this still yields recall@10 ≈ 0.9 while
  // scoring only candidate buckets; with real near-dup structure the
  // collision probability of true neighbours rises sharply.
  private val TABLES = 16
  private val NBITS = 4
  private val DIM = 64
  private val SEED = 42L

  /** Query vector as a 1-row broadcast frame — no driver-side collect. */
  private def queryVec(s: SparkSession, d: String): DataFrame =
    broadcast(embeddings(s, d).filter(col("vec_id") === QUERY_VEC)
      .select(col("embedding").as("qv")))

  // -- s01: exact top-k cosine neighbours --------------------------------
  def s01(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(col("vec_id") =!= QUERY_VEC)
      .crossJoin(queryVec(s, d))
      .select(col("vec_id"), cosineDet("embedding", "qv").as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)
      .select(col("vec_id"), round(col("cos"), 6).as("cosine"))

  // -- s02: LSH-bucketed approximate top-k -------------------------------
  // Candidates = vectors sharing the query's bucket in >=1 of the hash
  // tables (posexplode + semi join on (table, bucket) — one shuffle over
  // the *exploded index*, and at scale the index is pre-built/bucketed so
  // a query touches only its own buckets). Exact cosine re-ranks the
  // candidate set.
  def s02(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .withColumn("buckets", lshBuckets("embedding", DIM, TABLES, NBITS, SEED))
    val idx = e.select(col("vec_id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val qIdx = broadcast(e.filter(col("vec_id") === QUERY_VEC)
      .select(posexplode(col("buckets")).as(Seq("tbl", "bucket"))))
    val candidates = idx
      .join(qIdx, Seq("tbl", "bucket"), "left_semi")
      .filter(col("vec_id") =!= QUERY_VEC)
      .select("vec_id").distinct()
    embeddings(s, d)
      .join(candidates, Seq("vec_id"), "left_semi")
      .crossJoin(queryVec(s, d))
      .select(col("vec_id"), cosineDet("embedding", "qv").as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)
      .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_ann_bruteforce" -> (s01 _),
    "s02_ann_lsh" -> (s02 _)
  )

  val oracle: Map[String, String] = Map(
    // s02 is rows-only: its recall contract vs s01 is pinned in
    // SimilaritySpec (hash-seeded bucketing is not DuckDB-expressible).
    "s01_ann_bruteforce" ->
      s"""WITH pe AS (
         | SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |  CAST(unnest(embedding) AS DOUBLE) AS x
         | FROM embeddings),
         |norms AS (SELECT vec_id, ${sqlDotDet("x * x")} AS nrm FROM pe GROUP BY 1),
         |dots AS (
         | SELECT a.vec_id, ${sqlDotDet("a.x * q.x")} AS dot
         | FROM pe a JOIN pe q ON a.i = q.i AND q.vec_id = $QUERY_VEC
         | WHERE a.vec_id <> $QUERY_VEC GROUP BY 1)
         |SELECT vec_id, ROUND(cos, 6) AS cosine FROM (
         | SELECT d.vec_id, d.dot / sqrt(n.nrm * nq.nrm) AS cos
         | FROM dots d JOIN norms n ON n.vec_id = d.vec_id
         |  JOIN norms nq ON nq.vec_id = $QUERY_VEC)
         |ORDER BY cos DESC, vec_id LIMIT $K""".stripMargin
  )
}
