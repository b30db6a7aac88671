package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d01 keeps one representative per distinct content") {
    val d = Dedup.d01(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(d.map(_.getAs[Long]("n_copies")).sum == total)
    assert(d.map(_.getAs[Long]("keep_id")).distinct.length == d.length)
  }

  test("d02 finds the planted near-duplicate pairs with high jaccard") {
    val rows = Dedup.d02(spark, sfDir).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups; d02 must find them")
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.7))
  }

  test("d03 minhash-LSH finds the same pairs as the exact inverted index") {
    // 8 bands x 4 rows: P(miss | jaccard >= 0.7) <= (1 - 0.7^4)^8 < 4%,
    // and the planted pairs sit at ~0.98 where P(miss) ~ 1e-9. The final
    // exact-Jaccard verify keeps precision at 1.0, so set equality holds.
    val exact = pairSet(Dedup.d02(spark, sfDir))
    val lsh = pairSet(Dedup.d03(spark, sfDir))
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("d04 simhash candidates cover the true near-duplicates") {
    val exact = pairSet(Dedup.d02(spark, sfDir))
    val sim = pairSet(Dedup.d04(spark, sfDir))
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.75, s"simhash recall $recall over ${exact.size} true pairs")
  }

  test("d05 embedding pairs are symmetric-free and above threshold") {
    val rows = Dedup.d05(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }
}
