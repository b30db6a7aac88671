package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("s01 returns k descending-cosine neighbours excluding the query") {
    val rows = Similarity.s01(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(!rows.exists(_.getAs[Long]("vec_id") == 0L))
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("s02 LSH top-k reaches recall@10 >= 0.7 against brute force") {
    // Random 64-dim data is LSH's worst case (no true near neighbours);
    // 16 tables x 4 bits still keeps expected recall ~0.9. Real corpora
    // with planted near-dups only do better.
    val exact = Similarity.s01(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val approx = Similarity.s02(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall@10 = $recall")
  }
}
