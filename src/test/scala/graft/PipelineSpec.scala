package graft

import graft.operators.{Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("p01 equals the naive composition of its oracle-checked stages") {
    // rebuild the pipeline decision on the driver from the per-stage
    // operator OUTPUTS (each oracle-checked on its own), then compare
    // the aggregate exactly
    val quality = TextAnalysis.t02(spark, sfDir)
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val exactKeep = Dedup.d01(spark, sfDir)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    val nearDrop = Dedup.d06(spark, sfDir).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    val split = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.splitOf(col("doc_id")).as("s"),
        col("lang"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    val expected = split.toSeq
      .filter { case (id, _) =>
        quality(id)._2 >= 0.5 && exactKeep(id) && !nearDrop(id) }
      .groupBy { case (_, (s, l)) => (s, l) }
      .map { case (k, g) =>
        k -> (g.size.toLong, g.map(x => quality(x._1)._1.toLong).sum) }
    val got = Pipeline.p01(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // the dedup stages must actually bite at this SF, or the
    // composition test is the quality filter alone
    val qualityOnly = split.keys.count(id => quality(id)._2 >= 0.5)
    assert(got.values.map(_._1).sum < qualityOnly,
      "dedup stages dropped nothing — composition untested")
  }
}
