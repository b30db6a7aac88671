package graft

import graft.functions.RollingFingerprint
import graft.operators.TextAnalysis
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.col

class FingerprintSpec extends SparkSpec {

  private def ref(s: String): Long = RollingFingerprint.fingerprint(
    s.getBytes("UTF-8"), RollingFingerprint.DefaultWindow,
    RollingFingerprint.DefaultBase)

  test("codegen path matches the Scala reference implementation") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.t04(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == docs.keySet)
    got.foreach { case (id, fp) =>
      assert(fp == ref(docs(id)), s"doc $id fingerprint mismatch")
    }
  }

  test("interpreted eval matches the reference on edge cases") {
    val cases = Seq("", "a", "shorter than 16", "exactly sixteen!",
      "a longer string that slides the window several times",
      "unicode: äöü 中文 🎉 end")
    cases.foreach { s =>
      val interpreted = RollingFingerprint(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s)),
        RollingFingerprint.DefaultWindow, RollingFingerprint.DefaultBase)
        .eval(null)
      assert(interpreted == ref(s), s"interpreted mismatch on '$s'")
    }
  }

  test("fingerprint runs inside whole-stage codegen") {
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id"), RollingFingerprint(col("text")).as("fp"))
    df.collect() // materialize the (adaptive) final plan
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val fpLine = plan.linesIterator.find(_.contains("rolling_fingerprint")).get
    assert(fpLine.trim.startsWith("*("), s"fingerprint not codegen-fused:\n$plan")
  }

  test("null input yields null, not a crash") {
    val row = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(RollingFingerprint(col("s")).as("fp")).collect()(0)
    assert(row.isNullAt(0))
  }
}
