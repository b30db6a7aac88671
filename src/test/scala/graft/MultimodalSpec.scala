package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.{col, encode}
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("payload column is a true binary column") {
    val df = Tables.documents(spark, sfDir)
      .select(encode(col("text"), "UTF-8").as("payload"))
    assert(df.schema("payload").dataType == BinaryType)
  }

  test("m01 metadata is deterministic and well-formed") {
    val a = Multimodal.m01(spark, sfDir).collect()
    val b = Multimodal.m01(spark, sfDir).collect()
    assert(a.sameElements(b), "decode stub must be deterministic")
    a.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(Set("jpeg", "png", "webp")(r.getAs[String]("format")))
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 16 && w < 2049 && h >= 16 && h < 2049)
    }
  }

  test("typed mapPartitions decode matches the SQL-expression stub") {
    val sqlSide = Multimodal.m01(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_bytes"),
        r.getAs[String]("format"), r.getAs[Int]("width"), r.getAs[Int]("height")))
      .toSet
    val typedSide = Multimodal.decodeStubTyped(spark, sfDir).collect()
      .map(m => (m.doc_id, m.n_bytes, m.format, m.width, m.height)).toSet
    assert(typedSide == sqlSide)
  }

  test("head slice checksum equals full checksum for sub-1KB payloads") {
    Multimodal.m01(spark, sfDir).collect()
      .filter(_.getAs[Int]("n_bytes") <= 1024)
      .foreach { r =>
        assert(r.getAs[Long]("head_checksum") == r.getAs[Long]("checksum"))
      }
  }
}
