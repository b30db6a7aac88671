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

  test("p03 delta decisions verify leg-by-leg against raw recomputes") {
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashes = docs.view.mapValues(md5hex).toMap
    def shingles(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Seq.empty
      else w.sliding(3).map(_.mkString(" ")).toSeq
    }
    val setsOf = docs.view.mapValues(t => shingles(t).toSet).toMap
    val rows = Pipeline.p03(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4), r.getInt(5)))
    assert(rows.map(_._1).toSeq == docs.keys.filter(_ % 5 == 4).toSeq.sorted,
      "every delta doc gets exactly one decision row")
    rows.foreach { case (id, q, dup, near, _, kept) =>
      // exact-dup leg: a named target really shares content and is the
      // canonical (min corpus id, else min smaller delta id) choice;
      // absence means NO copy exists (the bloom gate has no false
      // negatives to hide one behind)
      val corpusCopies = hashes.collect {
        case (o, h) if o % 5 != 4 && h == hashes(id) => o }
      val deltaPrior = hashes.collect {
        case (o, h) if o % 5 == 4 && o < id && h == hashes(id) => o }
      val expDup =
        if (corpusCopies.nonEmpty) Some(corpusCopies.min)
        else if (deltaPrior.nonEmpty) Some(deltaPrior.min) else None
      assert(dup == expDup, s"doc $id: dup_of $dup vs $expDup")
      // near-dup leg: any named partner is policy-legal and truly over
      // the jaccard threshold
      near.foreach { p =>
        assert(p % 5 != 4 || p < id, s"doc $id: illegal partner $p")
        val (a, b) = (setsOf(id), setsOf(p))
        val jac = (a & b).size.toDouble / (a | b).size
        assert(jac >= 0.7, s"doc $id ~ $p: jaccard $jac below threshold")
      }
      // keep bit is exactly the conjunction of the three verdicts
      assert(kept == (if (q >= 0.5 && dup.isEmpty && near.isEmpty) 1 else 0))
    }
    // the near/quality legs fire on the generated corpus
    assert(rows.exists(_._4.isDefined), "no near dup in the delta")
    assert(rows.exists(r => r._2 < 0.5), "no quality drop in the delta")
    assert(rows.exists(_._6 == 1) && rows.exists(_._6 == 0))
  }

  test("p03 exact-dup legs fire on a planted cross-slice corpus") {
    // the generated corpus has no content copy straddling the delta
    // slice (verified: zero matches at sf0.001 and sf0.01), so the
    // exact-dup branches need planted coverage: a delta copy of a
    // corpus doc, a delta copy of an EARLIER delta doc, and a near-dup
    // (one token changed) of a corpus doc
    import spark.implicits._
    val dir = s"${graft.Scratch.dir}/p03_planted"
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = ((1 to 29).map(i => s"w$i") :+ "zz").mkString(" ")
    val docs = Seq(
      0L -> "f0 g0 h0", 1L -> "f1 g1 h1", 2L -> "f2 g2 h2",
      3L -> "x1 x2", // corpus original
      4L -> "y1 y2", // delta original (first)
      5L -> "f5 g5 h5",
      6L -> base, // corpus near-dup anchor
      9L -> "x1 x2", // delta copy of corpus 3
      14L -> "y1 y2", // delta copy of delta 4
      19L -> near // delta near-dup of corpus 6
    )
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.p03(spark, dir).collect().map(r =>
      r.getLong(0) -> ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(5)))).toMap
    assert(got.keySet == Set(4L, 9L, 14L, 19L))
    assert(got(4L) == ((None, None, 0)), "first delta copy is original")
    assert(got(9L)._1 == Some(3L), "corpus copy wins")
    assert(got(14L)._1 == Some(4L), "earlier delta copy wins")
    assert(got(19L)._2 == Some(6L), "near-dup partner found")
    assert(got(19L)._3 == 0 && got(9L)._3 == 0 && got(14L)._3 == 0)
  }
  test("p04 release manifest: stage monotonicity, stages match their operators") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Pipeline.p04(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c2, d2) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_source_gated"), r.getAs[Long]("n_after_dedup"),
        r.getAs[Long]("n_released"))
      assert(a >= b && b >= c2 && c2 >= d2, s"stages must only shrink: $r")
    }
    // stage 1 equals t18's verdict applied per language
    val keptSrc = graft.operators.TextAnalysis.t18(spark, sfDir).collect()
      .filter(_.getAs[Int]("keep") == 1).map(_.getAs[String]("source")).toSet
    val perLang = Tables.documents(spark, sfDir)
      .select("lang", "source").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.count(r => keptSrc(r.getString(1))).toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_source_gated") ==
        perLang(r.getAs[String]("lang")))
    }
    // the dedup stage really bites on this corpus (planted near-dups)
    assert(rows.map(r => r.getAs[Long]("n_source_gated") -
      r.getAs[Long]("n_after_dedup")).sum > 0)
  }

  test("p05 quarantines exactly t11's contaminated eval docs") {
    import graft.operators.{Pipeline, TextAnalysis}
    val rows = Pipeline.p05(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length == Tables.documents(spark, sfDir).count())
    // train is never quarantined (contamination is an EVAL verdict)
    rows.filter(_._2 == "train").foreach(r => assert(r._3 == "train"))
    // the quarantine set IS t11's doc set — no more, no fewer
    val quarantined = rows.filter(_._3 == "quarantined").map(_._1).toSet
    val t11Ids = TextAnalysis.t11(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(quarantined == t11Ids)
    assert(quarantined.nonEmpty, "planted cross-split dups must fire")
    // clean eval docs keep their split unchanged
    rows.filter(r => r._2 != "train" && !quarantined(r._1))
      .foreach(r => assert(r._3 == r._2))
  }
}
