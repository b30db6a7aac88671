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

  test("m04 windows overlap by WIN-HOP chars and the activity gate bites") {
    val rows = Multimodal.m04(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // energies bounded by the printable-ascii range of the corpus
    rows.foreach { r =>
      val e = r.getAs[Double]("energy")
      assert(e >= 93.0 && e < 127.0, s"energy $e out of range")
      val wc = r.getAs[Int]("win_chars")
      assert(wc >= 1 && wc <= 128, s"win_chars $wc out of range")
    }
    // the gate must actually drop windows: ungated count strictly larger
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val unggated = texts.values
      .map(t => math.max((t.length - 128) / 64, 0) + 1).sum
    assert(rows.length < unggated,
      s"activity gate dropped nothing ($unggated windows)")
    // overlap property recomputed on the driver: window k of a doc is
    // text.substring(k*HOP, k*HOP+WIN), so consecutive windows share
    // WIN-HOP chars; spot-check energies against a naive recompute
    rows.take(200).foreach { r =>
      val (id, k) = (r.getLong(0), r.getLong(1).toInt)
      val raw = texts(id).drop(k * 64).take(128)
      assert(r.getAs[Int]("win_chars") == raw.length,
        s"doc $id win $k length mismatch")
      val naive = raw.padTo(128, ' ').map(_.toInt).sum.toDouble / 128
      assert(math.abs(naive - r.getAs[Double]("energy")) < 1e-9,
        s"doc $id win $k energy mismatch")
    }
  }

  test("m03 features are bounded byte-sums, one row per sampled frame") {
    val feats = Multimodal.m03(spark, sfDir).collect()
    assert(feats.length.toLong == Multimodal.m02(spark, sfDir).count(),
      "one feature row per m02 frame")
    feats.foreach { r =>
      (2 until 10).map(r.getInt).foreach { f =>
        // 8 chars per chunk, space padding (32) up to ascii 127
        assert(f >= 8 * 32 && f <= 8 * 127, s"feature $f out of byte-sum range")
      }
    }
    // deterministic: identical on recomputation (stable embed bridge)
    assert(Multimodal.m03(spark, sfDir).collect().map(_.toSeq).toSeq ==
      feats.map(_.toSeq).toSeq)
  }

  test("m05 manifest equals a driver-side repack and the budget knob re-bins") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def repack(budget: Long) = docs.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      var off = 0L
      g.sortBy(_._1).map { case (id, _, n, t) =>
        val row = (src, off / budget, id, n, md5hex(t))
        off += n; row
      }.toSeq
    }.groupBy(r => (r._1, r._2)).map { case ((src, shard), rows) =>
      (src, shard) -> ((rows.size.toLong, rows.map(_._4).sum,
        rows.map(_._3).min, rows.map(_._3).max,
        rows.map(_._5).min, rows.map(_._5).max))
    }.toMap
    def got() = Multimodal.m05(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getString(7)))).toMap
    val default = got()
    assert(default == repack(4096L))
    // packing must actually split sources at the default budget...
    assert(default.size > docs.map(_._2).distinct.length,
      "default budget must produce multi-shard sources")
    // ...and the conf knob re-bins: a corpus-dwarfing budget collapses
    // every source to one shard holding its full byte total
    spark.conf.set("spark.graft.shard.bytes", (1L << 40).toString)
    try {
      val one = got()
      assert(one == repack(1L << 40))
      assert(one.keySet.map(_._1).size == one.size &&
        one.keys.forall(_._2 == 0L), "one shard 0 per source")
    } finally spark.conf.unset("spark.graft.shard.bytes")
  }

  test("p02 ranks every probe frame's k neighbours over OTHER assets only") {
    val rows = Multimodal.p02(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val probeFrames = Multimodal.m03(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .count()
    val byFrame = rows.groupBy(_.getLong(0))
    assert(byFrame.keySet.size == probeFrames,
      "every probe frame must get a neighbour list")
    byFrame.values.foreach { g =>
      // exactly k ranks 1..k, cosines monotone non-increasing, valid range
      assert(g.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      val cos = g.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
    // the probe asset itself never appears as a neighbour
    assert(rows.forall(_.getLong(2) != 0L))
  }

  test("m06 pairs every frame with its best overlapping active window") {
    val wins = Multimodal.m04(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val frames = Multimodal.m02(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // overlap geometry: frame at 256f x 64 chars overlaps exactly the
    // 128-char windows starting at 64*(4f-1) and 64*4f
    val expected = frames.map { case (d, f) =>
      val best = Seq(4 * f - 1, 4 * f).filter(_ >= 0)
        .flatMap(wn => wins.get((d, wn)).map(e => (wn, e)))
        .sortBy { case (wn, e) => (-e, wn) }.headOption
      (d, f) -> best.map { case (wn, e) => (wn, e) }
    }.toMap
    val got = Multimodal.m06(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(w => (w.asInstanceOf[Long], r.getDouble(3))))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty),
      "both the synced and the silent branch must occur at this SF")
  }

  test("m07 packs the combined modality costs by the t07 cum-sum rule") {
    val aud = Multimodal.m04(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.length.toLong }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._1 % 8).toSeq.flatMap { case (sh, xs) =>
      var cum = 0L
      xs.sortBy(_._1).map { case (id, t) =>
        val text = t.split(" ").length.toLong
        val img = math.max(t.length / 256, 1).toLong * 16
        val audT = aud.getOrElse(id, 0L) * 8
        val cost = text + img + audT
        val seq = cum / 2048
        cum += cost
        ((sh, seq), (text, img, audT, cost))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2._1).sum, vs.map(_._2._2).sum,
        vs.map(_._2._3).sum, vs.map(_._2._4).sum))
    }
    val got = Multimodal.m07(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))
    }.toMap
    assert(got == expected)
    // the audio gate must actually bite: some docs contribute zero
    // audio tokens, and no sequence is all-silence at this SF
    assert(docs.exists { case (id, _) => !aud.contains(id) })
    assert(got.values.forall { case (_, t, i, _, tot) => t + i <= tot })
  }
  test("m08 dataset card sections account exactly for the corpus") {
    val card = graft.operators.Multimodal.m08(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("n_units"))).toMap
    val (nDocs, nTok) = card(("corpus", "documents"))
    val langRows = card.filter(_._1._1 == "lang").values
    // language sections partition the corpus, docs AND tokens
    assert(langRows.map(_._1).sum == nDocs)
    assert(langRows.map(_._2).sum == nTok)
    assert(card(("modality", "events"))._1 ==
      Tables.events(spark, sfDir).count())
    assert(card(("modality", "embeddings"))._2 == 64L)
    assert(card(("corpus", "sources"))._1 ==
      Tables.documents(spark, sfDir).select("source").distinct().count())
  }
  test("m09 shared-footage pairs equal a driver recompute over m02 digests") {
    val digests = graft.operators.Multimodal.m02(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("frame_md5")))
      .distinct
    val df = digests.groupBy(_._2).map { case (h, xs) => h -> xs.length }
    val kept = digests.filter(x => df(x._2) <= 50)
    val want = kept.groupBy(_._2).values
      .flatMap { xs =>
        val ids = xs.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val got = graft.operators.Multimodal.m09(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(got == want, s"missing=${(want.keySet -- got.keySet).take(3)} " +
      s"extra=${(got.keySet -- want.keySet).take(3)}")
    assert(got.nonEmpty, "planted duplicate docs must share frames")
  }
  test("m09 df-cap kills a frame digest shared corpus-wide") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 60 assets all opening with the SAME 256-char intro card (one
    // frame digest in 60 > DF_CAP=50 assets) then unique tails: the
    // cap must drop the intro digest, so no pair forms from it alone
    val intro = ("intro " * 60).take(256)
    val docs = (1L to 60L).map { i =>
      (i, intro + s" unique tail $i " + ("x" * 300), "en", s"s$i", 0L)
    }
    val dir = s"${graft.Scratch.dir}/m09_cap"
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Multimodal.m09(spark, dir).collect()
    assert(pairs.isEmpty,
      s"the shared intro frame must be df-capped away, got ${pairs.length}")
  }
}
