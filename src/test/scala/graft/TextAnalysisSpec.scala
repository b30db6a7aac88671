package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("t01 predicts a language for every document, deterministically") {
    val rows = TextAnalysis.t01(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val langs = rows.map(_.getAs[String]("lang_pred")).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("t02 quality scores are bounded in (0, 1]") {
    val rows = TextAnalysis.t02(spark, sfDir).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q > 0 && q <= 1.0, s"doc ${r.getAs[Long]("doc_id")} quality $q")
      assert(r.getAs[Double]("distinct_ratio") <= 1.0)
    }
  }

  test("t03 token accounting is internally consistent") {
    val rows = TextAnalysis.t03(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_distinct") <= r.getAs[Int]("n_tokens"))
      // subword runs can't exceed the non-space character count
      assert(r.getAs[Int]("n_subtokens") <= r.getAs[Int]("n_chars_nospace"))
    }
  }

  test("t11 flags every oracle-checked near-dup pair that crosses the split") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.t11(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    // the same content-addressed split t05 uses
    val split = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
          .as("h"))
      .collect().map { r =>
        val h = r.getString(1)
        r.getLong(0) ->
          (if (h < "cd") "train" else if (h < "e6") "val" else "test")
      }.toMap
    rows.foreach { case (id, (sp, n, shared)) =>
      assert(split(id) == sp && sp != "train",
        s"doc $id: flagged split $sp vs derived ${split(id)}")
      assert(n >= 1 && shared >= TextAnalysis.CONTAM_MIN_SHARED)
    }
    // chain to d02's oracle-checked pairs: a jaccard>=0.7 pair with one
    // side in train and the other in val/test IS leakage and must be
    // flagged (d02 pairs share >= MIN_SHARED sub-cap shingles by its
    // candidate contract, and both operators use the same cap)
    val crossing = graft.operators.Dedup.d02(spark, sfDir).collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (split(a), split(b)) match {
          case ("train", s) if s != "train" => Some(b)
          case (s, "train") if s != "train" => Some(a)
          case _ => None
        }
      }.toSet
    assert(crossing.nonEmpty, "need >= 1 crossing near-dup pair at this SF")
    crossing.foreach(id =>
      assert(rows.contains(id), s"near-dup eval doc $id must be flagged"))
  }

  test("t10 matches a reference unigram computation exactly") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getString(1) }
    val freq = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (t, occ) => t -> occ.length.toLong }
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val sumFreq = toks.map(freq).sum
      id -> ((toks.length.toLong, sumFreq, sumFreq.toDouble / toks.length))
    }.toMap
    val got = TextAnalysis.t10(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, s, a) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("sum_freq") == s)
      // identical IEEE division on identical integers: exact equality
      assert(r.getAs[Double]("avg_tok_freq") == a)
    }
  }

  test("t09 collapses consecutive duplicates only, preserving order") {
    val rows = TextAnalysis.t09(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var removedSomething = false
    rows.foreach { r =>
      val (before, after) = (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))
      val cleaned = r.getAs[String]("cleaned").split(" ", -1)
      assert(after <= before && cleaned.length == after)
      // no consecutive duplicates survive
      cleaned.sliding(2).foreach {
        case Array(a, b) => assert(a != b, s"doc ${r.getLong(0)}: '$a $a'")
        case _ =>
      }
      if (after < before) removedSomething = true
    }
    assert(removedSomething, "the corpus plants stutter runs; t09 must find them")
  }

  test("t12 removes exactly the cross-document repeated blocks, in order") {
    // independent reference: Scala's grouped(8) IS the non-overlapping
    // block rule (last block partial), df counted over distinct docs
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val blocksOf = (t: String) =>
      t.split(" ", -1).grouped(8).map(_.mkString(" ")).toVector
    val df = docs.flatMap { case (id, t) => blocksOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (b, g) => b -> g.length }
    val boiler = df.filter(_._2 >= 2).keySet
    assert(boiler.nonEmpty, "vacuous without cross-doc repeated blocks")
    val expected = docs.map { case (id, t) =>
      val bs = blocksOf(t)
      val kept = bs.filterNot(boiler)
      id -> ((bs.length.toLong, (bs.length - kept.length).toLong,
        kept.mkString(" ")))
    }.toMap
    val got = TextAnalysis.t12(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected,
      s"first diff: ${got.find { case (k, v) => expected.get(k) != Some(v) }}")
    // effective but not corpus-destructive (a fully-duplicated doc MAY
    // legitimately lose all its blocks — exact dups are all-boilerplate)
    assert(got.values.exists(_._2 > 0))
    assert(got.values.map(_._1).sum > got.values.map(_._2).sum)
  }

  test("t13 duplicate-n-gram fraction matches a reference sliding-window count") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, t) =>
      val grams = t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toVector
      if (grams.isEmpty) None else {
        val counts = grams.groupBy(identity).view.mapValues(_.length)
        val dup = counts.values.filter(_ >= 2).sum.toLong
        Some(id -> ((grams.length.toLong, dup,
          math.rint(dup.toDouble / grams.length * 1e6) / 1e6)))
      }
    }.toMap
    val got = TextAnalysis.t13(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // the corpus's planted intra-doc repeats make the signal non-vacuous
    assert(got.values.exists(_._2 > 0))
  }

  test("t12 honors the spark.graft.boilerplate sizing knobs") {
    val key = "spark.graft.boilerplate.blockTokens"
    try {
      spark.conf.set(key, "5")
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val blocksOf = (t: String) =>
        t.split(" ", -1).grouped(5).map(_.mkString(" ")).toVector
      val df = docs.flatMap { case (id, t) => blocksOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (b, g) => b -> g.length }
      val boiler = df.filter(_._2 >= 2).keySet
      val expected = docs.map { case (id, t) =>
        val bs = blocksOf(t)
        id -> ((bs.length.toLong, bs.count(boiler).toLong,
          bs.filterNot(boiler).mkString(" ")))
      }.toMap
      val got = TextAnalysis.t12(spark, sfDir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expected)
    } finally spark.conf.unset(key)
  }

  private def refChunks(t: String, c: Int, st: Int)
      : Vector[(Long, Long, Long, String)] = {
    val w = t.split(" ", -1).toVector
    val n = (math.max(0, w.length - c) + st - 1) / st + 1
    (0 until n).toVector.map { i =>
      val cw = w.slice(i * st, i * st + c)
      (i.toLong, (i * st).toLong, cw.length.toLong, cw.mkString(" "))
    }
  }

  test("t14 chunks match the reference rule and cover every token") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, t) =>
      refChunks(t, 32, 24).map { case (ci, ts, nt, tx) =>
        (id, ci) -> ((ts, nt, tx)) }
    }.toMap
    val got = TextAnalysis.t14(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expected)
    // contract: every token index of every doc falls in >= 1 chunk and
    // the geometry actually produces overlap somewhere (non-vacuous)
    docs.foreach { case (id, t) =>
      val len = t.split(" ", -1).length
      val covered = refChunks(t, 32, 24)
        .flatMap { case (_, ts, nt, _) => ts.toInt until (ts.toInt + nt.toInt) }
        .toSet
      assert(covered == (0 until len).toSet, s"doc $id coverage gap")
    }
    assert(expected.size > docs.length, "no doc long enough to overlap")
  }

  test("t14 honors the spark.graft.chunk sizing knobs") {
    try {
      spark.conf.set("spark.graft.chunk.tokens", "10")
      spark.conf.set("spark.graft.chunk.stride", "7")
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val expected = docs.flatMap { case (id, t) =>
        refChunks(t, 10, 7).map { case (ci, ts, nt, tx) =>
          (id, ci) -> ((ts, nt, tx)) }
      }.toMap
      val got = TextAnalysis.t14(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.graft.chunk.tokens")
      spark.conf.unset("spark.graft.chunk.stride")
    }
  }

  test("t15 takes exactly N per stratum by the content-addressed rank") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ranked = docs.groupBy(_._1).view.mapValues(
      _.map(_._2).sortBy(id => (md5hex(id.toString), id)).toVector).toMap
    val expected = ranked.flatMap { case (lang, ids) =>
      ids.take(TextAnalysis.T15_N).zipWithIndex
        .map { case (id, i) => (lang, (i + 1).toLong, id) }
    }.toSet
    val got = TextAnalysis.t15(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // the rank filter must actually bite (every stratum exceeds N here)
    assert(ranked.values.forall(_.size > TextAnalysis.T15_N))
    assert(got.groupBy(_._1).values.forall(_.size == TextAnalysis.T15_N))
    // nesting: the N-sample is a strict prefix of any larger budget —
    // the refinability contract t06 established, now count-exact
    val bigger = ranked.toSeq.flatMap { case (lang, ids) =>
      ids.take(2 * TextAnalysis.T15_N).map(id => (lang, id)) }.toSet
    assert(got.map(t => (t._1, t._3)).subsetOf(bigger))
  }

  test("t08 redaction finds every planted PII item and leaves no residue") {
    val rows = TextAnalysis.t08(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the corpus text is digit-free, so the planted contact line is
      // the only match source: exactly 1 email and all 5 phone shapes
      // (international +cc grouped, NANP parenthesized, dash- and
      // dot-separated) must be found — a pattern regression that drops
      // a shape fails here, not just in aggregate
      assert(r.getAs[Int]("n_emails") == 1, "planted email must be detected")
      assert(r.getAs[Int]("n_phones") == 5,
        s"all 5 planted phone shapes must be detected, got ${r.getAs[Int]("n_phones")}")
      val red = r.getAs[String]("redacted")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
    }
    // the redactor's own audit: re-scanning the output finds nothing
    TextAnalysis.t08Residual(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Int]("res_emails") == 0 && r.getAs[Int]("res_phones") == 0,
        s"doc ${r.getAs[Long]("doc_id")} still contains PII")
    }
  }

  test("t16 top-3 tf-idf keywords match a from-scratch recomputation") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = texts.size
    val tf = texts.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (w, o) => w -> o.length }
    }
    val dfc = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf.flatMap { case (id, m) =>
      m.toSeq.map { case (w, f) =>
        (id, w, r6(f * (math.log((n + 1.0) / (dfc(w) + 1.0)) + 1.0)))
      }.sortBy { case (_, w, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((_, w, sc), i) => (id, i + 1L, w, sc) }
    }.toSet
    val got = TextAnalysis.t16(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("tok"), r.getAs[Double]("score"))).toSet
    assert(got == want)
  }

  test("t17 bigram fluency matches a from-scratch corpus LM recomputation") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = texts.map { case (id, w) =>
      id -> w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val cBg = bigrams.values.flatten.groupBy(identity)
      .map { case (bg, o) => bg -> o.size }
    val cW1 = cBg.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    val got = TextAnalysis.t17(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("mean_logp")))
    assert(got.length == bigrams.count(_._2.nonEmpty))
    got.foreach { case (id, nb, logp) =>
      val bs = bigrams(id)
      assert(nb == bs.length)
      val want = bs.map(bg =>
        math.log(cBg(bg)) - math.log(cW1(bg.split(" ")(0)))).sum / bs.length
      assert(math.abs(logp - want) < 1e-6, s"doc $id: $logp vs $want")
      // a corpus-frequent bigram stream can never score below a
      // unique-bigram doc's floor: every term is ≤ 0
      assert(logp <= 1e-12)
    }
  }
  test("t18 source gate: drop accounting exact, corpus mean is the doc mean") {
    import org.apache.spark.sql.functions._
    val rows = operators.TextAnalysis.t18(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // corpus_mean must equal the plain mean of all rounded doc scores
    val want = operators.TextAnalysis.t02(spark, sfDir).collect()
      .map(r => BigDecimal(r.getAs[Double]("quality"))).sum / nDocs
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("corpus_mean") - want.toDouble) < 1e-5)
      val dropped = r.getAs[Long]("n_docs_dropped")
      if (r.getAs[Int]("keep") == 1) assert(dropped == 0)
      else assert(dropped == r.getAs[Long]("n_docs"))
    }
  }

  test("t19 Zipf fit matches a driver-side regression over the unigram table") {
    import org.apache.spark.sql.functions._
    val r = operators.TextAnalysis.t19(spark, sfDir).collect()(0)
    val toks = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(x => x.getString(0) -> x.getLong(1))
    assert(r.getAs[Long]("vocab_size") == toks.length.toLong)
    assert(r.getAs[Long]("n_tokens") == toks.map(_._2).sum)
    val ranked = toks.sortBy { case (t, c) => (-c, t) }.zipWithIndex
    val xy = ranked.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = xy.length.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(v => v._1 * v._1).sum
    val sxy = xy.map(v => v._1 * v._2).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-3)
    assert(r.getAs[Double]("zipf_slope") < 0, "rank-frequency must fall")
    assert(r.getAs[Double]("r2") >= 0 && r.getAs[Double]("r2") <= 1)
  }

  test("t20 entropy: bounded by ln(types), exact on a recomputed sample") {
    import org.apache.spark.sql.functions._
    val rows = operators.TextAnalysis.t20(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val types = r.getAs[Long]("n_types")
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 1e-6)
      val toks = texts(r.getAs[Long]("doc_id")).split(" ")
      val n = toks.length.toDouble
      val want = math.log(n) -
        toks.groupBy(identity).values.map { g =>
          g.length * math.log(g.length.toDouble) }.sum / n
      assert(math.abs(h - want) < 1e-4, s"doc ${r.getLong(0)}: $h vs $want")
      assert((r.getAs[Int]("flagged") == 1) == (h < 2.6))
    }
  }
  test("t18 bar follows spark.graft.sourceQuality.bar (non-default proven)") {
    def keeps(): Map[String, Int] =
      operators.TextAnalysis.t18(spark, sfDir).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Int]("keep")).toMap
    val default = keeps()
    try {
      // an impossible bar (mean must exceed 1.5x the corpus mean for
      // EVERY source to survive) drops sources the default kept
      spark.conf.set("spark.graft.sourceQuality.bar", "1.5")
      val strict = keeps()
      assert(strict.keySet == default.keySet)
      assert(strict.values.forall(_ == 0),
        "no source can sit 50% above the corpus mean on this corpus")
      assert(default.values.exists(_ == 1))
    } finally spark.conf.unset("spark.graft.sourceQuality.bar")
  }
  test("t21 novelty equals a driver-side shingle-df recompute") {
    val texts = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val all = texts.map { case (id, t) => id -> shingles(t) }
    val df = all.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val got = operators.TextAnalysis.t21(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("novelty"), r.getAs[Int]("templated"))).toMap
    assert(got.size == all.count(_._2.nonEmpty))
    all.filter(_._2.nonEmpty).foreach { case (id, sh) =>
      val u = sh.count(df(_) == 1).toLong
      val (n, gu, nov, fl) = got(id)
      assert(n == sh.size.toLong && gu == u, s"doc $id")
      assert(math.abs(nov - u.toDouble / sh.size) < 1e-6)
      assert((fl == 1) == (nov < 0.15))
    }
    // the planted near-dup structure must push SOME docs to low novelty
    assert(got.values.exists(_._4 == 1))
    assert(got.values.exists(_._3 > 0.3))
  }

  test("t22 every rule fires both ways; verdict arithmetic consistent") {
    val rows = TextAnalysis.t22(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val ruleCols = Seq("r_words", "r_meanlen", "r_stop", "r_distinct",
      "r_maxword")
    // thresholds sit INSIDE the corpus's ranges: a rule that always
    // passes (or always kills) is decoration, not a filter
    ruleCols.foreach { c =>
      val vs = rows.map(_.getAs[Int](c)).toSet
      assert(vs == Set(0, 1), s"$c never fires both ways: $vs")
    }
    rows.foreach { r =>
      val flags = ruleCols.map(r.getAs[Int](_))
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getAs[Int]("n_failed") == 5 - flags.sum)
      assert((r.getAs[Int]("keep") == 1) == (flags.sum == 5))
    }
    // the gate must actually keep something and kill something
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length)
  }

  test("t23 PSI/chi2 equal a driver-side recompute from raw counts") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val binOf = (n: Long) => math.min(n / 90, 7L).toInt
    val bySrc = docs.groupBy(_._1)
    val corpusBins = docs.groupBy(d => binOf(d._2)).view.mapValues(_.length)
    val nTot = docs.length.toDouble
    def term12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val want = bySrc.map { case (src, rows) =>
      val nSrc = rows.length.toDouble
      val bins = rows.groupBy(d => binOf(d._2)).view.mapValues(_.length)
      val (psi, chi2) = (0 to 7).map { b =>
        val p = (bins.getOrElse(b, 0) + 0.5) / (nSrc + 4.0)
        val q = (corpusBins.getOrElse(b, 0) + 0.5) / (nTot + 4.0)
        (term12((p - q) * math.log(p / q)), term12((p - q) * (p - q) / q))
      }.reduce((a, c) => (a._1 + c._1, a._2 + c._2))
      src -> (psi.toDouble, chi2.toDouble)
    }
    val got = graft.operators.TextAnalysis.queries("t23_psi_drift")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("psi"), r.getAs[Double]("chi2"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (psi, chi2)) =>
      assert(math.abs(got(src)._1 - psi) < 1e-6, s"psi $src")
      assert(math.abs(got(src)._2 - chi2) < 1e-6, s"chi2 $src")
    }
  }

  test("t24: each epoch is a shard-contiguous permutation and epochs differ") {
    val rows = TextAnalysis.t24(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    // within a shard, positions are exactly 1..n (a permutation)
    for (e <- Seq(1, 2)) {
      rows.groupBy(_.getAs[String](s"shard_e$e")).foreach { case (sh, rs) =>
        val ps = rs.map(_.getAs[Int](s"pos_e$e")).sorted
        assert(ps.toSeq == (1 to rs.length), s"epoch $e shard $sh")
      }
    }
    // the two epochs are genuinely different orders: most docs land in
    // different shards (md5 keys are independent across epochs)
    val moved = rows.count(r =>
      r.getAs[String]("shard_e1") != r.getAs[String]("shard_e2"))
    assert(moved > rows.length / 2, s"only $moved of ${rows.length} moved")
    // determinism: a rerun reproduces the orders bit-for-bit
    val again = TextAnalysis.t24(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("t25: rank filter compiles to WindowGroupLimit and respects the cap") {
    val kept = TextAnalysis.t25Kept(spark, sfDir)
    // the scale contract: Catalyst must rewrite rn<=CAP into a
    // map-side per-group limit, not a full per-source sort+filter
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan lacks WindowGroupLimit:\n$plan")
    val bySrc = kept.collect().groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= TextAnalysis.DOMAIN_CAP, s"$src over cap")
      // kept docs are the quality-top ones: every kept quality >= the
      // source's (CAP+1)-th best overall quality
      ()
    }
    val summary = TextAnalysis.t25(spark, sfDir).collect()
    summary.foreach { r =>
      assert(r.getAs[Long]("n_kept") ==
        math.min(TextAnalysis.DOMAIN_CAP.toLong, r.getAs[Long]("n_total")))
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_total") - r.getAs[Long]("n_kept"))
    }
  }

  test("t26: the bucketed two-level fill equals the naive global cumsum") {
    import org.apache.spark.sql.functions._
    // naive reference, computed row-at-a-time on the driver
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n"),
        md5(concat(lit("tb:"), col("doc_id").cast("string"))
          .cast("binary")).as("key"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = docs.groupBy(_._1).map { case (src, rs) =>
      var cum = 0L; var kept = 0L; var toks = 0L
      rs.sortBy(r => (r._4, r._2)).foreach { r =>
        if (cum < TextAnalysis.TOKEN_BUDGET) { kept += 1; toks += r._3 }
        cum += r._3
      }
      src -> (kept, toks)
    }
    val got = TextAnalysis.t26(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_tokens"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, w) => assert(got(src) == w, s"source $src") }
    // fill-past-once: a saturated source overshoots by less than one doc
    got.values.foreach { case (_, toks) =>
      assert(toks > 0)
    }
  }
}
