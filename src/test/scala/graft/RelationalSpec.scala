package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and is non-degenerate") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      withClue(s"$name schema: ") { assert(df.columns.nonEmpty) }
    }
  }

  test("q01 groups are the return-flag/status combinations") {
    val rows = Relational.q01(spark, sfDir).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val qty = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(qty > 0)
  }

  test("q07 anti join complements the customers having a large order") {
    import org.apache.spark.sql.functions.col
    val without = Relational.q07(spark, sfDir)
      .collect().map(_.getAs[Long]("n_no_orders")).sum
    val withLarge = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val total = Tables.customer(spark, sfDir).count()
    assert(without > 0, "anti join must be non-vacuous")
    assert(without + withLarge == total)
  }

  test("q10 emits at most 3 rows per customer, ranked") {
    val rows = Relational.q10(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      val ranked = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(ranked.sameElements(ranked.sortBy(-(_: Double))))
    }
  }

  test("q15b approx percentiles stay within 2.5% of exact") {
    // exact percentile() INTERPOLATES between values; approx_percentile
    // returns an actual data value — on sf0.001's ~300-value groups the
    // neighbour gap alone is >1%, so the bound covers value spacing,
    // not sketch error (which is ~0 at accuracy 10000 here)
    def grab(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> Seq("p25", "p50", "p75", "p90")
        .map(c => r.getAs[Double](c))).toMap
    val exact = grab(Relational.q15(spark, sfDir))
    val approx = grab(Relational.q15b(spark, sfDir))
    exact.foreach { case (k, es) =>
      es.zip(approx(k)).foreach { case (e, a) =>
        assert(math.abs(e - a) / e < 0.025, s"$k: exact $e vs approx $a")
      }
    }
  }

  test("q29b approx distinct counts stay within 10% of exact") {
    def grab(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = grab(Relational.q29(spark, sfDir))
    val approx = grab(Relational.q29b(spark, sfDir))
    exact.foreach { case (c, e) =>
      assert(math.abs(approx(c) - e).toDouble / e.max(1) <= 0.10,
        s"$c: exact $e vs approx ${approx(c)}")
    }
  }

  test("q12 rollup grand total equals row count") {
    val rows = Relational.q12(spark, sfDir).collect()
    val grand = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(grand.getAs[Long]("n") == Tables.lineitem(spark, sfDir).count())
  }

  test("q30 grouping sets are internally consistent and expand over one scan") {
    val rows = Relational.q30(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1 && grand.head.getLong(4) == total)
    // each single-dimension marginal partitions the table
    assert(rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
      .map(_.getLong(4)).sum == total)
    assert(rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 0)
      .map(_.getLong(4)).sum == total)
    val plan = Relational.q30(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must expand, not re-scan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1)
  }

  test("q31 range frame matches a brute-force sliding-window count") {
    import org.apache.spark.sql.functions._
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = purchases.groupBy(_._1).map { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      u -> ts.map(t => ts.count(x => x >= t - 7L * 86400 && x <= t)).max
    }.filter(_._2 >= 3)
    val got = Relational.q31(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute, s"missing=${brute.toSet -- got.toSet} extra=${got.toSet -- brute.toSet}")
    assert(got.nonEmpty, "corpus must contain at least one burst user")
  }

  test("q32 equals a driver-side correlated EXISTS evaluation, one scan each") {
    // independent reference: evaluate the textbook correlated form
    // (EXISTS + NOT EXISTS) directly over collected rows
    def millis(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[java.time.LocalDateTime](i)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val odate = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> millis(r, 1)).toMap
    val late = scala.collection.mutable.Map[(Long, Long), Boolean]()
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        val isLate = millis(r, 2) >
          odate(r.getLong(0)) + 60L * 86400000
        late(k) = late.getOrElse(k, false) || isLate
      }
    val byOrder = late.keys.groupBy(_._1)
    val expected = late.collect {
      case ((ok, sk), true)
        if byOrder(ok).exists(_._2 != sk) &&
          !byOrder(ok).exists(p => p._2 != sk && late(p)) => sk
    }.groupBy(identity).map { case (sk, g) => sk -> g.size.toLong }
    val names = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val df = Relational.queries("q32_multi_exists")(spark, sfDir)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (sk, n) => names(sk) -> n })
    // the expensive subtree (scan + join + per-(order, supplier) flags)
    // is computed ONCE: its shuffle feeds both the per-order rollup and
    // the join back, so the FINAL adaptive plan reuses the exchange —
    // the naive correlated form would re-run it per subquery
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange") ||
      "lineitem\\.parquet".r.findAllIn(plan).length == 1,
      s"the per-(order, supplier) flags must be computed once:\n$plan")
  }

  test("q33 melts exactly q14's wide cells, adding no exchange of its own") {
    val segs = Seq("automobile", "building", "furniture", "household",
      "machinery")
    val wide = Relational.q14(spark, sfDir).collect()
    val long = Relational.q33(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(long.size == wide.length * segs.size,
      "every (nation, segment) cell must appear exactly once")
    for (r <- wide; (seg, i) <- segs.zipWithIndex)
      assert(long((r.getString(0), seg)) == r.getDouble(i + 1),
        s"cell (${r.getString(0)}, $seg) diverged in the melt")
    // the Expand runs on the aggregated frame: on the production path
    // (gate sort off) the whole melt costs exactly q14's ONE aggregate
    // shuffle — no shuffle of its own, no sort (final adaptive plan,
    // the AQE-safe slice)
    val gateOff = "spark.graft.gateSort"
    spark.conf.set(gateOff, "false")
    try {
      val plan = Relational.q33(spark, sfDir)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("Expand"), "unpivot must plan as one Expand")
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1 &&
        !plan.contains("Exchange rangepartitioning"),
        s"the melt must add no shuffle beyond q14's aggregate:\n$plan")
    } finally spark.conf.set(gateOff, "true")
  }

  test("q34 deciles are balanced, ordered, and exhaustive per segment") {
    val rows = Relational.q34(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = Tables.customer(spark, sfDir).count()
    assert(rows.map(_._3).sum == total, "every customer lands in a band")
    rows.groupBy(_._1).foreach { case (seg, bands) =>
      assert(bands.map(_._2).sorted.toSeq == (1 to bands.length),
        s"$seg: deciles must be dense from 1")
      // NTILE's equal-population contract: sizes differ by at most 1
      val sizes = bands.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$seg: unbalanced $sizes")
      // data-driven boundaries: each band's range is sane and bands
      // never regress (hi of band k <= hi of band k+1; lo <= hi)
      val ordered = bands.sortBy(_._2).toSeq
      ordered.foreach { b => assert(b._4 <= b._5) }
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(a._5 <= b._5 && a._4 <= b._4,
          s"$seg: band ${a._2} overtakes band ${b._2}")
      }
    }
  }

  test("q24 covers every nation that has customers or suppliers") {
    val rows = Relational.q24(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[Long]("c_cnt") + r.getAs[Long]("s_cnt") > 0))
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Bench's record gate never lets a dirtier run replace a cleaner record") {
    val clean = """{"contended":false,"loadavg_before":"0.59 1.2 1.5",""" +
      """"n_queries":124,"value":54.1}"""
    // anything records over nothing or over a contended record
    assert(Bench.shouldRecord(contended = false, 0.5, 124, 50.0, None))
    assert(Bench.shouldRecord(contended = true, 20.0, 124, 80.0, None))
    assert(Bench.shouldRecord(contended = false, 2.0, 124, 55.0,
      Some("""{"contended":true,"loadavg_before":"17.0","value":80.0}""")))
    // comparably-idle or faster runs refresh the record
    assert(Bench.shouldRecord(contended = false, 1.4, 124, 55.0, Some(clean)))
    assert(Bench.shouldRecord(contended = false, 4.0, 124, 53.0, Some(clean)))
    // the r7 failure mode: sub-cores/2 load but far dirtier than the
    // record, slower, same-ish suite — REFUSED now
    assert(!Bench.shouldRecord(contended = false, 9.42, 124, 63.2, Some(clean)))
    // a changed suite refreshes only from a near-idle machine
    assert(Bench.shouldRecord(contended = false, 2.8, 130, 60.0, Some(clean)))
    assert(!Bench.shouldRecord(contended = false, 9.42, 130, 63.2, Some(clean)))
    // contended runs still never replace a clean record, stamp or not
    assert(!Bench.shouldRecord(contended = true, 20.0, 124, 80.0, Some(clean)))
    assert(!Bench.shouldRecord(contended = true, 20.0, 124, 80.0,
      Some("""{"value":58.5}""")))
  }

  test("q35 trailing window equals a brute-force per-row recompute") {
    // different plan shape on purpose: self-join + filter instead of a
    // RANGE window — the window frame semantics are what's under test
    val rows = operators.Relational.q35(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        // NTZ column collects as LocalDateTime; UTC re-label
        r.getAs[java.time.LocalDateTime](2)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
        r.getDouble(3)))
    val byCust = orders.groupBy(_._1)
    val win = 7L * 86400 * 1000000
    rows.foreach { r =>
      val (ck, ok) = (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"))
      val me = byCust(ck).find(_._2 == ok).get
      val inFrame = byCust(ck).filter(o => o._3 >= me._3 - win && o._3 <= me._3)
      assert(r.getAs[Long]("n_trailing_7d") == inFrame.length,
        s"order $ok frame size")
      val want = BigDecimal(inFrame.map(o => BigDecimal(o._4)).sum.toDouble)
      assert(math.abs(r.getAs[Double]("trailing_7d_spend") - want.toDouble) < 1e-6,
        s"order $ok trailing sum")
    }
  }

  test("q37 regression matches a driver-side exact OLS recompute") {
    import org.apache.spark.sql.functions._
    val got = operators.Relational.q37(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("slope_per_day"), r.getAs[Double]("intercept"),
          r.getAs[Double]("r2"))).toMap
    val data = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("double").as("x"),
        col("o_totalprice").as("y"))
      .collect()
      .groupBy(_.getString(0))
    data.foreach { case (g, rows) =>
      val xs = rows.map(_.getAs[Double]("x"))
      val ys = rows.map(_.getAs[Double]("y"))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val (gs, gi, gr2) = got(g)
      assert(math.abs(gs - slope) < 1e-4, s"$g slope $gs vs $slope")
      assert(math.abs(gi - (sy / n - slope * sx / n)) < 1e-2)
      assert(gr2 >= 0.0 && gr2 <= 1.0)
    }
  }

  test("q38 fences: outliers counted against the exact quartile fences") {
    val rows = operators.Relational.q38(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bals = Tables.customer(spark, sfDir)
      .select("c_mktsegment", "c_acctbal").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val vals = bals(seg).map(_.getAs[Double]("c_acctbal"))
      assert(r.getAs[Long]("n") == vals.length.toLong)
      val lo = r.getAs[Double]("lo_fence")
      val hi = r.getAs[Double]("hi_fence")
      assert(r.getAs[Long]("n_low") == vals.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_high") == vals.count(_ > hi).toLong)
      assert(lo < hi)
    }
  }

  test("q39 first/second/last values equal a driver-side recompute") {
    val rows = Relational.q39(spark, sfDir).collect()
    val byCust = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .collect()
      .groupBy(_.getLong(0))
    assert(rows.length == byCust.size)
    rows.foreach { r =>
      val hist = byCust(r.getAs[Long]("o_custkey"))
        .sortBy(x => (x.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli, x.getLong(2)))
        .map(_.getDouble(3))
      assert(r.getAs[Double]("first_price") == hist.head)
      assert(r.getAs[Double]("last_price") == hist.last)
      assert(r.getAs[Long]("n_orders") == hist.length.toLong)
      if (hist.length >= 2)
        assert(r.getAs[Double]("second_price") == hist(1))
      else assert(r.isNullAt(r.fieldIndex("second_price")))
    }
  }

  test("q40 modal pick equals a driver recompute under the tie rule") {
    val got = Relational.q40(spark, sfDir).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[String]("modal_priority"), r.getAs[Long]("n_modal"),
          r.getAs[Long]("n_orders"))).toMap
    val seg = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (seg(r.getLong(0)), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    counts.keys.map(_._1).toSet.foreach { (sg: String) =>
      val inSeg = counts.filter(_._1._1 == sg)
        .map { case ((_, p), n) => (p, n) }.toSeq
      val want = inSeg.minBy { case (p, n) => (-n, p) }
      val (gp, gn, gt) = got(sg)
      assert((gp, gn) == want, s"$sg: ($gp,$gn) vs $want")
      assert(gt == inSeg.map(_._2).sum)
    }
  }

  test("q41 basket rules equal a driver-side recompute of support/conf/lift") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val itemSup = li.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nBaskets = li.map(_._1).distinct.length.toLong
    val pairSup = li.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val is: Seq[Long] = items.map(_._2).sorted.toSeq
      for { a <- is; b <- is if a < b } yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val top = pairSup.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val got = Relational.q41(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> (r.getAs[Long]("sup_ab"),
        r.getAs[Double]("conf_a_b"), r.getAs[Double]("conf_b_a"),
        r.getAs[Double]("lift"))
    }.toMap
    assert(got.keySet == top.map(_._1).toSet)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    top.foreach { case ((a, b), n) =>
      val g = got((a, b))
      assert(g._1 == n, s"($a,$b): ${g._1} vs $n")
      assert(g._2 == r6(n.toDouble / itemSup(a)))
      assert(g._3 == r6(n.toDouble / itemSup(b)))
      assert(g._4 == r6(n.toDouble * nBaskets / (itemSup(a) * itemSup(b))))
    }
    // the rank-20 boundary actually cut something (the tie rule matters)
    assert(pairSup.size > 20, "fewer than 21 pairs - the top-k is untested")
  }

  test("every query has a matching oracle or is documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val rowsOnly = Set("d03_dedup_minhash_lsh", "d03b_dedup_lsh_prebuilt",
      "d04_dedup_simhash", "d04b_dedup_simhash_wide",
      "d05b_dedup_embedding_ivf",
      "s02_ann_lsh", "s02b_ann_lsh_prebuilt",
      "s03_ann_ivf", "s03b_ann_ivf_prebuilt",
      "s04_ann_pq", "s04b_ann_pq_prebuilt", "s05b_knn_join_lsh",
      "t04_fingerprint", "m01_multimodal_meta", "q15b_percentiles_approx",
      "c06b_los_percentiles_approx", "q29b_column_profile_approx",
      "c20_report_incremental", "s10_mmr_rerank", "s11_index_quality",
      "s12_ann_ivfpq", "s12b_ann_ivfpq_prebuilt", "s13_ann_filtered_ivf",
      "s14_ann_tombstones", "s15_ann_sq8", "s15b_ann_sq8_prebuilt",
      "st16_stream_index_maintenance")
    assert(missing.subsetOf(rowsOnly), s"undocumented rows-only: ${missing -- rowsOnly}")
  }
}
