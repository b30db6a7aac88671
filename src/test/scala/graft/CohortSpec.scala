package graft

import graft.operators.Cohort

class CohortSpec extends SparkSpec {

  test("c06b approx LOS percentiles stay within 2.5% of exact") {
    // exact percentile() interpolates; approx_percentile returns an
    // actual span value — the bound covers value spacing in the ~150
    // per-user spans at sf0.001, not sketch error (~0 at accuracy 10000)
    def grab(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect()(0)
      (r.getAs[Long]("n_users"),
        Seq("p50", "p90", "p99").map(c => r.getAs[Double](c)))
    }
    val (nExact, exact) = grab(Cohort.c06(spark, sfDir))
    val (nApprox, approx) = grab(Cohort.c06b(spark, sfDir))
    assert(nExact == nApprox)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) / e < 0.025, s"exact $e vs approx $a")
    }
  }

  test("c18 one-pass report sections equal their standalone queries") {
    import org.apache.spark.sql.functions._
    val report = Cohort.c18(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // hour section == c04 (keys zero-padded), concept section == the
    // per-type event/user counts — the fused pass must lose nothing
    val c04 = Cohort.c04(spark, sfDir).collect()
      .map(r => f"${r.getInt(0)}%02d" -> (r.getLong(1), r.getLong(2))).toMap
    c04.foreach { case (h, v) => assert(report(("hour", h)) == v) }
    val concepts = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    concepts.foreach { case (t, v) => assert(report(("concept", t)) == v) }
    assert(report.keys.map(_._1).toSet ==
      Set("hour", "weekday", "month", "concept"))
  }

  test("c18 reads the fact table exactly once") {
    val plan = Cohort.c18(spark, sfDir).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") || l.contains("Scan parquet"))
    assert(scans == 1, s"multi-section report must be ONE scan, saw $scans")
  }

  test("c10 funnel is one scan + one keyed shuffle and matches a staged recompute") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val df = Cohort.c10(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") || l.contains("Scan parquet"))
    assert(scans == 1, s"funnel must read the fact table once, saw $scans")
    // the three stage windows + per-user rollup must share ONE
    // hash(user_id) exchange (the final 1-row agg is SinglePartition)
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"stages must share one user_id shuffle, saw $keyed")
    // staged per-user recompute in exact microseconds (getTimestamp
    // would truncate to millis and corrupt the strict > comparisons)
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val stages = evs.groupBy(_._1).values.toSeq.map { es =>
      def first(t: String, after: Long): Option[Long] = {
        val c = es.filter(e => e._2 == t && e._3 > after).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      val fv = first("view", Long.MinValue)
      val fc = fv.flatMap(first("click", _))
      val fp = fc.flatMap(first("purchase", _))
      (fv.isDefined, fc.isDefined, fp.isDefined)
    }
    val got = df.collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (stages.count(_._1).toLong, stages.count(_._2).toLong,
        stages.count(_._3).toLong))
  }

  test("c20 incremental report: exact counts, bounded sketch error, merge-invariant") {
    val exact = Cohort.c18(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val inc = Cohort.c20(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(inc.keySet == exact.keySet)
    inc.foreach { case (k, (n, approxUsers)) =>
      val (exactN, exactUsers) = exact(k)
      assert(n == exactN, s"$k: counts must merge exactly")
      assert(math.abs(approxUsers - exactUsers) <= math.max(2.0, exactUsers * 0.05),
        s"$k: sketch estimate $approxUsers vs exact $exactUsers")
    }
    // HLL union is register-wise max — merging split states must equal
    // the one-shot state's estimates exactly
    val oneShot = Cohort.reportFromState(
      Cohort.reportState(Tables.events(spark, sfDir))).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(oneShot == inc, "incremental merge must equal the one-shot state")
  }

  test("c21 subtree rollup covers exactly the /app concepts at every level") {
    import org.apache.spark.sql.functions._
    val appTypes = Set("click", "view", "signup")
    val perType = Tables.events(spark, sfDir)
      .filter(col("event_type").isin(appTypes.toSeq: _*))
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Cohort.c21(spark, sfDir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2))
      .toMap
    // grand total and the level-1 'app' subtotal both equal all /app events
    assert(rows((None, None)) == perType.values.sum)
    assert(rows((Some("app"), None)) == perType.values.sum)
    // level-2 subtotals partition by subtree branch
    assert(rows((Some("app"), Some("engagement"))) ==
      perType("click") + perType("view"))
    assert(rows((Some("app"), Some("account"))) == perType("signup"))
    // nothing outside the subtree leaks in
    assert(!rows.keySet.exists(_._1.exists(l => l != "app")))
    // the ontology dimension joins as a broadcast, never a shuffle
    val plan = Cohort.c21(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("c22 federated counts: per-site jitter bounds, total sums obfuscated rows") {
    import org.apache.spark.sql.functions._
    val truth = Tables.events(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => s"site_${r.get(0)}" -> r.getLong(1)).toMap
    val rows = Cohort.c22(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sites = rows.filter(_._1 != "TOTAL")
    assert(sites.keySet == truth.keySet)
    sites.foreach { case (k, o) =>
      assert(o >= 10, s"$k below suppression floor")
      assert(o == 10 || math.abs(o - truth(k)) <= 3, s"$k: obf $o vs ${truth(k)}")
    }
    // the hub sums what the sites REPORT — obfuscated values, not truth
    assert(rows("TOTAL") == sites.values.sum)
    // both branches of the union reuse the cached per-site frame
    // instead of rescanning the fact table
    val plan = Cohort.c22(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"TOTAL must come from the cached site rows:\n$plan")
  }

  test("c27 timeline is the (ts, event_id)-ordered capped prefix, one shuffle") {
    import org.apache.spark.sql.functions._
    val df = Cohort.c27(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // independent naive reimplementation on the driver
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      (u, rows.length.toLong,
        ordered.take(Cohort.TIMELINE_CAP).mkString(">"))
    }
    assert(got == expected)
    assert(expected.exists(_._2 > Cohort.TIMELINE_CAP),
      "cap must actually bite at this SF or the test is vacuous")
    // window + groupBy must share ONE user_id shuffle (the gate sort is
    // a range exchange, not hashpartitioning)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"timeline window and agg must share one user_id shuffle:\n$plan")
  }

  test("c28 bands partition the c01 cohort exactly") {
    val rows = Cohort.c28(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val labels = Set("negative", "00000-2499", "02500-4999",
      "05000-7499", "07500+")
    assert(rows.map(_._1).toSet.subsetOf(labels))
    assert(rows.map(_._1).distinct.length == rows.length)
    // every cohort member has a customer row (user ids are customer
    // keys), so the band counts must sum to the cohort size exactly
    assert(rows.map(_._2).sum == Cohort.c01(spark, sfDir).count())
  }

  test("c30 pair counts and lift equal a driver-side basket recompute") {
    import org.apache.spark.sql.functions._
    // sf0.01 (the gate's SF): sf0.001's pair counts sit under
    // C30_MIN_PAIRS, which would make the assertion vacuous
    val dir = "/root/testdata/sf0.01"
    val triples = Tables.events(spark, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val baskets = triples.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3)).toMap
    val nBaskets = baskets.size
    val nType = triples.groupBy(_._3).view.mapValues(_.size).toMap
    val pairCount = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = pairCount.collect {
      case ((a, b), n) if n >= Cohort.C30_MIN_PAIRS =>
        (a, b) -> ((n.toLong, nType(a).toLong, nType(b).toLong,
          (n.toLong * nBaskets).toDouble / (nType(a).toLong * nType(b))))
    }.toMap
    val got = Cohort.c30(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.nonEmpty, "the gate SF must clear the support floor")
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expected.keySet).take(3)}")
    // the corpus leaves the plan through ONE checkpointed aggregate
    // pass: every branch (pairs/margins/total) scans the tiny counted
    // RDD — a parquet scan here means a branch re-reads the events
    // table (the five-scan shape this operator was rewritten to kill)
    val plan = Cohort.c30(spark, dir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Scan parquet"),
      s"c30 branches must reuse the materialized counts:\n$plan")
  }

  test("c31 incidence/prevalence equals a driver recompute, 2 hash shuffles") {
    import org.apache.spark.sql.functions._
    val perDay = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).distinct
    val firstDay = perDay.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).min).toMap
    val expected = perDay.groupBy(t => (t._2, t._3)).map {
      case ((et, day), rows) =>
        (et, day) -> ((rows.length.toLong,
          rows.count(t => firstDay((t._1, t._2)) == day).toLong))
    }
    val df = Cohort.c31(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // non-vacuous both ways: the corpus has first presentations after
    // day 1 AND returning patients (incident < active somewhere)
    assert(got.exists { case ((_, d), (_, inc)) => d > "2024-01-01" && inc > 0 })
    assert(got.exists { case (_, (act, inc)) => inc < act })
    // the raw facts are shuffled ONCE (the explicit (user, concept)
    // repartition serves the per-day rollup AND the first-day window);
    // the only other hash exchange moves concept x day aggregate rows
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"c31 must shuffle raw facts once + one aggregate exchange:\n$plan")
  }

  test("c32 drift stats match a reference trailing-window computation") {
    import org.apache.spark.sql.functions._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.zipWithIndex.drop(1).map { case ((_, day, n), i) =>
        val prior = ordered.slice(math.max(0, i - Cohort.C32_WIN), i).map(_._3)
        val (sum, cnt) = (prior.sum, prior.length.toLong)
        (et, day) -> ((n, r6(sum.toDouble / cnt),
          r6((n * cnt - sum).toDouble / sum),
          if (math.abs(n * cnt - sum) * 5 > sum) 1 else 0))
      }
    }.toMap
    val got = Cohort.c32(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(got == expected)
    // the 20% threshold must actually separate the corpus (both flag
    // values occur), or the monitor is vacuous at this SF
    assert(got.values.exists(_._4 == 1) && got.values.exists(_._4 == 0))
  }

  test("c33 occupancy equals a driver session-fold + interval recompute") {
    import org.apache.spark.sql.functions._
    // sf0.01: sf0.001's sparser sessions never overlap across users,
    // which would make the crowding assertion vacuous
    val dir = "/root/testdata/sf0.01"
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hourUs = 3600L * 1000000
    // independent fold: per user, events sorted by (ts, event_id);
    // >30-min gap opens a new session; a session covers the hourly
    // instants in [ceil(start/h), floor(last/h)]
    val sessionsAll = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      ts.tail.foldLeft(Vector((ts.head, ts.head))) { case (acc, t) =>
        val (s0, last) = acc.last
        if (t - last > 30L * 60 * 1000000) acc :+ ((t, t))
        else acc.init :+ ((s0, t))
      }
    }
    val covered = sessionsAll.flatMap { case (s0, s1) =>
      ((s0 + hourUs - 1) / hourUs) to (s1 / hourUs)
    }
    val expected = covered.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    val got = Cohort.c33(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (h, n) =>
      fmt.format(java.time.Instant.EPOCH.plusSeconds(h * 3600)) -> n })
    // crowding is real at this SF: some instant holds >1 patient, and
    // sub-hour visits exist (the h0 > h1 sequence guard actually bites)
    assert(got.values.exists(_ > 1))
    assert(sessionsAll.exists { case (s0, s1) =>
      (s0 + hourUs - 1) / hourUs > s1 / hourUs },
      "no sub-hour visit straddling zero instants — the guard is untested")
  }

  test("c34 overlap matrix equals per-user flag recomputes, non-trivially") {
    import org.apache.spark.sql.functions._
    def day(s: String) = java.time.LocalDate.parse(s)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    def panel(et: String, lo: String, hi: String, n: Int) =
      byUser.collect { case (u, es) if es.count(e =>
        e._1 == et && e._2 >= day(lo) && e._2 < day(hi)) >= n => u }.toSet
    val hb = panel("purchase", "2024-01-01", "2024-01-03", 2)
    val er = panel("error", "2024-01-15", "2024-01-16", 1)
    val br = panel("view", "2024-01-20", "2024-01-22", 3)
    val expected = Map(
      ("browsers", "browsers") -> br.size, ("browsers", "error_seen") -> (br & er).size,
      ("browsers", "heavy_buyers") -> (br & hb).size,
      ("error_seen", "error_seen") -> er.size,
      ("error_seen", "heavy_buyers") -> (er & hb).size,
      ("heavy_buyers", "heavy_buyers") -> hb.size)
      .view.mapValues(_.toLong).toMap
    val got = Cohort.c34(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // intersections bounded by their diagonals, and at least one is a
    // PROPER overlap (neither empty nor containment) — the comparison
    // face is non-vacuous at this SF
    assert(got(("browsers", "error_seen")) <=
      math.min(got(("browsers", "browsers")), got(("error_seen", "error_seen"))))
    assert(Seq(("browsers", "error_seen"), ("browsers", "heavy_buyers"),
      ("error_seen", "heavy_buyers")).exists { p =>
      val n = got(p)
      n > 0 && n < math.min(got((p._1, p._1)), got((p._2, p._2)))
    })
  }

  test("c36 transition matrix equals a driver lag recompute and accounts") {
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val steps = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      ordered.zip(ordered.drop(1)).map { case (a, b) => (u, a, b) }
    }
    val expected = steps.groupBy(s => (s._2, s._3)).map { case (k, g) =>
      k -> ((g.size.toLong, g.map(_._1).distinct.size.toLong)) }
    val got = Cohort.c36(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // conservation: every event except each patient's first is the
    // target of exactly one step
    val nUsers = evs.map(_._1).distinct.length
    assert(got.values.map(_._1).sum == evs.length - nUsers)
  }

  test("c15 obfuscated counts stay within ±3 of truth and respect the floor") {
    import org.apache.spark.sql.functions._
    val truth = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val obf = Cohort.c15(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(obf.keySet == truth.keySet)
    obf.foreach { case (k, o) =>
      assert(o >= 10, s"$k below suppression floor")
      assert(o == 10 || math.abs(o - truth(k)) <= 3,
        s"$k: obf $o vs true ${truth(k)}")
    }
  }

  test("c37 readmissions recompute exactly from c09's session table") {
    // independent recompute: collect the oracle-checked c09 sessions
    // and redo the lead-within-24h logic in plain Scala
    val fmtT = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    val sess = Cohort.c09(spark, sfDir).collect().map { r =>
      val ldt = java.time.LocalDateTime
        .parse(r.getAs[String]("session_start"), fmtT)
      val startUs =
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        startUs, startUs + (r.getAs[Double]("dur_sec") * 1e6).round)
    }
    val expected = sess.groupBy(_._1).values.flatMap { vs =>
      val sorted = vs.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, _, _, lastUs), i) =>
        val readmit = i + 1 < sorted.length &&
          sorted(i + 1)._3 - lastUs <= 24L * 3600 * 1000000
        (java.time.Instant.ofEpochMilli(lastUs / 1000)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString, readmit)
      }
    }.toSeq
    val wantByDay = expected.groupBy(_._1).map { case (day, xs) =>
      day -> ((xs.size.toLong, xs.count(_._2).toLong))
    }
    val got = Cohort.c37(spark, sfDir).collect()
    assert(got.length == wantByDay.size)
    got.foreach { r =>
      val (nd, nr) = wantByDay(r.getAs[String]("discharge_day"))
      assert(r.getAs[Long]("n_discharges") == nd)
      assert(r.getAs[Long]("n_readmit_24h") == nr)
      assert(math.abs(r.getAs[Double]("readmit_rate") -
        nr.toDouble / nd) < 1e-6)
    }
  }

  test("c35 native session_window agrees with c09's fold off the boundary") {
    import org.apache.spark.sql.functions._
    // the two rules differ only at a gap of EXACTLY 30 min; prove the
    // corpus has no such tie, then the session counts must agree
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val exactGapTies = Tables.events(spark, sfDir)
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap") === 30L * 60 * 1000000).count()
    assert(exactGapTies == 0, "corpus has an exact-gap tie; adjust the spec")
    val native = Cohort.c35(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    val fold = Cohort.c09(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) =>
        u -> (rs.length.toLong, rs.map(_.getAs[Long]("n_events")).sum)
      }
    assert(native == fold)
  }

  test("c38 KM curve: monotone non-increasing, correct risk-set accounting") {
    val rows = Cohort.c38(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val kms = rows.map(_.getAs[Double]("km"))
    kms.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "KM must never increase")
      case _ =>
    }
    // risk set at the first day = every subject; each later risk set
    // drops exactly the prior day's events + censors
    val total = rows.map(r => r.getAs[Long]("n_events") +
      r.getAs[Long]("n_censored")).sum
    assert(rows.head.getAs[Long]("n_risk") == total)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") == a.getAs[Long]("n_risk") -
          a.getAs[Long]("n_events") - a.getAs[Long]("n_censored"))
      case _ =>
    }
    // independent product-limit recompute
    var s = 1.0
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"))
      if (d > 0) s = if (n == d) 0.0 else s * (n - d).toDouble / n
      assert(math.abs(r.getAs[Double]("km") - s) < 1e-5,
        s"day ${r.getAs[Long]("t_day")}: km ${r.getAs[Double]("km")} vs $s")
    }
  }

  test("c39 tiers partition every user; scores match a direct recompute") {
    import org.apache.spark.sql.functions._
    val tiers = Cohort.c39(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(tiers.map(_.getAs[Long]("n_patients")).sum == nUsers)
    tiers.foreach { r =>
      assert(r.getAs[Long]("min_score") <= r.getAs[Long]("max_score"))
    }
  }

  test("c40 matching: ≤2 controls per case, same stratum, disjoint roles") {
    val pairs = Cohort.c40(spark, sfDir).collect()
    assert(pairs.nonEmpty, "no matches at test sf — threshold too tight")
    val byCase = pairs.groupBy(r =>
      (r.getAs[Int]("stratum"), r.getAs[Long]("case_user")))
    byCase.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      assert(rs.map(_.getAs[Int]("slot")).toSet.subsetOf(Set(1, 2)))
    }
    val cases = pairs.map(_.getAs[Long]("case_user")).toSet
    val controls = pairs.map(_.getAs[Long]("control_user")).toSet
    assert(cases.intersect(controls).isEmpty, "a user serving both roles")
    // every control used at most once
    val ctrlUse = pairs.groupBy(_.getAs[Long]("control_user"))
    ctrlUse.foreach { case (_, rs) => assert(rs.length == 1) }
  }

  test("exportReport delivers c18's table with a matching write audit") {
    val dir = s"${graft.Scratch.dir}/report_export"
    val audit = Cohort.exportReport(spark, sfDir, dir)
    val want = Cohort.c18(spark, sfDir).collect()
    val got = spark.read.parquet(dir)
      .orderBy("section", "sec_key").collect()
    assert(got.sameElements(want), "the delivered table must BE c18")
    assert(audit("n_rows") == want.length.toLong)
    assert(audit("n_null") == 0L)
    assert(audit("checksum") == want.map(_.getLong(2)).sum.toDouble)
  }
  test("c41 standardized rates equal a driver-side stratum recompute") {
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = evs.groupBy(_._1).map { case (u, xs) => u -> xs.length }
    val strata = perUser.toSeq.sortBy { case (u, n) => (n, u) }
      .zipWithIndex.map { case ((u, _), i) =>
        // ntile(4) over N rows: first (N+3)/4... replicate via quartile
        u -> (i * 4 / perUser.size + 1)
      }.toMap
    val weights = Map(1 -> 0.4, 2 -> 0.3, 3 -> 0.2, 4 -> 0.1)
    val sizes = strata.values.groupBy(identity).map { case (k, v) => k -> v.size }
    val rows = Cohort.c41(spark, sfDir).collect()
    rows.foreach { r =>
      val tp = r.getAs[String]("event_type")
      val users = evs.filter(_._2 == tp).map(_._1).toSet
      assert(r.getAs[Long]("n_affected") == users.size.toLong)
      assert(r.getAs[Long]("n_users_total") == perUser.size.toLong)
      assert(math.abs(r.getAs[Double]("crude_rate") -
        users.size.toDouble / perUser.size) < 1e-6)
      val std = (1 to 4).map { st =>
        val aff = users.count(u => strata(u) == st)
        aff.toDouble / sizes(st) * weights(st)
      }.sum
      assert(math.abs(r.getAs[Double]("std_rate") - std) < 1e-5,
        s"$tp: ${r.getAs[Double]("std_rate")} vs $std")
    }
  }

  test("c42 ontology search: substring, case-insensitive, usage-counted") {
    val rows = Cohort.c42(spark, sfDir).collect()
    // 'engagement' owns exactly the click/view subtree
    assert(rows.map(_.getAs[String]("concept_cd")).toSeq == Seq("click", "view"))
    assert(rows.forall(_.getAs[String]("path").contains("engagement")))
    assert(rows.forall(_.getAs[Long]("n_events") > 0))
    assert(rows.forall(r =>
      r.getAs[Long]("n_users") <= r.getAs[Long]("n_events")))
    // case-insensitive contains (the i2b2 search box mode)
    assert(Cohort.searchConcepts(spark, "ENGAGEment").count() == 2)
    // a leaf NAME matches too (search is over the full path)
    assert(Cohort.searchConcepts(spark, "purchase").collect()
      .map(_.getAs[String]("event_type")).toSeq == Seq("purchase"))
    // no hits -> empty frame, not an error
    assert(Cohort.searchConcepts(spark, "no-such-term").count() == 0)
  }

  test("c44 eras: gap-merged, disjoint, seq-contiguous, day-conserving") {
    val eras = Cohort.c44(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("era_seq"), r.getAs[String]("era_start"),
        r.getAs[String]("era_end"), r.getAs[Long]("n_active_days"),
        r.getAs[Int]("span_days")))
    assert(eras.nonEmpty)
    def day(s: String) = java.time.LocalDate.parse(s).toEpochDay
    eras.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._3)
      // era ids are 1..n with no holes
      assert(sorted.map(_._3).toSeq == (1L to g.length).toSeq)
      sorted.foreach { case (_, _, _, st, en, nDays, span) =>
        assert(day(en) - day(st) + 1 == span)
        // active days fit the span; a span only exists around active days
        assert(nDays >= 1 && nDays <= span)
      }
      // consecutive eras are separated by MORE than the persistence gap
      // (else they would have merged), and never overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(day(b._4) - day(a._5) > Cohort.C44_GAP_DAYS)
        case _ =>
      }
    }
    // day conservation: total active days == distinct (user,type,day)
    import org.apache.spark.sql.functions._
    val expected = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")))
      .distinct().count()
    assert(eras.map(_._6).sum == expected)

    // c45 is c44's rollup — person-days and era counts must reconcile
    // exactly against the era rows (shared-core chain)
    val rates = Cohort.c45(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_eras"), r.getAs[Long]("person_days"),
          r.getAs[Double]("eras_per_100_person_days"))).toMap
    val byType = eras.groupBy(_._2)
    assert(rates.keySet == byType.keySet)
    byType.foreach { case (t, g) =>
      val (nE, pd, rate) = rates(t)
      assert(nE == g.length)
      assert(pd == g.map(_._7.toLong).sum)
      assert(math.abs(rate - nE * 100.0 / pd) < 1e-6)
    }
  }

  test("c49 PDC reconciles with c44's eras; bar knob moves the verdict") {
    import org.apache.spark.sql.functions._
    val pdc = Cohort.c49(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4), r.getInt(5))).toMap
    // covered days == the era table's span sum, key for key (the
    // shared-core chain: adherence cannot disagree with the eras)
    val spans = Cohort.c44(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(7).toLong))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    assert(pdc.keySet == spans.keySet)
    pdc.foreach { case (k, (cov, wd, p, adh)) =>
      assert(cov == spans(k))
      assert(math.abs(p - cov.toDouble / wd) < 1e-6)
      assert((adh == 1) == (cov * 2 >= wd), s"$k verdict at the 0.5 bar")
    }
    // the verdict fires both ways at this SF
    assert(pdc.values.exists(_._4 == 1) && pdc.values.exists(_._4 == 0))
    // per-protocol bar: at 0.9 nothing in this corpus is adherent
    spark.conf.set("spark.graft.pdc.bar", "0.9")
    try {
      val strict = Cohort.c49(spark, sfDir).collect()
      assert(strict.forall(_.getInt(5) == 0))
    } finally spark.conf.unset("spark.graft.pdc.bar")
  }

  test("c48 suppression: no group leaks, visible cells >= K, totals exact") {
    import org.apache.spark.sql.functions._
    val rows = Cohort.c48(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    val (totals, cells) = rows.partition(_._3 == -1L)
    // the anti-leak invariant: a group never publishes a VISIBLE total
    // alongside exactly one suppressed cell (total minus visible cells
    // would reveal it) — either >=2 cells hide, or the total hides too
    val totSup = totals.map(t => (t._1, t._2) -> (t._5 == 1)).toMap
    cells.groupBy(t => (t._1, t._2)).foreach { case (g, cs) =>
      val nSup = cs.count(_._5 == 1)
      assert(nSup != 1 || totSup(g),
        s"group $g leaks: one suppressed cell under a visible total")
    }
    // the last-resort total suppression exists and fires only on
    // single-cell groups
    assert(totals.exists(_._5 == 1), "no suppressed total at this SF")
    totals.filter(_._5 == 1).foreach { t =>
      assert(t._4 == -1L, "suppressed total must publish NULL")
      val g = cells.filter(c => (c._1, c._2) == ((t._1, t._2)))
      assert(g.length == 1 && g.head._5 == 1)
    }
    // visible cells all clear the threshold; suppressed ones are null
    cells.foreach { c =>
      if (c._5 == 0) assert(c._4 >= Cohort.C48_K)
      else assert(c._4 == -1L, "suppressed cell must publish NULL")
    }
    // both suppression modes actually fire at this SF
    assert(cells.exists(_._5 == 1), "primary suppression never fired")
    // complementary = a group whose suppressed count exceeds its
    // below-threshold count (a visible-range cell was hidden too);
    // verify against the unsuppressed recompute
    val raw = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"),
          col("c_nationkey")), "user_id")
    val rawCells = raw.groupBy("day", "c_mktsegment", "c_nationkey")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getLong(3)))
      .toSeq
    // suppression flags agree with the raw recompute: every below-K
    // cell is hidden, and a group hides either >=2 cells or its total
    val belowByGroup = rawCells.groupBy(t => (t._1, t._2)).view
      .mapValues(_.count(_._4 < Cohort.C48_K)).toMap
    val supByGroup = cells.groupBy(t => (t._1, t._2)).view
      .mapValues(_.count(_._5 == 1)).toMap
    supByGroup.foreach { case (g, s) => assert(s >= belowByGroup(g)) }
    // published group totals are exact (that is WHY complementary
    // suppression is needed)
    val rawTotals = rawCells.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._4)).toMap
    totals.filter(_._5 == 0).foreach { t =>
      val members = raw.filter(col("day") === t._1 &&
        col("c_mktsegment") === t._2)
        .select("user_id").distinct().count()
      assert(t._4 == members, s"total for (${t._1}, ${t._2})")
    }
    assert(rawTotals.keySet == totals.map(t => (t._1, t._2)).toSet)
  }

  test("c48 complementary rule fires on a constructed group") {
    import spark.implicits._
    // group A: one below-K cell (2) among visible cells (5, 7) — the
    // smallest visible (5) must ALSO hide, 7 stays; group B: two
    // below-K cells — both hide, nothing else does
    val cells = Seq(
      ("d1", "A", 1L, 5L), ("d1", "A", 2L, 2L), ("d1", "A", 3L, 7L),
      ("d1", "B", 1L, 1L), ("d1", "B", 2L, 2L), ("d1", "B", 3L, 9L))
      .toDF("day", "c_mktsegment", "c_nationkey", "n")
    val out = Cohort.suppressCells(cells).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toMap
    assert(out(("A", 2L)) == (-1L, 1), "primary must hide the 2-cell")
    assert(out(("A", 1L)) == (-1L, 1), "complementary must hide the 5-cell")
    assert(out(("A", 3L)) == (7L, 0), "the 7-cell stays visible")
    assert(out(("B", 1L)) == (-1L, 1) && out(("B", 2L)) == (-1L, 1))
    assert(out(("B", 3L)) == (9L, 0), "two primaries need no complementary")
  }

  test("c47 log-rank agrees with an independent driver-side recomputation") {
    import org.apache.spark.sql.functions._
    val r = Cohort.c47(spark, sfDir).collect().head
    val (nU, n1U, o1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (e1, v) = (r.getDouble(3), r.getDouble(4))
    assert(n1U > 0 && n1U < nU, "both groups must be populated")
    assert(v > 0 && r.getDouble(5) >= 0)
    // independent path: collect the raw tables and run the textbook
    // per-day log-rank in plain Scala (different code, same math)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val h = ev.map(_._3).max
    val byUser = ev.groupBy(_._1)
    val perUser = byUser.toSeq.flatMap { case (u, rows) =>
      val s0s = rows.filter(_._2 == "signup").map(_._3)
      if (s0s.isEmpty || !seg.contains(u)) None
      else {
        val s0 = s0s.min
        val evs = rows.filter(x => x._2 == "purchase" && x._3 >= s0).map(_._3)
        val t = ((if (evs.isEmpty) h else evs.min) - s0) / 86400000000L
        val grp = if (Cohort.C47_EXPOSED_SEGMENTS.contains(seg(u))) 1 else 0
        Some((t, if (evs.nonEmpty) 1 else 0, grp))
      }
    }
    assert(perUser.size == nU && perUser.count(_._3 == 1) == n1U)
    val days = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.count(_._3 == 1).toLong,
        g.count(_._2 == 1).toLong, g.count(x => x._2 == 1 && x._3 == 1).toLong)
    }
    var (atRisk, atRisk1) = (perUser.size.toLong, perUser.count(_._3 == 1).toLong)
    var (sumO1, sumE1, sumV) = (0L, 0.0, 0.0)
    days.foreach { case (_, m, m1, o, oG1) =>
      if (o > 0) {
        sumO1 += oG1
        sumE1 += o.toDouble * atRisk1 / atRisk
        if (atRisk > 1)
          sumV += o.toDouble * (atRisk1.toDouble / atRisk) *
            ((atRisk - atRisk1).toDouble / atRisk) *
            ((atRisk - o).toDouble / (atRisk - 1))
      }
      atRisk -= m; atRisk1 -= m1
    }
    assert(sumO1 == o1)
    assert(math.abs(sumE1 - e1) < 1e-3, s"E1 $sumE1 vs $e1")
    assert(math.abs(sumV - v) < 1e-3, s"V $sumV vs $v")
    val chi = (sumO1 - sumE1) * (sumO1 - sumE1) / sumV
    assert(math.abs(chi - r.getDouble(5)) < 1e-2, s"chi2 $chi vs ${r.getDouble(5)}")
  }

  test("c50 weights presence once per concept and bands the census") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-17 00:00:00")
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .filter(r => !r.getTimestamp(2).before(ts0) &&
        r.getTimestamp(2).before(ts1))
      .map(r => (r.getLong(0), r.getString(1)))
    val w = Cohort.C50_WEIGHTS.toMap
    // presence, not count: DISTINCT concepts per user before weighting
    val scores = evs.distinct.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(x => w(x._2)).sum }
    def band(s: Int) =
      if (s <= 3) "low" else if (s <= 6) "moderate" else "high"
    val expect = scores.values.groupBy(band)
      .map { case (b, ss) => b -> (ss.size.toLong, ss.sum.toLong) }
    val got = Cohort.c50(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"$got vs $expect")
    // a repeat-heavy user must score like a single occurrence: at
    // sf0.001 every user repeats at least one concept in the window
    assert(evs.length > evs.distinct.length,
      "window has no repeats - the presence rule is untested")
  }

  test("c51 forecast is the trailing same-weekday mean, final week only") {
    val df = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val daily = Tables.events(spark, sfDir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rows = Cohort.c51(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = java.time.LocalDate.parse(r.getString(0), df)
      assert(!day.isBefore(java.time.LocalDate.parse("2024-01-24", df)))
      val tp = r.getString(1)
      assert(r.getLong(2) == daily((tp, day)))
      // the trailing frame is the three SAME-WEEKDAY predecessors,
      // never the three previous calendar days
      val prev3 = (1 to 3).map(k => daily.getOrElse((tp, day.minusWeeks(k)), 0L)).sum
      assert(r.getLong(3) == prev3, s"$tp $day: ${r.getLong(3)} vs $prev3")
      val fc = (BigDecimal(prev3) / 3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == fc, s"$tp $day: ${r.getDouble(4)} vs $fc")
    }
    // backtest coverage: exactly the final 7 days x every concept seen
    assert(rows.map(_.getString(0)).distinct.length == 7)
  }

  test("c52 co-exposure equals a driver-side overlap recompute over c44's eras") {
    // independent truth: pairwise interval overlap in plain Scala over
    // the era frame (already spec'd against its own oracle)
    val eras = Cohort.c44(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        java.time.LocalDate.parse(r.getAs[String]("era_start")),
        java.time.LocalDate.parse(r.getAs[String]("era_end")))
    }
    val overlaps = scala.collection.mutable.ArrayBuffer
      .empty[((String, String), (Long, Long))]
    eras.groupBy(_._1).foreach { case (u, es) =>
      for (a <- es; b <- es)
        if (a._2 < b._2 && !a._3.isAfter(b._4) && !b._3.isAfter(a._4)) {
          val st = if (a._3.isAfter(b._3)) a._3 else b._3
          val en = if (a._4.isBefore(b._4)) a._4 else b._4
          val ov = java.time.temporal.ChronoUnit.DAYS.between(st, en) + 1
          overlaps += (((a._2, b._2), (u, ov)))
        }
    }
    val want = overlaps.groupBy(_._1).map { case (k, xs) =>
      val vals = xs.map(_._2)
      k -> ((vals.map(_._1).distinct.size.toLong, vals.size.toLong,
        vals.map(_._2).sum, vals.map(_._2).max))
    }
    val got = Cohort.c52(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_episodes"),
          r.getAs[Long]("total_overlap_days"),
          r.getAs[Int]("max_overlap_days").toLong,
          r.getAs[Double]("mean_overlap_days"))
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (nu, ne, tot, mx)) =>
      val g = got(k)
      assert((g._1, g._2, g._3, g._4) == ((nu, ne, tot, mx)), s"$k: $g")
      val mean = BigDecimal(tot.toDouble / ne)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(g._5 == mean, s"$k mean: ${g._5} vs $mean")
    }
    // the overlap predicate actually discriminates: some same-user
    // cross-type era pair must NOT overlap at this SF
    val byUser = eras.groupBy(_._1)
    val nonOverlapping = byUser.values.exists(es =>
      es.exists(a => es.exists(b => a._2 < b._2 &&
        (a._3.isAfter(b._4) || b._3.isAfter(a._4)))))
    assert(nonOverlapping, "every era pair overlaps - predicate untested")
  }
}
