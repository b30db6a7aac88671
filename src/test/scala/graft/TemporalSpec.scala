package graft

import graft.operators.Temporal
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {

  private def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")

  test("asofJoin picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("12:00")), (1L, 11L, ts("12:30")),
      (2L, 12L, ts("09:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, ts("11:00"), "a"), (1L, ts("12:30"), "b"),
      (1L, ts("13:00"), "c"))
      .toDF("user_id", "rts", "tag")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "rts")
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "a", "12:00 must see the 11:00 row, not 12:30")
    assert(out(11L) == "b", "equal timestamps are inclusive (at-or-before)")
    assert(out(12L) == null, "no right rows for the key -> null payload")
  }

  test("asofJoin picks whole rows: nulls in the latest row do not resurrect older values") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("12:10")), (2L, 11L, ts("12:10")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (Option(1L), Option(ts("11:00")), Option("a"), Option("x1")),
      (Option(1L), Option(ts("12:00")), Option.empty[String], Option("x2")),
      // null-key right row: must match nothing (equality-join semantics)
      (Option.empty[Long], Option(ts("12:05")), Option("z"), Option("zz")),
      // null-timestamp right row: rts <= ts can never hold — ignored
      // (it would otherwise sort nulls-first and shadow real matches)
      (Option(2L), Option.empty[Timestamp], Option("w"), Option("ww")))
      .toDF("user_id", "rts", "tag", "extra")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "rts")
      .select("event_id", "tag", "extra").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // user 1's latest row is (null, x2): tag stays null — per-column
    // fill would tear the payload and resurrect "a" from 11:00
    assert(out(10L) == (null, "x2"))
    assert(out(11L) == (null, null), "user 2 has no (non-null-key) right rows")
    // tolerance measures the picked ROW's staleness: 5 min excludes
    // nothing for user 1 (12:00 is 10 min back? no — 10 > 5, excluded)
    val tol = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "rts",
        toleranceUs = Some(5L * 60 * 1000000))
      .select("event_id", "extra").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tol(10L) == null, "latest row is 10 min stale > 5 min tolerance")
  }

  test("asofJoin rejects payload columns that collide with the left side") {
    import spark.implicits._
    val f = Seq((1L, ts("12:00"), "x")).toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(f, f, Seq("user_id"), "ts", "ts")
    }
  }

  test("asofJoin matches a brute-force reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i => (rnd.nextInt(10).toLong, i.toLong,
      new Timestamp(rnd.nextInt(100000) * 1000L)))
    // distinct (key, ts) on the right so the expected pick is unique
    val right = (1 to 300).map(i => (rnd.nextInt(10).toLong,
        new Timestamp(rnd.nextInt(100000) * 1000L), s"p$i"))
      .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
    val ldf = left.toDF("user_id", "event_id", "ts")
    val rdf = right.toDF("user_id", "rts", "tag")
    val got = Temporal.asofJoin(ldf, rdf, Seq("user_id"), "ts", "rts")
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tolUs = 30000L * 1000000
    val gotTol = Temporal.asofJoin(ldf, rdf, Seq("user_id"), "ts", "rts",
        toleranceUs = Some(tolUs))
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byKey = right.groupBy(_._1)
    left.foreach { case (k, id, lts) =>
      val latest = byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(lts))
        .sortBy(_._2.getTime).lastOption
      val expected = latest.map(_._3).orNull
      val expectedTol = latest
        .filter(r => (lts.getTime - r._2.getTime) * 1000L <= tolUs)
        .map(_._3).orNull
      assert(got(id) == expected, s"left row $id (key $k, ts $lts)")
      assert(gotTol(id) == expectedTol, s"tolerance: left row $id")
    }
  }

  test("q25/q26 compile to shuffles, never nested-loop joins") {
    // the naive inequality-join formulation of ASOF/range joins becomes
    // BroadcastNestedLoopJoin — the quadratic 100 TB trap these
    // operators exist to avoid
    for (df <- Seq(Temporal.q25(spark, sfDir), Temporal.q26(spark, sfDir))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested loop in:\n$plan")
    }
  }

  test("c43 endpoint matrix: internally consistent, covers c16's users") {
    val rows = Temporal.c43(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      def s(c: String) = r.getAs[String](c)
      // the TS format is lexicographically ordered, so every flag must
      // equal the string comparison of its two endpoints
      assert((s("a_first_end") < s("b_first_start")) ==
        (r.getAs[Int]("first_a_before_first_b") == 1))
      assert((s("a_first_end") < s("b_last_start")) ==
        (r.getAs[Int]("first_a_before_last_b") == 1))
      assert((s("a_last_end") < s("b_first_start")) ==
        (r.getAs[Int]("last_a_before_first_b") == 1))
      assert((s("a_last_end") < s("b_last_start")) ==
        (r.getAs[Int]("last_a_before_last_b") == 1))
      // span sanity: first <= last, start <= end, spans are day-bounded
      for (p <- Seq("a", "b")) {
        assert(s(s"${p}_first_start") <= s(s"${p}_last_start"))
        assert(s(s"${p}_first_start") <= s(s"${p}_first_end"))
        assert(s(s"${p}_last_start") <= s(s"${p}_last_end"))
        assert(s(s"${p}_first_start").take(10) == s(s"${p}_first_end").take(10),
          "an occurrence span must stay within its day")
      }
      // matrix monotonicity: first-A-before-first-B implies
      // first-A-before-last-B (last starts no earlier than first)
      if (r.getAs[Int]("first_a_before_first_b") == 1)
        assert(r.getAs[Int]("first_a_before_last_b") == 1)
    }
    // c16 (first signup followed by a purchase within 7d) is a special
    // case: each of its users must appear here with a purchase
    // occurrence ending after the first signup's start
    Temporal.c16(spark, sfDir).collect().foreach { r =>
      val u = r.getLong(0)
      assert(byUser.contains(u), s"c16 user $u missing from c43 frame")
      val m = byUser(u)
      assert(m.getAs[String]("b_last_end") > m.getAs[String]("a_first_start"))
    }
  }
}
