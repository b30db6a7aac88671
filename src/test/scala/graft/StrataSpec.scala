package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cohort, Relational, Strata}

/** Strata.band: the exact/approx equal-population banding behind
  * c40/c41/q34 (the ApproxAtScale decision applied to NTILE).
  */
class StrataSpec extends SparkSpec {

  private def withApprox[T](f: => T): T =
    try { spark.conf.set("spark.graft.approx", "true"); f }
    finally spark.conf.unset("spark.graft.approx")

  private def userFrame = Tables.events(spark, sfDir)
    .groupBy(col("user_id"))
    .agg(count(lit(1)).as("n_events"))

  test("approx banding agrees with exact NTILE off tie/boundary rows") {
    val exact = Strata.band(spark, userFrame, 4, "n_events", "user_id", "st")
      .select("user_id", "n_events", "st").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val approx = withApprox {
      Strata.band(spark, userFrame, 4, "n_events", "user_id", "st")
        .select("user_id", "st").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    // rows that disagree must sit on a value shared across a boundary
    // (the declared trade: ties band by value, not by tiebreak) — and
    // the overall agreement stays high
    val byValue = exact.groupBy(_._2)
    val disagree = exact.filter { case (u, v, st) => approx(u) != st }
    disagree.foreach { case (u, v, st) =>
      assert(byValue(v).map(_._3).distinct.size > 1 ||
        math.abs(approx(u) - st) == 1,
        s"user $u value $v: exact $st approx ${approx(u)} not boundary-explained")
    }
    assert(disagree.length.toDouble / exact.length <= 0.10,
      s"agreement ${1 - disagree.length.toDouble / exact.length}")
    // both paths produce all 4 bands with near-balanced populations
    val sizes = approx.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keySet == Set(1, 2, 3, 4))
    val (mn, mx) = (sizes.values.min, sizes.values.max)
    assert(mx <= 2 * mn, s"unbalanced approx strata: $sizes")
  }

  test("approx path kills the sort: no ntile window in c40/c41/q34 plans") {
    withApprox {
      for (df <- Seq(Cohort.c40(spark, sfDir), Cohort.c41(spark, sfDir),
          Relational.q34(spark, sfDir))) {
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        // "ntile(" not "ntile": percentile_approx contains the bare word
        assert(!plan.contains("ntile("), s"global-sort NTILE survived:\n$plan")
      }
      // and the operators still produce their full output shape
      assert(Relational.q34(spark, sfDir).count() == 50)
      assert(Cohort.c41(spark, sfDir).count() == 5)
    }
    // exact path (the gate's) still carries the ntile window
    val exactPlan = Relational.q34(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("ntile("))
  }

  test("per-segment approx deciles: 10 near-balanced bands per segment") {
    withApprox {
      val rows = Relational.q34(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      rows.groupBy(_._1).foreach { case (seg, ds) =>
        assert(ds.map(_._2).toSet == (1 to 10).toSet, s"segment $seg")
        val ns = ds.map(_._3)
        assert(ns.max <= 2 * ns.min, s"segment $seg deciles unbalanced: $ns")
      }
    }
  }
}
