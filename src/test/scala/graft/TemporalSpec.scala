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

  test("asofJoin rejects payload columns that collide with the left side") {
    import spark.implicits._
    val f = Seq((1L, ts("12:00"), "x")).toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(f, f, Seq("user_id"), "ts", "ts")
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
}
