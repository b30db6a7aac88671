package graft

import graft.operators.Panels
import graft.operators.Panels.{CohortDef, Concept, Panel}
import graft.streaming.CohortStreams
import graft.streaming.CohortStreams.CohortUpdate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

case class StreamEv(user_id: Long, ts: Timestamp, event_type: String,
    value: Double)

class CohortStreamSpec extends SparkSpec {

  private val c01Def = CohortDef(Seq(
    Panel(Seq(Concept("signup"), Concept("view"))),
    Panel(Seq(Concept("purchase")), minOccurrences = 2),
    Panel(Seq(Concept("error")), negated = true)),
    from = Some("2024-01-01"), until = Some("2024-01-08"))

  /** Current membership from the change-log: counts are monotone, so a
    * user's latest update is the one with the largest count total.
    */
  private def membership(updates: Seq[CohortUpdate]): Set[Long] =
    updates.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.counts.sum)).toMap
      .collect { case (u, up) if up.qualifies => u }.toSet

  test("streaming cohort membership converges to the batch panel query") {
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[StreamEv].collect().toSeq
    val (b1, b2) = rows.partition(_.ts.getTime % 2 == 0) // arbitrary split
    val input = MemoryStream[StreamEv](spark)
    val q = CohortStreams.cohortStream(spark, input.toDF(), c01Def)
      .writeStream.format("memory").queryName("cohort_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val updates = spark.table("cohort_out").as[CohortUpdate].collect().toSeq
      val streamed = membership(updates)
      val batch = Panels.cohort(Tables.events(spark, sfDir), c01Def)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch,
        s"missing=${batch -- streamed} extra=${streamed -- batch}")
    } finally q.stop()
  }

  test("membership flips are emitted as users enter and leave the cohort") {
    import spark.implicits._
    def ev(u: Long, day: Int, t: String) =
      StreamEv(u, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), t, 10.0)
    val cd = CohortDef(Seq(
      Panel(Seq(Concept("purchase"))),
      Panel(Seq(Concept("error")), negated = true)))
    val input = MemoryStream[StreamEv](spark)
    val q = CohortStreams.cohortStream(spark, input.toDF(), cd)
      .writeStream.format("memory").queryName("cohort_flips")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Seq(ev(1, 1, "purchase"))); q.processAllAvailable()
      input.addData(Seq(ev(1, 2, "error"))); q.processAllAvailable()
      val ups = spark.table("cohort_flips").as[CohortUpdate].collect()
        .sortBy(_.counts.sum)
      assert(ups.length == 2)
      assert(ups(0).qualifies, "purchase alone -> in the cohort")
      assert(!ups(1).qualifies, "error arrives -> leaves the cohort")
    } finally q.stop()
  }

  test("streaming eras converge to c44's era table across ordered batches") {
    import spark.implicits._
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{DayFact, Era}
    // the day-level feed, split into three ORDERED batches (the st02/
    // st14 ingestion contract) with same-day rows allowed to straddle
    // a batch boundary via the per-key day split
    val days = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.to_date(col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_facts"))
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.datediff(col("day"),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
          .as("epoch_day"), col("n_facts"))
      .as[DayFact].collect().toSeq.sortBy(_.epoch_day)
    val cuts = days.map(_.epoch_day).distinct.sorted
    val (c1, c2) = (cuts(cuts.size / 3), cuts(2 * cuts.size / 3))
    val batches = Seq(
      days.filter(_.epoch_day <= c1),
      days.filter(f => f.epoch_day > c1 && f.epoch_day <= c2),
      days.filter(_.epoch_day > c2))
    // sentinel flush: one far-future day per key closes every open era
    val flushDay = cuts.last + graft.operators.Cohort.C44_GAP_DAYS + 10
    val flush = days.map(f => (f.user_id, f.event_type)).distinct
      .map { case (u, t) => DayFact(u, t, flushDay, 0L) }
    val input = MemoryStream[DayFact](spark)
    val q = EventStreams.eraStream(spark, input.toDS())
      .writeStream.format("memory").queryName("era_out")
      .outputMode(OutputMode.Update()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(flush); q.processAllAvailable()
      val streamed = spark.table("era_out").as[Era].collect()
        .filter(_.era_start != java.time.LocalDate
          .ofEpochDay(flushDay.toLong).toString)
        .map(e => (e.user_id, e.event_type, e.era_seq, e.n_active_days,
          e.n_facts, e.era_start, e.era_end, e.span_days)).toSet
      val batch = graft.operators.Cohort.c44(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5), r.getString(6), r.getInt(7))).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }
}
