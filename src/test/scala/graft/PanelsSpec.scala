package graft

import graft.operators.Panels
import graft.operators.Panels.{Concept, CohortDef, Panel}
import java.sql.Timestamp

case class PanelEv(user_id: Long, event_id: Long, ts: Timestamp,
    event_type: String, value: Double)

class PanelsSpec extends SparkSpec {

  private def ev(u: Long, id: Long, day: Int, t: String, v: Double = 10.0) =
    PanelEv(u, id, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), t, v)

  private lazy val frame = {
    import spark.implicits._
    Seq(
      // user 1: 2 purchases + 1 view, no error -> in (purchase>=2 & !error)
      ev(1, 1, 1, "purchase"), ev(1, 2, 2, "purchase"), ev(1, 3, 3, "view"),
      // user 2: 2 purchases but an error -> excluded by NOT panel
      ev(2, 4, 1, "purchase"), ev(2, 5, 2, "purchase"), ev(2, 6, 3, "error"),
      // user 3: 1 purchase only -> fails occurrence bound
      ev(3, 7, 1, "purchase"), ev(3, 8, 2, "view"),
      // user 4: high-value purchases outside window -> window excludes
      ev(4, 9, 20, "purchase", 500.0), ev(4, 10, 21, "purchase", 500.0)
    ).toDF()
  }

  test("occurrence bound, negation and OR semantics on a hand-built frame") {
    val cd = CohortDef(Seq(
      Panel(Seq(Concept("purchase"), Concept("signup")), minOccurrences = 2),
      Panel(Seq(Concept("error")), negated = true)))
    val users = Panels.cohort(frame, cd).collect().map(_.getLong(0)).toSet
    assert(users == Set(1L, 4L))
  }

  test("observation window excludes out-of-window events") {
    val cd = CohortDef(Seq(Panel(Seq(Concept("purchase")), minOccurrences = 2)),
      from = Some("2024-01-01"), until = Some("2024-01-10"))
    val users = Panels.cohort(frame, cd).collect().map(_.getLong(0)).toSet
    assert(users == Set(1L, 2L), "user 4's purchases are outside the window")
  }

  test("value constraint filters concept matches") {
    val cd = CohortDef(Seq(
      Panel(Seq(Concept("purchase", minValue = Some(100.0))), minOccurrences = 2)))
    val users = Panels.cohort(frame, cd).collect().map(_.getLong(0)).toSet
    assert(users == Set(4L))
  }

  test("the API reproduces c01 when given c01's definition") {
    val cd = CohortDef(Seq(
      Panel(Seq(Concept("signup"), Concept("view"))),
      Panel(Seq(Concept("purchase")), minOccurrences = 2),
      Panel(Seq(Concept("error")), negated = true)),
      from = Some("2024-01-01"), until = Some("2024-01-08"))
    val api = Panels.cohort(Tables.events(spark, sfDir), cd)
      .collect().map(_.getLong(0)).toSet
    val c01 = graft.operators.Cohort.c01(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(api == c01)
  }
}
