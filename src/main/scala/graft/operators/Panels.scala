package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** i2b2-style panel-query COMPILER — the reference's headline capability
  * as a reusable API, not a fixed query.
  *
  * An i2b2 CRC cohort definition (cf. the CRC cells shipped in the
  * reference's WildFly image) is a conjunction of panels; each panel is
  * a disjunction of concept predicates with an occurrence bound
  * ("at least N times"), optional negation ("patients WITHOUT ..."),
  * optional value constraints, inside an optional observation window.
  *
  * Compilation strategy (the §5 scale rule): ONE conditional-aggregate
  * pass over the fact table — per panel one `count(when(...))` column —
  * then a HAVING-style conjunction. A k-panel query costs a single scan
  * + one shuffle on patient id regardless of k; never per-panel
  * self-joins.
  */
object Panels {

  /** One concept predicate: event type + optional numeric value bound. */
  case class Concept(eventType: String, minValue: Option[Double] = None)

  /** OR of concepts with an occurrence bound, or a NOT-panel (zero
    * matching events).
    */
  case class Panel(concepts: Seq[Concept], minOccurrences: Long = 1,
      negated: Boolean = false)

  /** AND of panels over an optional [from, until) event-time window. */
  case class CohortDef(panels: Seq[Panel], from: Option[String] = None,
      until: Option[String] = None)

  private def conceptMatch(c: Concept): Column = {
    val base = col("event_type") === c.eventType
    c.minValue.fold(base)(v => base && col("value") >= v)
  }

  /** Compile a cohort definition against an `events`-shaped frame.
    * Output: user_id + one `p<i>` occurrence count per panel, filtered
    * to qualifying users.
    */
  def cohort(eventsDf: DataFrame, cd: CohortDef): DataFrame = {
    val windowed = Seq(
      cd.from.map(f => col("ts") >= lit(f).cast("timestamp")),
      cd.until.map(u => col("ts") < lit(u).cast("timestamp")))
      .flatten.foldLeft(eventsDf)(_ filter _)
    val panelCols = cd.panels.zipWithIndex.map { case (p, i) =>
      count(when(p.concepts.map(conceptMatch).reduce(_ || _), 1)).as(s"p$i")
    }
    val qualifies = cd.panels.zipWithIndex.map { case (p, i) =>
      if (p.negated) col(s"p$i") === 0 else col(s"p$i") >= p.minOccurrences
    }.reduce(_ && _)
    windowed
      .groupBy(col("user_id"))
      .agg(panelCols.head, panelCols.tail: _*)
      .filter(qualifies)
  }

  // -- c13: the API exercised through the oracle gate --------------------
  // Panel 1: at least 3 events that are (purchase with value >= 100) OR
  // click; panel 2: NOT error — over the first week of January (the
  // window keeps the NOT-panel non-vacuous: over longer spans every
  // user has errors).
  val c13Def: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("purchase", minValue = Some(100.0)),
        Concept("click")), minOccurrences = 3),
      Panel(Seq(Concept("error")), negated = true)),
    from = Some("2024-01-01"), until = Some("2024-01-08"))

  def c13(s: SparkSession, d: String): DataFrame =
    cohort(events(s, d), c13Def).transform(Gate.ordered("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_panel_cohort_api" -> (c13 _)
  )

  val oracle: Map[String, String] = Map(
    "c13_panel_cohort_api" ->
      """SELECT user_id,
        | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
        |   OR event_type = 'click' THEN 1 END) AS p0,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY user_id
        |HAVING p0 >= 3 AND p1 = 0
        |ORDER BY user_id""".stripMargin
  )
}
