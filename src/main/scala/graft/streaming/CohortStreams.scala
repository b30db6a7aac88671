package graft.streaming

import graft.operators.Panels
import graft.operators.Panels.CohortDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous cohort membership — the i2b2 panel compiler evaluated
  * over an event STREAM instead of a finished fact table: per-user
  * panel counts live in stream state, and a row is emitted whenever a
  * user's qualification flips (enters or leaves the cohort). The
  * reference computes cohorts over completed imports; this is the same
  * definition answering "who is in the cohort right now" as feeds land.
  *
  * The panel predicates are compiled by the SAME code path as the batch
  * compiler (Panels.panelFlags → conceptMatch), evaluated as codegen'd
  * columns BEFORE the stateful operator — state sees only (user, flag
  * vector), so per-event work in the typed fold is a vector add.
  * State is one Long per (user, panel): bounded, watermark-free.
  */
object CohortStreams {

  case class PanelFlags(user_id: Long, flags: Seq[Int])
  case class CohortUpdate(user_id: Long, counts: Seq[Long], qualifies: Boolean)

  private def qualifies(cd: CohortDef, counts: Seq[Long]): Boolean =
    cd.panels.zip(counts).forall { case (p, c) =>
      if (p.negated) c == 0 else c >= p.minOccurrences
    }

  /** Per-event panel membership flags as one codegen'd projection. */
  def panelFlags(events: DataFrame, cd: CohortDef): DataFrame = {
    Panels.requireModifierSupport(events, cd.panels)
    val windowed = Seq(
      cd.from.map(f => col("ts") >= lit(f).cast("timestamp")),
      cd.until.map(u => col("ts") < lit(u).cast("timestamp")))
      .flatten.foldLeft(events)(_ filter _)
    windowed.select(col("user_id"),
      array(cd.panels.map(p =>
        when(p.concepts.map(Panels.conceptMatch).reduce(_ || _), 1)
          .otherwise(0)): _*).as("flags"))
  }

  /** Streaming form: emits a CohortUpdate each time a user's
    * qualification status changes (including the first time it becomes
    * known). Update output mode; state = one count vector per user.
    */
  def cohortStream(s: SparkSession, stream: DataFrame, cd: CohortDef)
      : Dataset[CohortUpdate] = {
    import s.implicits._
    // encounter-aware definitions need per-visit state the flag-vector
    // fold does not carry — refuse them rather than silently evaluating
    // at patient scope
    require(cd.scope == Panels.PatientScope && cd.panels.forall(!_.perEncounter),
      "cohortStream supports PatientScope definitions without perEncounter")
    val flagged = panelFlags(stream, cd).as[PanelFlags]
    flagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], CohortUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[PanelFlags], state: GroupState[Seq[Long]]) =>
          val first = state.getOption.isEmpty
          val prev = state.getOption.getOrElse(Seq.fill(cd.panels.size)(0L))
          val now = batch.foldLeft(prev)((acc, f) =>
            acc.zip(f.flags).map { case (a, fl) => a + fl })
          state.update(now)
          val was = qualifies(cd, prev)
          val is = qualifies(cd, now)
          if (first || was != is) Iterator.single(CohortUpdate(user, now, is))
          else Iterator.empty
      }
  }
}
