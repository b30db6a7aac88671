package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B sec01 — per-site masked views: the row/column-security face a
  * federated deployment hands each spoke.
  *
  * The reference stack runs one DWH per hospital with per-service DB
  * roles (the database image creates separate i2b2/aktin users; the PM
  * cell scopes every webclient session to a project). The engine-level
  * equivalent is a VIEW FACTORY: a site's analysts get a frame that (a)
  * contains only their site's patients — row-level security via a
  * patient-dimension semi-join — and (b) carries no direct identifiers —
  * column-level security: `user_id` is replaced by a deterministic
  * site-scoped pseudonym and the free-text payload (`props`) is
  * redacted. Pseudonyms are md5("site_<k>:" || user_id) — STABLE within
  * a site (longitudinal analyses, panel counts, and query-in-query all
  * still work, because every Panels/Cohort composition groups by
  * user_id and never needs its raw value) and UNLINKABLE across sites
  * (two sites' views of the same patient — were membership to overlap —
  * share no key).
  *
  * Composition is the point: [[siteView]] returns an `events`-shaped
  * frame, so the ENTIRE registered surface (Panels.cohort, attrition,
  * cohortWithPatientSet, the breakdown queries) runs over it unchanged;
  * SecuritySpec proves the panel compile commutes with the mask (cohort
  * over the view == pseudonymized cohort over the raw site slice) and
  * that no composition can emit another site's rows — the row filter is
  * INSIDE the frame a spoke receives, not a convention callers follow.
  *
  * Scale shape: the membership side is dimension-sized (customers of
  * one nation), so the row filter is a broadcast semi-join the fact
  * scan absorbs — at 100 TB a spoke's query reads only pruned fact
  * partitions and never shuffles on the mask. The md5 pseudonym is a
  * codegen'd expression, zero extra passes.
  *
  * Reference face: per-role DB users in the reference's database image
  * (src/docker/database/Dockerfile) and the i2b2 PM cell's
  * project-scoped sessions (generated/compose.yml services).
  */
object Security {

  /** The gate's fixed spoke. Site ≈ the patient's nation, as in c22;
    * site 2 is the busiest nation at every shipped SF, so the gate
    * query is non-empty from sf0.001 up (2/7/69 qualifying patients at
    * sf0.001/0.01/0.1 — a 0-row gate would pass vacuously).
    */
  private[graft] val SEC_SITE = 2L

  /** The spoke's panel definition: c13's first panel at a 2-occurrence
    * bound (the NOT-error panel is dropped — one site's slice is small
    * enough at the low SFs that c13's exact definition returns empty).
    */
  private[graft] val secDef: Panels.CohortDef = Panels.CohortDef(
    panels = Seq(Panels.Panel(Seq(
      Panels.Concept("purchase", minValue = Some(100.0)),
      Panels.Concept("click")), minOccurrences = 2)),
    from = Some("2024-01-01"), until = Some("2024-01-08"))

  private def pseudonym(site: Long): org.apache.spark.sql.Column =
    md5(concat(lit(s"site_$site:"), col("user_id").cast("string"))
      .cast("binary"))

  /** The masked per-site view of the fact table: rows = the site's
    * patients only; columns = user_id pseudonymized (site-scoped,
    * deterministic), props redacted. Everything else (ts, event_type,
    * value, event_id) passes through — the analytics surface.
    */
  def siteView(s: SparkSession, d: String, site: Long): DataFrame = {
    val members = customer(s, d)
      .filter(col("c_nationkey") === site)
      .select(col("c_custkey").as("user_id"))
    events(s, d)
      .join(broadcast(members), Seq("user_id"), "left_semi")
      .withColumn("user_id", pseudonym(site))
      .withColumn("props", lit(null).cast("string"))
  }

  /** [[secDef]] compiled over the masked site view — the spoke's own
    * cohort query. The oracle is the same panel SQL over the
    * pre-filtered site slice with the same pseudonym applied, so the
    * gate proves filter, mask, and panel compile all at once.
    */
  def sec01(s: SparkSession, d: String): DataFrame =
    Panels.cohort(siteView(s, d, SEC_SITE), secDef)
      .transform(Gate.ordered("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sec01_site_masked_view" -> (sec01 _))

  val oracle: Map[String, String] = Map(
    "sec01_site_masked_view" ->
      s"""SELECT md5('site_$SEC_SITE:' || CAST(user_id AS VARCHAR)) AS user_id,
        | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
        |   OR event_type = 'click' THEN 1 END) AS p0
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        | AND user_id IN (SELECT c_custkey FROM customer
        |                 WHERE c_nationkey = $SEC_SITE)
        |GROUP BY user_id
        |HAVING p0 >= 2
        |ORDER BY 1""".stripMargin)
}
