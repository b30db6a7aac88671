package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.Panels._

/** Wire format for cohort definitions — the service face of the panel
  * compiler. The reference's CRC receives query DEFINITIONS as
  * documents over the wire (i2b2 query_definition XML); here the same
  * role is a small JSON dialect, parsed with the json4s shipped inside
  * Spark (no extra dependency):
  *
  * {{{
  * { "panels": [
  *     { "concepts": [ { "eventType": "purchase", "minValue": 100.0 },
  *                     { "eventType": "click",
  *                       "codeIn": ["1", "2"] } ],
  *       "minOccurrences": 3 },
  *     { "concepts": [ { "eventType": "error" } ], "negated": true } ],
  *   "from": "2024-01-01", "until": "2024-01-08",
  *   "scope": "patient" }
  * }}}
  *
  * `parse` and `toJson` round-trip exactly (PanelsSpec), so definitions
  * can be stored, shipped and replayed; a parsed definition compiles
  * through the same one-pass `Panels.cohort` as the Scala API.
  */
object PanelsJson {

  private case class ConceptDto(eventType: String,
      minValue: Option[Double] = None, maxValue: Option[Double] = None,
      codeIn: Option[Seq[String]] = None,
      modifierPrefix: Option[String] = None)
  private case class PanelDto(concepts: Seq[ConceptDto],
      minOccurrences: Option[Long] = None, negated: Option[Boolean] = None,
      perEncounter: Option[Boolean] = None)
  private case class CohortDto(panels: Seq[PanelDto],
      from: Option[String] = None, until: Option[String] = None,
      scope: Option[String] = None)

  private implicit val formats: Formats = DefaultFormats

  private val cohortKeys = Set("panels", "from", "until", "scope")
  private val panelKeys =
    Set("concepts", "minOccurrences", "negated", "perEncounter")
  private val conceptKeys =
    Set("eventType", "minValue", "maxValue", "codeIn", "modifierPrefix")

  /** Reject unknown keys: json4s extraction silently ignores them, and a
    * typo'd "negate" would flip a NOT-panel into a positive one with no
    * error — unacceptable for documents arriving over the wire.
    */
  private def checkKeys(v: JValue, allowed: Set[String], where: String): Unit =
    v match {
      case JObject(fields) =>
        val unknown = fields.map(_._1).filterNot(allowed)
        require(unknown.isEmpty,
          s"unknown field(s) ${unknown.mkString("'", "', '", "'")} in $where " +
            s"(allowed: ${allowed.toSeq.sorted.mkString(", ")})")
      case other => throw new IllegalArgumentException(
        s"$where must be a JSON object, got $other")
    }

  def parse(json: String): CohortDef = {
    val root = JsonMethods.parse(json)
    checkKeys(root, cohortKeys, "cohort definition")
    (root \ "panels") match {
      case JArray(ps) => ps.foreach { p =>
        checkKeys(p, panelKeys, "panel")
        (p \ "concepts") match {
          case JArray(cs) => cs.foreach(checkKeys(_, conceptKeys, "concept"))
          case _ => () // missing/non-array concepts caught by extract below
        }
      }
      case _ => () // missing/non-array panels caught by extract below
    }
    val dto = root.extract[CohortDto]
    require(dto.panels.nonEmpty, "a cohort definition needs >= 1 panel")
    val scope = dto.scope match {
      case None | Some("patient") => PatientScope
      case Some("encounter")      => EncounterScope
      case Some(other) => throw new IllegalArgumentException(
        s"scope must be 'patient' or 'encounter', got '$other'")
    }
    CohortDef(
      panels = dto.panels.map { p =>
        require(p.concepts.nonEmpty, "a panel needs >= 1 concept")
        Panel(
          concepts = p.concepts.map(c =>
            Concept(c.eventType, c.minValue, c.maxValue, c.codeIn,
              c.modifierPrefix)),
          minOccurrences = p.minOccurrences.getOrElse(1L),
          negated = p.negated.getOrElse(false),
          perEncounter = p.perEncounter.getOrElse(false))
      },
      from = dto.from, until = dto.until, scope = scope)
  }

  def toJson(cd: CohortDef): String = {
    def concept(c: Concept): JObject = JObject(List(
      Some("eventType" -> (JString(c.eventType): JValue)),
      c.minValue.map(v => "minValue" -> (JDouble(v): JValue)),
      c.maxValue.map(v => "maxValue" -> (JDouble(v): JValue)),
      c.codeIn.map(vs =>
        "codeIn" -> (JArray(vs.toList.map(JString(_))): JValue)),
      c.modifierPrefix.map(p =>
        "modifierPrefix" -> (JString(p): JValue))).flatten)
    def panel(p: Panel): JObject = JObject(List(
      Some("concepts" -> (JArray(p.concepts.toList.map(concept)): JValue)),
      Some("minOccurrences" -> (JLong(p.minOccurrences): JValue)),
      Some("negated" -> (JBool(p.negated): JValue)),
      Some("perEncounter" -> (JBool(p.perEncounter): JValue))).flatten)
    val scope = cd.scope match {
      case PatientScope   => "patient"
      case EncounterScope => "encounter"
    }
    JsonMethods.compact(JsonMethods.render(JObject(List(
      Some("panels" -> (JArray(cd.panels.toList.map(panel)): JValue)),
      cd.from.map(f => "from" -> (JString(f): JValue)),
      cd.until.map(u => "until" -> (JString(u): JValue)),
      Some("scope" -> (JString(scope): JValue))).flatten)))
  }
}
