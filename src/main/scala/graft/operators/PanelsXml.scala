package graft.operators

import scala.xml.{Elem, Node, Utility, XML}

import graft.operators.Panels._

/** XML wire format for cohort definitions — the reference's NATIVE
  * dialect: the i2b2 CRC receives `query_definition` XML from the
  * webclient (the wildfly CRC cells in
  * /root/reference/generated/compose.yml speak XML, not JSON).
  * PanelsJson is the modern-service face; this is the same wire role
  * in the reference's own shape: a `<cohort>` of `<panel>`s of
  * `<concept>`s (≈ query_definition/panel/item), scala-xml is bundled
  * with Spark, and a parsed definition compiles through the SAME
  * one-pass [[Panels.cohort]].
  *
  * {{{
  * <cohort scope="patient" from="2024-01-01" until="2024-01-08">
  *   <panel minOccurrences="3">
  *     <concept eventType="purchase" minValue="100.0"/>
  *     <concept eventType="click"><code>1</code><code>2</code></concept>
  *   </panel>
  *   <panel negated="true"><concept eventType="error"/></panel>
  * </cohort>
  * }}}
  *
  * Parsing is STRICT like PanelsJson's: unknown elements and unknown
  * attributes are rejected loudly — a typo'd `negate="true"` must not
  * silently turn a NOT-panel positive on a document arriving over the
  * wire. `parse` and `toXml` round-trip exactly (PanelsSpec).
  */
object PanelsXml {

  private val cohortAttrs = Set("scope", "from", "until")
  private val panelAttrs = Set("minOccurrences", "negated", "perEncounter")
  private val conceptAttrs =
    Set("eventType", "minValue", "maxValue", "modifierPrefix")

  private def checkAttrs(e: Elem, allowed: Set[String]): Unit = {
    val unknown = e.attributes.asAttrMap.keySet -- allowed
    require(unknown.isEmpty,
      s"unknown attribute(s) ${unknown.mkString("'", "', '", "'")} on " +
        s"<${e.label}> (allowed: ${allowed.toSeq.sorted.mkString(", ")})")
  }

  private def childElems(e: Elem): Seq[Elem] =
    e.child.collect { case c: Elem => c }

  private def attr(e: Elem, name: String): Option[String] =
    e.attribute(name).map(_.text)

  def parse(xml: String): CohortDef = {
    val root = XML.loadString(xml)
    require(root.label == "cohort", s"root must be <cohort>, got <${root.label}>")
    checkAttrs(root, cohortAttrs)
    val scope = attr(root, "scope") match {
      case None | Some("patient") => PatientScope
      case Some("encounter")      => EncounterScope
      case Some(other) => throw new IllegalArgumentException(
        s"scope must be 'patient' or 'encounter', got '$other'")
    }
    val panels = childElems(root).map { p =>
      require(p.label == "panel",
        s"<cohort> children must be <panel>, got <${p.label}>")
      checkAttrs(p, panelAttrs)
      val concepts = childElems(p).map { c =>
        require(c.label == "concept",
          s"<panel> children must be <concept>, got <${c.label}>")
        checkAttrs(c, conceptAttrs)
        val codeKids = childElems(c)
        codeKids.foreach(k => require(k.label == "code",
          s"<concept> children must be <code>, got <${k.label}>"))
        Concept(
          eventType = attr(c, "eventType").getOrElse(
            throw new IllegalArgumentException("<concept> needs eventType")),
          minValue = attr(c, "minValue").map(_.toDouble),
          maxValue = attr(c, "maxValue").map(_.toDouble),
          codeIn =
            if (codeKids.isEmpty) None else Some(codeKids.map(_.text)),
          modifierPrefix = attr(c, "modifierPrefix"))
      }
      require(concepts.nonEmpty, "a panel needs >= 1 concept")
      Panel(
        concepts = concepts,
        minOccurrences = attr(p, "minOccurrences").map(_.toLong).getOrElse(1L),
        negated = attr(p, "negated").exists(_.toBoolean),
        perEncounter = attr(p, "perEncounter").exists(_.toBoolean))
    }
    require(panels.nonEmpty, "a cohort definition needs >= 1 panel")
    CohortDef(panels = panels, from = attr(root, "from"),
      until = attr(root, "until"), scope = scope)
  }

  def toXml(cd: CohortDef): String = {
    def conceptX(c: Concept): Elem = {
      val codes = c.codeIn.toSeq.flatten.map(v => <code>{v}</code>)
      val base = <concept eventType={c.eventType}>{codes}</concept>
      Seq[(String, Option[String])](
        "minValue" -> c.minValue.map(_.toString),
        "maxValue" -> c.maxValue.map(_.toString),
        "modifierPrefix" -> c.modifierPrefix
      ).foldLeft(base) { case (e, (k, v)) =>
        v.fold(e)(x => e % scala.xml.Attribute(None, k, scala.xml.Text(x), scala.xml.Null))
      }
    }
    def panelX(p: Panel): Elem =
      <panel minOccurrences={p.minOccurrences.toString}
             negated={p.negated.toString}
             perEncounter={p.perEncounter.toString}>{p.concepts.map(conceptX)}</panel>
    val scope = cd.scope match {
      case PatientScope   => "patient"
      case EncounterScope => "encounter"
    }
    val root0 = <cohort scope={scope}>{cd.panels.map(panelX)}</cohort>
    val root = Seq[(String, Option[String])](
      "from" -> cd.from, "until" -> cd.until
    ).foldLeft(root0) { case (e, (k, v)) =>
      v.fold(e)(x => e % scala.xml.Attribute(None, k, scala.xml.Text(x), scala.xml.Null))
    }
    Utility.serialize(Utility.trim(root): Node).toString
  }
}
