package graft.operators

import scala.xml.{Elem, Node, Text, Utility, XML}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** i2b2-style XML RESULT envelope — the response side of the wire
  * dialect whose request side [[PanelsXml]] already parses.
  *
  * The reference serves the i2b2 webclient through httpd → WildFly CRC
  * cells (/root/reference/generated/compose.yml:1,
  * src/docker/httpd/Dockerfile:1); the client POSTs a query_definition
  * and reads back a query RESULT INSTANCE: status + set size, the
  * patient set as id rows, and each breakdown as a column/value list
  * (the public i2b2 CRC messaging shape). Graft's cohort operators
  * emit DataFrames; this object closes the loop by rendering those
  * frames as that response document — and parsing it back, so the
  * round trip is spec-checkable without an app server.
  *
  * Deliberately a DELIVERY face, not a data-plane operator: the
  * patient-id list is collected to the driver BOUNDED by
  * `maxPatients` (i2b2's own webclient pages patient sets the same
  * way), while `setSize` always reports the TRUE distributed count.
  * Aggregate breakdowns (c17/c24-shaped: category, count) are
  * report-sized by construction.
  *
  * {{{
  * <queryResult name="panel_cohort" status="FINISHED" setSize="6">
  *   <patientSet truncated="false"><patientId>3</patientId>…</patientSet>
  *   <breakdown name="demographics">
  *     <data column="MACHINERY">2</data>…
  *   </breakdown>
  * </queryResult>
  * }}}
  *
  * Parsing is STRICT like PanelsXml's: unknown elements/attributes are
  * rejected loudly — a result document is an interchange contract, and
  * a silently dropped breakdown is a wrong report.
  */
object ResultEnvelope {

  final case class Result(
      queryName: String,
      status: String,
      setSize: Long,
      truncated: Boolean,
      patientIds: Seq[Long],
      breakdowns: Seq[(String, Seq[(String, Long)])])

  /** Render a patient-set frame (numeric id in its FIRST column; the
    * c13/c23b shape) plus optional (category, count) breakdown frames
    * (the c17/c24 shape) as the response document. Ids are emitted in
    * ascending order so the document is deterministic on any
    * partitioning.
    */
  def render(queryName: String, patients: DataFrame,
      breakdowns: Seq[(String, DataFrame)] = Seq.empty,
      maxPatients: Int = 100000): String = {
    val idCol = patients.columns.head
    // ONE distributed job for both the true set size and the id page:
    // per-partition (count, first-maxPatients ids) partials merged on
    // the driver. Two separate jobs (count() then limit().collect())
    // would re-execute the cohort plan twice AND could disagree if the
    // underlying saved set refreshes between them — an envelope whose
    // setSize contradicts its own id list.
    val partials = patients.select(col(idCol).cast("long")).rdd
      .mapPartitions { it =>
        var n = 0L
        // bounded max-heap keeping the partition's SMALLEST ids — the
        // page is the ascending prefix, like the orderBy/limit it
        // replaces, with per-task memory capped at maxPatients+1
        val heap = new java.util.PriorityQueue[java.lang.Long](
          java.util.Collections.reverseOrder[java.lang.Long]())
        it.foreach { r =>
          n += 1
          val v = r.getLong(0)
          if (heap.size <= maxPatients) heap.add(v)
          else if (v < heap.peek()) { heap.poll(); heap.add(v) }
        }
        Iterator.single((n,
          heap.toArray(Array.empty[java.lang.Long]).map(_.longValue)))
      }.collect()
    val setSize = partials.map(_._1).sum
    val ids = partials.flatMap(_._2).sorted.take(maxPatients)
    val truncated = setSize > ids.length
    val bx = breakdowns.map { case (name, df) =>
      val rows = df.collect().map(r =>
        (String.valueOf(r.get(0)), r.get(1).toString.toLong))
      <breakdown name={name}>{rows.map { case (c, n) =>
        <data column={c}>{n.toString}</data>
      }}</breakdown>
    }
    val root =
      <queryResult name={queryName} status="FINISHED"
          setSize={setSize.toString}>
        <patientSet truncated={truncated.toString}>{
          ids.map(i => <patientId>{i.toString}</patientId>)
        }</patientSet>{bx}
      </queryResult>
    Utility.serialize(Utility.trim(root): Node).toString
  }

  private def childElems(e: Elem): Seq[Elem] =
    e.child.collect { case c: Elem => c }

  private def checkAttrs(e: Elem, allowed: Set[String]): Unit = {
    val unknown = e.attributes.asAttrMap.keySet -- allowed
    require(unknown.isEmpty,
      s"unknown attribute(s) ${unknown.mkString("'", "', '", "'")} on " +
        s"<${e.label}> (allowed: ${allowed.toSeq.sorted.mkString(", ")})")
  }

  def parse(xml: String): Result = {
    val root = XML.loadString(xml)
    require(root.label == "queryResult",
      s"root must be <queryResult>, got <${root.label}>")
    checkAttrs(root, Set("name", "status", "setSize"))
    def need(a: String): String = root.attribute(a).map(_.text).getOrElse(
      throw new IllegalArgumentException(s"<queryResult> needs $a"))
    val kids = childElems(root)
    kids.foreach(k => require(k.label == "patientSet" || k.label == "breakdown",
      s"<queryResult> children must be <patientSet>|<breakdown>, got <${k.label}>"))
    val sets = kids.filter(_.label == "patientSet")
    require(sets.length == 1, "exactly one <patientSet> required")
    checkAttrs(sets.head, Set("truncated"))
    val ids = childElems(sets.head).map { p =>
      require(p.label == "patientId",
        s"<patientSet> children must be <patientId>, got <${p.label}>")
      checkAttrs(p, Set.empty)
      p.text.toLong
    }
    val bx = kids.filter(_.label == "breakdown").map { b =>
      checkAttrs(b, Set("name"))
      val name = b.attribute("name").map(_.text).getOrElse(
        throw new IllegalArgumentException("<breakdown> needs name"))
      name -> childElems(b).map { d =>
        require(d.label == "data",
          s"<breakdown> children must be <data>, got <${d.label}>")
        checkAttrs(d, Set("column"))
        (d.attribute("column").map(_.text).getOrElse(
          throw new IllegalArgumentException("<data> needs column")),
          d.text.toLong)
      }
    }
    Result(need("name"), need("status"), need("setSize").toLong,
      sets.head.attribute("truncated").exists(_.text.toBoolean), ids, bx)
  }
}
