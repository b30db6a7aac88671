package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** i2b2-style panel-query COMPILER — the reference's headline capability
  * as a reusable API, not a fixed query.
  *
  * An i2b2 CRC cohort definition (cf. the CRC cells shipped in the
  * reference's WildFly image) is a conjunction of panels; each panel is
  * a disjunction of concept predicates with an occurrence bound
  * ("at least N times"), optional negation ("patients WITHOUT ..."),
  * optional value constraints, inside an optional observation window.
  * Value constraints cover i2b2's NUMBER (range on nval_num ≈ `value`)
  * and TEXT (equality/IN on a coded value ≈ the `props.k` code) forms.
  *
  * Scoping mirrors i2b2's query timing: `PatientScope` ("occurs ever",
  * the default) vs `EncounterScope` ("same financial encounter" — every
  * panel must be satisfied within ONE shared visit). A patient with
  * a diagnosis in one ED visit and the triage code in another matches at
  * patient scope but NOT at encounter scope.
  *
  * Compilation strategy (the §5 scale rule): ONE conditional-aggregate
  * pass over the fact table — per panel one `count(when(...))` column —
  * then a HAVING-style conjunction. A k-panel query costs a single scan
  * + one shuffle on patient id regardless of k; never per-panel
  * self-joins. Encounter scope adds only a per-user re-aggregation of
  * the already-collapsed (user, encounter) rows — the second shuffle
  * moves one row per encounter, not per event.
  */
object Panels {

  /** One concept predicate: event type + optional value constraints
    * (numeric range [minValue, maxValue) on `value`; categorical
    * code-equality against the `props.k` coded value) + an optional
    * modifier-SUBTREE constraint (i2b2 modifier_dimension: facts carry a
    * modifier_cd, modifiers live in a path hierarchy, and a panel
    * concept may require its facts' modifier to fall under a path
    * prefix — "diagnosis X WITH modifier under \\MOD\\principal\\").
    * Requires a `modifier_path` column (cf. withModifiers).
    */
  case class Concept(eventType: String, minValue: Option[Double] = None,
      maxValue: Option[Double] = None, codeIn: Option[Seq[String]] = None,
      modifierPrefix: Option[String] = None)

  /** OR of concepts with an occurrence bound, or a NOT-panel (zero
    * matching events). `perEncounter` counts occurrences as DISTINCT
    * visits containing a match (i2b2's "in at least N separate
    * encounters") instead of raw fact count — requires an encounter_id
    * column (cf. withEncounters).
    */
  case class Panel(concepts: Seq[Concept], minOccurrences: Long = 1,
      negated: Boolean = false, perEncounter: Boolean = false)

  /** Panel conjunction scope: per patient (ever) or per encounter (all
    * panels inside one shared visit).
    */
  sealed trait Scope
  case object PatientScope extends Scope
  case object EncounterScope extends Scope

  /** AND of panels over an optional [from, until) event-time window. */
  case class CohortDef(panels: Seq[Panel], from: Option[String] = None,
      until: Option[String] = None, scope: Scope = PatientScope)

  /** Fail fast with an actionable message when a definition carries
    * modifier constraints but the fact frame was never joined through
    * [[withModifiers]] — otherwise the compile dies later with an
    * unresolved-column error deep inside the aggregate (the same
    * loud-but-misleading failure PanelsJson's strict keys guard
    * against for typos).
    */
  private[graft] def requireModifierSupport(df: DataFrame,
      panels: Seq[Panel]): Unit =
    require(
      !panels.exists(_.concepts.exists(_.modifierPrefix.isDefined)) ||
        df.columns.contains("modifier_path"),
      "modifierPrefix constraints need a modifier_path column — pass " +
        "the fact frame through withModifiers(events, modifierDim) first")

  private[graft] def conceptMatch(c: Concept): Column = Seq(
    Some(col("event_type") === c.eventType),
    c.minValue.map(col("value") >= _),
    c.maxValue.map(col("value") < _),
    c.codeIn.map(vs =>
      get_json_object(col("props"), "$.k").isin(vs: _*)),
    c.modifierPrefix.map(p => col("modifier_path").startsWith(p)))
    .flatten.reduce(_ && _)

  /** Derive a visit (encounter) id by 30-minute-gap sessionization — the
    * ED-visit proxy over a fact table with no explicit visit dimension
    * (same rule as Cohort.c09). A fact table that already carries an
    * `encounter_id` column skips this and feeds `cohort` directly.
    */
  def withEncounters(eventsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsDf
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("encounter_id", sum(col("is_new")).over(wCum))
      .drop("prev_us", "is_new")
  }

  /** Compile a cohort definition against an `events`-shaped frame.
    *
    * PatientScope output: user_id + one `p<i>` occurrence count per
    * panel, filtered to qualifying users. EncounterScope (requires an
    * `encounter_id` column, cf. withEncounters): user_id +
    * n_encounters (qualifying visits) + per-panel counts summed over
    * the qualifying visits.
    */
  def cohort(eventsDf: DataFrame, cd: CohortDef): DataFrame = {
    requireModifierSupport(eventsDf, cd.panels)
    val windowed = Seq(
      cd.from.map(f => col("ts") >= lit(f).cast("timestamp")),
      cd.until.map(u => col("ts") < lit(u).cast("timestamp")))
      .flatten.foldLeft(eventsDf)(_ filter _)
    val panelCols = cd.panels.zipWithIndex.map { case (p, i) =>
      val matches = p.concepts.map(conceptMatch).reduce(_ || _)
      val c =
        if (p.perEncounter) countDistinct(when(matches, col("encounter_id")))
        else count(when(matches, 1))
      c.as(s"p$i")
    }
    val qualifies = cd.panels.zipWithIndex.map { case (p, i) =>
      if (p.negated) col(s"p$i") === 0 else col(s"p$i") >= p.minOccurrences
    }.reduce(_ && _)
    cd.scope match {
      case PatientScope =>
        windowed
          .groupBy(col("user_id"))
          .agg(panelCols.head, panelCols.tail: _*)
          .filter(qualifies)
      case EncounterScope =>
        val rollup = count(lit(1)).as("n_encounters") +:
          cd.panels.indices.map(i => sum(col(s"p$i")).as(s"p$i"))
        windowed
          .groupBy(col("user_id"), col("encounter_id"))
          .agg(panelCols.head, panelCols.tail: _*)
          .filter(qualifies)
          .groupBy(col("user_id"))
          .agg(rollup.head, rollup.tail: _*)
    }
  }

  /** i2b2 "previous result" composition: restrict a cohort definition
    * to an existing PATIENT SET (the saved result of an earlier query) —
    * the CRC's query-in-query face. One broadcast semi-join narrows the
    * fact scan to set members BEFORE the one-pass compile, so at 100 TB
    * the second query reads only the (small) cohort's facts, and panel
    * counts are computed over exactly the same rows a standalone run
    * would see.
    */
  def cohortWithPatientSet(eventsDf: DataFrame, cd: CohortDef,
      patientSet: DataFrame): DataFrame =
    cohort(eventsDf.join(
      broadcast(patientSet.select("user_id")), Seq("user_id"), "left_semi"), cd)

  /** CONSORT-style attrition flow — the eligibility ladder every study
    * protocol reports: panels applied IN ORDER, with the count of
    * patients still eligible after each step (step 0 = everyone
    * assessed, i.e. any fact in the window). The naive form runs K
    * cohort queries (K fact scans); this compiles the whole ladder into
    * the SAME one-pass shape as [[cohort]]: one conditional-aggregate
    * scan gives every per-user panel count, the prefix conjunctions are
    * free column arithmetic on the collapsed user frame, and ONE final
    * rollup emits all K+1 survivor counts — a K-step ladder costs
    * exactly one fact scan + one user_id shuffle, independent of K.
    * PatientScope only (a ladder is a patient-level construct).
    */
  def attrition(eventsDf: DataFrame, cd: CohortDef): DataFrame = {
    require(cd.scope == PatientScope, "attrition is a patient-level ladder")
    requireModifierSupport(eventsDf, cd.panels)
    val windowed = Seq(
      cd.from.map(f => col("ts") >= lit(f).cast("timestamp")),
      cd.until.map(u => col("ts") < lit(u).cast("timestamp")))
      .flatten.foldLeft(eventsDf)(_ filter _)
    val panelCols = cd.panels.zipWithIndex.map { case (p, i) =>
      count(when(p.concepts.map(conceptMatch).reduce(_ || _), 1)).as(s"p$i")
    }
    val perUser = windowed.groupBy(col("user_id"))
      .agg(panelCols.head, panelCols.tail: _*)
    val quals = cd.panels.zipWithIndex.map { case (p, i) =>
      if (p.negated) col(s"p$i") === 0 else col(s"p$i") >= p.minOccurrences
    }
    // survived(step i) = panels 0..i-1 all hold — monotone prefix ANDs
    val prefixes = quals.scanLeft(lit(true))(_ && _)
    val steps = prefixes.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"n$i")
    }
    perUser.agg(steps.head, steps.tail: _*)
      .select(posexplode(array(prefixes.indices.map(i => col(s"n$i")): _*))
        .as(Seq("step", "n_surviving")))
      .transform(Gate.ordered("step"))
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

  // -- c13b: value-constraint breadth (numeric range + categorical code) --
  // Panel 1: at least 2 purchases with value in [50, 150); panel 2: at
  // least one click whose coded value (props.k, i2b2 tval_char-style) is
  // in a 10-code set — over the first two weeks.
  val c13bDef: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("purchase", minValue = Some(50.0),
        maxValue = Some(150.0))), minOccurrences = 2),
      Panel(Seq(Concept("click",
        codeIn = Some((1 to 10).map(_.toString)))))),
    from = Some("2024-01-01"), until = Some("2024-01-15"))

  def c13b(s: SparkSession, d: String): DataFrame =
    cohort(events(s, d), c13bDef).transform(Gate.ordered("user_id"))

  // -- c13c: panels over a patient-bucketed fact table -------------------
  // The deployment layout for the i2b2 face at 100 TB: observation_fact
  // stored bucketBy(patient). Every panel query groups by patient, so
  // the ONE shuffle a panel query normally pays disappears — the
  // conditional-aggregate pass runs entirely shuffle-free on co-located
  // buckets. Same src03 technique, applied to the engine's most-used
  // query family. PanelsSpec asserts the aggregation plan contains NO
  // Exchange; the oracle (shared with c13) proves identical results.

  private def sanitizeTag(d: String): String = graft.Scratch.tag(d)

  private def scratch: String = graft.Scratch.dir

  /** Build-if-absent the patient-bucketed events table. */
  def ensureBucketedEvents(s: SparkSession, d: String): String = {
    val nb = graft.GraftConf.indexBuckets(s)
    val name = s"graft_events_by_user_${sanitizeTag(d)}_b$nb"
    if (!s.catalog.tableExists(name)) {
      events(s, d).write.mode("overwrite")
        .bucketBy(nb, "user_id").sortBy("user_id")
        .option("path", s"$scratch/events_by_user/${sanitizeTag(d)}_b$nb")
        .saveAsTable(name)
    }
    name
  }

  def c13c(s: SparkSession, d: String): DataFrame =
    cohort(s.table(ensureBucketedEvents(s, d)), c13Def)
      .transform(Gate.ordered("user_id"))

  // -- c14: same-encounter scoping ---------------------------------------
  // "High-value purchase AND click in the SAME visit" — the i2b2
  // same-encounter timing an ED analyst hits constantly ("diagnosis X
  // AND triage Y in the same ED visit"). Patients whose purchase and
  // click occur only in different visits are excluded (PanelsSpec proves
  // the exclusion on a hand-built frame).
  val c14Def: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("purchase", minValue = Some(100.0)))),
      Panel(Seq(Concept("click")))),
    scope = EncounterScope)

  def c14(s: SparkSession, d: String): DataFrame =
    cohort(withEncounters(events(s, d)), c14Def)
      .transform(Gate.ordered("user_id"))

  // -- c14b: occurrence over distinct encounters -------------------------
  // "Purchases in at least 3 SEPARATE visits, and no errors" over the
  // first week — i2b2's per-encounter occurrence constraint (3 purchases
  // inside one visit do not qualify; the spec proves the distinction).
  val c14bDef: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("purchase")), minOccurrences = 3, perEncounter = true),
      Panel(Seq(Concept("error")), negated = true)),
    from = Some("2024-01-01"), until = Some("2024-01-08"))

  def c14b(s: SparkSession, d: String): DataFrame =
    cohort(withEncounters(events(s, d)), c14bDef)
      .transform(Gate.ordered("user_id"))

  // -- c14c: same-encounter scoping over an EXPLICIT visit dimension ------
  // The i2b2-migration face of c14: a real CRC load ships an explicit
  // visit_dimension table (encounter_num is DATA), not a derived
  // sessionization. Here orders plays visit_dimension (o_orderkey =
  // encounter_num, o_custkey = patient_num) and lineitem plays
  // observation_fact — the SAME cohort() compile runs unchanged on a
  // frame whose encounter_id arrives by join, with NO window/lag
  // anywhere in the plan, proving the panel machinery independent of
  // the visit definition (PanelsSpec crosses derived vs explicit on a
  // frame where both agree). Panels: a returned line (l_returnflag R)
  // with quantity >= 30 AND an accepted line (N) in the SAME order.
  // At 100 TB the fact→visit join is a plain orderkey equi-join (AQE-
  // splittable, co-locatable by bucketing both tables on the key).
  val c14cDef: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("R", minValue = Some(30.0)))),
      Panel(Seq(Concept("N")))),
    scope = EncounterScope)

  /** lineitem + orders as an events-shaped fact frame carrying an
    * EXPLICIT encounter_id (the visit id is data, not a session rule).
    */
  private[graft] def explicitEncounterFacts(s: SparkSession, d: String)
      : DataFrame =
    lineitem(s, d).select(col("l_orderkey").as("encounter_id"),
        col("l_returnflag").as("event_type"),
        col("l_quantity").as("value"))
      .join(orders(s, d).select(col("o_orderkey").as("encounter_id"),
        col("o_custkey").as("user_id")), "encounter_id")

  def c14c(s: SparkSession, d: String): DataFrame =
    cohort(explicitEncounterFacts(s, d), c14cDef)
      .transform(Gate.ordered("user_id"))

  // -- c26: modifier-dimension constraints -------------------------------

  /** The modifier dimension as a (modifier_cd, modifier_path) frame —
    * i2b2's modifier_dimension is exactly such a small static mapped
    * table (cf. the CRC star schema in the reference's database image).
    * Here the fact's coded value (`props.k`, the same code c13b treats
    * as tval_char) doubles as modifier_cd, and the hierarchy groups
    * codes by decade: code k lives at `/mod/g<k/10>/<k>/`. Paths end
    * with '/' so a subtree prefix can never match across a path-
    * component boundary (the i2b2 trailing-backslash convention).
    */
  def modifierDim(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 to 99).map(k => (k.toString, s"/mod/g${k / 10}/$k/"))
      .toDF("modifier_cd", "modifier_path")
  }

  /** Attach `modifier_path` to a fact frame via a BROADCAST left join
    * against the (tiny) modifier dimension — the 100 TB fact scan never
    * shuffles for it. Facts whose code is absent from the dimension get
    * a null path: every modifier constraint fails on them (they still
    * satisfy unconstrained concepts), mirroring i2b2's inner modifier
    * join semantics without dropping the fact row for other panels.
    */
  def withModifiers(eventsDf: DataFrame, dim: DataFrame): DataFrame =
    eventsDf.join(
      broadcast(dim),
      get_json_object(col("props"), "$.k") === dim("modifier_cd"),
      "left")
      .drop("modifier_cd")

  // "at least 2 purchases whose modifier falls under /mod/g3/ (codes
  // 30-39), and at least one click" over January — a panel mixing a
  // modifier-constrained concept with a plain one.
  val c26Def: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("purchase", modifierPrefix = Some("/mod/g3/"))),
        minOccurrences = 2),
      Panel(Seq(Concept("click")))),
    from = Some("2024-01-01"), until = Some("2024-02-01"))

  def c26(s: SparkSession, d: String): DataFrame =
    cohort(withModifiers(events(s, d), modifierDim(s)), c26Def)
      .transform(Gate.ordered("user_id"))

  // -- c23: query-in-query — c13's definition over c01's patient set -----
  def c23(s: SparkSession, d: String): DataFrame =
    cohortWithPatientSet(events(s, d), c13Def,
      graft.operators.Cohort.c01Core(s, d).select("user_id"))
      .transform(Gate.ordered("user_id"))

  // -- c23b: the i2b2 QT result lifecycle — run once, reuse many times ---
  // c23 recomputes its "previous result" inline on every call; the CRC
  // actually MATERIALIZES each query's patient set into a QT result
  // table (qt_patient_set_collection in the i2b2 schema the
  // reference's database image carries) and every later query-in-query
  // reads the saved table. saveCohort is that face: the set persists
  // bucketed+sorted by user_id — the key every reuse joins on — so a
  // 100 TB deployment pays the cohort compute once and each reuse is a
  // semi-join against a pre-sorted slim table (two columns would even
  // co-locate with the c13c bucketed facts with zero exchange).

  /** Persist a patient set under a name; returns the table. Replay-
    * stable: a second save of the same name is a no-op (PanelsSpec
    * proves the file listing is bit-stable), matching QT semantics —
    * a result, once saved, is immutable; new runs get new names.
    *
    * Immutability covers the PHYSICAL layout too: unlike the ensure*
    * index builders (whose names encode geometry so conf changes
    * rebuild), a QT name is user-facing and its contract is the SET,
    * not the layout — a set saved under an older
    * spark.graft.index.buckets keeps that layout on reuse. That is
    * semantically safe (reuse broadcasts the slim set; bucketing is a
    * bonus for co-located joins, not load-bearing), and re-deriving a
    * differently-bucketed copy is just a save under a new name.
    */
  def saveCohort(s: SparkSession, name: String,
      patientSet: DataFrame): String = {
    val table = s"graft_qt_$name"
    if (!s.catalog.tableExists(table)) {
      patientSet.select("user_id").write.mode("overwrite")
        .bucketBy(graft.GraftConf.indexBuckets(s), "user_id")
        .sortBy("user_id")
        .option("path", s"$scratch/qt_sets/$name")
        .saveAsTable(table)
    }
    table
  }

  /** c13's definition over the SAVED c01 patient set: must hash-match
    * c23 exactly, but the plan reads the QT table — PanelsSpec asserts
    * a single events scan (no recompute of the saved query).
    */
  def c23b(s: SparkSession, d: String): DataFrame = {
    val t = saveCohort(s, s"c01_${sanitizeTag(d)}",
      graft.operators.Cohort.c01Core(s, d).select("user_id"))
    cohortWithPatientSet(events(s, d), c13Def, s.table(t))
      .transform(Gate.ordered("user_id"))
  }

  // -- c23c: set algebra over saved results (QT AND/OR/NOT composition) --
  // The i2b2 webclient lets a user COMBINE previous query results —
  // "patients in result A and result B but not C" — before running new
  // panels over the combination. With saveCohort providing the saved
  // results, the algebra is Spark's own set operators over the slim
  // (user_id) tables; the combined set then feeds the same broadcast
  // semi-join composition every patient-set path uses. Sets are
  // result-table-sized (thousands of ids at 100 TB, not facts), so
  // the algebra is a rounding error next to the fact scan it narrows.

  /** intersect/union/except over saved QT tables, by name. */
  def combineCohorts(s: SparkSession, op: String, names: String*)
      : DataFrame = {
    require(names.nonEmpty, "set algebra needs at least one saved result")
    val sets = names.map(n => s.table(n).select("user_id"))
    op match {
      case "and" => sets.reduce(_ intersect _)
      case "or"  => sets.reduce(_ union _).distinct()
      case "not" => sets.reduce(_ except _) // first minus the rest
      case other => throw new IllegalArgumentException(
        s"unknown set op '$other' (and | or | not)")
    }
  }

  /** c13's panels over (saved c01 result AND saved demographic
    * result) — the QT composition face end to end. The oracle is
    * c23's with the IN-subquery replaced by the INTERSECT of the two
    * saved queries' SQL.
    */
  def c23c(s: SparkSession, d: String): DataFrame = {
    val a = saveCohort(s, s"c01_${sanitizeTag(d)}",
      graft.operators.Cohort.c01Core(s, d).select("user_id"))
    val b = saveCohort(s, s"demo_${sanitizeTag(d)}",
      patients(customer(s, d), c24Filter))
    cohortWithPatientSet(events(s, d), c13Def,
      combineCohorts(s, "and", a, b))
      .transform(Gate.ordered("user_id"))
  }

  // -- c24: patient_dimension panel constraints --------------------------

  /** i2b2 demographic predicates over the patient dimension (an i2b2
    * panel can mix patient_dimension concepts — age range, gender,
    * vital status — with fact concepts; cf. the CRC star schema in the
    * reference's database image). Here `customer` plays
    * patient_dimension: market segment ≈ demographic group, nation ≈
    * geography, account balance ≈ a numeric patient attribute.
    */
  case class PatientFilter(segmentIn: Option[Seq[String]] = None,
      nationIn: Option[Seq[Long]] = None, minBalance: Option[Double] = None,
      maxBalance: Option[Double] = None)

  /** Compile a demographic filter to its qualifying patient-key set.
    * The dimension is small relative to facts, so downstream
    * composition via [[cohortWithPatientSet]] broadcasts it — the fact
    * scan never joins the dimension row-by-row at 100 TB.
    */
  def patients(patientDim: DataFrame, pf: PatientFilter): DataFrame = Seq(
    pf.segmentIn.map(vs => col("c_mktsegment").isin(vs: _*)),
    pf.nationIn.map(vs => col("c_nationkey").isin(vs: _*)),
    pf.minBalance.map(col("c_acctbal") >= _),
    pf.maxBalance.map(col("c_acctbal") < _))
    .flatten.foldLeft(patientDim)(_ filter _)
    .select(col("c_custkey").as("user_id"))

  // c13's fact panels restricted to three demographic segments with a
  // non-negative balance — a strict, non-empty subset of c13 at both
  // test SFs (PanelsSpec proves membership = intersection).
  val c24Filter: PatientFilter = PatientFilter(
    segmentIn = Some(Seq("AUTOMOBILE", "BUILDING", "MACHINERY")),
    minBalance = Some(0.0))

  def c24(s: SparkSession, d: String): DataFrame =
    cohortWithPatientSet(events(s, d), c13Def,
      patients(customer(s, d), c24Filter))
      .transform(Gate.ordered("user_id"))

  // -- c25: anchored temporal panels -------------------------------------

  /** i2b2 temporal query builder: panels evaluated RELATIVE to a
    * per-patient anchor event ("within N days after the FIRST
    * occurrence of X") rather than a fixed calendar window. The CRC
    * builds these as anchor-derivation + constrained panels; here the
    * anchor (first matching ts) is a whole-partition window min over
    * user_id, the relative window is a filter against it, and the
    * panel compile is the same conditional-aggregate pass — the window
    * and the aggregation share ONE shuffle on user_id (PanelsSpec
    * asserts a single Exchange), so the anchored form costs exactly
    * what a calendar-window cohort costs at 100 TB.
    */
  def anchoredCohort(eventsDf: DataFrame, anchor: Concept, days: Int,
      panels: Seq[Panel]): DataFrame = {
    require(!panels.exists(_.perEncounter),
      "anchored compile counts facts, not encounters — combine " +
        "withEncounters + cohort(EncounterScope) for per-visit bounds")
    requireModifierSupport(eventsDf,
      Panel(Seq(anchor)) +: panels)
    val w = Window.partitionBy("user_id")
    val anchored = eventsDf
      .withColumn("anchor_ts",
        min(when(conceptMatch(anchor), col("ts"))).over(w))
      .filter(col("anchor_ts").isNotNull &&
        col("ts") >= col("anchor_ts") &&
        col("ts") < col("anchor_ts") + expr(s"INTERVAL '$days' DAY"))
    val panelCols = panels.zipWithIndex.map { case (p, i) =>
      count(when(p.concepts.map(conceptMatch).reduce(_ || _), 1)).as(s"p$i")
    }
    val qualifies = panels.zipWithIndex.map { case (p, i) =>
      if (p.negated) col(s"p$i") === 0 else col(s"p$i") >= p.minOccurrences
    }.reduce(_ && _)
    anchored
      .groupBy(col("user_id"))
      .agg(date_format(min(col("anchor_ts")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("anchor"),
        panelCols: _*)
      .filter(qualifies)
  }

  // "within one week of first signup: at least 2 substantial purchases
  // and at least 5 clicks" — non-vacuous at every test SF
  def c25(s: SparkSession, d: String): DataFrame =
    anchoredCohort(events(s, d), Concept("signup"), 7, Seq(
      Panel(Seq(Concept("purchase", minValue = Some(50.0))),
        minOccurrences = 2),
      Panel(Seq(Concept("click")), minOccurrences = 5)))
      .transform(Gate.ordered("user_id"))

  // -- c29: the SQL front door -------------------------------------------
  // The reference's analysts reach the CRC in SQL (i2b2 webclient →
  // CRC cells, cf. compose.yml httpd/wildfly services); graft's
  // equivalent is the graft_cohort TABLE FUNCTION (GraftExtensions): a
  // PanelsJson wire document placed inside ordinary SQL, compiled at
  // resolution time into the SAME one-pass Panels.cohort plan — no
  // Scala anywhere in the user's query. c29 runs c13's exact
  // definition through the SQL surface over the registered views; the
  // oracle is c13's, so the SQL face is proven hash-identical to the
  // API face.
  def c29(s: SparkSession, d: String): DataFrame = {
    graft.Tables.registerViews(s, d)
    val doc = PanelsJson.toJson(c13Def).replace("'", "''")
    s.sql(s"SELECT * FROM graft_cohort('$doc')")
      .transform(Gate.ordered("user_id"))
  }

  // -- c46: attrition flow under the gate ----------------------------------
  // c01's eligibility criteria unrolled into a ladder (assessed →
  // engaged → paying → clean record): each prefix's survivor count is
  // re-derived independently by the oracle, so the one-pass compile
  // must agree with K separate cohort queries at every step — and the
  // final rung must equal the standalone c01 cohort (PanelsSpec pins
  // that equality against the independently oracle-checked operator).
  val c46Def: CohortDef = CohortDef(
    panels = Seq(
      Panel(Seq(Concept("signup"), Concept("view"))),
      Panel(Seq(Concept("purchase")), minOccurrences = 2),
      Panel(Seq(Concept("error")), negated = true)),
    from = Some("2024-01-01"), until = Some("2024-01-08"))

  def c46(s: SparkSession, d: String): DataFrame =
    attrition(events(s, d), c46Def)

  private val C46_SQL =
    """WITH f AS (
      | SELECT user_id,
      |  COUNT(CASE WHEN event_type IN ('signup', 'view') THEN 1 END) AS p0,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS p1,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p2
      | FROM events
      | WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      | GROUP BY user_id)
      |SELECT 0 AS step, COUNT(*) AS n_surviving FROM f
      |UNION ALL SELECT 1, COUNT(*) FROM f WHERE p0 >= 1
      |UNION ALL SELECT 2, COUNT(*) FROM f WHERE p0 >= 1 AND p1 >= 2
      |UNION ALL SELECT 3, COUNT(*) FROM f
      | WHERE p0 >= 1 AND p1 >= 2 AND p2 = 0
      |ORDER BY step""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c46_attrition_flow" -> (c46 _),
    "c13_panel_cohort_api" -> (c13 _),
    "c13b_panel_value_constraints" -> (c13b _),
    "c13c_panel_prebucketed" -> (c13c _),
    "c29_sql_cohort" -> (c29 _),
    "c14_panel_same_encounter" -> (c14 _),
    "c14b_panel_distinct_encounters" -> (c14b _),
    "c14c_explicit_encounter" -> (c14c _),
    "c23_patient_set_panel" -> (c23 _),
    "c23b_saved_patient_set" -> (c23b _),
    "c23c_patient_set_algebra" -> (c23c _),
    "c24_panel_demographic" -> (c24 _),
    "c25_anchored_panels" -> (c25 _),
    "c26_panel_modifiers" -> (c26 _)
  )

  private val C13_SQL =
    """SELECT user_id,
      | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
      |   OR event_type = 'click' THEN 1 END) AS p0,
      | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      |GROUP BY user_id
      |HAVING p0 >= 3 AND p1 = 0
      |ORDER BY user_id""".stripMargin

  // c13's panels evaluated only over members of c01's patient set —
  // the IN-subquery is the saved previous result
  private val C23_SQL =
    """SELECT user_id,
      | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
      |   OR event_type = 'click' THEN 1 END) AS p0,
      | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      | AND user_id IN (
      |  SELECT user_id FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      |  GROUP BY user_id
      |  HAVING (COUNT(CASE WHEN event_type = 'signup' THEN 1 END) >= 1
      |    OR COUNT(CASE WHEN event_type = 'view' THEN 1 END) >= 1)
      |   AND COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 2
      |   AND COUNT(CASE WHEN event_type = 'error' THEN 1 END) = 0)
      |GROUP BY user_id
      |HAVING p0 >= 3 AND p1 = 0
      |ORDER BY user_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // every prefix's survivor count re-derived as its own filtered
    // aggregate — the one-pass ladder must match K separate queries
    "c46_attrition_flow" -> C46_SQL,
    // explicit visit dimension: encounter_id is the order key (data,
    // not a session rule) — no window function anywhere
    "c14c_explicit_encounter" ->
      """WITH f AS (
        | SELECT o.o_custkey AS user_id, l.l_orderkey AS encounter_id,
        |  l.l_returnflag AS event_type, l.l_quantity AS value
        | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |enc AS (
        | SELECT user_id, encounter_id,
        |  COUNT(CASE WHEN event_type = 'R' AND value >= 30.0
        |   THEN 1 END) AS p0,
        |  COUNT(CASE WHEN event_type = 'N' THEN 1 END) AS p1
        | FROM f GROUP BY 1, 2
        | HAVING p0 >= 1 AND p1 >= 1)
        |SELECT user_id, COUNT(*) AS n_encounters,
        | CAST(SUM(p0) AS BIGINT) AS p0, CAST(SUM(p1) AS BIGINT) AS p1
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    "c23_patient_set_panel" -> C23_SQL,
    // the saved-set path must answer EXACTLY like the inline path
    "c23b_saved_patient_set" -> C23_SQL,
    // QT set algebra: the IN-subquery is the INTERSECT of the two
    // saved queries' defining SQL
    "c23c_patient_set_algebra" ->
      """SELECT user_id,
        | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
        |   OR event_type = 'click' THEN 1 END) AS p0,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        | AND user_id IN (
        |  SELECT user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY user_id
        |  HAVING (COUNT(CASE WHEN event_type = 'signup' THEN 1 END) >= 1
        |    OR COUNT(CASE WHEN event_type = 'view' THEN 1 END) >= 1)
        |   AND COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 2
        |   AND COUNT(CASE WHEN event_type = 'error' THEN 1 END) = 0
        |  INTERSECT
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        |   AND c_acctbal >= 0.0)
        |GROUP BY user_id
        |HAVING p0 >= 3 AND p1 = 0
        |ORDER BY user_id""".stripMargin,
    // c13's fact panels over patients passing the demographic filter —
    // the IN-subquery is the compiled patient_dimension constraint
    "c24_panel_demographic" ->
      """SELECT user_id,
        | COUNT(CASE WHEN (event_type = 'purchase' AND value >= 100.0)
        |   OR event_type = 'click' THEN 1 END) AS p0,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        | AND user_id IN (
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        |   AND c_acctbal >= 0.0)
        |GROUP BY user_id
        |HAVING p0 >= 3 AND p1 = 0
        |ORDER BY user_id""".stripMargin,
    // anchor = first signup; panels counted inside [anchor, anchor+7d)
    "c25_anchored_panels" ->
      """WITH a AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS anchor_ts
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id,
        | strftime(min(a.anchor_ts), '%Y-%m-%d %H:%M:%S.%f') AS anchor,
        | COUNT(CASE WHEN event_type = 'purchase' AND value >= 50.0
        |   THEN 1 END) AS p0,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS p1
        |FROM events e JOIN a USING (user_id)
        |WHERE a.anchor_ts IS NOT NULL AND e.ts >= a.anchor_ts
        | AND e.ts < a.anchor_ts + INTERVAL 7 DAY
        |GROUP BY e.user_id
        |HAVING p0 >= 2 AND p1 >= 5
        |ORDER BY user_id""".stripMargin,
    // the modifier path is reconstructed inline from the code exactly as
    // modifierDim lays it out, and the constraint is the same prefix test
    "c26_panel_modifiers" ->
      """SELECT user_id, p0, p1 FROM (
        | SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'purchase'
        |    AND starts_with('/mod/g'
        |      || (CAST(props->>'$.k' AS INT) // 10) || '/'
        |      || (props->>'$.k') || '/', '/mod/g3/') THEN 1 END) AS p0,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS p1
        | FROM events
        | WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        | GROUP BY user_id)
        |WHERE p0 >= 2 AND p1 >= 1
        |ORDER BY user_id""".stripMargin,
    "c13_panel_cohort_api" -> C13_SQL,
    // identical definition, identical results — only the storage layout
    // (and the resulting shuffle-free plan) differs
    "c13c_panel_prebucketed" -> C13_SQL,
    // identical definition submitted through the graft_cohort SQL table
    // function — the front door must hash-match the API compile
    "c29_sql_cohort" -> C13_SQL,
    "c13b_panel_value_constraints" -> {
      val codes = (1 to 10).map(c => s"'$c'").mkString(", ")
      s"""SELECT user_id,
         | COUNT(CASE WHEN event_type = 'purchase'
         |   AND value >= 50.0 AND value < 150.0 THEN 1 END) AS p0,
         | COUNT(CASE WHEN event_type = 'click'
         |   AND (props->>'$$.k') IN ($codes) THEN 1 END) AS p1
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
         |GROUP BY user_id
         |HAVING p0 >= 2 AND p1 >= 1
         |ORDER BY user_id""".stripMargin
    },
    // same 30-min sessionization as c09, then the panel conjunction per
    // (user, encounter) and a per-user roll-up of qualifying visits
    "c14_panel_same_encounter" ->
      """WITH se AS (
        | SELECT user_id, event_type, value,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS encounter_id
        | FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |   CASE WHEN prev_us IS NULL
        |     OR epoch_us(ts) - prev_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM (SELECT user_id, event_id, ts, event_type, value,
        |    LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS prev_us
        |   FROM events))),
        |enc AS (
        | SELECT user_id, encounter_id,
        |  COUNT(CASE WHEN event_type = 'purchase' AND value >= 100.0
        |   THEN 1 END) AS p0,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS p1
        | FROM se GROUP BY 1, 2
        | HAVING p0 >= 1 AND p1 >= 1)
        |SELECT user_id, COUNT(*) AS n_encounters,
        | CAST(SUM(p0) AS BIGINT) AS p0, CAST(SUM(p1) AS BIGINT) AS p1
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    // same sessionization, then per-user: distinct purchase-visits vs
    // raw error count over the windowed week
    "c14b_panel_distinct_encounters" ->
      """WITH se AS (
        | SELECT user_id, event_type, ts,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS encounter_id
        | FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |   CASE WHEN prev_us IS NULL
        |     OR epoch_us(ts) - prev_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM (SELECT user_id, event_id, ts, event_type,
        |    LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS prev_us
        |   FROM events)))
        |SELECT user_id,
        | COUNT(DISTINCT CASE WHEN event_type = 'purchase'
        |   THEN encounter_id END) AS p0,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS p1
        |FROM se
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY user_id
        |HAVING p0 >= 3 AND p1 = 0
        |ORDER BY user_id""".stripMargin
  )
}
