package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — the clinical "what was active at the time
  * of this observation" family (i2b2 temporal queries relate facts to
  * the encounter/medication/state current at their timestamp).
  *
  * Spark has no ASOF or range join operator; the naive formulations
  * (inequality join conditions) degenerate to BroadcastNestedLoopJoin —
  * quadratic work, the classic 100 TB trap. Both operators here are
  * re-expressed as ONE equi-shuffle plus local work:
  *
  *  - asofJoin: union both sides, one window pass per key ordered by
  *    time — each left row picks up the latest right row at-or-before
  *    it via last(ignoreNulls). One shuffle + one sort, zero joins.
  *  - q26 binned range join: quantize time into bins sized to the range
  *    width; a range predicate then only spans 2 adjacent bins, so an
  *    equi-join on (key, bin) + exact residual filter replaces the
  *    nested loop. Amplification is bounded (2 bins per probe row).
  */
object Temporal {

  private val TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val TS_FMT_SQL = "%Y-%m-%d %H:%M:%S.%f"

  /** As-of join: each `left` row gains the payload of the latest `right`
    * row with the same keys and `rightTs` <= `leftTs` (nulls if none).
    * Payload = right's non-key, non-ts columns; their names must not
    * collide with left's.
    *
    * One shuffle on `keys`, one per-partition sort on (__ts, side) —
    * right rows sort before left rows at equal timestamps, so "<=" holds
    * inclusively. Ties among right rows at the same (keys, ts) are
    * resolved arbitrarily (sub-microsecond collisions; supply a
    * tie-breaking payload column if the source can produce them).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val pick = right.columns.filterNot(keys.contains).filterNot(_ == rightTs)
    val internal = Seq("__ts", "__r", "__p", "__rts")
    val collisions = (pick.toSet & left.columns.toSet) ++
      internal.filter(c => left.columns.contains(c) || right.columns.contains(c))
    require(collisions.isEmpty,
      s"column collision (right payload vs left, or reserved __ts/__r/__p/__rts): $collisions")
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__r", lit(0))
    // equality-join semantics: null keys never match, and a null right
    // timestamp can never satisfy rightTs <= leftTs — both kinds of row
    // contribute nothing (null-key left rows pass through with a null
    // payload — they partition alone)
    val r = right.filter(
        (keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
      .withColumn("__ts", col(rightTs)).drop(rightTs)
      .withColumn("__r", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the payload is carried as ONE struct per right row (its ts
    // included), so the left row picks up the latest right ROW
    // atomically — per-column last() would tear multi-column payloads
    // across rows and resurrect older values under nulls
    val payload = struct(pick.map(col) :+ col("__ts").as("__rts"): _*)
    val filled = u.withColumn("__p",
      last(when(col("__r") === 1, payload), ignoreNulls = true).over(w))
    // tolerance: the picked ROW must be no staler than toleranceUs
    // (pandas merge_asof's tolerance) — same single window pass
    val fresh = toleranceUs.fold(col("__p").isNotNull) { t =>
      col("__p").isNotNull &&
        unix_micros(col("__ts")) - unix_micros(col("__p.__rts")) <= t
    }
    pick.foldLeft(filled)((df, c) =>
        df.withColumn(c, when(fresh, col(s"__p.$c"))))
      .filter(col("__r") === 0)
      .drop("__r", "__ts", "__p")
  }

  // -- q25: as-of join (purchase -> most recent prior view) --------------
  // DuckDB's native ASOF LEFT JOIN is the oracle, so the union+window
  // re-expression is value-checked against a reference implementation
  // of the real operator semantics.
  def q25(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), TS_FMT).as("purchase_ts"),
        date_format(col("view_ts"), TS_FMT).as("last_view_ts"))
      .transform(Gate.ordered("user_id", "event_id"))
  }

  // -- q25b: as-of join with tolerance (view no staler than 1 hour) ------
  // DuckDB's ASOF has no tolerance clause, so the oracle is the exact
  // aggregate formulation (max view ts within the window per purchase).
  def q25b(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
        toleranceUs = Some(HOUR_US))
      .select(col("user_id"), col("event_id"),
        date_format(col("view_ts"), TS_FMT).as("recent_view_ts"))
      .transform(Gate.ordered("user_id", "event_id"))
  }

  // -- q26: binned range join (views in the hour before each purchase) ---
  private val HOUR_US = 3600L * 1000000

  def q26(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("p_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"))
      .withColumn("v_bin", expr(s"v_us div $HOUR_US"))
    // each purchase probes its own bin and the previous one — the 1-hour
    // range spans at most 2 hour-bins; integer div keeps binning exact
    val probes = purchases.withColumn("bin",
      explode(expr(s"sequence((p_us - $HOUR_US) div $HOUR_US, p_us div $HOUR_US)")))
    probes
      .join(views,
        probes("user_id") === views("v_user") && col("bin") === col("v_bin"),
        "left")
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(when(col("v_us") >= col("p_us") - HOUR_US &&
        col("v_us") < col("p_us"), 1)).as("n_prior_views"))
      .transform(Gate.ordered("user_id", "event_id"))
  }

  // -- c16: bounded temporal sequencing ----------------------------------
  /** i2b2 temporal-builder sequence: users whose FIRST `first` event is
    * followed by a `second` event within `withinUs` — (user, ts of the
    * first A, ts of the first qualifying B). One aggregate + one
    * equi-join on user, exact-bounded by the residual time filter
    * (c02's unbounded "A before B" with the gap constraint the real
    * query builder has).
    */
  def followedBy(events: DataFrame, first: String, second: String,
      withinUs: Long): DataFrame = {
    val fa = events.filter(col("event_type") === first)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_a"))
    events.filter(col("event_type") === second)
      .join(fa, "user_id")
      .filter(col("ts") > col("ts_a") &&
        unix_micros(col("ts")) - unix_micros(col("ts_a")) <= withinUs)
      .groupBy(col("user_id"), col("ts_a"))
      .agg(min(col("ts")).as("ts_b"))
  }

  private val WEEK_US = 7L * 24 * 3600 * 1000000

  def c16(s: SparkSession, d: String): DataFrame =
    followedBy(events(s, d), "signup", "purchase", WEEK_US)
      .select(col("user_id"),
        date_format(col("ts_a"), TS_FMT).as("first_signup"),
        date_format(col("ts_b"), TS_FMT).as("first_purchase_within_7d"))
      .transform(Gate.ordered("user_id"))

  // -- c43: the temporal-builder endpoint×aggregate matrix ---------------
  // i2b2's GENERAL pair constraint, which c02 (first-A-before-first-B)
  // and c16 (followed-within) are special cases of: each side selects
  // an occurrence AGGREGATE (first/last) and a span ENDPOINT
  // (start/end) — "first occurrence of A ends before last occurrence
  // of B starts". Occurrences here are per-day presence spans (a day
  // with ≥1 such event; span = [min ts, max ts] that day) — the
  // observation_fact start/end shape. Because a user's day-spans are
  // DISJOINT and ordered, every endpoint is a plain or struct-ordered
  // min/max over the RAW events: first occurrence's start = min(ts);
  // first occurrence's END = the latest instant of the earliest day =
  // -min(struct(day, -us)).nu (lexicographic struct ordering picks the
  // min day, then the min of -us = the max µs within it), and
  // symmetrically for the last occurrence's start. The whole
  // 8-endpoint frame is ONE conditional aggregate with map-side
  // partials — a single user_id shuffle, no per-(user,type,day)
  // pre-aggregate, no window, no self-join (c16's decorrelation,
  // generalized). The gate face emits all four before-matrix cells so
  // every endpoint pairing is hash-checked at once.
  /** All 8 endpoints per user having ≥1 occurrence of BOTH types. */
  private[graft] def endpointFrame(ev: DataFrame, typeA: String,
      typeB: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val day = date_format(col("ts"), "yyyy-MM-dd")
    def side(t: String, pre: String) = {
      val cond = col("event_type") === t
      // (day asc, -µs asc): min = earliest day's latest instant,
      // max = latest day's earliest instant
      val spanKey = when(cond, struct(day.as("d"), (-us).as("nu")))
      Seq(
        min(when(cond, col("ts"))).as(s"${pre}_first_start"),
        timestamp_micros(-min(spanKey).getField("nu"))
          .as(s"${pre}_first_end"),
        timestamp_micros(-max(spanKey).getField("nu"))
          .as(s"${pre}_last_start"),
        max(when(cond, col("ts"))).as(s"${pre}_last_end"))
    }
    val aggs = side(typeA, "a") ++ side(typeB, "b")
    ev.filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("a_first_start").isNotNull && col("b_first_start").isNotNull)
  }

  /** One matrix cell: the selected A occurrence (its END) precedes the
    * selected B occurrence (its START) — i2b2's span-ordering "before".
    * `aggA`/`aggB` ∈ {"first", "last"}; apply over [[endpointFrame]].
    */
  def beforeCell(aggA: String, aggB: String): Column =
    col(s"a_${aggA}_end") < col(s"b_${aggB}_start")

  def c43(s: SparkSession, d: String): DataFrame = {
    val fmtCols = Seq("a_first_start", "a_first_end", "a_last_start",
      "a_last_end", "b_first_start", "b_first_end", "b_last_start",
      "b_last_end").map(c => date_format(col(c), TS_FMT).as(c))
    endpointFrame(events(s, d), "signup", "purchase")
      .select(col("user_id") +: fmtCols :+
        beforeCell("first", "first").cast("int").as("first_a_before_first_b") :+
        beforeCell("first", "last").cast("int").as("first_a_before_last_b") :+
        beforeCell("last", "first").cast("int").as("last_a_before_first_b") :+
        beforeCell("last", "last").cast("int").as("last_a_before_last_b"): _*)
      .transform(Gate.ordered("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_asof_join" -> (q25 _),
    "q25b_asof_tolerance" -> (q25b _),
    "q26_range_join_binned" -> (q26 _),
    "c16_sequence_within" -> (c16 _),
    "c43_endpoint_matrix" -> (c43 _)
  )

  val oracle: Map[String, String] = Map(
    "q25_asof_join" ->
      s"""SELECT p.user_id, p.event_id,
         | strftime(p.ts, '$TS_FMT_SQL') AS purchase_ts,
         | strftime(v.view_ts, '$TS_FMT_SQL') AS last_view_ts
         |FROM (SELECT user_id, event_id, ts FROM events
         |      WHERE event_type = 'purchase') p
         |ASOF LEFT JOIN (SELECT user_id AS v_user, ts AS view_ts FROM events
         |      WHERE event_type = 'view') v
         | ON p.user_id = v.v_user AND p.ts >= v.view_ts
         |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q25b_asof_tolerance" ->
      s"""SELECT p.user_id, p.event_id,
         | strftime(MAX(v.vts), '$TS_FMT_SQL') AS recent_view_ts
         |FROM (SELECT user_id, event_id, ts FROM events
         |      WHERE event_type = 'purchase') p
         |LEFT JOIN (SELECT user_id AS v_user, ts AS vts FROM events
         |      WHERE event_type = 'view') v
         | ON v.v_user = p.user_id AND v.vts <= p.ts
         |  AND epoch_us(p.ts) - epoch_us(v.vts) <= $HOUR_US
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q26_range_join_binned" ->
      s"""SELECT p.user_id, p.event_id, COUNT(v.v_us) AS n_prior_views
         |FROM (SELECT user_id, event_id, epoch_us(ts) AS p_us FROM events
         |      WHERE event_type = 'purchase') p
         |LEFT JOIN (SELECT user_id AS v_user, epoch_us(ts) AS v_us FROM events
         |      WHERE event_type = 'view') v
         | ON v.v_user = p.user_id AND v.v_us >= p.p_us - $HOUR_US
         |  AND v.v_us < p.p_us
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same day-span occurrence frame, same single conditional
    // aggregate, same span-ordering before rule — every matrix cell
    // hash-checked
    "c43_endpoint_matrix" -> {
      def side(t: String, pre: String) =
        s"""MIN(CASE WHEN event_type = '$t' THEN o_start END) AS ${pre}_first_start,
           |  MIN(CASE WHEN event_type = '$t' THEN o_end END) AS ${pre}_first_end,
           |  MAX(CASE WHEN event_type = '$t' THEN o_start END) AS ${pre}_last_start,
           |  MAX(CASE WHEN event_type = '$t' THEN o_end END) AS ${pre}_last_end""".stripMargin
      val fmt8 = Seq("a_first_start", "a_first_end", "a_last_start",
        "a_last_end", "b_first_start", "b_first_end", "b_last_start",
        "b_last_end")
        .map(c => s"strftime($c, '$TS_FMT_SQL') AS $c").mkString(",\n ")
      s"""WITH occ AS (
         | SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day,
         |  MIN(ts) AS o_start, MAX(ts) AS o_end
         | FROM events WHERE event_type IN ('signup', 'purchase')
         | GROUP BY 1, 2, 3),
         |m AS (
         | SELECT user_id,
         |  ${side("signup", "a")},
         |  ${side("purchase", "b")}
         | FROM occ GROUP BY 1)
         |SELECT user_id,
         | $fmt8,
         | CAST(a_first_end < b_first_start AS INT) AS first_a_before_first_b,
         | CAST(a_first_end < b_last_start AS INT) AS first_a_before_last_b,
         | CAST(a_last_end < b_first_start AS INT) AS last_a_before_first_b,
         | CAST(a_last_end < b_last_start AS INT) AS last_a_before_last_b
         |FROM m
         |WHERE a_first_start IS NOT NULL AND b_first_start IS NOT NULL
         |ORDER BY user_id""".stripMargin
    },
    "c16_sequence_within" ->
      s"""SELECT e.user_id,
         | strftime(a.ts_a, '$TS_FMT_SQL') AS first_signup,
         | strftime(MIN(e.ts), '$TS_FMT_SQL') AS first_purchase_within_7d
         |FROM events e JOIN (
         | SELECT user_id, MIN(ts) AS ts_a FROM events
         | WHERE event_type = 'signup' GROUP BY 1) a
         | ON e.user_id = a.user_id
         |WHERE e.event_type = 'purchase' AND e.ts > a.ts_a
         | AND epoch_us(e.ts) - epoch_us(a.ts_a) <= $WEEK_US
         |GROUP BY 1, a.ts_a ORDER BY 1""".stripMargin
  )
}
