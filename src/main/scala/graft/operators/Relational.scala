package graft.operators

import graft.Det._
import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.A — the relational/SQL core.
  *
  * This is the analytics surface the reference exposes through i2b2's
  * CRC cell + PostgreSQL (aktin/docker-aktin-dwh ships the schema in
  * its database image; cf. src/docker/database/Dockerfile): filtered
  * star-join aggregation, grouping, windows, set ops, subqueries.
  * Everything is declared with the DataFrame API so Catalyst plans the
  * physical execution: filters/pruning reach the parquet scans, small
  * dimensions broadcast, partial aggregation runs map-side.
  *
  * Every query orders deterministically and renders aggregates through
  * [[graft.Det]] so results are bit-identical across engines and
  * partitionings.
  */
object Relational {

  private def rev(l: DataFrame): Column =
    l("l_extendedprice") * (lit(1) - l("l_discount"))

  // -- q01: filter + groupBy + multi-aggregate (pricing summary) ------
  def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // -- q02: 3-way join + group + top-k ---------------------------------
  def q02(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val l = lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1999-01-01")))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey").as("l_orderkey"), o("o_orderdate").as("od"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("od"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // -- q03: 6-way star join + agg --------------------------------------
  def q03(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") === "ASIA")
    val n = nation(s, d)
    val c = customer(s, d)
    val o = orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val l = lineitem(s, d)
    val su = supplier(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(su, l("l_suppkey") === su("s_suppkey") &&
        c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // -- q04: selective filter + arithmetic aggregate --------------------
  def q04(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount").between(0.05, 0.08) && col("l_quantity") < 25)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))

  // -- q05: explicit broadcast dim joins -------------------------------
  def q05(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_acctbal"),
        davg(col("c_acctbal")).as("avg_acctbal"))
      .orderBy("r_name")

  // -- q06: semi join (EXISTS) -----------------------------------------
  def q06(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .transform(Gate.ordered("c_custkey"))

  // -- q07: anti join (NOT EXISTS) -------------------------------------
  // Customers with no large order (> 400k). The filter is applied to the
  // build side BEFORE the anti join so the join input shrinks at the scan
  // (at sf0.01 every customer has *some* order, which would make an
  // unfiltered anti join vacuously empty).
  def q07(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_no_orders"))
      .orderBy("c_mktsegment")

  // -- q08: multi-column distinct --------------------------------------
  def q08(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .transform(Gate.ordered("c_mktsegment", "c_nationkey"))

  // -- q09: union all + aggregate --------------------------------------
  def q09(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nationkey"))
    val su = supplier(s, d).select(col("s_nationkey").as("nationkey"))
    c.unionByName(su)
      .groupBy("nationkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("nationkey")
  }

  // -- q10: window top-N per group -------------------------------------
  def q10(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .transform(Gate.ordered("o_custkey", "rn"))
  }

  // -- q11: running cumulative sum per key -----------------------------
  def q11(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("running_total"))
      .transform(Gate.ordered("o_custkey", "o_orderdate", "o_orderkey"))
  }

  // -- q12: ROLLUP -----------------------------------------------------
  def q12(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  // -- q13: CUBE -------------------------------------------------------
  def q13(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")

  // -- q14: pivot via conditional aggregation --------------------------
  /** Unsorted wide core — q14 sorts it; q33 melts it back to long form. */
  private def q14Core(s: SparkSession, d: String): DataFrame = {
    def seg(name: String): Column =
      coalesce(dsum(when(col("c_mktsegment") === name, col("c_acctbal"))), lit(0.0))
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(seg("AUTOMOBILE").as("automobile"), seg("BUILDING").as("building"),
        seg("FURNITURE").as("furniture"), seg("HOUSEHOLD").as("household"),
        seg("MACHINERY").as("machinery"))
  }

  def q14(s: SparkSession, d: String): DataFrame =
    q14Core(s, d).orderBy("n_name")

  // -- q15: exact percentiles per group --------------------------------
  def q15(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy("o_orderpriority")

  // -- q15b: the 100 TB percentile path --------------------------------
  // Exact percentile buffers EVERY group value; approx_percentile keeps
  // a bounded mergeable sketch (Greenwald-Khanna) per group — constant
  // memory per group at any scale. Rows-only gate (sketch results are
  // engine-specific); RelationalSpec bounds its error against q15.
  def q15b(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.25, 10000)").as("p25"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(o_totalprice, 0.75, 10000)").as("p75"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"))
      .orderBy("o_orderpriority")

  // -- q16: moment-sum statistics (variance/stddev/corr) ---------------
  def q16(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsumWide(x).as("sx"), dsumWide(x * x).as("sxx"),
        dsumWide(y).as("sy"), dsumWide(y * y).as("syy"),
        dsumWide(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round(col("sx") / col("n"), 6).as("mean_qty"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), 6).as("var_qty"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  // -- q17: aggregate-threshold subquery -------------------------------
  def q17(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val thr = l.groupBy(col("l_partkey").as("pk"))
      .agg((davg(col("l_quantity")) * 0.2).as("thr"))
    l.join(thr, l("l_partkey") === thr("pk"))
      .filter(l("l_quantity") < col("thr"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  // -- q18: group + HAVING ---------------------------------------------
  def q18(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy(col("l_orderkey").as("lok"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    orders(s, d)
      .join(big, col("o_orderkey") === col("lok"))
      .select(col("o_orderkey"), col("o_totalprice"), col("sum_qty"))
      .transform(Gate.orderedBy(col("sum_qty").desc, col("o_orderkey")))
  }

  // -- q19: CASE bucketing histogram -----------------------------------
  def q19(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") < 100000, "a_0_100k")
          .when(col("o_totalprice") < 200000, "b_100k_200k")
          .when(col("o_totalprice") < 300000, "c_200k_300k")
          .otherwise("d_300k_plus"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), davg(col("o_totalprice")).as("avg_price"))
      .orderBy("bucket")

  // -- q20: string function pipeline -----------------------------------
  def q20(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").like("%e%"))
      .withColumn("color", upper(split(col("p_name"), " ").getItem(0)))
      .withColumn("name_len", length(col("p_name")))
      .groupBy("color")
      .agg(count(lit(1)).as("n"), davg(col("p_retailprice")).as("avg_price"),
        max(col("name_len")).as("max_len"))
      .orderBy("color")

  // -- q21: time-series (monthly truncation) ---------------------------
  def q21(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  // -- q22: conditional ratio aggregates -------------------------------
  def q22(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(coalesce(dsum(when(col("c_mktsegment") === "BUILDING",
        col("c_acctbal"))), lit(0.0)) / dsum(col("c_acctbal")), 6).as("building_ratio"),
        count(lit(1)).as("n"))
      .orderBy("n_name")

  // -- q23: JSON extraction --------------------------------------------
  def q23(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
      .orderBy("event_type")

  // -- q24: full outer join + coalesce ---------------------------------
  def q24(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("c_cnt"))
    val su = supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("s_cnt"))
    c.join(su, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
        coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
      .orderBy("nationkey")
  }

  // -- q27: INTERSECT / EXCEPT set operators ------------------------------
  // The remaining ANSI set operators (q09 covers UNION): customers in
  // the BUILDING segment split by whether they placed a >200k order.
  // Both compile to aggregate-style dedup + a single shuffle each.
  def q27(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bigOrder = orders(s, d)
      .filter(col("o_totalprice") > 200000).select(col("o_custkey").as("c_custkey"))
    building.intersect(bigOrder).withColumn("tag", lit("both"))
      .unionByName(building.except(bigOrder)
        .withColumn("tag", lit("building_only")))
      .select("tag", "c_custkey")
      .transform(Gate.ordered("tag", "c_custkey"))
  }

  // -- q28: salted join under the oracle gate -----------------------------
  // functions.SkewJoin as a first-class query: revenue by supplier
  // nation through a SALTED lineitem⋈supplier join (each supplier key
  // spread over 8 sub-keys by the per-row l_orderkey hash, supplier side
  // replicated 8x). The oracle is the PLAIN join — proving salting is a
  // pure execution-strategy change with identical semantics, the
  // property that matters when a hot key at 100 TB forces it.
  def q28(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val small = supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.functions.SkewJoin.saltedJoin(big, small, "suppkey", "l_orderkey", 8)
      .groupBy(col("s_nationkey"))
      .agg(graft.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy("s_nationkey")
  }

  // -- q29: column profiling (import-validation face) --------------------
  // The DWH loader's data-quality pass: per-column null counts, distinct
  // cardinality, range and checksum-style sum — ONE scan computing every
  // column's stats as parallel aggregates, then stack() unpivots to the
  // (column, stats) report shape. At 100 TB swap countDistinct for
  // approx_count_distinct (HLL, mergeable) — the scan count stays one.
  private val PROFILE_COLS = Seq("l_quantity", "l_extendedprice",
    "l_discount", "l_tax")

  /** One profile body, parameterized by the distinct-count aggregate —
    * q29 (exact) and q29b (HLL) stay in lockstep by construction.
    *
    * Shape (r15): one single-column branch per profiled column, each a
    * two-level aggregate — groupBy(value) collapses the column to its
    * distinct values WITH multiplicities (map-side partial dedup, so
    * the exchange carries ≤|distinct| rows per column), then one
    * global row derives every stat from the (value, cnt) frame. This
    * replaces the multi-countDistinct plan Spark would otherwise emit:
    * an Expand×5 of the FULL fact table feeding a hash aggregate keyed
    * by all four double columns at once — 5× the scan rows shuffled
    * and hashed so that four independent distincts can share one pass
    * (the r14 plan; 4.5 s vs 1.0 s at sf0.1, and at 100 TB the Expand
    * is 5× the corpus). Identical values by construction: n_nulls is
    * the null group's cnt, n_distinct counts the non-null groups,
    * min/max over distinct values equal min/max over rows, and the
    * exact-decimal sum distributes over multiplicity
    * (Σ_rows x = Σ_groups x·cnt — decimal × integer is exact).
    */
  private def profile(s: SparkSession, d: String,
      nd: Column => Column): DataFrame =
    PROFILE_COLS.map { c =>
      lineitem(s, d)
        .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          nd(col(c)).as("n_distinct"),
          min(col(c)).as("min_v"),
          max(col(c)).as("max_v"),
          round(sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 6))
            * col("cnt")), 2).cast("double").as("sum_v"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_v"), col("max_v"), col("sum_v"))
    }.reduce(_ unionByName _).orderBy("col_name")

  /** Exact profile: over the distinct-value frame the exact distinct
    * count is a plain count of the non-null groups — no second
    * dedup pass, no Expand anywhere in the plan.
    */
  def q29(s: SparkSession, d: String): DataFrame =
    profile(s, d, c => count(c))

  /** q29b: the 100 TB profile — approx_count_distinct (HLL, mergeable,
    * constant memory) replaces the exact distinct; the HLL sketch is
    * multiplicity-invariant, so feeding it the distinct-value frame
    * yields the identical estimate the row frame would.
    * RelationalSpec bounds its error vs q29.
    */
  def q29b(s: SparkSession, d: String): DataFrame =
    profile(s, d, approx_count_distinct(_))

  // -- q30: explicit GROUPING SETS --------------------------------------
  // Arbitrary grouping-set combinations (rollup/cube are the special
  // cases q12/q13 cover). Spark expands the sets in ONE aggregate over
  // one scan (Expand operator), not one scan per set; grouping() flags
  // disambiguate a rolled-up null from a data null.
  def q30(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")),
          Seq(col("o_orderpriority"), col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("gp"),
        grouping(col("o_orderstatus")).cast("int").as("gs"),
        count(lit(1)).as("n_orders"),
        graft.Det.dsum(col("o_totalprice")).as("sum_price"))
      .transform(Gate.ordered("o_orderpriority", "o_orderstatus"))

  // -- q31: sliding-window frequency via a RANGE frame -------------------
  // "At least N occurrences within ANY trailing 7-day window" — the
  // i2b2 frequency-constraint shape (and the fraud/engagement-burst
  // shape) — as a RANGE window frame over epoch seconds: each event
  // sees the count of same-user purchases in [ts − 7 d, ts], one
  // shuffle on user, no self-join (contrast c12's pairwise range join:
  // the frame version scales with events, not event pairs). Spark's
  // rangeBetween needs a numeric ordering column, so ts quantizes to
  // epoch seconds — exact (generator is µs-precision) and identical in
  // the DuckDB oracle's integer RANGE frame. Positive-epoch assumption:
  // Spark `div` truncates toward zero while DuckDB `//` floors, which
  // differ only for pre-1970 timestamps — impossible for this fact
  // table; a corpus with negative epochs would need a shared floor-div.
  private val Q31_WINDOW_SEC = 7L * 86400
  private val Q31_MIN = 3

  def q31(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-Q31_WINDOW_SEC, 0)
    events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("ts_sec"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("n_7d")).as("peak_7d"))
      .filter(col("peak_7d") >= Q31_MIN)
      .transform(Gate.ordered("user_id"))
  }

  // -- q32: correlated multi-EXISTS (TPC-H Q21 shape) --------------------
  // "Suppliers who were the SOLE late supplier on a multi-supplier
  // order" — the classic EXISTS + NOT-EXISTS correlated pattern (i2b2's
  // temporal builder emits the same shape for "patients with A and no
  // B in the same encounter"). The oracle keeps the textbook correlated
  // subqueries; the Spark side is the decorrelated form a 100 TB plan
  // needs: ONE per-(order, supplier) aggregate (late flag), ONE
  // per-order rollup (supplier count + late-supplier count), and a
  // co-partitioned join back on the order key — three shuffles all on
  // o_orderkey prefixes, no per-row subquery re-execution anywhere.
  private val Q32_LATE_DAYS = 60

  def q32(s: SparkSession, d: String): DataFrame = {
    val lo = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $Q32_LATE_DAYS DAYS"), 1)
        .otherwise(0)).as("sup_late"))
    // per-order rollup and the join back share the l_orderkey shuffle
    // (the aggregate's partitioning satisfies the join's requirement)
    val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("sup_late")).as("n_late"))
    lo.join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("sup_late") === 1 && col("n_supp") >= 2 &&
        col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .transform(Gate.ordered("s_name"))
  }

  // -- q33: UNPIVOT (wide → long melt) -----------------------------------
  // The inverse of q14's pivot: per-segment balance columns melt back
  // into (n_name, segment, balance) rows. Spark's `unpivot` is ONE
  // Expand over the already-aggregated wide frame — no join, no extra
  // shuffle beyond q14's own aggregate (the Expand multiplies rows
  // AFTER the group-by, when the frame is nation-sized, not
  // customer-sized). The long form is what generic (dimension, measure)
  // consumers want — melting 100 TB of per-column metrics this way
  // costs only the width factor, never a second scan per column.
  private val Q33_SEGS =
    Seq("automobile", "building", "furniture", "household", "machinery")

  def q33(s: SparkSession, d: String): DataFrame =
    q14Core(s, d)
      .unpivot(Array(col("n_name")), Q33_SEGS.map(col).toArray,
        "segment", "balance")
      .transform(Gate.ordered("n_name", "segment"))

  // -- q34: NTILE decile profile -----------------------------------------
  // The BI banding shape q19's fixed CASE buckets can't give: DATA-
  // driven equal-population deciles of account balance per market
  // segment (risk tiers, spend bands). ntile's rank order carries the
  // c_custkey tie-break so equal balances band identically on every
  // engine; the decile summary (count, min/max balance) aggregates the
  // windowed frame in the same per-segment shuffle. Scale note: ntile
  // needs its partition sorted — per-SEGMENT sort, parallel across
  // segments but single-task WITHIN one (a 100 TB segment is ~10⁷-10⁸
  // customers); Strata.band swaps in per-segment GK-sketch boundaries
  // under spark.graft.approx, killing the in-segment sort.
  def q34(s: SparkSession, d: String): DataFrame = {
    Strata.band(s,
      customer(s, d)
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
      10, "c_acctbal", "c_custkey", "decile", Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .transform(Gate.ordered("c_mktsegment", "decile"))
  }

  // -- q35: trailing-interval window (RANGE BETWEEN 7 days) ---------------
  // Time-based window frames q11's row-based running totals can't give:
  // each order's trailing-7-day customer revenue — the "recent spend"
  // feature every risk/abuse model wants. RANGE on epoch-µs makes the
  // frame a true time interval (peers at the same instant all join the
  // frame, so ties are order-independent); the exact-decimal sum keeps
  // the double reproducible across engines and partitionings. One
  // hash(custkey) shuffle carries both the sort and the frame scan;
  // at 100 TB the per-customer partitions are tiny (orders/customer is
  // bounded), so the sort parallelises perfectly.
  private val Q35_WIN_US = 7L * 86400 * 1000000
  def q35(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      // o_orderdate reads as TIMESTAMP_NTZ; the cast under the UTC
      // session re-labels the same wall-clock instant (Tables.events
      // doc) so epoch-µs frames agree with the oracle's epoch_us
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-Q35_WIN_US, 0)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      // Det.dsum's windowed form: OVER binds to the SUM, the exact
      // decimal result casts back to double outside the window
      .withColumn("trailing_7d_spend",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("n_trailing_7d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_totalprice"), col("trailing_7d_spend"), col("n_trailing_7d"))
      .transform(Gate.ordered("o_custkey", "o_orderkey"))
  }

  // -- q36: distribution-rank windows (PERCENT_RANK / CUME_DIST) ----------
  // The remaining members of the ranking-window family (q10 rank, q34
  // ntile): each supplier's account balance as a relative position
  // within its nation — "this supplier is at the 85th percentile of
  // its nation" is the normalized form reports compare across nations
  // of different sizes. Both functions are rank arithmetic over the
  // same per-nation sort (one shuffle, shared by all three windows);
  // the (balance, suppkey) tie-break makes equal balances rank
  // identically on every engine, and both engines compute the ratios
  // as one correctly-rounded divide of exact integers — rounded to 6
  // only to cut ulp noise in the division itself.
  def q36(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s_nationkey").orderBy(col("s_acctbal"), col("s_suppkey"))
    supplier(s, d)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"))
      .withColumn("rk", rank().over(w).cast("bigint"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .transform(Gate.ordered("s_nationkey", "s_suppkey"))
  }

  // -- q37: per-group OLS trend (regression as moment sums) ---------------
  // The "is this metric drifting" question every monthly report ends
  // with: a least-squares line of order value over time, per priority
  // class. Spark ships regr_slope/regr_intercept, but their double
  // accumulation is partition-order-dependent — useless for a
  // reproducible report. q16's discipline instead: exact decimal moment
  // sums (one map-side-combined aggregate, one tiny shuffle), then the
  // slope/intercept/r² arithmetic in IDENTICAL double formulas on both
  // engines, rounded. x = whole days since the corpus epoch (exact
  // integers), so sxx needs no decimal rendition at all.
  private val Q37_EPOCH = "1995-01-01"
  def q37(s: SparkSession, d: String): DataFrame = {
    val x = datediff(col("o_orderdate"), lit(Q37_EPOCH)).cast("long")
    val y = col("o_totalprice")
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        // the long SUMs are exact (x <= ~2.4e3 days, x**2 <= 5.8e6;
        // even 10**9 rows/group stays under 2**53) — but the FORMULA
        // squares the sums, and sx*sx overflows long past ~3e9 rows/
        // group-days (hit at sf10). Cast to double first, exactly as
        // the oracle's CAST(SUM(x) AS DOUBLE) does, so both engines
        // run the identical double arithmetic.
        sum(x).cast("double").as("sx"), sum(x * x).cast("double").as("sxx"),
        dsumWide(y).as("sy"), dsumWide(x * y).as("sxy"),
        dsumWide(y * y).as("syy"))
      .select(col("o_orderpriority"), col("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n")), 6).as("slope_per_day"),
        round(col("sy") / col("n") -
          (col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("sx") / col("n")), 4).as("intercept"),
        round(pow((col("sxy") - col("sx") * col("sy") / col("n")), 2) /
          ((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("r2"))
      .orderBy("o_orderpriority")
  }

  // -- q38: IQR-fence outlier profile ------------------------------------
  // Tukey's fences per market segment: exact p25/p75 (q15's percentile
  // discipline, rounded so both engines agree on the boundary), fences
  // at 1.5×IQR, then one pass flags and summarizes the outliers. The
  // fence frame is group-count-sized — broadcast back, so the detail
  // pass is scan + map + aggregate (two scans of the dimension total;
  // at 100 TB the fence pass would ride q15b's GK sketch instead of
  // buffering groups, same composed shape).
  def q38(s: SparkSession, d: String): DataFrame = {
    val fences = customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(round(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
        round(expr("percentile(c_acctbal, 0.75)"), 4).as("p75"))
      // fence arithmetic in EXACT decimal: 1.5 × a 4-decimal IQR has
      // exactly 5 decimals, so rounding it back to 4 is a guaranteed
      // half-tie whenever the IQR's last digit is odd — and the two
      // engines break half-ties differently. A decimal(18,5) result
      // needs no rounding and converts to double exactly.
      .select(col("c_mktsegment"),
        (col("p25").cast("decimal(18,4)") - lit(BigDecimal("1.5")) *
          (col("p75").cast("decimal(18,4)") - col("p25").cast("decimal(18,4)")))
          .cast("double").as("lo_fence"),
        (col("p75").cast("decimal(18,4)") + lit(BigDecimal("1.5")) *
          (col("p75").cast("decimal(18,4)") - col("p25").cast("decimal(18,4)")))
          .cast("double").as("hi_fence"))
    customer(s, d)
      .join(broadcast(fences), "c_mktsegment")
      .groupBy(col("c_mktsegment"), col("lo_fence"), col("hi_fence"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_acctbal") < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("c_acctbal") > col("hi_fence"), 1L).otherwise(0L)).as("n_high"),
        min(col("c_acctbal")).as("min_bal"), max(col("c_acctbal")).as("max_bal"))
      .orderBy("c_mktsegment")
  }

  // -- q39: value-window family (FIRST/LAST/NTH over a full frame) --------
  // The remaining window-function family after ranking (q10/q34/q36),
  // frames (q11/q35) and distribution (q36): per-customer first, second
  // and latest order value — the "acquisition vs current" comparison
  // CRM reports run. One per-customer sort shuffle carries all four
  // windows (full-frame first/last/nth + the running count); one row
  // per customer survives via rn=1, so the output is customer-sized.
  // (o_orderdate, o_orderkey) ordering makes every picked value
  // engine-stable under date ties.
  def q39(s: SparkSession, d: String): DataFrame = {
    val wFull = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("first_price", first(col("o_totalprice")).over(wFull))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(wFull))
      .withColumn("last_price", last(col("o_totalprice")).over(wFull))
      .withColumn("n_orders", count(lit(1)).over(wFull))
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("rn") === 1)
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_day"),
        col("first_price"), col("second_price"), col("last_price"),
        col("n_orders"))
      .transform(Gate.ordered("o_custkey"))
  }

  // -- q40: deterministic per-group mode (categorical profiling) ----------
  // The MODE aggregate (modal order priority per market segment, with
  // its share) — the categorical complement of q15's numeric
  // percentiles. Both engines' built-in mode() breaks ties arbitrarily,
  // so neither is used: the modal pick is min_by over a (-count,
  // value) struct — partial-aggregatable (no per-group sort window on
  // the Spark side) and tie-broken to the lexicographically smallest
  // value on both engines.
  def q40(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(expr("min_by(struct(o_orderpriority, n), struct(-n, o_orderpriority))")
        .as("m"),
        sum(col("n")).as("n_orders"))
      .select(col("c_mktsegment"),
        col("m.o_orderpriority").as("modal_priority"),
        col("m.n").as("n_modal"),
        round(col("m.n").cast("double") / col("n_orders"), 6).as("modal_share"),
        col("n_orders"))
      .orderBy("c_mktsegment")

  // -- q41: market-basket association rules (top co-purchased pairs) ------
  // Frequent-itemset mining's pair stage (A-priori at k=2): baskets are
  // orders, items the DISTINCT parts in them. In-basket pair expansion
  // is a map-side transform over each basket's sorted distinct item
  // array — ONE shuffle of the 2-column (basket, item) projection
  // builds that frame, work bounded by Σ basket_size² (Poisson basket
  // sizes, never all-pairs over the catalog), support counts
  // map-side-combined, top-20 via TakeOrderedAndProject. Confidence and
  // lift then need single-item supports for just those 20 pairs: the
  // 20-row frame BROADCASTS into the item-support table (never the
  // reverse — the catalog is 20M parts at sf100), and the basket total
  // rides a 1-row cross. All counts integer-exact; one rounded divide
  // per measure, mirrored operand-for-operand by the oracle.
  def q41(s: SparkSession, d: String): DataFrame = q41Core(s, d)

  private[graft] def q41Core(s: SparkSession, d: String,
      cp: graft.Checkpointer = graft.LocalCheckpointer): DataFrame = {
    // ONE corpus shuffle (r15): fold each basket to its sorted distinct
    // item array up front — the pair expansion, the item supports and
    // the basket total all derive from that basket-sized frame
    // (checkpointed, c30's move) instead of each replaying the
    // distinct + self-join (the pre-r15 plan: 26 Exchanges, the
    // (basket,item) projection shuffled five times). The in-basket
    // pair expansion is now a map-side transform over the sorted array
    // — work still bounded by Σ basket_size², but no second shuffle of
    // the projection to align pair sides, and a<b falls out of the
    // array order instead of a post-join filter that discards half the
    // expansion.
    val baskets = cp(lineitem(s, d)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items")))
    val itemSup = baskets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("sup"))
    val nb = broadcast(baskets.agg(count(lit(1)).as("n_baskets")))
    val top = baskets
      .select(explode(expr(
        """flatten(transform(items, (a, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |    b -> struct(a AS item_a, b AS item_b))))""".stripMargin))
        .as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("sup_ab"))
      .orderBy(col("sup_ab").desc, col("item_a"), col("item_b"))
      .limit(20)
    val withA = itemSup.toDF("item_a", "sup_a").join(broadcast(top), "item_a")
    itemSup.toDF("item_b", "sup_b").join(broadcast(withA), "item_b")
      .crossJoin(nb)
      .select(col("item_a"), col("item_b"), col("sup_ab"),
        round(col("sup_ab").cast("double") / col("sup_a"), 6).as("conf_a_b"),
        round(col("sup_ab").cast("double") / col("sup_b"), 6).as("conf_b_a"),
        round(col("sup_ab").cast("double") * col("n_baskets") /
          (col("sup_a") * col("sup_b")), 6).as("lift"))
      .transform(Gate.ordered("item_a", "item_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_basket_rules" -> (q41 _),
    "q37_regression_trend" -> (q37 _),
    "q38_iqr_outliers" -> (q38 _),
    "q39_value_windows" -> (q39 _),
    "q40_modal_profile" -> (q40 _),
    "q36_distribution_rank" -> (q36 _),
    "q35_trailing_window" -> (q35 _),
    "q34_ntile_deciles" -> (q34 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_topk_shipping" -> (q02 _),
    "q03_multijoin_revenue" -> (q03 _),
    "q04_filter_agg" -> (q04 _),
    "q05_broadcast_join" -> (q05 _),
    "q06_semi_join" -> (q06 _),
    "q07_anti_join" -> (q07 _),
    "q08_distinct" -> (q08 _),
    "q09_union" -> (q09 _),
    "q10_window_rank" -> (q10 _),
    "q11_window_running" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_cube" -> (q13 _),
    "q14_pivot_conditional" -> (q14 _),
    "q15_percentiles" -> (q15 _),
    "q15b_percentiles_approx" -> (q15b _),
    "q16_stats" -> (q16 _),
    "q17_scalar_subquery" -> (q17 _),
    "q18_having" -> (q18 _),
    "q19_histogram_bucket" -> (q19 _),
    "q20_string_ops" -> (q20 _),
    "q21_time_series" -> (q21 _),
    "q22_ratio_agg" -> (q22 _),
    "q23_json_extract" -> (q23 _),
    "q24_outer_join_coalesce" -> (q24 _),
    "q27_intersect_except" -> (q27 _),
    "q28_salted_skew_join" -> (q28 _),
    "q29_column_profile" -> (q29 _),
    "q29b_column_profile_approx" -> (q29b _),
    "q30_grouping_sets" -> (q30 _),
    "q31_sliding_frequency" -> (q31 _),
    "q32_multi_exists" -> (q32 _),
    "q33_unpivot" -> (q33 _)
  )

  private val REV = "l_extendedprice * (1 - l_discount)"

  val oracle: Map[String, String] = Map(
    // integer supports end-to-end; the three rule measures are single
    // divides of exact BIGINTs in the identical operand order, and the
    // top-20 boundary is tie-broken (sup_ab DESC, item_a, item_b) on
    // both engines
    "q41_basket_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS basket,
        |  l_partkey AS item FROM lineitem),
        |ic AS (SELECT item, COUNT(*) AS sup FROM li GROUP BY 1),
        |nb AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM li),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |  COUNT(*) AS sup_ab
        | FROM li a JOIN li b ON a.basket = b.basket AND a.item < b.item
        | GROUP BY 1, 2
        | ORDER BY sup_ab DESC, item_a, item_b LIMIT 20)
        |SELECT item_a, item_b, sup_ab,
        | ROUND(CAST(sup_ab AS DOUBLE) / ia.sup, 6) AS conf_a_b,
        | ROUND(CAST(sup_ab AS DOUBLE) / ib.sup, 6) AS conf_b_a,
        | ROUND(CAST(sup_ab AS DOUBLE) * nb.n_baskets
        |  / (ia.sup * ib.sup), 6) AS lift
        |FROM p JOIN ic ia ON ia.item = p.item_a
        | JOIN ic ib ON ib.item = p.item_b CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,
    // q16's discipline: exact decimal/integer moment sums, then the
    // slope/intercept/r² arithmetic in the SAME double formula order
    "q37_regression_trend" ->
      s"""SELECT o_orderpriority, n,
         | ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
         |  AS slope_per_day,
         | ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
         |  * (sx / n), 4) AS intercept,
         | ROUND(POW(sxy - sx * sy / n, 2) /
         |  ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
         |FROM (SELECT o_orderpriority, COUNT(*) AS n,
         |  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |  ${sqlDsumWide("o_totalprice")} AS sy,
         |  ${sqlDsumWide("x * o_totalprice")} AS sxy,
         |  ${sqlDsumWide("o_totalprice * o_totalprice")} AS syy
         | FROM (SELECT *, datediff('day', TIMESTAMP '$Q37_EPOCH',
         |   o_orderdate) AS x FROM orders)
         | GROUP BY 1)
         |ORDER BY o_orderpriority""".stripMargin,
    // identical (count desc, value) tie order on both engines
    "q40_modal_profile" ->
      """SELECT c_mktsegment, o_orderpriority AS modal_priority,
        | n AS n_modal,
        | ROUND(CAST(n AS DOUBLE) / n_orders, 6) AS modal_share, n_orders
        |FROM (
        | SELECT c_mktsegment, o_orderpriority, n,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |   ORDER BY n DESC, o_orderpriority) AS rk,
        |  CAST(SUM(n) OVER (PARTITION BY c_mktsegment) AS BIGINT)
        |   AS n_orders
        | FROM (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2))
        |WHERE rk = 1 ORDER BY c_mktsegment""".stripMargin,
    // same (date, orderkey) tie order; the full frame makes
    // first/last/nth frame-deterministic, not peer-dependent
    "q39_value_windows" ->
      """SELECT o_custkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS first_day,
        | first_price, second_price, last_price, n_orders
        |FROM (
        | SELECT o_custkey, o_orderdate,
        |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
        |  LAST_VALUE(o_totalprice) OVER w AS last_price,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_orders,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS rn
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    // fence arithmetic in exact DECIMAL (1.5 × a 4-decimal IQR is a
    // guaranteed half-tie at 4 decimals; a (18,5) result needs no
    // rounding), so the boundary classifies identically on both engines
    "q38_iqr_outliers" ->
      """SELECT c_mktsegment, lo_fence, hi_fence, COUNT(*) AS n,
        | CAST(SUM(CASE WHEN c_acctbal < lo_fence THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_low,
        | CAST(SUM(CASE WHEN c_acctbal > hi_fence THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_high,
        | MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        |FROM customer JOIN (
        | SELECT c_mktsegment,
        |  CAST(p25 - CAST(1.5 AS DECIMAL(2,1)) * (p75 - p25) AS DOUBLE)
        |   AS lo_fence,
        |  CAST(p75 + CAST(1.5 AS DECIMAL(2,1)) * (p75 - p25) AS DOUBLE)
        |   AS hi_fence
        | FROM (SELECT c_mktsegment,
        |   CAST(ROUND(quantile_cont(c_acctbal, 0.25), 4)
        |    AS DECIMAL(18,4)) AS p25,
        |   CAST(ROUND(quantile_cont(c_acctbal, 0.75), 4)
        |    AS DECIMAL(18,4)) AS p75
        |  FROM customer GROUP BY 1)) USING (c_mktsegment)
        |GROUP BY 1, 2, 3 ORDER BY c_mktsegment""".stripMargin,
    // unique (balance, suppkey) sort order → rank arithmetic and its
    // one integer divide are identical on both engines
    "q36_distribution_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        | CAST(RANK() OVER w AS BIGINT) AS rk,
        | ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        | ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        | ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    // RANGE frame on epoch-µs: peers at one instant join the frame in
    // both engines, so tie order cannot change the sum; decimal-sum
    // rendition matches Det.dsum bit-for-bit
    "q35_trailing_window" ->
      s"""SELECT o_custkey, o_orderkey,
         | strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_totalprice,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |  AS trailing_7d_spend,
         | CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_7d
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
         | RANGE BETWEEN $Q35_WIN_US PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // identical (balance, custkey) rank order -> identical banding
    "q34_ntile_deciles" ->
      """SELECT c_mktsegment, decile, COUNT(*) AS n,
        | MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
        |FROM (
        | SELECT c_mktsegment, c_acctbal,
        |  NTILE(10) OVER (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal, c_custkey) AS decile
        | FROM customer)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the oracle keeps the CORRELATED form (EXISTS + NOT EXISTS over
    // the per-(order, supplier) late flags) that the Spark side
    // decorrelates into the per-order rollup join — same answer proves
    // the decorrelation faithful
    "q32_multi_exists" ->
      s"""WITH lo AS (
         | SELECT l_orderkey, l_suppkey,
         |  MAX(CASE WHEN l_shipdate > o_orderdate
         |    + INTERVAL $Q32_LATE_DAYS DAY THEN 1 ELSE 0 END) AS sup_late
         | FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         | GROUP BY 1, 2)
         |SELECT s_name, COUNT(*) AS numwait
         |FROM lo a JOIN supplier ON s_suppkey = a.l_suppkey
         |WHERE a.sup_late = 1
         | AND EXISTS (SELECT 1 FROM lo b
         |  WHERE b.l_orderkey = a.l_orderkey
         |   AND b.l_suppkey <> a.l_suppkey)
         | AND NOT EXISTS (SELECT 1 FROM lo c
         |  WHERE c.l_orderkey = a.l_orderkey
         |   AND c.l_suppkey <> a.l_suppkey AND c.sup_late = 1)
         |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // epoch_us // 1000000, NOT epoch(): DuckDB's epoch() returns DOUBLE
    // with fractional seconds — a different RANGE ordering key than
    // Spark's integer-truncated seconds; the integer division matches
    "q31_sliding_frequency" ->
      s"""SELECT user_id, CAST(MAX(n_7d) AS BIGINT) AS peak_7d FROM (
         | SELECT user_id, COUNT(*) OVER (
         |   PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
         |   RANGE BETWEEN $Q31_WINDOW_SEC PRECEDING AND CURRENT ROW) AS n_7d
         | FROM events WHERE event_type = 'purchase')
         |GROUP BY user_id HAVING MAX(n_7d) >= $Q31_MIN
         |ORDER BY user_id""".stripMargin,
    // NULLS FIRST: DuckDB default is NULLS LAST, Spark's asc is
    // nulls-first — rolled-up rows must land in the same positions
    "q30_grouping_sets" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         | CAST(GROUPING(o_orderpriority) AS INT) AS gp,
         | CAST(GROUPING(o_orderstatus) AS INT) AS gs,
         | COUNT(*) AS n_orders, ${graft.Det.sqlDsum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
         | (o_orderpriority, o_orderstatus), ())
         |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlDsum("l_quantity")} AS sum_qty,
         | ${sqlDsum("l_extendedprice")} AS sum_base_price,
         | ${sqlDsum(REV)} AS sum_disc_price,
         | ${sqlDsum(s"$REV * (1 + l_tax)")} AS sum_charge,
         | ${sqlDavg("l_quantity")} AS avg_qty,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_topk_shipping" ->
      s"""SELECT l_orderkey, ${sqlDsum(REV)} AS revenue,
         | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         | AND o_orderdate < TIMESTAMP '1999-01-01'
         | AND l_shipdate > TIMESTAMP '1999-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q03_multijoin_revenue" ->
      s"""SELECT n_name, ${sqlDsum(REV)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON o_orderkey = l_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         | AND o_orderdate >= TIMESTAMP '1996-01-01'
         | AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q04_filter_agg" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         | AND l_shipdate < TIMESTAMP '1998-01-01'
         | AND l_discount BETWEEN 0.05 AND 0.08 AND l_quantity < 25""".stripMargin,
    "q05_broadcast_join" ->
      s"""SELECT r_name, COUNT(*) AS n_customers,
         | ${sqlDsum("c_acctbal")} AS sum_acctbal,
         | ${sqlDavg("c_acctbal")} AS avg_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_no_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY 1, 2""".stripMargin,
    "q09_union" ->
      """SELECT nationkey, COUNT(*) AS cnt FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q11_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS running_total
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q12_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         | COALESCE(l_linestatus, 'ALL') AS linestatus,
         | COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY 1, 2""".stripMargin,
    "q13_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
         | COALESCE(o_orderpriority, 'ALL') AS orderpriority,
         | COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY 1, 2""".stripMargin,
    "q14_pivot_conditional" -> {
      def seg(nm: String, alias: String) =
        s"COALESCE(${sqlDsum(s"CASE WHEN c_mktsegment = '$nm' THEN c_acctbal END")}, 0.0) AS $alias"
      s"""SELECT n_name, ${seg("AUTOMOBILE", "automobile")},
         | ${seg("BUILDING", "building")}, ${seg("FURNITURE", "furniture")},
         | ${seg("HOUSEHOLD", "household")}, ${seg("MACHINERY", "machinery")}
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    },
    // the melt is a UNION ALL over the same wide CTE — one branch per
    // measure column, the ANSI spelling of what Spark's Expand does in
    // a single pass
    "q33_unpivot" -> {
      def seg(nm: String, alias: String) =
        s"COALESCE(${sqlDsum(s"CASE WHEN c_mktsegment = '$nm' THEN c_acctbal END")}, 0.0) AS $alias"
      val wide =
        s"""SELECT n_name, ${seg("AUTOMOBILE", "automobile")},
           | ${seg("BUILDING", "building")}, ${seg("FURNITURE", "furniture")},
           | ${seg("HOUSEHOLD", "household")}, ${seg("MACHINERY", "machinery")}
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name""".stripMargin
      val branches = Q33_SEGS.map(c =>
        s"SELECT n_name, '$c' AS segment, $c AS balance FROM wide")
        .mkString("\n UNION ALL\n ")
      s"""WITH wide AS (
         |$wide)
         |$branches
         |ORDER BY n_name, segment""".stripMargin
    },
    "q15_percentiles" ->
      """SELECT o_orderpriority,
        | ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        | ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_stats" ->
      s"""SELECT l_returnflag, n, ROUND(sx / n, 6) AS mean_qty,
         | ROUND((sxx - sx * sx / n) / n, 6) AS var_qty,
         | ROUND((sxy - sx * sy / n) /
         |  SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
         |FROM (SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlDsumWide("l_quantity")} AS sx,
         |  ${sqlDsumWide("l_quantity * l_quantity")} AS sxx,
         |  ${sqlDsumWide("l_extendedprice")} AS sy,
         |  ${sqlDsumWide("l_extendedprice * l_extendedprice")} AS syy,
         |  ${sqlDsumWide("l_quantity * l_extendedprice")} AS sxy
         | FROM lineitem GROUP BY 1)
         |ORDER BY l_returnflag""".stripMargin,
    "q17_scalar_subquery" ->
      s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
         |FROM lineitem l JOIN (
         | SELECT l_partkey AS pk, ${sqlDavg("l_quantity")} * 0.2 AS thr
         | FROM lineitem GROUP BY 1) a ON l.l_partkey = a.pk
         |WHERE l.l_quantity < a.thr""".stripMargin,
    "q18_having" ->
      s"""SELECT o_orderkey, o_totalprice, sum_qty
         |FROM orders JOIN (
         | SELECT l_orderkey AS lok, ${sqlDsum("l_quantity")} AS sum_qty
         | FROM lineitem GROUP BY 1 HAVING ${sqlDsum("l_quantity")} > 150
         |) ON o_orderkey = lok
         |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "q19_histogram_bucket" ->
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'a_0_100k'
         |  WHEN o_totalprice < 200000 THEN 'b_100k_200k'
         |  WHEN o_totalprice < 300000 THEN 'c_200k_300k'
         |  ELSE 'd_300k_plus' END AS bucket,
         | COUNT(*) AS n, ${sqlDavg("o_totalprice")} AS avg_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_string_ops" ->
      s"""SELECT UPPER(string_split(p_name, ' ')[1]) AS color, COUNT(*) AS n,
         | ${sqlDavg("p_retailprice")} AS avg_price,
         | MAX(LENGTH(p_name)) AS max_len
         |FROM part WHERE p_name LIKE '%e%'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_time_series" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
         | ${sqlDsum("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_ratio_agg" ->
      s"""SELECT n_name,
         | ROUND(COALESCE(${sqlDsum("CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END")}, 0.0)
         |  / ${sqlDsum("c_acctbal")}, 6) AS building_ratio,
         | COUNT(*) AS n
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | MIN(CAST(props->>'$.k' AS INTEGER)) AS min_k,
        | MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k,
        | CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_outer_join_coalesce" ->
      """SELECT COALESCE(nk_c, nk_s) AS nationkey,
        | COALESCE(c_cnt, 0) AS c_cnt, COALESCE(s_cnt, 0) AS s_cnt
        |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS c_cnt FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk_s, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) s
        | ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,
    "q27_intersect_except" ->
      """SELECT 'both' AS tag, c_custkey FROM (
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |UNION ALL
        |SELECT 'building_only' AS tag, c_custkey FROM (
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY tag, c_custkey""".stripMargin,
    // the PLAIN join: salting must not change semantics
    "q28_salted_skew_join" ->
      s"""SELECT s_nationkey, ${sqlDsum(REV)} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_column_profile" -> {
      val sections = PROFILE_COLS.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_nulls,
           | COUNT(DISTINCT $c) AS n_distinct, MIN($c) AS min_v,
           | MAX($c) AS max_v, ${sqlDsum(c)} AS sum_v FROM lineitem""".stripMargin)
      sections.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }
  )
}
