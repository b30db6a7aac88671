package graft.operators

import graft.Gate
import graft.Tables._
import graft.sources.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B rep01 — scheduled-report delivery lifecycle: the last of the
  * reference's deployment faces (the AKTIN DWH doesn't just compute the
  * monthly ED report — its WildFly stack schedules, renders, and emails
  * it to the site, and the site confirms receipt).
  *
  * The engine-level lifecycle is three verbs over a snapshot-committed
  * delivery log (report_week, status, n_rows):
  *
  *   - [[schedule]]: one SCHEDULED row per report period PRESENT IN THE
  *     DATA (periods derive from the fact table's own timestamps, never
  *     the wall clock — deterministic, re-runnable, and exactly what a
  *     backfill over historical data needs);
  *   - [[deliverDue]]: for every scheduled period with no DELIVERED row
  *     yet, run the period-scoped report (c18's section definition
  *     verbatim over the period slice), WRITE the artifact with the QA
  *     audit riding the write (writeWithAudit — exportReport's
  *     delivery convention), and commit a DELIVERED row carrying the
  *     artifact's audited row count. Resumable by construction: the
  *     "due" set is an anti-join on the log, so a delivery that crashed
  *     before its commit is simply still due next cycle, and a re-run
  *     after success is a no-op;
  *   - [[acknowledge]]: the receipt confirmation (the email bounce /
  *     site-confirms face), one more committed row.
  *
  * Scale shape: the log is calendar-sized (weeks, not facts) — the one
  * driver-side collect is that list; each delivery is one period-slice
  * scan (partition-prunable on a date-partitioned deployment) through
  * the already-audited c18 aggregate. Statuses inherit the lakehouse
  * guarantees (crash-honest, time-travelable) exactly as QueryStatus
  * does — same pattern, different lifecycle.
  *
  * Reference face: the WildFly mail session + report scheduler the
  * reference's compose stack wires (src/docker/wildfly/configuration);
  * exportReport is the render step, this is the schedule/deliver/
  * acknowledge loop around it.
  */
object ReportDelivery {

  val Scheduled = "SCHEDULED"
  val Delivered = "DELIVERED"
  val Acknowledged = "ACKNOWLEDGED"

  /** ISO-week period key (Monday start), identical in Spark and
    * DuckDB: CAST(date_trunc('week', ts) AS DATE) as text.
    */
  private[graft] def weekOf: Column =
    to_date(date_trunc("week", col("ts"))).cast("string")

  private def logRow(s: SparkSession, week: String, status: String,
      nRows: Long): DataFrame = {
    import s.implicits._
    Seq((week, status, nRows)).toDF("report_week", "status", "n_rows")
  }

  /** Commit one SCHEDULED row per week present in the fact data. */
  def schedule(s: SparkSession, root: String, d: String): Int =
    Snapshots.commit(s, root,
      events(s, d).select(weekOf.as("report_week")).distinct()
        .withColumn("status", lit(Scheduled))
        .withColumn("n_rows", lit(0L)))

  /** Deliver every scheduled-but-undelivered week; returns the weeks
    * delivered this cycle (empty = all caught up).
    */
  def deliverDue(s: SparkSession, root: String, d: String,
      outDir: String): Seq[String] = {
    val log = Snapshots.read(s, root)
    // calendar-sized driver list: weeks, never facts
    val due = log.filter(col("status") === Scheduled).select("report_week")
      .except(log.filter(col("status") === Delivered).select("report_week"))
      .collect().map(_.getString(0)).sorted.toSeq
    // deliveries are independent period-scoped jobs — overlap a few so
    // one week's straggler tail back-fills with the next week's scan
    // (guide §2.6's thread-pool move; FIFO scheduling keeps the earlier
    // week ahead). Each week still commits its own DELIVERED row as it
    // lands — commit is CAS-with-rebase, so concurrent appends are safe
    // and a crash mid-cycle leaves exactly the finished weeks logged
    // (the resumability contract is unchanged: uncommitted weeks are
    // still due next cycle). Bounded pool: enough to fill the tail,
    // not so many the slices fight for executors.
    if (due.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, due.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      // fail-fast switch: the first failed week stops LATER weeks from
      // starting (in-flight ones finish — Spark jobs aren't interrupted
      // mid-write), so a poisoned week can't wedge the whole cycle
      val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fs = due.map { wk => scala.concurrent.Future {
        if (aborted.get())
          throw new IllegalStateException(s"cycle aborted before $wk")
        // the week slice as a ts RANGE, not weekOf === wk: date_trunc is
        // opaque to the scanner, a range reaches the parquet reader as
        // PushedFilters (row-group pruning here; partition pruning on a
        // date-partitioned production layout). [wk, wk+7d) IS the set of
        // timestamps whose Monday-truncation equals wk.
        val wkStart = to_timestamp(lit(wk))
        val report = Cohort.reportSections(
            events(s, d).filter(col("ts") >= wkStart &&
              col("ts") < to_timestamp(date_add(lit(wk).cast("date"), 7))))
          .groupBy(col("section"), col("sec_key"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
        val audit = graft.sources.RoundTrip
          .writeWithAudit(report, "n_events", s"$outDir/$wk")
        Snapshots.commit(s, root,
          logRow(s, wk, Delivered, audit("n_rows").asInstanceOf[Long]))
      }}
      // bounded await (conf'd; generous default) — a wedged write must
      // surface as an error, not block the delivery cycle forever; on
      // the first failure the abort flag stops unstarted weeks and
      // shutdownNow() cancels queued work, so no orphan threads keep
      // running behind a failed cycle. Correctness is unaffected either
      // way: commits are CAS, and un-committed weeks are still due next
      // cycle (the resumability contract).
      val timeout = scala.concurrent.duration.Duration(
        s.conf.get("spark.graft.rep.deliverTimeoutSec", "3600").toLong,
        java.util.concurrent.TimeUnit.SECONDS)
      try fs.foreach(f => scala.concurrent.Await.result(f, timeout))
      catch { case e: Throwable =>
        aborted.set(true)
        pool.shutdownNow()
        throw e
      }
      finally pool.shutdown()
    }
    due
  }

  /** Record the site's receipt confirmation for a delivered week. */
  def acknowledge(s: SparkSession, root: String, week: String): Int =
    Snapshots.commit(s, root, logRow(s, week, Acknowledged, 0L))

  /** The queryable delivery log. */
  def log(s: SparkSession, root: String): DataFrame =
    Snapshots.read(s, root)

  /** Gate face: fresh log root per invocation (the st18/qs01
    * convention), full lifecycle — schedule every week in the data,
    * deliver all due, acknowledge the first (min) week — then the
    * deterministic projection. The oracle re-derives the week set and
    * every DELIVERED count (distinct (section, sec_key) of the week
    * slice) from the fact table.
    */
  def rep01(s: SparkSession, d: String): DataFrame = {
    val base = s"${graft.Scratch.dir}/rep01/${graft.Scratch.tag(d)}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val root = s"$base/log"
    schedule(s, root, d)
    val delivered = deliverDue(s, root, d, s"$base/artifacts")
    // second cycle: everything is delivered, nothing may re-ship
    require(deliverDue(s, root, d, s"$base/artifacts").isEmpty,
      "deliverDue re-shipped an already-delivered week")
    delivered.headOption.foreach(wk => acknowledge(s, root, wk))
    log(s, root)
      .select(col("report_week"), col("status"), col("n_rows"))
      .transform(Gate.ordered("report_week", "status"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rep01_report_delivery" -> (rep01 _))

  val oracle: Map[String, String] = Map(
    "rep01_report_delivery" ->
      """WITH sections AS (
        | SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
        |  'hour' AS section, strftime(ts, '%H') AS sec_key FROM events
        | UNION ALL SELECT CAST(date_trunc('week', ts) AS DATE),
        |  'weekday', dayname(ts) FROM events
        | UNION ALL SELECT CAST(date_trunc('week', ts) AS DATE),
        |  'month', strftime(ts, '%Y-%m') FROM events
        | UNION ALL SELECT CAST(date_trunc('week', ts) AS DATE),
        |  'concept', event_type FROM events),
        |permonth AS (
        | SELECT wk, COUNT(*) AS n_rows FROM (
        |  SELECT DISTINCT wk, section, sec_key FROM sections) AS u
        | GROUP BY wk)
        |SELECT * FROM (
        | SELECT CAST(wk AS VARCHAR) AS report_week, 'SCHEDULED' AS status,
        |  CAST(0 AS BIGINT) AS n_rows FROM permonth
        | UNION ALL
        | SELECT CAST(wk AS VARCHAR), 'DELIVERED', n_rows FROM permonth
        | UNION ALL
        | SELECT CAST(MIN(wk) AS VARCHAR), 'ACKNOWLEDGED', CAST(0 AS BIGINT)
        |  FROM permonth
        |) AS t ORDER BY report_week, status""".stripMargin)
}
