package graft

import graft.operators.{Cohort, ReportDelivery}
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

class ReportDeliverySpec extends SparkSpec {

  private def freshBase(name: String): String = {
    val base = s"${Scratch.dir}/repdel_spec/$name"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    base
  }

  test("lifecycle: schedule from data, deliver due once, acknowledge") {
    val base = freshBase("lifecycle")
    val root = s"$base/log"
    ReportDelivery.schedule(spark, root, sfDir)
    val weeks = ReportDelivery.log(spark, root)
      .select("report_week").collect().map(_.getString(0)).sorted
    assert(weeks.nonEmpty)
    // weeks derive from the data's own span, Monday-anchored
    val span = Tables.events(spark, sfDir)
      .select(ReportDelivery.weekOf.as("w")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(weeks.toSeq == span.toSeq)
    val delivered = ReportDelivery
      .deliverDue(spark, root, sfDir, s"$base/artifacts")
    assert(delivered == weeks.toSeq)
    // resumable no-op: everything delivered, nothing re-ships
    assert(ReportDelivery
      .deliverDue(spark, root, sfDir, s"$base/artifacts").isEmpty)
    ReportDelivery.acknowledge(spark, root, weeks.head)
    val byStatus = ReportDelivery.log(spark, root)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("SCHEDULED") == weeks.length)
    assert(byStatus("DELIVERED") == weeks.length)
    assert(byStatus("ACKNOWLEDGED") == 1)
  }

  test("delivered artifacts: per-week reports partition c18 exactly") {
    val base = freshBase("artifacts")
    val root = s"$base/log"
    ReportDelivery.schedule(spark, root, sfDir)
    val weeks = ReportDelivery
      .deliverDue(spark, root, sfDir, s"$base/artifacts")
    // re-reading every weekly artifact and re-aggregating must equal
    // the corpus-wide c18 (weeks partition the facts, counts add;
    // distinct users can't be summed so compare n_events only)
    val weekly = weeks.map(wk => spark.read.parquet(s"$base/artifacts/$wk"))
      .reduce(_ unionByName _)
      .groupBy("section", "sec_key")
      .agg(sum("n_events").as("n_events"))
      .orderBy("section", "sec_key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val corpus = Cohort.queries("c18_monthly_report")(spark, sfDir)
      .select("section", "sec_key", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(weekly.toSeq == corpus.toSeq)
    // the log's DELIVERED counts match the artifacts on disk
    val logged = ReportDelivery.log(spark, root)
      .filter(col("status") === "DELIVERED")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    weeks.foreach { wk =>
      assert(logged(wk) == spark.read.parquet(s"$base/artifacts/$wk").count())
    }
  }

  test("crash-resumability: a delivery that never committed stays due") {
    val base = freshBase("resume")
    val root = s"$base/log"
    ReportDelivery.schedule(spark, root, sfDir)
    val weeks = ReportDelivery.log(spark, root)
      .select("report_week").collect().map(_.getString(0)).sorted
    // simulate a crash AFTER one delivery committed: mark only the
    // first week delivered, leave the rest
    Snapshots.commit(spark, root, {
      import spark.implicits._
      Seq((weeks.head, "DELIVERED", 0L))
        .toDF("report_week", "status", "n_rows")
    })
    val due = ReportDelivery.deliverDue(spark, root, sfDir, s"$base/artifacts")
    assert(due == weeks.tail.toSeq, "the committed week must not re-ship")
  }

  test("rep01 gate face is deterministic across invocations") {
    val one = operators.ReportDelivery.rep01(spark, sfDir).collect().toSeq
    val two = operators.ReportDelivery.rep01(spark, sfDir).collect().toSeq
    assert(one.nonEmpty && one == two)
  }

  test("a poisoned cycle fails fast and the next cycle still delivers everything") {
    val base = freshBase("poisoned")
    val root = s"$base/log"
    ReportDelivery.schedule(spark, root, sfDir)
    // poison the artifact dir: a FILE where the output directory must
    // go makes every week's write throw — the cycle must surface the
    // failure promptly (bounded await + fail-fast abort), never wedge
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$base/artifacts"), true).close()
    spark.conf.set("spark.graft.rep.deliverTimeoutSec", "120")
    try {
      val t0 = System.nanoTime()
      intercept[Throwable] {
        ReportDelivery.deliverDue(spark, root, sfDir, s"$base/artifacts/x")
      }
      assert((System.nanoTime() - t0) / 1e9 < 120.0,
        "poisoned cycle did not fail fast")
    } finally spark.conf.unset("spark.graft.rep.deliverTimeoutSec")
    // nothing was committed as DELIVERED; the retry cycle with a
    // healthy sink delivers every scheduled week (resumability)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/artifacts"), true)
    val retried = ReportDelivery
      .deliverDue(spark, root, sfDir, s"$base/artifacts")
    val scheduled = ReportDelivery.log(spark, root)
      .filter(col("status") === ReportDelivery.Scheduled).count()
    assert(retried.size.toLong == scheduled,
      s"retry delivered ${retried.size} of $scheduled scheduled weeks")
    assert(ReportDelivery
      .deliverDue(spark, root, sfDir, s"$base/artifacts").isEmpty)
  }
}
