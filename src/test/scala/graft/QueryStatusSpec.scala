package graft

import graft.operators.QueryStatus
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

class QueryStatusSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${Scratch.dir}/qstatus_spec/$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  test("recorded: lifecycle rows carry ordered timestamps and the result count") {
    import spark.implicits._
    val root = freshRoot("lifecycle")
    val out = QueryStatus.recorded(spark, root, "tiny") {
      Seq(1, 2, 3).toDF("x")
    }
    assert(out.exists(_.count() == 3))
    val rows = QueryStatus.status(spark, root)
      .orderBy("status").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("FINISHED", "PROCESSING"))
    val fin = rows(0)
    assert(fin.getLong(4) == 3L) // n_rows
    // started <= finished, and PROCESSING shares the run's start stamp
    assert(fin.getLong(2) <= fin.getLong(3))
    assert(rows(1).getLong(2) == fin.getLong(2))
    assert(rows(1).getLong(3) == -1L) // PROCESSING has no finish
  }

  test("recorded: a failing query lands an ERROR row with the message") {
    val root = freshRoot("error")
    val out = QueryStatus.recorded(spark, root, "boom") {
      throw new IllegalStateException("deliberate")
    }
    assert(out.isEmpty)
    val err = QueryStatus.status(spark, root)
      .filter(col("status") === "ERROR").collect()
    assert(err.length == 1 && err(0).getString(5).contains("deliberate"))
  }

  test("recorded: re-runs append new lifecycles; history is time-travelable") {
    import spark.implicits._
    val root = freshRoot("append")
    QueryStatus.recorded(spark, root, "q")(Seq(1).toDF("x"))
    val v2 = Snapshots.headVersion(spark, root)
    QueryStatus.recorded(spark, root, "q")(Seq(1, 2).toDF("x"))
    // two full lifecycles — QT semantics: each run is its own instance
    val all = QueryStatus.status(spark, root)
    assert(all.count() == 4)
    assert(all.filter(col("status") === "FINISHED").count() == 2)
    // the status table is a snapshot table: the pre-second-run state
    // reads back exactly (what the ops dashboard showed then)
    assert(Snapshots.read(spark, root, Some(v2)).count() == 2)
  }

  test("qs01 gate face is deterministic across invocations") {
    val one = QueryStatus.qs01(spark, sfDir).collect().toSeq
    val two = QueryStatus.qs01(spark, sfDir).collect().toSeq
    assert(one.nonEmpty && one == two)
    // the failed query is visible as ERROR, with its PROCESSING row
    assert(one.count(_.getString(0) == "bad_modifier_panel") == 2)
  }
}
