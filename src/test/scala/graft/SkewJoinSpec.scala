package graft

import graft.functions.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    // events.user_id vs a small per-user dim; event_id is the unique salt
    // source. Result must be identical to the unsalted join.
    val e = Tables.events(spark, sfDir)
    val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
    val plain = e.join(dim, Seq("user_id"))
      .select("user_id", "event_id", "n_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(e, dim, "user_id", "event_id", 8)
      .select("user_id", "event_id", "n_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("null unique-column rows survive the salted join") {
    import spark.implicits._
    val big = Seq((1L, Option(10L)), (1L, None), (2L, Option(20L)))
      .toDF("k", "uid")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(big, small, "k", "uid", 4)
    assert(out.count() == 3, "the null-uid row must not be dropped")
  }

  test("pre-existing salt column name is rejected, not silently joined") {
    import spark.implicits._
    val big = Seq((1L, 1L, 0)).toDF("k", "uid", "__graft_salt")
    val small = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", "uid", 4)
    }
  }

  test("salt spreads a hot key across multiple partitions' sub-keys") {
    val e = Tables.events(spark, sfDir)
    val salts = e.select(col("user_id"),
      pmod(xxhash64(col("event_id")), lit(8)).cast("int").as("s"))
      .groupBy("user_id").agg(countDistinct(col("s")).as("n_salts"))
      .collect().map(_.getAs[Long]("n_salts"))
    // every user has >= 60 events at sf0.001 -> all 8 salts hit w.h.p.
    assert(salts.forall(_ >= 4))
  }
}
