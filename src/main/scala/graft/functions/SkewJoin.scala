package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join places every row of a hot key in ONE reducer; at 100 TB
  * a single key holding 1% of the fact serializes 1 TB through one task.
  * Salting splits each hot key into `salts` sub-keys: the big side gets a
  * deterministic salt derived from a per-row unique column, the small
  * side is replicated across all salts (explode), and the join runs on
  * (key, salt) — spreading each hot key over `salts` reducers at the cost
  * of a `salts`x replication of the SMALL side only.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by
  * default) handles moderate skew automatically; explicit salting is the
  * deterministic tool for extreme known-hot keys or non-AQE paths.
  */
object SkewJoin {

  /** @param uniqueCol a column of `big` whose per-row hash spreads rows
    *                  of the same key uniformly (e.g. a row id).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(expandedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
