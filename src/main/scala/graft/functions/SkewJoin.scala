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
    *                  of the same key uniformly (e.g. a row id). A null
    *                  value salts to 0 (the row lands in one bucket but
    *                  is never dropped — the result is exactly the plain
    *                  join's).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, salts: Int): DataFrame = {
    // collision-proof temp column: refuse inputs that already carry it
    // rather than silently joining on a pre-existing column
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not already have a $saltCol column")
    // null-safe: xxhash64(null) is null, and a null salt would make the
    // inner join DROP the row — coalesce to bucket 0 instead
    val saltedBig = big.withColumn(saltCol,
      pmod(coalesce(xxhash64(col(uniqueCol)), lit(0L)), lit(salts)).cast("int"))
    val expandedSmall = small.withColumn(saltCol,
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(expandedSmall, Seq(key, saltCol)).drop(saltCol)
  }
}
