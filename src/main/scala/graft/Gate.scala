package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Final-output ordering policy.
  *
  * Many queries end in a global `orderBy` that exists ONLY so the oracle
  * gate can hash a deterministic result — semantically the result is a
  * set. A full global sort of an O(N) output is the single worst
  * scale-killer at 100 TB (one extra range-shuffle of the entire result),
  * so the production path must be able to skip it.
  *
  * `spark.graft.gateSort=true` (default): deterministic sorted output —
  * what Verify/the correctness gate use. `false`: the production path —
  * no final sort; Bench measures this one.
  *
  * Queries where order IS the semantics (top-k via orderBy.limit, which
  * Spark executes as TakeOrderedAndProject, no full sort) do NOT go
  * through this helper. Small-aggregate outputs (a few dozen rows) keep
  * their plain orderBy — sorting them is free.
  *
  * Usage: `df.transform(Gate.ordered("a", "b"))`.
  */
object Gate {
  def ordered(cols: String*)(df: DataFrame): DataFrame =
    orderedBy(cols.map(col): _*)(df)

  def orderedBy(cols: Column*)(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.gateSort", "true").toBoolean)
      df.orderBy(cols: _*)
    else df
}
