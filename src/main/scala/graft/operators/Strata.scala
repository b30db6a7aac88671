package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equal-population banding (activity quartiles, balance deciles) with
  * the 100 TB escape hatch built in — the ApproxAtScale pattern applied
  * to NTILE, which the optimizer rule cannot rewrite generically
  * (killing the sort changes a Window node into a boundary join, not an
  * aggregate-function swap, so the decision lives at the operator
  * level).
  *
  * Exact path (default): `ntile(n)` over (value, tiebreak) — a global
  * window is a SINGLE-TASK sort, fine while the banded frame is a
  * reduced user/customer dimension (users ≪ events), but a real wall
  * past ~10⁸ rows. Approx path (`spark.graft.approx=true`): band
  * boundaries from `approx_percentile`'s GK sketch — constant memory,
  * map-side combinable, no global sort — then band-by-comparison
  * against the broadcast 1-row (or per-partition) boundary frame. The
  * trade is exact equal-population strata for value-banded strata: rows
  * tied on `value` across a quartile boundary band together instead of
  * splitting by tiebreak, and sketch error can shift a boundary by
  * O(1/accuracy) quantile mass (`spark.graft.approx.accuracy`).
  * StrataSpec pins the agreement against exact NTILE at the shipped
  * SFs; the oracle gate always runs the exact path.
  */
object Strata {

  private def approxOn(s: SparkSession): Boolean =
    s.conf.get("spark.graft.approx", "false").toBoolean

  /** `df` plus column `out` ∈ [1, n]: equal-population band of `value`
    * within each `partitionBy` group (global when empty).
    */
  def band(s: SparkSession, df: DataFrame, n: Int, value: String,
      tiebreak: String, out: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    if (!approxOn(s)) {
      val w =
        if (partitionBy.isEmpty) Window.orderBy(col(value), col(tiebreak))
        else Window.partitionBy(partitionBy.map(col): _*)
          .orderBy(col(value), col(tiebreak))
      df.withColumn(out, ntile(n).over(w))
    } else {
      val accuracy = s.conf.get("spark.graft.approx.accuracy", "10000").toInt
      val pcts = array((1 until n).map(k => lit(k.toDouble / n)): _*)
      val bnd = percentile_approx(col(value), pcts, lit(accuracy)).as("__bnd")
      // 1 + (# boundaries strictly below value): a codegen'd when-free
      // comparison chain — no higher-order lambda in the per-row path
      val bandOf = (1 until n).foldLeft(lit(1)) { (acc, k) =>
        acc + (col(value) > element_at(col("__bnd"), k)).cast("int")
      }
      val banded =
        if (partitionBy.isEmpty) df.crossJoin(broadcast(df.agg(bnd)))
        else df.join(
          broadcast(df.groupBy(partitionBy.map(col): _*).agg(bnd)),
          partitionBy)
      banded.withColumn(out, bandOf).drop("__bnd")
    }
}
