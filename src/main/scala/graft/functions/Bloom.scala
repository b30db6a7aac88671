package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe over Spark's own sketch machinery — the
  * same `BloomFilterAggregate`/`BloomFilterMightContain` expression
  * pair Spark's runtime row-level filtering injects into shuffle joins,
  * here surfaced as an explicit operator building block (the optimizer
  * only injects them into equi-join plans it owns; an ingest gate wants
  * the filter as a first-class, persistable artifact).
  *
  * Both sides hash through `xxhash64` (the aggregate stores 64-bit
  * XXH64 keys), so build and probe agree by construction. The probe is
  * a codegen'd native predicate — no UDF, no interpreted path.
  */
object Bloom {

  /** ONE distributed aggregate pass over `df` builds the filter:
    * per-partition sketches OR-merge up the tree (mergeable, constant
    * size — ~1.2 bytes/key at the built-in fpp), and only the final
    * serialized bit array (not the keys) reaches the driver. Returns
    * null on empty input (probe then matches nothing).
    */
  def buildBytes(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = GraftSql.column(
      new BloomFilterAggregate(GraftSql.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())
    df.agg(agg.as("bf")).head.getAs[Array[Byte]]("bf")
  }

  /** Membership probe against a built filter, as a foldable binary
    * literal — ships with the task closure exactly once, like a
    * broadcast var. False positives possible, false negatives not.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    GraftSql.column(BloomFilterMightContain(
      Literal(filter, BinaryType), GraftSql.expression(xxhash64(key))))
}
