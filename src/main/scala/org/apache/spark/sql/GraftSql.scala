package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from graft's custom Catalyst expressions to the public Column
  * API. Spark 4 routes Column construction through ColumnNodes; the
  * conversion from a raw `Expression` lives behind `private[sql]`, so
  * this one-liner is the only code that needs to sit in the spark
  * package.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
