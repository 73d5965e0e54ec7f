package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[sql]` Column↔Expression conversion — the
  * standard mechanism for libraries contributing custom Catalyst expressions
  * (same role as Column(expr) in Spark 3.x, which Spark 4 moved behind
  * classic.ExpressionUtils).
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
