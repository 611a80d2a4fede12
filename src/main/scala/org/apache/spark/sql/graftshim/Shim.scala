package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (the sanctioned
  * escape hatch for engines extending Catalyst from outside Spark's
  * namespace; lives in a subpackage of org.apache.spark.sql purely for
  * access, contains no Spark-internal logic).
  */
object Shim {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
