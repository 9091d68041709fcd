package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column⇄Expression converters (the
  * classic-API seam every Spark extension library crosses). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * modifier; no Spark behavior is altered.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
