package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 made `Column` a thin wrapper over a connect-compatible
  * `ColumnNode`; the classic converter (`ExpressionUtils`) is
  * `private[sql]`, so custom native expressions need this one-file shim
  * living inside the `org.apache.spark.sql` package tree. Mirrors what
  * Spark's own internal callers do — no private state is touched beyond
  * the two pure conversion calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
