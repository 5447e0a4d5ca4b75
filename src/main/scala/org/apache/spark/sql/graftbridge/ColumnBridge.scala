package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ Catalyst-Expression bridge
  * (`classic.ExpressionUtils`) private[sql]; custom native expressions
  * still need it to surface as Columns. This shim lives inside the
  * org.apache.spark.sql namespace purely to re-export those two calls —
  * the standard technique used by Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
