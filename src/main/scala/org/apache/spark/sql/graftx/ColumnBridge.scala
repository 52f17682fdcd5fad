package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4.x's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 decoupled the public `Column` API from Catalyst (`Column.expr`
  * is gone; columns wrap `ColumnNode`s for Connect compatibility). Classic
  * execution keeps `org.apache.spark.sql.classic.ExpressionUtils` for the
  * conversion, but it is `private[sql]` — this one-file shim, placed under
  * the `org.apache.spark.sql` package tree, is the minimal sanctioned-by-
  * visibility way to register custom Catalyst expressions (e.g.
  * graft.functions.CosineSimFloat) as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
