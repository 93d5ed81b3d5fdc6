package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Bridge to the sql-private Column <-> Expression converters: Spark 4
  * removed `Column.expr` from the public surface (columns are now
  * connect-agnostic ColumnNodes), so extension code that must hand the
  * analyzer a Catalyst tree — e.g. a FunctionBuilder returning a
  * compiled predicate — goes through this package-privileged shim.
  * The eager converter (not ExpressionUtils' lazy ColumnNodeExpression
  * wrapper) is required: a FunctionBuilder's result is substituted
  * mid-analysis, where a still-wrapped node never gets converted.
  */
object ColumnBridge {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
