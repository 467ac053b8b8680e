package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's public `Column` is ColumnNode-based and the classic
  * Expression↔Column bridge (`classic.ExpressionUtils`) is
  * `private[sql]`. Custom Catalyst expressions (graft.functions.*) need
  * that bridge, so this one-file shim lives inside the `sql` package
  * tree — the standard extension-point pattern for libraries that ship
  * native expressions against Spark 4.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
