package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps Columns around ColumnNode (not Expression); the public
  * conversion lives in the sql-private ExpressionUtils. This bridge is the
  * single sanctioned crossing point for graft's custom Catalyst expressions
  * (cf. public pattern in e.g. Qbeast's DatasetFactory; SNIPPETS.md [3]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
