package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for [[graft.plans.GraftExtensions]].
  *
  * Spark 4 rebased `Column` on `ColumnNode` and made the adapters
  * (`classic.ExpressionUtils.column/expression`) private[sql]. A library
  * that registers Column-combinator functions in the FunctionRegistry
  * needs exactly these two hops — wrap the SQL call's child expressions,
  * apply the combinator, unwrap the result — so this one-object file
  * lives in the `org.apache.spark.sql` package to reach them (the
  * established extension-library pattern; no Spark internals are copied
  * or modified).
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** EAGER ColumnNode → Expression conversion. `ExpressionUtils.expression`
    * only wraps the node lazily; an expression registered through the
    * FunctionRegistry must come back as a real (resolvable) catalyst tree
    * or execution dies on an unevaluable ColumnNodeExpression.
    */
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
