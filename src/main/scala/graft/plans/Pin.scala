package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that refuses constant folding.
  *
  * Catalyst folds window PARTITION BY expressions it can prove constant
  * (e.g. a currency-pair column built upstream with `lit("USD")`) down to
  * literals and then drops them from the partition spec entirely — WindowExec
  * falls back to "No Partition Defined" and moves ALL rows to a single
  * partition. For a calendar-sized FX dim that is merely noisy; for any
  * bigger caller it is a silent scale cliff. Pinning the partition columns
  * keeps them in the spec: the plan stays hash-partitioned on the declared
  * keys whether or not the optimizer can prove them constant, and for
  * genuinely non-constant columns the wrapper is a zero-cost identity (the
  * generated code is the child's own).
  */
case class Pin(child: Expression) extends UnaryExpression {

  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pin"
}
