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
  * falls back to "No Partition Defined" and warns it is moving all rows to a
  * single partition. Pinning the partition columns preserves the DECLARED
  * keys in the spec: callers whose key columns are genuinely non-constant
  * get correct hash-partitioning (and a stable plan shape) instead of a
  * folded-away spec, and the wrapper is a zero-cost identity (the generated
  * code is the child's own). Note what Pin does NOT do: a key that really is
  * one constant value still hashes every row to the same partition — Pin
  * fixes the plan shape, not physical skew; single-valued keys are a data
  * problem no partition spec can shard.
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
