package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The hub set a [[HubTopTwo]] probe scores against, shipped ONCE per
  * executor as a broadcast (the [[BloomProbe]] transport pattern): cid-
  * ascending ids, norms, and row-major flattened vectors (H·dim doubles —
  * ≤ 2 MB at the 4096-hub cap).
  */
final case class HubSet(cids: Array[Long], nrms: Array[Double],
                        vecs: Array[Double], dim: Int) {
  def size: Int = cids.length
}

/** Native codegen'd top-2-nearest-hub assignment: for one corpus vector,
  * scan every hub (cid ascending), cosine = in-element-order dot over
  * precomputed norms, and keep the two best under STRICT `>` — exactly
  * row_number over (cos DESC, cid ASC) ∈ {1, 2}, the order the q100
  * oracle replays.
  *
  * Why an Expression: the equivalent `aggregate()` higher-order fold
  * never enters codegen — each of the H lambda steps runs interpreted
  * with a struct allocation, and at the 512-hub ladder step the fold
  * alone dominated the 100× probe (108 s for 200k rows). This compiles
  * to two tight primitive loops, the same reasoning as [[DotProduct]].
  *
  * Returns struct(i1, i2): nearest and second-nearest hub cid, -1 for an
  * unfilled slot (fewer hubs than 2). Null input array → null.
  */
case class HubTopTwo(left: Expression, right: Expression,
                     hubs: Broadcast[HubSet]) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("i1", LongType, nullable = false),
    StructField("i2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hub_top_two expects (array<float|double>, double norm), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, nrm: Any): Any =
    HubTopTwo.top2(vec.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      hubs.value, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("hubSet", hubs,
      classOf[Broadcast[HubSet]].getName)
    val hs = ctx.addMutableState(classOf[HubSet].getName, "hubSetVal",
      v => s"$v = (${classOf[HubSet].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev, (vec, nrm) =>
      s"${ev.value} = graft.plans.HubTopTwo.top2($vec, $nrm, $hs, $isFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hub_top_two"
}

object HubTopTwo {

  /** Static forwarder target for the generated code: two primitive loops,
    * no allocation besides the 2-field result row.
    */
  def top2(vec: ArrayData, nrm: Double, hs: HubSet,
           isFloat: Boolean): InternalRow = {
    val d = hs.dim
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"hub_top_two length mismatch: ${vec.numElements()} vs $d")
    var c1 = Double.NegativeInfinity
    var i1 = -1L
    var c2 = Double.NegativeInfinity
    var i2 = -1L
    var h = 0
    while (h < hs.size) {
      var dot = 0.0d
      var i = 0
      val base = h * d
      while (i < d) {
        // null elements (either side) contribute 0, matching DotProduct's
        // skip; hub-side nulls were zeroed at collection
        if (!vec.isNullAt(i)) {
          val xv = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += xv * hs.vecs(base + i)
        }
        i += 1
      }
      val cc = dot / (nrm * hs.nrms(h))
      // Double.compare, NOT primitive `>`: Spark SQL (and DuckDB) order
      // NaN as the LARGEST double, so a zero-norm vector's NaN cosine
      // must outrank real scores here too or the graph diverges from the
      // oracle's row_number replay; primitive NaN > x is always false
      if (java.lang.Double.compare(cc, c1) > 0) {
        c2 = c1; i2 = i1; c1 = cc; i1 = hs.cids(h)
      } else if (java.lang.Double.compare(cc, c2) > 0) {
        c2 = cc; i2 = hs.cids(h)
      }
      h += 1
    }
    new GenericInternalRow(Array[Any](i1, i2))
  }
}
