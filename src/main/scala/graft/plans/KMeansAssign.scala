package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The centroid set a [[KMeansAssign]] probe scores against: k row-major
  * flattened QUANTIZED (fixed-point int64) centroid vectors, shipped once
  * per executor as a broadcast (the [[HubSet]]/[[BloomProbe]] transport).
  * Component magnitudes must stay below 2^27 so a squared-diff sum over
  * any realistic dim count fits int64 — [[graft.operators.similarity
  * .KMeansExact]] enforces the bound at quantization time.
  */
final case class CentroidSet(cents: Array[Long], k: Int, dim: Int)

/** Native codegen'd nearest-centroid assignment over EXACT int64
  * arithmetic: for one quantized vector (array<long>), scan every centroid
  * (cid ascending) and keep the argmin squared-L2 distance under strict
  * `<` — exactly row_number over (dist ASC, cid ASC) = 1, the order the
  * training oracles replay. Integer distances make every comparison (and
  * every tie) engine-independent: no float rounding, no NaN ordering.
  *
  * Why an Expression: the equivalent per-centroid literal expression tree
  * is O(k·dim) Catalyst nodes — fine for 8 centroids, a codegen bomb at
  * the 4096-hub ladder cap — and an `aggregate()` HOF fold never enters
  * codegen (the [[HubTopTwo]] lesson: 108 s interpreted at H=512). This
  * compiles to two tight primitive loops.
  *
  * Returns struct(cid, dist): nearest centroid id and its squared
  * distance (for medoid selection downstream). Null array → null; null
  * ELEMENTS are rejected loudly — squared distance has no
  * skip-consistent null semantics (the [[PqAnn]] dense-vector
  * discipline), and training must not silently zero-fill.
  */
case class KMeansAssign(child: Expression, cents: Broadcast[CentroidSet])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmeans_assign expects array<bigint> (quantized), got ${t.catalogString}")
  }

  override def nullSafeEval(vec: Any): Any =
    KMeansAssign.nearest(vec.asInstanceOf[ArrayData], cents.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centSet", cents,
      classOf[Broadcast[CentroidSet]].getName)
    val cs = ctx.addMutableState(classOf[CentroidSet].getName, "centSetVal",
      v => s"$v = (${classOf[CentroidSet].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.plans.KMeansAssign.nearest($vec, $cs);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "kmeans_assign"
}

object KMeansAssign {

  /** Static forwarder target for the generated code: pure int64 loops. */
  def nearest(vec: ArrayData, cs: CentroidSet): InternalRow = {
    val d = cs.dim
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"kmeans_assign length mismatch: ${vec.numElements()} vs $d")
    var bestDist = Long.MaxValue
    var bestCid = -1L
    var c = 0
    while (c < cs.k) {
      var dist = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        if (vec.isNullAt(i))
          throw new IllegalArgumentException(
            s"kmeans_assign: null element at index $i — training requires " +
              "dense vectors (filter or impute upstream)")
        val diff = vec.getLong(i) - cs.cents(base + i)
        dist += diff * diff
        i += 1
      }
      // strict < with cids scanned ascending = (dist ASC, cid ASC) rank 1
      if (dist < bestDist) { bestDist = dist; bestCid = c.toLong }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestDist))
  }
}
