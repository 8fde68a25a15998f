package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** GROUP-SLICED quantized centroid set for the two-level k-means rung
  * ([[graft.operators.similarity.KMeansTwoLevel]]): group g's centroids
  * are rows `offsets(g) until offsets(g+1)` of the row-major flattened
  * int64 array, and a probe for a row carrying group id g scans ONLY that
  * slice — per-row cost k_fine, not k_total. Same transport as
  * [[CentroidSet]] (one broadcast per executor); `offsets` has
  * nGroups + 1 entries.
  */
final case class GroupedCentroidSet(offsets: Array[Int], cents: Array[Long],
                                    dim: Int) {
  def groups: Int = offsets.length - 1
}

/** [[KMeansAssign]] restricted to one group's slice: argmin squared-L2
  * over exact int64, ties → lowest LOCAL centroid index, scanning the
  * group ascending (= row_number over (dist ASC, fcid ASC) = 1 — the
  * order the two-level training oracle replays per coarse cell). Returns
  * struct(cid, dist) where cid is the LOCAL index within the group.
  *
  * An empty group throws: during training every probed group id comes
  * from the group's own seeded members, so an empty slice is a
  * seeding/assignment bug, not a data condition.
  */
case class KMeansAssignGrouped(left: Expression, right: Expression,
                               cents: Broadcast[GroupedCentroidSet])
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmeans_assign_grouped expects (array<bigint>, bigint group id), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(vec: Any, gid: Any): Any =
    KMeansAssignGrouped.nearest(vec.asInstanceOf[ArrayData],
      gid.asInstanceOf[Long], cents.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("groupedCentSet", cents,
      classOf[Broadcast[GroupedCentroidSet]].getName)
    val cs = ctx.addMutableState(classOf[GroupedCentroidSet].getName,
      "groupedCentSetVal",
      v => s"$v = (${classOf[GroupedCentroidSet].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev, (vec, gid) =>
      s"${ev.value} = graft.plans.KMeansAssignGrouped.nearest($vec, $gid, $cs);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kmeans_assign_grouped"
}

object KMeansAssignGrouped {

  /** Static forwarder target for the generated code: pure int64 loops
    * over the group's slice.
    */
  def nearest(vec: ArrayData, gid: Long, cs: GroupedCentroidSet): InternalRow = {
    val d = cs.dim
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"kmeans_assign_grouped length mismatch: ${vec.numElements()} vs $d")
    if (gid < 0 || gid >= cs.groups)
      throw new IllegalArgumentException(
        s"kmeans_assign_grouped: group $gid outside [0, ${cs.groups})")
    val from = cs.offsets(gid.toInt)
    val until = cs.offsets(gid.toInt + 1)
    if (from >= until)
      throw new IllegalArgumentException(
        s"kmeans_assign_grouped: group $gid has no centroids — seeding " +
          "guarantees every probed group is non-empty")
    var bestDist = Long.MaxValue
    var bestCid = -1L
    var c = from
    while (c < until) {
      var dist = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        if (vec.isNullAt(i))
          throw new IllegalArgumentException(
            s"kmeans_assign_grouped: null element at index $i — training " +
              "requires dense vectors (filter or impute upstream)")
        val diff = vec.getLong(i) - cs.cents(base + i)
        dist += diff * diff
        i += 1
      }
      // strict < scanning local ids ascending = (dist ASC, fcid ASC) rank 1
      if (dist < bestDist) { bestDist = dist; bestCid = (c - from).toLong }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestDist))
  }
}

/** GROUP-SLICED hub set for the two-level COSINE assignment probe: group
  * g's hubs are rows `offsets(g) until offsets(g+1)` of the row-major
  * flattened double array (dequantized fine centroids). Broadcast once
  * per executor like [[HubSet]].
  */
final case class GroupedHubSet(offsets: Array[Int], nrms: Array[Double],
                               vecs: Array[Double], dim: Int) {
  def groups: Int = offsets.length - 1
}

/** [[HubTopTwo]]'s argmax restricted to one group's slice: best-cosine
  * hub among the row's group, strict `>` via Double.compare (NaN ranks
  * LARGEST, matching Spark SQL and DuckDB ordering) with local ids
  * scanned ascending — exactly row_number over (cos DESC, fcid ASC) = 1,
  * the order the two-level assignment oracle replays. Returns the LOCAL
  * hub index (long); an EMPTY group returns 0 — a coarse cell that
  * attracted no training sample has no fine structure, so everything it
  * catches shares one fine cell (the oracle's COALESCE(fcid, 0)).
  */
case class HubArgmaxGrouped(first: Expression, second: Expression,
                            third: Expression, hubs: Broadcast[GroupedHubSet])
  extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"hub_argmax_grouped expects (array<float|double>, double norm, " +
          s"bigint group id), got ${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString}")
    }

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, nrm: Any, gid: Any): Any =
    HubArgmaxGrouped.best(vec.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], gid.asInstanceOf[Long], hubs.value, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("groupedHubSet", hubs,
      classOf[Broadcast[GroupedHubSet]].getName)
    val hs = ctx.addMutableState(classOf[GroupedHubSet].getName,
      "groupedHubSetVal",
      v => s"$v = (${classOf[GroupedHubSet].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev, (vec, nrm, gid) =>
      s"${ev.value} = graft.plans.HubArgmaxGrouped.best($vec, $nrm, $gid, $hs, $isFloat);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "hub_argmax_grouped"
}

object HubArgmaxGrouped {

  /** Static forwarder target for the generated code: one primitive loop
    * over the group's slice.
    */
  def best(vec: ArrayData, nrm: Double, gid: Long, hs: GroupedHubSet,
           isFloat: Boolean): Long = {
    val d = hs.dim
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"hub_argmax_grouped length mismatch: ${vec.numElements()} vs $d")
    if (gid < 0 || gid >= hs.groups)
      throw new IllegalArgumentException(
        s"hub_argmax_grouped: group $gid outside [0, ${hs.groups})")
    val from = hs.offsets(gid.toInt)
    val until = hs.offsets(gid.toInt + 1)
    var c1 = Double.NegativeInfinity
    var i1 = 0L // empty group → fine cell 0 (the oracle's COALESCE)
    var first = true
    var h = from
    while (h < until) {
      var dot = 0.0d
      var i = 0
      val base = h * d
      while (i < d) {
        // null elements contribute 0, matching DotProduct's skip
        if (!vec.isNullAt(i)) {
          val xv = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += xv * hs.vecs(base + i)
        }
        i += 1
      }
      val cc = dot / (nrm * hs.nrms(h))
      if (first || java.lang.Double.compare(cc, c1) > 0) {
        c1 = cc; i1 = (h - from).toLong; first = false
      }
      h += 1
    }
    i1
  }
}
