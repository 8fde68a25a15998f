package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A product-quantization codebook: `subs` subspaces × `k` codewords ×
  * `subDim` dims, flattened row-major as codewords(((s·k)+c)·subDim + d).
  * Broadcast once per executor ([[BloomProbe]]/[[HubTopTwo]] transport).
  * k ≤ 16 so one code packs in 4 bits and a full 8-subspace code word
  * packs into one INT — 64 float dims (256 B) compress to 4 B.
  */
final case class PqCodebook(codewords: Array[Double], subs: Int, k: Int,
                            subDim: Int) {
  require(k >= 1 && k <= 16, s"k must fit 4 bits, got $k")
  require(subs >= 1 && subs <= 8, s"subs must fit one int (4 bits each), got $subs")
  require(codewords.length == subs * k * subDim,
    s"codebook length ${codewords.length} != $subs*$k*$subDim")
}

/** Native codegen'd PQ encoder: per subspace, assign the sub-vector to its
  * L2-nearest codeword (squared distance, dims in order, STRICT `<` with
  * codewords scanned ascending — exactly row_number over (dist ASC,
  * code ASC) = 1, the order the q102 oracle replays; Double.compare so a
  * NaN distance sorts LAST like both engines' ASC ordering). Returns the
  * packed int (code of subspace s in bits 4s..4s+3).
  *
  * Why an Expression: encoding is the corpus-wide pass (subs·k·subDim
  * multiplies per row — 8192 at the default shape); as with [[HubTopTwo]]
  * an interpreted HOF fold per codeword would dominate the build.
  */
case class PqEncode(child: Expression, codebook: Broadcast[PqCodebook])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any): Any =
    PqEncode.encode(vec.asInstanceOf[ArrayData], codebook.value, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("pqCodebook", codebook,
      classOf[Broadcast[PqCodebook]].getName)
    val cb = ctx.addMutableState(classOf[PqCodebook].getName, "pqCodebookVal",
      v => s"$v = (${classOf[PqCodebook].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.plans.PqEncode.encode($vec, $cb, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  /** Static forwarder for the generated code: three tight loops. */
  def encode(vec: ArrayData, cb: PqCodebook, isFloat: Boolean): Int = {
    val d = cb.subs * cb.subDim
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"pq_encode length mismatch: ${vec.numElements()} vs $d")
    var packed = 0
    var s = 0
    while (s < cb.subs) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < cb.k) {
        var dist = 0.0d
        var i = 0
        val vecBase = s * cb.subDim
        val cwBase = ((s * cb.k) + c) * cb.subDim
        while (i < cb.subDim) {
          // loud on null elements: an L2 codeword distance has no
          // skip-consistent null analog (zero-filling silently diverges
          // from an engine that NULL-propagates) — PQ needs dense vectors
          if (vec.isNullAt(vecBase + i))
            throw new IllegalArgumentException(
              "pq_encode: embedding contains a null element; PQ requires " +
                "dense vectors — impute or drop upstream")
          val xv =
            if (isFloat) vec.getFloat(vecBase + i).toDouble
            else vec.getDouble(vecBase + i)
          val diff = xv - cb.codewords(cwBase + i)
          dist += diff * diff
          i += 1
        }
        if (java.lang.Double.compare(dist, best) < 0) { best = dist; bestC = c }
        c += 1
      }
      packed |= bestC << (4 * s)
      s += 1
    }
    packed
  }
}
