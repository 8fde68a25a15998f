package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dHash / aHash over a sampled luminance GRID — the
  * perceptual-hash step of the image near-dup family (SURVEY §2 item 41b):
  * the decode stage ([[graft.operators.multimodal.ImageHash.grids]])
  * reduces each decoded image to a fixed
  * [[ImageGridHash.GridRows]]×[[ImageGridHash.GridCols]] row-major
  * luminance array (r+g+b per point-sampled pixel — integer-only, so any
  * engine replays it from the pixel bytes), and this expression folds that
  * tiny array into a 56-bit hash inside whole-stage codegen:
  *
  *   - dHash (difference hash, `dhash = true`): bit (gy·8+gx) set iff
  *     grid[gy][gx+1] > grid[gy][gx] — brightness GRADIENTS, robust to
  *     global brightness/contrast shifts;
  *   - aHash (average hash): bit set iff grid[gy][gx]·56 > Σ grid over
  *     the 8×7 window — the cross-multiplied mean compare keeps the
  *     whole computation in exact integers (no division to replay).
  *
  * 56 bits (not 64) by design: both engines carry the hash in a signed
  * 64-bit integer and a set sign bit would flip comparison/ordering
  * semantics between them. 56 = 7 bands × 8 bits is also exactly the
  * banding grain of the Hamming near-dup join: Hamming distance ≤ 6 <
  * bands guarantees (pigeonhole) one clean band, so banded retrieval at
  * the default threshold is EXACT, not approximate.
  *
  * Null semantics: null grid (an undecodable payload) → null hash; a
  * grid of the wrong length throws loudly — a silently mis-shaped grid
  * would be a plausible-but-wrong hash that quietly merges distinct
  * images.
  */
case class ImageGridHash(child: Expression, dhash: Boolean)
    extends UnaryExpression {

  import ImageGridHash._

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val g = a.asInstanceOf[ArrayData]
    if (g.numElements() != GridRows * GridCols)
      throw new IllegalArgumentException(
        s"$prettyName grid length ${g.numElements()} != ${GridRows * GridCols}")
    var bits = 0L
    if (dhash) {
      var gy = 0
      while (gy < GridRows) {
        var gx = 0
        while (gx < GridCols - 1) {
          if (g.getInt(gy * GridCols + gx + 1) > g.getInt(gy * GridCols + gx))
            bits |= 1L << (gy * (GridCols - 1) + gx)
          gx += 1
        }
        gy += 1
      }
    } else {
      var sum = 0L
      var gy = 0
      while (gy < GridRows) {
        var gx = 0
        while (gx < GridCols - 1) {
          sum += g.getInt(gy * GridCols + gx)
          gx += 1
        }
        gy += 1
      }
      gy = 0
      while (gy < GridRows) {
        var gx = 0
        while (gx < GridCols - 1) {
          if (g.getInt(gy * GridCols + gx).toLong * Bits > sum)
            bits |= 1L << (gy * (GridCols - 1) + gx)
          gx += 1
        }
        gy += 1
      }
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val bits = ctx.freshName("bits")
      val sum = ctx.freshName("sum")
      val gy = ctx.freshName("gy")
      val gx = ctx.freshName("gx")
      val guard =
        s"""
           |if ($g.numElements() != ${GridRows * GridCols}) {
           |  throw new IllegalArgumentException(
           |    "$prettyName grid length " + $g.numElements() + " != ${GridRows * GridCols}");
           |}
         """.stripMargin
      val body = if (dhash)
        s"""
           |long $bits = 0L;
           |for (int $gy = 0; $gy < $GridRows; $gy++) {
           |  for (int $gx = 0; $gx < ${GridCols - 1}; $gx++) {
           |    if ($g.getInt($gy * $GridCols + $gx + 1) > $g.getInt($gy * $GridCols + $gx)) {
           |      $bits |= 1L << ($gy * ${GridCols - 1} + $gx);
           |    }
           |  }
           |}
         """.stripMargin
      else
        s"""
           |long $bits = 0L;
           |long $sum = 0L;
           |for (int $gy = 0; $gy < $GridRows; $gy++) {
           |  for (int $gx = 0; $gx < ${GridCols - 1}; $gx++) {
           |    $sum += $g.getInt($gy * $GridCols + $gx);
           |  }
           |}
           |for (int $gy = 0; $gy < $GridRows; $gy++) {
           |  for (int $gx = 0; $gx < ${GridCols - 1}; $gx++) {
           |    if ((long) $g.getInt($gy * $GridCols + $gx) * $Bits > $sum) {
           |      $bits |= 1L << ($gy * ${GridCols - 1} + $gx);
           |    }
           |  }
           |}
         """.stripMargin
      s"$guard\n$body\n${ev.value} = $bits;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String =
    if (dhash) "image_grid_dhash" else "image_grid_ahash"
}

object ImageGridHash {
  /** Sampled grid geometry: GridCols luminance columns feed
    * GridCols−1 = 8 difference bits per row; GridRows = 7 rows → 56 bits.
    */
  val GridCols = 9
  val GridRows = 7
  /** Hash width = (GridCols−1)·GridRows; also the aHash window size. */
  val Bits: Int = (GridCols - 1) * GridRows
}
