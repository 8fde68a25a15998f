package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd difference hash over an audio ENERGY PROFILE — the
  * perceptual-hash step of the audio near-dup family (SURVEY §2 item
  * 41g), the sound-side sibling of [[ImageGridHash]]: the decode stage
  * ([[graft.operators.multimodal.AudioHash.energies]]) reduces each
  * decoded PCM16 stream to a fixed [[EnergyDiffHash.Windows]]-entry
  * integer energy profile (Σ|sample| per equal time window — the
  * integer-only restriction of the chromaprint idea, so any engine
  * replays it from the raw samples with plain int64 ops; a spectral
  * float transform would not be bitwise cross-engine replayable), and
  * this expression folds that profile into a 56-bit hash inside
  * whole-stage codegen: bit b set iff E[b+1] > E[b].
  *
  * Energy COMPARISONS (not values) are what make the hash perceptual:
  * a volume-scaled or re-encoded copy of the same recording scales every
  * window energy by ~the same factor, preserving the comparisons, while
  * byte-level fingerprints diverge on the first sample. 56 bits for the
  * same two reasons as [[ImageGridHash]]: the sign bit stays clear in
  * both engines' signed 64-bit carriers, and 56 matches the banded
  * Hamming retrieval grain (maxHamming < bands ⇒ exact by pigeonhole).
  *
  * Null semantics: null profile (undecodable / too-short payload) →
  * null hash; a wrong-length profile throws loudly — a silently
  * mis-shaped profile would be a plausible-but-wrong hash that quietly
  * merges distinct recordings.
  */
case class EnergyDiffHash(child: Expression) extends UnaryExpression {

  import EnergyDiffHash._

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != Windows)
      throw new IllegalArgumentException(
        s"$prettyName profile length ${e.numElements()} != $Windows")
    var bits = 0L
    var b = 0
    while (b < Bits) {
      if (e.getLong(b + 1) > e.getLong(b)) bits |= 1L << b
      b += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val bits = ctx.freshName("bits")
      val b = ctx.freshName("b")
      s"""
         |if ($e.numElements() != $Windows) {
         |  throw new IllegalArgumentException(
         |    "$prettyName profile length " + $e.numElements() + " != $Windows");
         |}
         |long $bits = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  if ($e.getLong($b + 1) > $e.getLong($b)) {
         |    $bits |= 1L << $b;
         |  }
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_energy_dhash"
}

object EnergyDiffHash {
  /** Profile geometry: Windows equal time windows feed Windows−1 = 56
    * adjacent-comparison bits.
    */
  val Windows = 57

  /** Hash width in bits. */
  val Bits: Int = Windows - 1
}
