package graft.plans

import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-backed Bloom-filter membership probe.
  *
  * The bitmap travels as a Spark BROADCAST VARIABLE (packed 64-bit words,
  * m/8 bytes over torrent transport, fetched once per executor) and the
  * expression holds only the handle — the Catalyst plan stays O(1) in m.
  * The earlier formulation inlined the bitmap as a `typedLit` array
  * literal, which put m boxed Booleans INSIDE the expression tree: plan
  * serialization, codegen constant pools, and every task's closure grew
  * with the filter (the round-8 audit's "plan-literal bitmap" finding).
  *
  * Bit positions replicate [[graft.operators.BloomFilter.positions]]
  * exactly — md5 of "<key>:bf<i>", first 8 hex chars as an unsigned int,
  * mod m — so the DuckDB oracle (and any engine with md5) reconstructs the
  * identical admit set; swapping the transport changed no probe result.
  *
  * Codegen: the generated body fetches the words array ONCE per operator
  * instance (mutable state init, not per row) and calls one static helper
  * per row — the md5 work dominates, as in [[ShingleHash]], but keeping a
  * doGenCode body means the probe stays inside the surrounding
  * whole-stage-codegen span instead of forcing a fallback boundary in the
  * fact table's hot filter.
  */
case class BloomProbe(child: Expression, words: Broadcast[Array[Long]],
                      m: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects a string key (cast first), got ${t.catalogString}")
  }

  override def nullSafeEval(key: Any): Any =
    BloomProbe.probe(key.asInstanceOf[UTF8String], words.value, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomWords", words,
      classOf[Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "bloomArr",
      v => s"$v = (long[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = graft.plans.BloomProbe.probe($key, $arr, $m, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_probe"
}

object BloomProbe {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Pack a Boolean bitmap into 64-bit words (bit p → word p>>>6, bit
    * p&63) — 8× denser than Boolean[] and the layout [[probe]] reads.
    */
  def pack(bits: Array[Boolean]): Array[Long] = {
    val words = new Array[Long]((bits.length + 63) >>> 6)
    var p = 0
    while (p < bits.length) {
      if (bits(p)) words(p >>> 6) |= 1L << (p & 63)
      p += 1
    }
    words
  }

  /** True iff all k md5-derived positions of `key` are set. Static (a
    * Scala-object forwarder) so the generated Java calls it directly.
    */
  def probe(key: UTF8String, words: Array[Long], m: Int, k: Int): Boolean = {
    val base = key.toString
    var i = 0
    while (i < k) {
      val md = digest.get()
      md.reset()
      val b = md.digest((base + ":bf" + i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
      val p = (v % m).toInt
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
