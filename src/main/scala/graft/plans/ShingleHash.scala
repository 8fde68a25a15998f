package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle hashing (default n=3): normalize → tokenize
  * → shingle → md5-prefix mod P, in one JVM pass.
  *
  * Semantically identical to the composed built-in pipeline
  * (TextShingles.shingleHashes): normalization trims ASCII spaces and
  * collapses runs of whitespace to one space after lowercasing (ROOT
  * locale); hash = first 4 md5 bytes of the UTF-8 shingle as an unsigned
  * int, mod 2147483647 — exactly what the DuckDB oracle computes with
  * `CAST('0x' || substr(md5(s),1,8) AS BIGINT) % 2147483647`.
  *
  * Why a custom expression: the built-in formulation nests three
  * higher-order functions (transform·transform·array_distinct) which run
  * interpreted with per-element lambda frames and intermediate UTF8String
  * allocations; this eval hashes straight out of one char scan. It uses
  * CodegenFallback (the md5 call dominates; a codegen body would not help).
  *
  * @param distinct true → first-occurrence-distinct hash set (dedup
  *                 family); false → ordered non-distinct sequence
  *                 (winnowing needs positions).
  * @param n        shingle width in tokens. 3 is the near-dup default;
  *                 production benchmark DECONTAMINATION uses 8–13-gram
  *                 windows (GPT-3 appendix C / The Pile / Llama), which
  *                 [[graft.operators.dedup.Decontaminate]] threads
  *                 through here. Documents shorter than n tokens hash
  *                 the whole normalized text.
  */
case class ShingleHash(child: Expression, distinct: Boolean, n: Int = 3)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val hashes = ShingleHash.hashText(input.asInstanceOf[UTF8String].toString, distinct, n)
    ArrayData.toArrayData(hashes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash"
}

object ShingleHash {
  val P = 2147483647L

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Spark's trim() strips ASCII space (0x20) only — replicate exactly. */
  private def trimSpaces(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** Collapse before trimming (same order as TextFns.normalizeText): after
    * the collapse all whitespace is ASCII spaces, so the space-only trim
    * removes every leading/trailing whitespace run.
    */
  def normalize(text: String): String =
    trimSpaces(text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " "))

  private def hashShingle(s: String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    v % P
  }

  def hashText(text: String, distinct: Boolean, n: Int = 3): Array[Long] = {
    val norm = normalize(text)
    val toks = norm.split(" ", -1)
    val shingles: Array[String] =
      if (toks.length >= n)
        Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
      else Array(norm)
    val out = shingles.map(hashShingle)
    if (distinct) {
      // first-occurrence order, like array_distinct
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      out.foreach(seen.add)
      seen.toArray
    } else out
  }
}
