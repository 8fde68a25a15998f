package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.functions.CleanFns

/** Property tests: the column-expression parsers agree with a direct Scala
  * transliteration of the reference's Python parsers
  * (transform_tiki.py:191 parse_sales_volume, :261 parse_discount_rate)
  * across generated inputs.
  */
class ParserPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics, straight port of parse_sales_volume. */
  private def refSalesVolume(value: String): Long = {
    if (value == null) return 0L
    val text = value.toLowerCase(java.util.Locale.ROOT).trim
    val suffix = """(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)""".r
    suffix.findFirstMatchIn(text) match {
      case Some(m) =>
        val number = m.group(1).replace(',', '.').toDouble
        val mult = if (m.group(2) == "k") 1000.0 else 1000000.0
        (number * mult).toLong
      case None =>
        val thousand = """(\d{1,3}(?:\.\d{3})+)""".r
        thousand.findFirstMatchIn(text) match {
          case Some(m) => m.group(1).replace(".", "").toLong
          case None =>
            """(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
        }
    }
  }

  private val salesGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 99999)
    frac <- Gen.option(Gen.chooseNum(1, 9))
    sep <- Gen.oneOf(".", ",")
    suffix <- Gen.oneOf("", "k", "tr", "m", "trieu", "triệu")
    prefix <- Gen.oneOf("", "Đã bán ", "da ban ", "sold: ")
    space <- Gen.oneOf("", " ", "  ")
  } yield prefix + n + frac.map(f => s"$sep$f").getOrElse("") + space + suffix

  test("parseSalesVolume matches the reference port on generated inputs") {
    val samples = Gen.listOfN(300, salesGen).sample.get.distinct
    val got = samples.toDF("v")
      .select(col("v"), CleanFns.parseSalesVolume(col("v")).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == refSalesVolume(s), s"input '$s'")
    }
  }

  private val discountGen: Gen[String] = for {
    sign <- Gen.oneOf("", "-")
    n <- Gen.chooseNum(0, 100)
    pct <- Gen.oneOf("", "%")
    junk <- Gen.oneOf("", " off", "!!")
  } yield s"$sign$n$pct$junk"

  test("parseDiscountRate matches the reference port on generated inputs") {
    def ref(s: String): Int =
      """(\d+)""".r.findFirstMatchIn(s.trim).map(_.group(1).toInt).getOrElse(0)
    val samples = Gen.listOfN(200, discountGen).sample.get.distinct
    val got = samples.toDF("v")
      .select(col("v"), CleanFns.parseDiscountRate(col("v")).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach(s => assert(got(s) == ref(s), s"input '$s'"))
  }
}
