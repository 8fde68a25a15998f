package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Partial-aggregation top-k per group.
  *
  * [[Analytics.topNPerGroup]] (row_number window) shuffles and sorts EVERY
  * row of every group; this aggregator keeps a k-sized buffer per group on
  * the map side and merges buffers on the reduce side, so the shuffle
  * carries at most k rows per group per mapper. At 100 TB with hot groups
  * that is the difference between a spilling sort and a trivial shuffle.
  *
  * Ordering matches the window formulation `sortCol.desc, idCol.asc`
  * exactly (asserted in TopKSpec), including Spark's SQL double semantics:
  * NaN sorts as the largest value (first under desc) and null sort values
  * sort last (desc = nulls-last).
  */
object TopK {

  /** Sort value is boxed so a null sort column survives to the comparator. */
  private type Entry = (java.lang.Double, Long, Row)

  private val entryOrd: Ordering[Entry] = new Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int = {
      val (xs, ys) = (x._1, y._1)
      val c =
        if (xs == null && ys == null) 0
        else if (xs == null) 1 // desc => nulls last
        else if (ys == null) -1
        // java.lang.Double.compare = Spark SQL's double ordering (NaN
        // greatest); reversed operands give descending
        else java.lang.Double.compare(ys, xs)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  /** Input rows are pre-projected as (__sort, __id, original columns...).
    * The buffer trims lazily at 2k so each row costs amortized O(1) appends
    * and every O(k log k) sort is paid once per k rows, not per row.
    */
  private final class TopKAgg(k: Int)
      extends Aggregator[Row, List[Entry], Seq[Row]] {
    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], r: Row): List[Entry] = {
      val sortVal: java.lang.Double =
        if (r.isNullAt(0)) null
        else {
          // Spark SQL ordering treats -0.0 == 0.0 (SQLOrderingUtil);
          // java.lang.Double.compare does not — normalize so ties break by
          // id exactly like the window formulation
          val d = r.getDouble(0)
          java.lang.Double.valueOf(if (d == 0.0d) 0.0d else d)
        }
      maybeTrim((sortVal, r.getLong(1), r) :: buf)
    }
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      maybeTrim(a ++ b)
    private def maybeTrim(entries: List[Entry]): List[Entry] =
      if (entries.lengthCompare(2 * k) >= 0) entries.sorted(entryOrd).take(k)
      else entries
    override def finish(buf: List[Entry]): Seq[Row] =
      buf.sorted(entryOrd).take(k).map(_._3)
    override def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
    override def outputEncoder: Encoder[Seq[Row]] = Encoders.kryo[Seq[Row]]
  }

  /** Unambiguous printable group key: length-prefixed segments so
    * ("a","bc") can never collide with ("ab","c"), and a null marker
    * distinct from the string "null".
    */
  private def groupKey(r: Row, idx: Seq[Int]): String = {
    val sb = new StringBuilder
    idx.foreach { i =>
      if (r.isNullAt(i)) sb.append("-:")
      else {
        val s = r.get(i) match {
          // groupBy normalizes signed zero; String.valueOf would not
          case d: java.lang.Double if d == 0.0d => "0.0"
          case f: java.lang.Float if f == 0.0f  => "0.0"
          case v => String.valueOf(v)
        }
        sb.append(s.length).append(':').append(s)
      }
    }
    sb.result()
  }

  /** Top `k` rows per group by `sortCol` descending (`idCol`, a unique
    * long, ascending as tiebreak). Output schema = input schema + `rank`.
    *
    * `idCol` MUST be non-null and long-castable (numeric, or a string of
    * digits): the tiebreak rides a `cast("long")`, and a window-era caller
    * with an arbitrary orderable id (e.g. a free-form string doc id) would
    * otherwise null the cast and NPE inside the aggregator. The cast is
    * guarded with `raise_error` so such a caller fails with a named
    * contract violation, not an NPE — same discipline as
    * [[Mixture]]'s grouped prefix-sum id guard.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], sortCol: String,
               idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    groupCols.foreach { c =>
      val dt = df.schema(c).dataType
      val ok = dt match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType |
             org.apache.spark.sql.types.BinaryType => false
        case _ => true
      }
      // String.valueOf on arrays/binary yields identity strings — equal
      // values would silently land in different groups
      require(ok, s"group column '$c' has non-atomic type ${dt.catalogString}; " +
        "project it to a comparable scalar first")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val idLong = col(idCol).cast("long")
    val idGuarded = when(idLong.isNull,
      raise_error(concat(
        lit(s"TopK.perGroup: idCol '$idCol' must be non-null and " +
          "long-castable, got "),
        coalesce(col(idCol).cast("string"), lit("NULL")))).cast("long"))
      .otherwise(idLong)
    val pre = df.select(
      col(sortCol).cast("double").as("__sort") +:
        idGuarded.as("__id") +:
        df.columns.map(col): _*)
    val groupIdx = groupCols.map(c => pre.schema.fieldIndex(c))
    val grouped = pre
      .groupByKey(r => groupKey(r, groupIdx))(Encoders.STRING)
      .agg(new TopKAgg(k).toColumn.name("topk"))
    val outSchema = df.schema.add("rank", IntegerType, nullable = false)
    grouped.flatMap { case (_, rows) =>
      rows.iterator.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq.drop(2) :+ (i + 1))
      }
    }(Encoders.row(outSchema))
  }
}
