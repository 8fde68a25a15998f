package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch (Cormode & Muthukrishnan 2005): the
  * fixed-size frequency summary — point queries overestimate by at most
  * εN with probability 1−δ (ε = e/w, δ = e^−d), never underestimate.
  * Complements [[HllSketch]] (distinct counts) with frequency counts.
  *
  * Determinism: row r's bucket for a value is md5("r:" || value)'s first
  * 8 hex chars mod w — string/integer ops only, reproducible in any engine
  * (`approx_count_distinct`-style private hashes are not).
  *
  * Scale shape: the sketch is one partial-agg groupBy over at most d·w
  * keys — every partition collapses map-side to ≤ d·w counter rows, the
  * shuffle is constant-size regardless of input, and sketches MERGE by
  * cell-wise sum ([[merge]]): per-day/per-partition sketches combine
  * without re-reading data, the property that makes CMS the 100 TB
  * heavy-hitters primitive.
  */
object CountMinSketch {
  val Depth = 4
  val Width = 1024

  private def bucket(row: Int, value: Column): Column =
    conv(substring(md5(concat(lit(s"$row:"), value.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") % Width

  /** Per-row (row, bucket) cell explosion — the shared front half of the
    * batch sketch and [[cells]]' streaming use. Null values are ignored
    * (they have no frequency to count).
    */
  def cellsOf(df: DataFrame, valueCol: Column): DataFrame = {
    val rows = (0 until Depth).map(r =>
      struct(lit(r).as("row"), bucket(r, valueCol).as("bucket")))
    df.filter(valueCol.isNotNull)
      .select(explode(array(rows: _*)).as("cell"))
      .select(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
  }

  /** SPARSE counter cells — the continuous/streaming shape: groupBy-count
    * in Complete mode maintains at most Depth·Width state rows forever,
    * and [[estimate]] reads sparse frames correctly (missing cell = 0).
    */
  def cells(df: DataFrame, valueCol: Column): DataFrame =
    cellsOf(df, valueCol)
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** All Depth·Width (row, bucket, cnt) cells; untouched cells hold 0. */
  def sketch(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    val present = cells(df, valueCol)
    val all = spark.range(0, Depth.toLong * Width).select(
      (col("id") / Width).cast("int").as("row"),
      (col("id") % Width).cast("long").as("bucket"))
    all.join(present, Seq("row", "bucket"), "left")
      .select(col("row"), col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Sketch union: cell-wise sum. `sketch(a ∪ b) == merge` exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query `queries` (one string value per row in `valueCol`) against
    * a sketch: estimate = min over the Depth rows' cells. Never below the
    * true count; over by at most εN w.h.p.
    */
  def estimate(cms: DataFrame, queries: DataFrame, valueCol: Column): DataFrame = {
    val keyed = queries.select(valueCol.as("value"))
      .withColumn("cells", array((0 until Depth).map(r =>
        struct(lit(r).as("row"), bucket(r, col("value")).as("bucket"))): _*))
      .select(col("value"), explode(col("cells")).as("cell"))
      .select(col("value"), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
    keyed.join(cms, Seq("row", "bucket"), "left")
      .groupBy(col("value"))
      // coalesce BEFORE min: against a sparse sketch (e.g. streaming state)
      // a missing cell means count 0 — min over only the present cells
      // would inflate or even null the estimate
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
