package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Wide→long unpivot (reference transform_google_trends.py:68 pd.melt).
  *
  * Spark-first: `stack` is a zero-shuffle narrow transform — each input row
  * expands to N output rows inside the same task, so this costs no data
  * movement at any scale (unlike a union of N self-scans).
  */
object Melt {
  /** @param valueCols (outputLabel, inputColumnName); all inputs are cast to
    *                  the common `valueType` (stack requires a shared type).
    */
  private val SafeLabel = "^[^'`\\\\]*$".r

  def wideToLong(df: DataFrame, idCols: Seq[String],
                 valueCols: Seq[(String, String)],
                 varName: String = "variable", valueName: String = "value",
                 valueType: String = "double"): DataFrame = {
    // ALL strings below are interpolated into a stack() SQL expression —
    // validate every one, not just the labels
    valueCols.foreach { case (label, c) =>
      require(SafeLabel.matches(label), s"melt label may not contain quotes: '$label'")
      require(!c.contains("`"), s"column name may not contain backticks: '$c'")
    }
    Seq("varName" -> varName, "valueName" -> valueName).foreach { case (what, v) =>
      require(!v.contains("`"), s"$what may not contain backticks: '$v'")
    }
    require("^[A-Za-z_][A-Za-z0-9_ ]*(\\(\\s*\\d+\\s*(,\\s*\\d+\\s*)?\\))?$".r.matches(valueType),
      s"valueType must be a plain SQL type name, got: '$valueType'")
    val stackArgs = valueCols
      .map { case (label, c) => s"'$label', CAST(`$c` AS $valueType)" }
      .mkString(", ")
    val stackExpr =
      expr(s"stack(${valueCols.size}, $stackArgs) AS (`$varName`, `$valueName`)")
    df.select(idCols.map(col) :+ stackExpr: _*)
  }
}
