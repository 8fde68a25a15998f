package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every `queries` key has a matching `oracleSql` entry
  * (DuckDB SQL over the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02GoldenJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.q01PricingSummary _),
    "q02_golden_join" -> (CoreQueries.q02GoldenJoin _),
    "q09_parse_funcs" -> (ParseQueries.q09ParseFuncs _),
    "q10_category_path" -> (ParseQueries.q10CategoryPath _)
  )

  /** DuckDB-runnable oracle for each query (same column names/aliases). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> CoreQueries.q01Oracle,
    "q02_golden_join" -> CoreQueries.q02Oracle,
    "q09_parse_funcs" -> ParseQueries.q09Oracle,
    "q10_category_path" -> ParseQueries.q10Oracle
  )
}
