package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every query module; each `queries` key has a matching DuckDB
  * `oracleSql` entry with identical column names and a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.c1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.defs ++ CoreQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ DedupQueries.defs ++
      MiscQueries.defs ++ AnalyticsQueries.defs ++ JoinQueries.defs ++
      MultimodalQueries.defs ++ SamplingQueries.defs ++ SketchQueries.defs ++
      GraphQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ CoreQueries.oracle ++ EventQueries.oracle ++
      TextQueries.oracle ++ SimilarityQueries.oracle ++ DedupQueries.oracle ++
      MiscQueries.oracle ++ AnalyticsQueries.oracle ++ JoinQueries.oracle ++
      MultimodalQueries.oracle ++ SamplingQueries.oracle ++ SketchQueries.oracle ++
      GraphQueries.oracle
}
