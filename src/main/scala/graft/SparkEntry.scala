package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from SURVEY.md §2
  * (or a training-pipeline extension), taking `(spark, sfDir)` and returning
  * a deterministic DataFrame; [[oracleSql]] holds the DuckDB-equivalent SQL
  * over the same parquet tables. Column names/aliases are kept identical on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The J8/Q4 shape: var-length hierarchy traversal + reverse VC expand.
    */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.j8HierVcCount(spark, "/root/testdata/sf0.001")

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelQueries.defs, RelQueries.oracles),
      (GraphQueries.defs, GraphQueries.oracles),
      (MutQueries.defs, MutQueries.oracles),
      (FuncQueries.defs, FuncQueries.oracles),
      (PipelineQueries.defs, PipelineQueries.oraclesWithTwins),
      (StreamQueries.defs, StreamQueries.oracles),
      (ScenarioQueries.defs, ScenarioQueries.oracles),
      (AnalyticsQueries.defs, AnalyticsQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    families.map(_._2).reduce(_ ++ _)
}
