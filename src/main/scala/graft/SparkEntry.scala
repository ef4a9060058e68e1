package graft

import graft.queries.{GraphQueries, GunQueries, MlQueries, RelationalQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared done in SURVEY §2 has a `queries` entry; every
  * SQL-expressible one also has an `oracleSql` entry (DuckDB syntax) with
  * identical output column names, so the driver's sorted-column hash compare
  * matches value-for-value.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * HAM merge over the event-derived cell store — the engine's core CRDT
    * operator (SURVEY §2 A10).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("gun_ham_merge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GunQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      GraphQueries.queries ++ MlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    GunQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      GraphQueries.oracles ++ MlQueries.oracles
}
