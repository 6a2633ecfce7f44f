package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, CoreQueries2, CoreQueries3, CoreQueries4, CoreQueries5, CoreQueries6, DataQueries, DataQueries2, DataQueries3, DataQueries4, DataQueries5, DataQueries6}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    CoreQueries.defs ++ CoreQueries2.defs ++ CoreQueries3.defs ++
      CoreQueries4.defs ++ CoreQueries5.defs ++ CoreQueries6.defs ++
      DataQueries.defs ++
      DataQueries2.defs ++ DataQueries3.defs ++ DataQueries4.defs ++
      DataQueries5.defs ++ DataQueries6.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01DynamicTable(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
