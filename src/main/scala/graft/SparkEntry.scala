package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventOps, Generated, GraphOps, MediaOps, QueryDef, Relational, Relational2, SketchOps, StreamOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from the operator modules; each entry
  * pairs a Spark implementation with a DuckDB-oracle SQL twin (where the
  * op is expressible in portable SQL — see QueryDef).
  */
object SparkEntry {

  /** All registered operators of the engine. */
  val all: Map[String, QueryDef] =
    Relational.defs ++ Relational2.defs ++ TextOps.defs ++ VectorOps.defs ++
      EventOps.defs ++ Generated.defs ++ MediaOps.defs ++ StreamOps.defs ++
      SketchOps.defs ++ GraphOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
