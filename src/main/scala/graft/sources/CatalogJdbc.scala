package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live-catalog introspection over JDBC — the reference's metadata scans
  * recast as Spark JDBC reads (SURVEY.md §2.1 S4–S9, §2.3 J1/J2,
  * §2.4 A1, §2.2 F6).
  *
  * The query texts are the reference's own catalog SQL
  * (run_engine.py:85-151,215; apply_mssql.py:34-35), pushed down via the
  * JDBC source's `query` option so the database evaluates them —
  * Catalyst adds nothing on top of a single-row metadata scan, and
  * shouldn't. The join/aggregation shapes (fkEdges, fkMap, discoverPk)
  * are pure DataFrame logic, testable without a live database; the JDBC
  * wiring is exercised only when a target exists (none ships in this
  * container — same situation as graft.load.JdbcSink).
  */
object CatalogJdbc {

  /** S4: base-table list (run_engine.py:215). */
  val TableListSql: String =
    "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES WHERE TABLE_TYPE = 'BASE TABLE'"

  /** S5: column metadata + identity/computed flags (run_engine.py:87-99).
    * The table-name predicate is part of the pushed query (F6). */
  def columnsSql(table: String): String =
    s"""SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE, CHARACTER_MAXIMUM_LENGTH,
       |  NUMERIC_PRECISION, NUMERIC_SCALE,
       |  COLUMNPROPERTY(OBJECT_ID(TABLE_SCHEMA + '.' + TABLE_NAME), COLUMN_NAME, 'IsIdentity') AS IS_IDENTITY,
       |  COLUMNPROPERTY(OBJECT_ID(TABLE_SCHEMA + '.' + TABLE_NAME), COLUMN_NAME, 'IsComputed') AS IS_COMPUTED
       |FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = '${table.replace("'", "''")}'""".stripMargin

  /** S9: database-existence probe (apply_mssql.py:34-35). */
  def databaseExistsSql(db: String): String =
    s"SELECT database_id FROM sys.databases WHERE Name = '${db.replace("'", "''")}'"

  /** S8: PK-value sample (run_engine.py:149-151) — the TOP-1000 cap. */
  def pkSampleSql(table: String, pk: String): String =
    s"SELECT TOP 1000 [$pk] FROM [$table] WITH (NOLOCK)"

  /** JDBC pushdown read of any of the above (F6: predicates evaluate in
    * the database, only result rows cross the wire). */
  def readQuery(spark: SparkSession, url: String, sql: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .options(scala.jdk.CollectionConverters.PropertiesHasAsScala(props)
        .asScala.toMap.map { case (k, v) => (k.toString, v.toString) })
      .load()

  /** J1: sys.foreign_keys ⋈ sys.foreign_key_columns — inner equi join on
    * object_id = constraint_object_id (run_engine.py:124-131). Both
    * sides are metadata-small, so the dimension side broadcasts. */
  def fkEdges(foreignKeys: DataFrame, fkColumns: DataFrame): DataFrame =
    foreignKeys.join(broadcast(fkColumns),
        foreignKeys("object_id") === fkColumns("constraint_object_id"), "inner")
      .select(
        col("table_name"), col("column_name"),
        col("referenced_table"), col("referenced_column"))

  /** A1: FK-map build — table → map(column → parent)
    * (run_engine.py:132-140), as one keyed aggregation. */
  def fkMap(edges: DataFrame): DataFrame =
    edges.groupBy("table_name")
      .agg(map_from_entries(
        collect_list(struct(col("column_name"), col("referenced_table")))).as("fk_map"))

  /** J2: PK discovery — TABLE_CONSTRAINTS ⋈ CONSTRAINT_COLUMN_USAGE,
    * filtered to PRIMARY KEY, limit 1, default "Id" on miss
    * (run_engine.py:145-147). */
  def discoverPk(tableConstraints: DataFrame, constraintColumnUsage: DataFrame,
      table: String): String = {
    val hit = tableConstraints
      .filter(col("CONSTRAINT_TYPE") === "PRIMARY KEY" && col("TABLE_NAME") === table)
      .join(broadcast(constraintColumnUsage), Seq("CONSTRAINT_NAME", "TABLE_NAME"), "inner")
      .select("COLUMN_NAME")
      .limit(1)
      .collect()
    hit.headOption.map(_.getString(0)).getOrElse("Id")
  }
}
