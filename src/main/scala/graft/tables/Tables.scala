package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column

/** Readers for the driver-provided fixture tables (TESTDATA.md).
  *
  * All query operators read through here so scans stay uniform: parquet
  * source, column pruning + predicate pushdown handled by Catalyst. At
  * 100 TB these would be partitioned/bucketed tables behind the same
  * interface.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // The fixtures carry NTZ (timestamp[us], no tz) timestamp columns.
    // The engine computes in session-time TIMESTAMP (UTC session), where
    // every epoch extraction (unix_micros & co.) is defined; with the
    // session pinned to UTC the NTZ→LTZ cast is micros-value-exact, so
    // this normalization changes types only, never instants.
    val ntz = raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }
    ntz.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast("timestamp")))
  }

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** The events fixture carries TIMESTAMP(NANOS) parquet timestamps,
    * which Spark 4 rejects unless read as raw longs
    * (spark.sql.legacy.parquet.nanosAsLong — set in Session.builder).
    * Normalize to microsecond TimestampType here so every operator is
    * agnostic to the on-disk unit (floor-truncation to µs, matching how
    * µs-native engines read the same file). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Exact fixed-point view of a 2-decimal double column.
    *
    * Sums of doubles are order-dependent, and Spark's partial-aggregation
    * combine order is nondeterministic across runs — so every aggregated
    * money/quantity column is cast to an exact decimal BEFORE aggregation
    * and back to double only at the very end (single deterministic
    * rounding). This is what makes results hash-comparable against the
    * DuckDB oracle, and it is also the right call at 100 TB where a
    * 1000-way combine tree would otherwise give run-to-run drift.
    */
  val Dec: DecimalType = DecimalType(18, 2)
  def dec(c: Column): Column = c.cast(Dec)
  def dec(name: String): Column = dec(col(name))
  def asDbl(c: Column): Column = c.cast(DoubleType)
}
