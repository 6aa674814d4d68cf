package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
  * one shuffle Catalyst cannot remove from a plain parquet layout. With
  * both sides written bucketed on the join key, the scan itself delivers
  * the hash distribution and the join runs exchange-free — BucketingSpec
  * asserts the plan has no shuffle on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table in the session
    * catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key —
    * exchange-free by layout. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
