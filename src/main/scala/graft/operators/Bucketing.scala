package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
  * one shuffle Catalyst cannot remove from a plain parquet layout. With
  * both sides written bucketed on the join key, the scan itself delivers
  * the hash distribution and the join runs exchange-free — ScaleOpsSpec
  * and PlanSpec (q42) assert the plan has no shuffle on either side.
  *
  * This is the Spark-native equivalent of the reference's physical-layout
  * DDL (`script.sql`'s 163 indexes, deployed by `run_engine.py`): the
  * layout is written once at deployment and every subsequent join reads
  * the distribution off disk instead of re-shuffling 100 TB per query.
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

  /** Drop a table from the session catalog AND delete its warehouse
    * location: the in-memory catalog forgets tables across JVMs while
    * the warehouse dirs survive, and saveAsTable refuses a location it
    * doesn't own. */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    // listFiles() returns NULL (not empty) on a concurrently-deleted dir
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File(wh, table.toLowerCase))
  }

  /** Number of buckets for the deployed fact layout. 8 divides every
    * local test parallelism; at 100 TB this is sized so one bucket of
    * the largest fact ≈ one task's worth of data (thousands). The VALUE
    * is irrelevant to the plan property — exchange deletion only needs
    * both sides to agree. */
  val FactBuckets = 8

  private val factCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  /** The deployed bucketed layout of the two fact tables, written once
    * per (session, dir) and read by every bucketed-join query (q42).
    * Returns (lineitemTable, ordersTable), both bucketed FactBuckets
    * ways on their orderkey.
    *
    * Deployment-shape note: the bucket METADATA lives in the session
    * catalog (Spark keeps it there, not in the parquet footers), so a
    * fresh JVM re-deploys before first use — exactly the write-once
    * /read-forever split a real deployment gets from a persistent
    * metastore. The write is the one-time cost the reference pays when
    * `run_engine.py` deploys its index DDL. */
  // deploys run under the object lock: TrieMap.getOrElseUpdate may
  // evaluate its builder TWICE under concurrent first access — harmless
  // for the pure-DataFrame memos elsewhere, destructive here where the
  // builder runs DROP + rm -rf + saveAsTable on a shared location
  def factTables(s: SparkSession, d: String): (String, String) = synchronized {
    factCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    factCache.getOrElseUpdate((s, d), {
      // table names keyed by dir so sf0.001/sf0.01/sf0.1 coexist
      val h = dirKey(d)
      val (liT, oT) = (s"graft_li_bkt_$h", s"graft_o_bkt_$h")
      dropWithLocation(s, liT); dropWithLocation(s, oT)
      writeBucketed(graft.tables.Tables.lineitem(s, d), liT, "l_orderkey", FactBuckets)
      writeBucketed(graft.tables.Tables.orders(s, d), oT, "o_orderkey", FactBuckets)
      (liT, oT)
    })
  }

  private def dirKey(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** The orders fact deployed PARTITIONED by o_orderpriority, plus a
    * priority DIM table (key + derived attribute) — the third physical-
    * layout lever after broadcast and bucketing: partition pruning.
    *
    * The dim must be a SEPARATE STORED TABLE, not a derived frame: a
    * frame computed from orders carries Catalyst constraints linking
    * `prio_code` back to the key, the attribute filter then infers onto
    * the fact's partition column, and STATIC pruning handles it — no
    * dynamic pruning left to demonstrate. Written as its own table the
    * columns are independent, so a filter on `prio_code` can only reach
    * the fact as a runtime dynamicpruning subquery on the join key —
    * exactly how a date-dim prunes a date-partitioned 100 TB fact
    * ("this week's dims" reads one week, not the decade). Returns
    * (factTable, dimTable); written once per (session, dir). */
  def partitionedOrdersWithDim(s: SparkSession, d: String): (String, String) = synchronized {
    partCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    partCache.getOrElseUpdate((s, d), {
      val t = s"graft_o_part_${dirKey(d)}"
      val dim = s"graft_prio_dim_${dirKey(d)}"
      dropWithLocation(s, t); dropWithLocation(s, dim)
      graft.tables.Tables.orders(s, d)
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .format("parquet")
        .saveAsTable(t)
      import org.apache.spark.sql.functions.{col, substring}
      graft.tables.Tables.orders(s, d)
        .select(col("o_orderpriority"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"))
        .distinct()
        .write.mode("overwrite").format("parquet").saveAsTable(dim)
      (t, dim)
    })
  }

  private val partCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]
}
