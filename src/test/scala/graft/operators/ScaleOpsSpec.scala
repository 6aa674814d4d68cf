package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques behave as claimed: salting preserves join results;
  * bucketing deletes the join exchange. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  val d = "/root/testdata/sf0.001"

  test("salted join ≡ plain join, with salts actually spreading") {
    val li = Tables.lineitem(spark, d)
    val sup = Tables.supplier(spark, d)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(
        li, sup.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey",
        saltSource = Seq("l_orderkey", "l_linenumber"), numSalts = 8)
      .withColumnRenamed("l_suppkey", "s_suppkey")
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("keySkew surfaces the dominant keys") {
    val skew = SkewJoin.keySkew(Tables.lineitem(spark, d), "l_suppkey", topN = 3)
      .collect()
    assert(skew.length == 3)
    assert(skew.map(_.getAs[Double]("share")).sum > 0)
  }

  test("bucketed join plans without a shuffle exchange") {
    // drop catalog entries AND their locations: the in-memory catalog
    // forgets tables across JVMs while the warehouse dirs survive, and
    // saveAsTable refuses a location it doesn't own
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      rmrf(new java.io.File(wh, t))
    }
    Bucketing.writeBucketed(
      Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)
    // disable broadcast: at fixture scale the dim side broadcasts, which
    // bypasses (and disables) the bucketed layout we're demonstrating —
    // at 100 TB neither fact side is broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      joined.count() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, d).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
