package graft.functions

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScoredTopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("typed top-k aggregator ≡ window row_number top-n") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, d)
    val viaAgg = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(ScoredTopK(3).toColumn)
      .flatMap { case (cust, top) => top.map { case (ok, price) => (cust, ok, price) } }
      .collect().toSet
    val viaWindow = graft.queries.Relational.windowTop3PerCustomer(spark, d)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("approximate distinct is within 5% of exact (sketch aggregate)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }
}
