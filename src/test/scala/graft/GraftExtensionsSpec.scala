package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extensions wiring: a session built with GraftExtensions can call the
  * engine's custom expressions straight from SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("dot_d is injected and codegen-evaluates from SQL") {
    // a dedicated session: extensions bind at session construction
    SparkSession.getActiveSession.foreach(_.stop())
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT dot_d(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r == 32.0)
      // null propagation (nullIntolerant)
      val n = spark.sql("SELECT dot_d(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d")
        .collect().head
      assert(n.isNullAt(0))
      // type check rejects mismatches at analysis time
      intercept[Exception] {
        spark.sql("SELECT dot_d(array('a'), array(1.0D))").collect()
      }
    } finally spark.stop() // later suites getOrCreate a fresh default session
  }
}
