package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the surfaced bloom pair: the two properties the t26
  * prefilter design rests on — NO false negatives (a bloom can only
  * over-approximate, so the exact confirm join sees every true hit) and
  * a usefully low false-positive rate at the sized capacity. */
class BloomExpressionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("no false negatives; absent keys mostly rejected") {
    BloomExpressions.register(spark)
    import spark.implicits._
    val xs = (1L to 1000L).toDF("x")
    val bf = xs.agg(BloomExpressions.bloomAgg(col("x"), lit(1000L), lit(16384L)))
      .head().getAs[Array[Byte]](0)
    assert(bf != null && bf.length > 0)
    val present = xs.filter(BloomExpressions.bloomContains(lit(bf), col("x"))).count()
    assert(present == 1000L, "bloom must never reject an inserted key")
    // 16384 bits / 1000 keys ≈ 1.2% theoretical FPP; allow generous slack
    val absent = (1000001L to 1001000L).toDF("x")
      .filter(BloomExpressions.bloomContains(lit(bf), col("x"))).count()
    assert(absent < 100, s"false-positive rate out of range: $absent/1000")
  }

  test("empty input aggregates to a NULL sketch (t26's nothing-flagged path)") {
    BloomExpressions.register(spark)
    import spark.implicits._
    val r = Seq.empty[Long].toDF("x")
      .agg(BloomExpressions.bloomAgg(col("x"), lit(100L), lit(1024L))).head()
    assert(r.isNullAt(0))
  }
}
