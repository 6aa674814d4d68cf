package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FWHT butterfly must equal the naive H·x matrix product
  * (h(i,j) = (−1)^popcount(i∧j)) bit for bit — v33's oracle states the
  * naive form, the engine runs the butterfly. */
class FwhtSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  private def naive(x: Array[Double]): Array[Double] = {
    val n = x.length
    Array.tabulate(n) { i =>
      var acc = 0.0
      for (j <- 0 until n)
        acc += (if (java.lang.Long.bitCount((i & j).toLong) % 2 == 0) x(j) else -x(j))
      acc
    }
  }

  test("fwht ≡ naive Hadamard product on 64-dim grid vectors (codegen path)") {
    import spark.implicits._
    HadamardExpressions.register(spark)
    // grid-int magnitudes like the quantized embeddings (±200)
    val rows = (0 until 20).map { r =>
      (r.toLong, Array.tabulate(64)(i => ((r * 37 + i * 11) % 401 - 200).toDouble))
    }
    val out = rows.toDF("id", "v")
      .withColumn("h", HadamardExpressions.fwht(col("v")))
      .orderBy("id").collect()
    rows.foreach { case (id, v) =>
      val got = out(id.toInt).getSeq[Double](2).toArray
      assert(got.sameElements(naive(v)), s"row $id: butterfly != naive")
    }
  }

  test("fwht works for any power-of-two length and rejects non-arrays") {
    import spark.implicits._
    HadamardExpressions.register(spark)
    val v8 = Array.tabulate(8)(i => (i * 3 - 10).toDouble)
    val got = Seq(Tuple1(v8)).toDF("v")
      .select(HadamardExpressions.fwht(col("v"))).head().getSeq[Double](0).toArray
    assert(got.sameElements(naive(v8)))
    val err = intercept[Exception] {
      Seq(Tuple1("nope")).toDF("v").select(HadamardExpressions.fwht(col("v"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("fwht") ||
      err.getMessage.toLowerCase.contains("array"), err.getMessage)
  }

  test("fwht rejects null elements with a diagnosable error, not a silent 0.0") {
    import spark.implicits._
    HadamardExpressions.register(spark)
    // Spark types this array containsNull=true; the null element must
    // raise — toDoubleArray on UnsafeArrayData would otherwise read it
    // as 0.0 and return a wrong transform
    val err = intercept[Exception] {
      Seq(Tuple1(Array[java.lang.Double](1.0, null, 3.0, 4.0))).toDF("v")
        .select(HadamardExpressions.fwht(col("v"))).collect()
    }
    val root = {
      var t: Throwable = err
      while (t.getCause != null) t = t.getCause
      t.getMessage
    }
    assert(root != null && root.contains("null array elements"), s"got: $root")
    // a nullable-TYPED array with no actual nulls still works
    val ok = Seq(Tuple1(Array[java.lang.Double](1.0, 2.0, 3.0, 4.0))).toDF("v")
      .select(HadamardExpressions.fwht(col("v"))).head().getSeq[Double](0)
    assert(ok == Seq(10.0, -2.0, -4.0, 0.0))
  }
}
