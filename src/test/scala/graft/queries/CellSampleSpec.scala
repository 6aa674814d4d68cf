package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence lock on v17's salted two-level tournament: on an
  * adversarial frame — one cell holding ~600 members (every salt slice
  * over-full) plus tied scores — the tournament must select EXACTLY the
  * rows one naive per-cell rank window selects. The containment proof
  * (any global top-k row ranks ≤ k inside its own salt slice under a
  * total order) is what makes the two-level shape exact, not an
  * approximation; this spec is that proof executed.
  */
class CellSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("tournament top-8 ≡ naive per-cell window on a skewed, tie-heavy frame") {
    import spark.implicits._
    // cell 0: 600 members with many duplicate scores (ccos quantized to
    // 1e-2 → ~7 distinct values, ties broken by vec_id); cell 1: fewer
    // members than k; cell 2: exactly k members.
    val rows =
      (0 until 600).map(i => (i.toLong, 0L, math.floor((i % 7) / 100.0 * 15) / 15.0)) ++
      (600 until 603).map(i => (i.toLong, 1L, 0.5)) ++
      (603 until 611).map(i => (i.toLong, 2L, 1.0 - (i - 603) * 0.01))
    val cells = rows.toDF("vec_id", "cell", "ccos")

    val naive = cells
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(col("ccos").desc, col("vec_id").asc)))
      .filter(col("rk") <= 8)
      .select("cell", "rk", "vec_id", "ccos")
    val tourn = VectorOps.tournamentTopK(cells, 8)

    val n = naive.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val t = tourn.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(n == t, s"tournament must equal the naive window:\nnaive-only=${n.diff(t)}\ntourn-only=${t.diff(n)}")
    // sanity on the fixture: the under-full and exactly-full cells kept whole
    assert(t.count(_._1 == 1L) == 3 && t.count(_._1 == 2L) == 8 && t.count(_._1 == 0L) == 8)
  }
}
