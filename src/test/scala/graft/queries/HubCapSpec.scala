package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence lock on p06's hub-adjacency cap: on a planted HUB — one
  * center with 600 neighbors, so every salt slice of the tournament is
  * over-full — the salted two-level cut must keep EXACTLY the first
  * CapA neighbors by id that the naive per-center row_number window
  * keeps. The hub is the 100 TB skew case the scaladoc names: a raw
  * per-center window would sort the whole neighborhood in one task.
  */
class HubCapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("salted adjacency cap ≡ naive per-center window on a planted hub") {
    import spark.implicits._
    // hub 0: 600 neighbors; center 1: fewer than CapA; center 2: exactly CapA
    val rows =
      (0 until 600).map(i => (0L, (1000 + i).toLong)) ++
      (0 until 4).map(i => (1L, (2000 + i).toLong)) ++
      (0 until GraphOps.CapA).map(i => (2L, (3000 + i).toLong))
    val nbrs = rows.toDF("c", "nb")

    val naive = nbrs
      .withColumn("rn", row_number().over(Window.partitionBy("c").orderBy("nb")))
      .filter(col("rn") <= GraphOps.CapA)
      .select("c", "nb")
    val tourn = GraphOps.cappedAdjacencyOn(nbrs)

    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = tourn.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(n == t, s"tournament cap must equal the naive window:\nnaive-only=${n.diff(t)}\ntourn-only=${t.diff(n)}")
    assert(t.count(_._1 == 0L) == GraphOps.CapA &&
      t.count(_._1 == 1L) == 4 && t.count(_._1 == 2L) == GraphOps.CapA)
  }
}
