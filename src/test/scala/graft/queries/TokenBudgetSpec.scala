package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic lock on t22's histogram drill-down: for ANY (doc_id, score,
  * n_tok) frame it must select exactly the rows the naive global window
  * selects — ordered by (score desc, doc_id asc), keep while the running
  * token sum fits the budget. The drill-down exists so no window in the
  * production plan ever spans the corpus; this spec proves the bounded
  * plan is not a different function, including on the adversarial shapes
  * (score ties across the straddling bucket, budget landing exactly on a
  * bucket edge, a single giant bucket, rows straddling range boundaries).
  */
class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  /** The semantics t22's oracle states: one global cumulative window. */
  private def reference(docs: DataFrame): Set[Long] = {
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = docs.agg(expr(s"sum(n_tok) div ${TextOps.BudgetDen}"))
      .collect()(0).getLong(0)
    docs.withColumn("running", sum(col("n_tok")).over(w))
      .filter(col("running") <= lit(budget))
      .collect().map(_.getAs[Long]("doc_id")).toSet
  }

  private def check(rows: Seq[(Long, Long, Long)], label: String): Unit = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "score", "n_tok")
    val got = TextOps.budgetPrefix(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == reference(docs), s"$label: drill-down != global-window prefix")
  }

  test("distinct scores, budget inside a bucket") {
    check((0L until 50L).map(i => (i, 100L - i, 10L + i % 7)), "distinct")
  }

  test("massive score tie: straddling bucket spans many ranges") {
    // 400 docs share one score, range width is 64 → the within-bucket
    // drill-down must cut at a range boundary AND inside a range
    check((0L until 400L).map(i => (i, 5L, 3L + i % 5)), "one-bucket")
  }

  test("budget lands exactly on a bucket edge (no straddling bucket)") {
    // two buckets of 100 tokens each → budget = 100 = cum(bucket 1):
    // bucket 1 fully selected, bucket 0 fully excluded, rem path empty
    check((0L until 10L).map(i => (i, 2L, 10L)) ++
      (10L until 20L).map(i => (i, 1L, 10L)), "edge")
  }

  test("budget lands exactly on a range edge inside the straddling bucket") {
    // single bucket, 128 docs of 2 tokens = 256 total, budget 128 =
    // exactly the first range (64 docs × 2 tokens) → rem2 path empty
    check((0L until 128L).map(i => (i, 1L, 2L)), "range-edge")
  }

  test("ties + interleaved doc ids across score buckets") {
    check((0L until 200L).map(i => (i, (i % 3) * 7L, 1L + (i * 13) % 11)),
      "interleaved")
  }

  test("giant straddling bucket (≫ RangeWidth² docs) recurses on width") {
    // 10,000 docs in ONE score bucket: a single-level range split at
    // width 64 would leave a ~157-range straddling window at the next
    // level under the old two-level code; the recursive drill-down must
    // narrow span 10,000 → ≤157 → ≤3 in bounded-window levels and still
    // compute the exact global prefix
    check((0L until 10000L).map(i => (i, 1L, 1L + i % 3)), "giant-bucket")
  }

  test("sparse non-contiguous doc ids in the straddling bucket") {
    // span-based widths must not assume dense ids: ids stride by 1009
    // so every range holds ≤ a few docs and most ranges are empty
    check((0L until 300L).map(i => (i * 1009L, 4L, 2L + i % 7)), "sparse")
  }

  test("t55: largest-remainder apportionment sums exactly to the budget, each within 1 of quota") {
    val rows = TextOps.budgetApportion(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == 100000L, "Hamilton apportionment must sum to N exactly")
    val w = rows.map(_._2).sum.toDouble
    rows.foreach { case (src, tok, alloc) =>
      val quota = 100000L * tok / w
      assert(math.abs(alloc - quota) <= 1.0 + 1e-9,
        s"$src: alloc $alloc must sit within 1 seat of quota $quota")
    }
  }
}
