package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantified-locality lock on q46's Z-order claim: range-partitioning
  * the orders grid by MORTON CODE must yield per-partition bounding
  * boxes that cover far less 2-D area than partitioning by the 1-D
  * price key — that area ratio IS the file-pruning win a z-sorted
  * layout buys at 100 TB (each file's min/max footprint is what a
  * reader prunes against, on BOTH dimensions at once).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  /** Per-"file" (range partition) min/max footprint — exactly the
    * statistics a parquet reader prunes row groups against. */
  private def fileStats(df: DataFrame, key: String, parts: Int) =
    df.repartitionByRange(parts, col(key))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("xb").as("x0"), max("xb").as("x1"),
        min("yb").as("y0"), max("yb").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("a date predicate prunes z-ordered files but touches EVERY price-sorted file") {
    val g = Relational2.zGrid(spark, sf)
      .select("xb", "yb", "zval", "o_totalprice").localCheckpoint()
    val parts = 16
    // month-band probe yb ∈ [24, 40] — the dimension the 1-D price sort
    // knows nothing about
    def touchedByMonth(stats: Array[(Long, Long, Long, Long)]): Int =
      stats.count { case (_, _, y0, y1) => y1 >= 24 && y0 <= 40 }
    val zTouched = touchedByMonth(fileStats(g, "zval", parts))
    val pTouched = touchedByMonth(fileStats(g, "o_totalprice", parts))
    // price-range files are month-blind: every file spans the full date
    // range, so min/max pruning keeps all of them
    assert(pTouched == parts,
      s"1-D price layout must touch every file for a date probe: $pTouched")
    // the Morton code's y bits localize months, so a strict subset of
    // z files intersects the band (top curve bits cut the date range
    // into blocks; the 17-month band sits inside ~half of them)
    assert(zTouched <= (parts * 3) / 4,
      s"z layout must prune a date probe: touched $zTouched of $parts")
  }

  test("the box cover is exact: cover-joined rows == plain 2-D filter rows") {
    val g = Relational2.zGrid(spark, sf)
    val viaFilter = g.filter(col("xb").between(2, 4) && col("yb").between(24, 40)).count()
    val viaCover = Relational2.zorderBoxQuery(spark, sf)
      .agg(sum("n_orders")).collect().head.getLong(0)
    assert(viaFilter == viaCover, s"Morton cover must equal the box: $viaCover vs $viaFilter")
  }
}
