package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The metric half of s21: the watermark must drop EXACTLY the planted
  * late set — no silent keeps, no over-dropping on-time rows.
  */
class LateDataSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("the watermark drops exactly the planted late rows") {
    val res = StreamOps.streamLateAccounting(spark, sf)
    val emitted = res.agg(sum("n")).collect().head.getLong(0)
    val ev = graft.tables.Tables.events(spark, sf)
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().head
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val planted = ev.filter(StreamOps.lateSel(lit(mid))).count()
    // the state-store metric counts POST-partial-aggregation rows: two
    // late rows in the same hour combine map-side before the stateful
    // filter, so the dropped count equals the DISTINCT late windows
    // (single-partition micro-batches — one file each), not raw rows
    val lateWindows = ev.filter(StreamOps.lateSel(lit(mid)))
      .select((unix_micros(col("ts")) / 3600000000L).cast("long")).distinct().count()
    val onTime = ev.count() - planted
    assert(planted > 0, "the fixture must plant a non-empty late set")
    val dropped = StreamOps.lastLateDrop
      .getOrElse(fail("s21 must record the dropped-rows metric"))
    assert(dropped == lateWindows,
      s"watermark must drop every late window group: dropped=$dropped " +
        s"lateWindows=$lateWindows (planted rows=$planted)")
    // emitted ≤ on-time: the tail windows the watermark never closed
    // stay in state, everything emitted is on-time and late-free
    assert(emitted <= onTime, s"emitted=$emitted must be ≤ on-time=$onTime")
  }
}
