package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lock on s23's absence decisions: the null-padded rows must really
  * have been EMITTED by the stream's state expiry (not vacuously empty),
  * and every per-user census line must equal an independent Scala
  * rederivation of the batch left join over the same watermark-provable
  * cut. The oracle already hash-checks the values; this pins that the
  * outer path is exercised and the cut is where the scaladoc says.
  */
class StreamOuterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("s23: unmatched clicks flow through the stream; census equals the Scala rederivation") {
    val out = StreamOps.streamLeftOuterJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    assert(out.values.map(_._2).sum > 0,
      "the fixture must exercise the null-padded (absence) path")
    assert(out.values.map(_._3).sum > 0,
      "the fixture must exercise the matched path")

    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    // min over the two sides' maxima — the global watermark's base
    val cut = math.min(ev.filter(_._3 == "click").map(_._4).max,
      purchases.map(_._4).max) - 7200000000L
    val expected = ev.filter(e => e._3 == "click" && e._4 <= cut)
      .groupBy(_._1).map { case (u, clicks) =>
        val ps = purchases.filter(_._1 == u)
        val perClick = clicks.map { c =>
          ps.count(p => p._4 >= c._4 && p._4 - c._4 <= 1800000000L)
        }
        u -> ((clicks.length.toLong,
          perClick.count(_ == 0).toLong,
          perClick.map(_.toLong).sum))
      }
    assert(out == expected, "stream census must equal the batch rederivation")
  }
}
