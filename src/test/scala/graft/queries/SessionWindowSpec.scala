package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic lock on s10: Spark's native session_window aggregation and
  * s01's hand-rolled flatMapGroupsWithState implement the SAME
  * 30-minute-gap sessionization — s10's drained sessions minus each
  * user's open tail must equal s01's closed-session set exactly
  * (bounds, counts, and exact-decimal sums).
  */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  val d = "/root/testdata/sf0.001"

  test("native session_window equals the custom-state operator on closed sessions") {
    val native = StreamOps.streamSessionWindow(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // drop each user's open tail (the session with that user's max start)
    val lastStart = native.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closedNative = native.filterNot(s => s._2 == lastStart(s._1)).toSet

    val custom = StreamOps.streamSessions(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2), r.getDouble(5)))
      .toSet

    assert(closedNative.nonEmpty, "fixture must produce closed sessions")
    assert(closedNative == custom,
      s"native/custom sessionization diverged: only-native=" +
        s"${(closedNative -- custom).take(3)}, only-custom=${(custom -- closedNative).take(3)}")
  }
}
