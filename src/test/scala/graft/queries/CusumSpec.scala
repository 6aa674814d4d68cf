package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** e27's CUSUM semantics on planted series (the oracle grades the
  * fixture; these pin the recursion): a sustained shift alarms at the
  * hand-computed crossing day, a flat series never alarms (slack eats
  * μ-level noise), and a dip RESETS the accumulator so a later shift
  * restarts from zero. */
class CusumSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  private def run(xs: Seq[(String, Long, Long)]): Map[String, (Long, Long)] = {
    import spark.implicits._
    EventOps.cusumOn(xs.toDF("event_type", "day", "x")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
  }

  test("sustained shift alarms at the hand-computed day; flat never alarms; dips reset") {
    // flat: x = 1000 every day → μ=1000, drift 0 − κ < 0 → S stays 0
    val flat = (1L to 10L).map(d => ("flat", d, 1000L))
    // shift: 8 days at 1000, then 2000 from day 9 → μ = 1200, κ = 60,
    // h = 600. S₉ = max(0, 2000−1260) = 740 > 600 → alarm day 9.
    val shift = (1L to 8L).map(d => ("shift", d, 1000L)) ++
      Seq(("shift", 9L, 2000L), ("shift", 10L, 2000L))
    // reset: spike at day 3 (not enough alone), deep dip at day 4 wipes
    // the accumulator, then a real shift from day 8 alarms at day 9,
    // NOT earlier off the stale spike. Series: 1000×2, 1500, 0, 1000×3,
    // 1600, 1600, 1600 → Σ = 11300, μ = 1130, κ = 56, h = 565.
    // S₃ = max(0, 1500 − 1186) = 314 < 565; S₄ = max(0, 314 + 0 − 1186)
    // = 0 (the reset); S₈ = 414 < 565; S₉ = 414 + 414 = 828 > 565.
    val reset = Seq(("reset", 1L, 1000L), ("reset", 2L, 1000L),
      ("reset", 3L, 1500L), ("reset", 4L, 0L), ("reset", 5L, 1000L),
      ("reset", 6L, 1000L), ("reset", 7L, 1000L), ("reset", 8L, 1600L),
      ("reset", 9L, 1600L), ("reset", 10L, 1600L))
    val out = run(flat ++ shift ++ reset)
    assert(out("flat") == ((-1L, 0L)), s"flat series must never alarm: ${out("flat")}")
    assert(out("shift")._1 == 9L, s"shift must alarm at day 9: ${out("shift")}")
    assert(out("reset")._1 == 9L,
      s"the dip must reset the accumulator — alarm at 9, not off the spike: ${out("reset")}")
  }
}
