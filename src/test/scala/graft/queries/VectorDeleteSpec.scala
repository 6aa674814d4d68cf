package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** v34's deletion-overlay contract: a tombstoned vector can NEVER be
  * returned, and for queries whose v08 top-5 contained no tombstoned
  * ids the overlay changes NOTHING — deletes only ever free slots. */
class VectorDeleteSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  test("no tombstoned hit; untouched queries identical to v08; freed slots refill") {
    def rows(name: String) = graft.SparkEntry.all(name).fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val v08 = rows("v08_ivf_topk")
    val v34 = rows("v34_ivf_with_deletes")
    assert(v34.forall(_._3 % 7 != 0),
      s"tombstoned ids returned: ${v34.filter(_._3 % 7 == 0).take(3).toSeq}")
    // queries whose v08 top-5 was tombstone-free must be bit-identical
    val cleanQs = v08.groupBy(_._1).collect {
      case (q, rs) if rs.forall(_._3 % 7 != 0) => q
    }.toSet
    assert(cleanQs.nonEmpty, "fixture must have tombstone-free top-5s")
    assert(v08.filter(r => cleanQs(r._1)).toSeq.sorted ==
      v34.filter(r => cleanQs(r._1)).toSeq.sorted,
      "deletion overlay must not perturb untouched queries")
    // affected queries still fill all 5 slots (candidates remain)
    val affected = v34.groupBy(_._1).filterNot { case (q, _) => cleanQs(q) }
    assert(affected.forall(_._2.length == 5),
      s"freed slots must refill from the probed cells: ${affected.view.mapValues(_.length).toMap}")
    assert(affected.nonEmpty, "fixture must exercise the overlay path")
  }
}
