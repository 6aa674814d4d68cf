package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** t60's packing semantics on planted boundary cases: straddle detection,
  * exact-boundary starts, per-shard independence, and tail underfill. */
class SequencePackingSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  test("straddles, exact boundaries, and tail fill come out token-exact") {
    import spark.implicits._
    // ctx = 256. Shard 0: three 100-token docs — the third starts at
    // offset 200 and crosses the boundary (straddler); the shard's 300
    // tokens leave seq 1 underfilled at 44 but no doc STARTS there, so
    // no row. Shard 1: a doc of exactly ctx tokens does NOT straddle
    // (offset 0 + 256 = ctx, not >), and the next doc starts seq 1.
    val docs = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L),
      (10L, 1L, 256L), (11L, 1L, 10L)
    ).toDF("doc_id", "shard", "n_tok")
    val got = TextOps.sequencePackingOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      (0L, 0L, 3L, 1L, 256L),
      (1L, 0L, 1L, 0L, 256L),
      (1L, 1L, 1L, 0L, 10L)), got.toString)
  }

  test("t61: growing the window trades straddlers for tail waste, monotonically") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.all("t61_packing_curve").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(128L, 256L, 512L, 1024L), rows.mkString(", "))
    assert(rows.forall(_._2 == rows.head._2), "constant doc census across ctx")
    // doubling the window can only merge sequences and un-straddle docs
    // (a doc crossing a 2c boundary crosses a c boundary at the same
    // offset), while each shard's tail underfill can only grow
    assert(rows.map(_._3).sliding(2).forall(w => w(0) >= w(1)),
      s"sequence count must fall with ctx: ${rows.toSeq}")
    assert(rows.map(_._4).sliding(2).forall(w => w(0) >= w(1)),
      s"straddlers must fall with ctx: ${rows.toSeq}")
    assert(rows.map(_._5).sliding(2).forall(w => w(0) <= w(1)),
      s"tail waste must grow with ctx: ${rows.toSeq}")
    info("t61 curve (ctx → straddlers @ waste): " +
      rows.map(r => s"${r._1} → ${r._4} @ ${r._5}").mkString(", "))
  }
}
