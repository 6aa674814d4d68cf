package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** s31's incremental contract: a later batch's edge that BRIDGES two
  * existing components must flood the smaller label through the other
  * component — seeded only by the new edge's endpoints — and an edge
  * internal to a settled component must change nothing. */
class IncCcStreamSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a bridging arrival merges components; an internal one is a fixpoint no-op") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("node", "lbl").localCheckpoint()
    val noPairs = Seq.empty[(Long, Long)].toDF("cn", "sn").localCheckpoint()
    // batch 1: two disjoint components {2,11} and {4,13}
    val b1 = Seq((2L, 11L), (4L, 13L)).toDF("cn", "sn")
    val (l1, p1) = StreamOps.incCcFold(empty, noPairs, b1)
    assert(labelMap(l1) == Map(2L -> 2L, 11L -> 2L, 4L -> 4L, 13L -> 4L),
      labelMap(l1).toString)
    // batch 2: (4, 11) bridges them — label 2 must flood through the
    // {4,13} side even though only nodes 4 and 11 seeded the flood
    val (l2, p2) = StreamOps.incCcFold(l1, p1, Seq((4L, 11L)).toDF("cn", "sn"))
    assert(labelMap(l2) == Map(2L -> 2L, 11L -> 2L, 4L -> 2L, 13L -> 2L),
      labelMap(l2).toString)
    // batch 3: an edge INSIDE the settled component — the seeded flood
    // must quiesce immediately with every label unchanged
    val (l3, _) = StreamOps.incCcFold(l2, p2, Seq((2L, 13L)).toDF("cn", "sn"))
    assert(labelMap(l3) == labelMap(l2), labelMap(l3).toString)
  }

  test("artifact fold-shape tag is locked to the fold's source (round-15 advice)") {
    // The s31 cross-run artifact persists the fold's OUTPUT; its key must
    // change whenever the fold's DERIVATION changes, or a fresh session
    // serves a stale label state. The tag has no scalar parameter to key
    // on (the capped_adj2/CapA route), so it is the source hash of the
    // three defs the state derives from — recomputed here, so editing any
    // of them without bumping StreamOps.IncCcFoldTag is a test failure
    // that PRINTS the new value to paste.
    val want = FoldTagLock.expectedTag("ccf",
      "src/main/scala/graft/queries/StreamOps.scala",
      Seq("def liPairStreamSource", "def incCcFold", "def streamIncrementalCc"))
    assert(StreamOps.IncCcFoldTag == want,
      s"fold source changed: bump StreamOps.IncCcFoldTag to \"$want\" " +
        "(the persisted inc_cc artifact must be invalidated with it)")
  }
}
