package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Round-17: v02's exact truth-pair set and v43's search-ready IVF-PQ
  * index persist as cross-run artifacts. Locks the fold tags (the
  * IncCcFoldTag rule), v43's build-path ≡ serve-path equality against
  * v24 (they share one oracle, so they must also agree in-JVM), and the
  * served-from-disk contract after a memo clear. */
class VectorArtifactSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"
  val src = "src/main/scala/graft/queries/VectorOps.scala"

  test("cos_pairs artifact fold-shape tag is locked to the derivation source") {
    val want = FoldTagLock.expectedTag("cos", src,
      Seq("def vecs(", "def cosineNearDupPairsUncached("))
    assert(VectorOps.CosPairsFoldTag == want,
      s"truth-pair derivation changed: bump VectorOps.CosPairsFoldTag to \"$want\" " +
        "(the persisted cos_pairs artifact must be invalidated with it)")
  }

  test("ann_index artifact fold-shape tag is locked to the derivation source") {
    val want = FoldTagLock.expectedTag("ann", src,
      Seq("def pqCandUncachedK(", "def centroidAffinityUncached(",
        "def cellAssignments(", "def annIndexUncached("))
    assert(VectorOps.AnnIndexFoldTag == want,
      s"index derivation changed: bump VectorOps.AnnIndexFoldTag to \"$want\" " +
        "(the persisted ann_index artifact must be invalidated with it)")
  }

  test("v43 persisted-index serve ≡ v24 in-session build, and a cleared session scans the artifact") {
    val r24 = VectorOps.ivfPqTopK(spark, d).collect().map(_.toSeq).toSeq
    val r43 = VectorOps.annPersistedIndexTopK(spark, d).collect().map(_.toSeq).toSeq
    assert(r43.nonEmpty && r43 == r24,
      "the persisted index must answer exactly what the in-session pipeline answers")
    VectorOps.clearCaches()
    val loads0 = graft.sources.ArtifactStore.loads.get()
    val builds0 = graft.sources.ArtifactStore.builds.get()
    val again = VectorOps.annPersistedIndexTopK(spark, d).collect().map(_.toSeq).toSeq
    assert(graft.sources.ArtifactStore.loads.get() > loads0,
      "post-clear serve must SCAN the persisted ann_index artifact")
    assert(graft.sources.ArtifactStore.builds.get() == builds0,
      "post-clear serve must not rebuild the index")
    assert(again == r43, "artifact-served top-k must be identical")
  }

  test("v02: a cleared session is served from the cos_pairs artifact with identical rows") {
    val rows1 = VectorOps.cosineNearDupPairs(spark, d).collect().map(_.toSeq).toSeq
    assert(rows1.nonEmpty, "fixture must have cosine near-dup pairs")
    VectorOps.clearCaches()
    val builds0 = graft.sources.ArtifactStore.builds.get()
    val rows2 = VectorOps.cosineNearDupPairs(spark, d).collect().map(_.toSeq).toSeq
    assert(graft.sources.ArtifactStore.builds.get() == builds0,
      "second invocation must not rebuild the truth set")
    assert(rows2 == rows1, "artifact scan must equal the built frame")
  }
}
