package graft.queries

import graft.sources.ArtifactStore
import org.scalatest.funsuite.AnyFunSuite

/** The ANN index persists ACROSS RUNS like the gram index: the coarse
  * routing table (centroid affinity) and the PQ candidate frame are
  * deployed parquet artifacts, so a fresh session serves v08/v12/v24/
  * v25 and friends from the index scan instead of re-scoring the
  * corpus — the "build once at deployment, read forever per query"
  * posture a 100 TB vector index actually runs under. */
class VectorArtifactSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  test("a new session loads both ANN index artifacts (no rebuild), v24 unchanged") {
    // run 1: builds or loads — either way both artifacts exist after
    val r1 = graft.SparkEntry.all("v24_ivfpq_topk").fn(spark, d)
      .collect().map(_.toSeq).toSet
    val key = ArtifactStore.key(d, "embeddings.parquet")
    for (kind <- Seq("ivf_affinity", "pq_cand64")) {
      val dir = java.nio.file.Paths.get(ArtifactStore.root, kind, key)
      assert(java.nio.file.Files.exists(dir.resolve("_SUCCESS")),
        s"$kind artifact must exist after first use: $dir")
    }

    // run 2: a NEW SparkSession (fresh memo key — the fresh-JVM shape)
    // must LOAD both halves, and consumers must scan the artifacts
    val s2 = spark.newSession()
    val builds0 = ArtifactStore.builds.get()
    val loads0 = ArtifactStore.loads.get()
    val aff2 = VectorOps.centroidAffinity(s2, d)
    val cand2 = VectorOps.pqCand64(s2, d)
    assert(ArtifactStore.builds.get() == builds0,
      "a second session must not rebuild the ANN index")
    assert(ArtifactStore.loads.get() >= loads0 + 2,
      "both index halves must load from disk")
    assert(aff2.inputFiles.forall(_.contains("ivf_affinity")),
      s"routing reads the artifact scan: ${aff2.inputFiles.take(3).mkString(",")}")
    assert(cand2.inputFiles.forall(_.contains("pq_cand64")),
      s"PQ candidates read the artifact scan: ${cand2.inputFiles.take(3).mkString(",")}")

    val r2 = graft.SparkEntry.all("v24_ivfpq_topk").fn(s2, d)
      .collect().map(_.toSeq).toSet
    assert(r2 == r1, "artifact-served results must hash-match the built run")
  }
}
