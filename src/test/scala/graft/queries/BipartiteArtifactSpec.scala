package graft.queries

import graft.sources.ArtifactStore
import org.scalatest.funsuite.AnyFunSuite

/** The bipartite trading graph persists ACROSS RUNS like partEdges and
  * the gram index: p01/p05/p07 iterate over a frame a deployment builds
  * once — a fresh JVM must serve it from the parquet artifact instead
  * of re-running the orders⋈lineitem distinct-pair build inside the
  * first timed graph query (round-7 bench: p04 cold 13.0 s vs 7.0 warm,
  * most of it this build). */
class BipartiteArtifactSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  test("a new session loads the bipartite artifact (no rebuild), p01 unchanged") {
    // run 1: builds or loads — either way the artifact exists after
    val r1 = graft.SparkEntry.all("p01_pagerank").fn(spark, d)
      .collect().map(_.toSeq).toSet
    val key = ArtifactStore.key(d, "orders.parquet") + "-" +
      ArtifactStore.key(d, "lineitem.parquet")
    val dir = java.nio.file.Paths.get(ArtifactStore.root, "bipartite", key)
    assert(java.nio.file.Files.exists(dir.resolve("_SUCCESS")),
      s"bipartite artifact must exist after first use: $dir")

    // run 2: a NEW SparkSession (fresh memo key — the fresh-JVM shape)
    // must LOAD, not rebuild, and the result must hash-match
    val s2 = spark.newSession()
    val builds0 = ArtifactStore.builds.get()
    val loads0 = ArtifactStore.loads.get()
    val r2 = graft.SparkEntry.all("p01_pagerank").fn(s2, d)
      .collect().map(_.toSeq).toSet
    assert(ArtifactStore.builds.get() == builds0,
      "a second session must not rebuild the trading graph")
    assert(ArtifactStore.loads.get() >= loads0 + 1,
      "the trading graph must load from disk")
    assert(r2 == r1, "artifact-served results must hash-match the built run")
  }
}
