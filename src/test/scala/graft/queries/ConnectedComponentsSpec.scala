package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The two CC round bodies (label propagation + pointer jumping vs
  * alternating large-star/small-star) must agree on the labeling, and
  * the star variant must not need MORE rounds on an adversarial
  * chain-shaped dup graph — the robustness case it exists for. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("500-node chain: both bodies label every node 0; star needs no more rounds") {
    import spark.implicits._
    val chain = (0L until 499L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (pjLabels, pjRounds) = TextOps.ccPointerJumping(spark, chain)
    val (starLabels, starRounds) = TextOps.ccLargeSmallStar(spark, chain)
    val pj = pjLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pj.size == 500 && star.size == 500)
    assert(pj.values.forall(_ == 0L), "pointer jumping must collapse the chain to min id 0")
    assert(star.values.forall(_ == 0L), "large/small-star must collapse the chain to min id 0")
    // O(log d) for both; the star rewrites shrink the graph itself, so a
    // deep chain never costs more rounds than pointer jumping
    assert(starRounds <= pjRounds,
      s"star took $starRounds rounds vs pointer jumping's $pjRounds on a 500-chain")
    assert(pjRounds < 40 && starRounds < 40, "neither body may hit the runaway guard")
  }

  test("two chains + a singleton pair: labelings agree per component") {
    import spark.implicits._
    // components: {10..15} chain, {100,101,102} triangle, {7,9} pair
    val edges = ((10L to 14L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (7L, 9L))).toDF("a_id", "b_id")
    val pj = TextOps.ccPointerJumping(spark, edges)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = TextOps.ccLargeSmallStar(spark, edges)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pj == star)
    assert((10L to 15L).forall(pj(_) == 10L))
    assert(Seq(100L, 101L, 102L).forall(pj(_) == 100L))
    assert(pj(7L) == 7L && pj(9L) == 7L)
  }

  test("ccAuto dispatches by average degree and labels identically either way") {
    import spark.implicits._
    // a 30-node chain: avg degree 2·29/30 < 3 → the deep-graph body
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (chainLabels, chainAlgo) = TextOps.ccAuto(spark, chain)
    assert(chainAlgo == "large_small_star",
      s"a chain (avg deg <3) must dispatch to the star body, got $chainAlgo")
    assert(chainLabels.collect().map(_.getLong(1)).forall(_ == 0L))
    // a 10-clique: avg degree 2·45/10 = 9 → shallow, pointer jumping
    val clique = (for (i <- 0L until 10L; j <- i + 1 until 10L) yield (i, j))
      .toDF("a_id", "b_id")
    val (cliqueLabels, cliqueAlgo) = TextOps.ccAuto(spark, clique)
    assert(cliqueAlgo == "pointer_jumping",
      s"a clique (avg deg ≥3) must dispatch to pointer jumping, got $cliqueAlgo")
    assert(cliqueLabels.collect().map(_.getLong(1)).forall(_ == 0L))
    // the rule itself, at the boundary: 2E/N = 3 exactly → pointer jumping
    assert(TextOps.ccChoose(3, 2) == "pointer_jumping")
    assert(TextOps.ccChoose(1, 2) == "large_small_star")
    assert(TextOps.ccChoose(0, 0) == "pointer_jumping") // empty graph: no loop either way
  }

  test("t32 leakage guard: every member of a dup cluster gets the SAME split") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val d = "/root/testdata/sf0.01"
    val split = TextOps.leakageSafeSplit(spark, d)
    // group by the INDEPENDENT clustering (not t32's own split_key —
    // split is a function of split_key, so grouping by it is
    // tautologically leak-free even if the key wiring broke): every
    // cluster must see exactly one distinct split across its members
    val clusters = TextOps.dupClusters(spark, d).select("doc_id", "cluster_id")
    assert(clusters.count() > 0, "fixture has no dup clusters; guard untested")
    val leaks = split.join(clusters, "doc_id")
      .groupBy("cluster_id")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(leaks == 0L, "a cluster straddles two splits — eval leakage")
    // and the key wiring is live: clustered docs must key on their
    // cluster root, not their own id
    val miskeyed = split.join(clusters, "doc_id")
      .filter(col("split_key") =!= col("cluster_id")).count()
    assert(miskeyed == 0L, "clustered docs must hash on the cluster root")
  }
}
