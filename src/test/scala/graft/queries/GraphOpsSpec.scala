package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-graph locks on the p-family (GraphOps): PageRank's integer
  * fixed-point semantics and triangle counting's degree-ordered
  * orientation, on graphs small enough to reason about exactly.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  private def undirected(pairs: (Long, Long)*) = {
    import spark.implicits._
    val und = pairs.toDF("a", "b")
    und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
  }

  test("p01: on a symmetric cycle every node converges to the same rank") {
    // 4-cycle: perfectly symmetric, so after any number of exact
    // iterations all ranks are EQUAL — any asymmetry is a math bug
    val ranks = GraphOps.pagerankOn(undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
      .collect().map(_.getLong(2)).toSet
    assert(ranks.size == 1, s"symmetric graph must give one rank value, got $ranks")
  }

  test("p01: star center outranks leaves; ranks are deterministic across runs") {
    val star = undirected((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L))
    val a = GraphOps.pagerankOn(star).collect()
    val b = GraphOps.pagerankOn(star).collect()
    assert(a.toSeq == b.toSeq, "integer fixed-point PageRank must be bit-deterministic")
    val ranked = a.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hub = ranked.filter(t => t._1 == "cust" && t._2 == 5L).map(_._3)
    val leaves = ranked.filterNot(t => t._1 == "cust" && t._2 == 5L).map(_._3)
    assert(hub.length == 1 && leaves.length == 5)
    assert(leaves.forall(_ < hub.head), s"hub must outrank leaves: $ranked")
    assert(leaves.toSet.size == 1, s"symmetric leaves must tie: $ranked")
  }

  test("p02: planted K4 plus a pendant path counts exactly 4 triangles") {
    // K4 has C(4,3)=4 triangles; the path 4-5-6 adds none
    val und = {
      import spark.implicits._
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
        (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    }
    val r = GraphOps.triangleCountOn(und).collect().head
    assert(r.getLong(0) == 4L, s"expected 4 triangles, got $r")
    assert(r.getLong(1) == 9L && r.getLong(2) == 7L)
  }

  test("p04: barbell graph resolves to exactly two equal communities") {
    import spark.implicits._
    // two triangles joined by one bridge edge: deterministic sync LP
    // with the min-label tie-break keeps them as separate communities
    // (hand-simulated: {0,1,2} → label 0, {10,11,12} → label 2)
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("a", "b")
    val out = GraphOps.labelPropagationOn(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 2L -> 3L),
      s"expected two 3-member communities (labels 0 and 2), got $out")
  }

  test("p04/p12: a collapsing frontier flips the adaptive loop to a LIVE delta round") {
    import spark.implicits._
    // K6 clique (labels collapse to 0 in one round) + pendant chain
    // 5-6-7 whose relabeling trickles outward one hop per round: after
    // round 2 the frontier is just the chain boundary (≪ |V|/2), so
    // round 3 MUST execute semi-naive — a live delta round, not the
    // post-fixpoint flat fill
    val cliq = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val edges = cliq ++ Seq((5L, 6L), (6L, 7L))
    val und = edges.toDF("a", "b")
    val bi = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val (communities, acctDf) = GraphOps.lpDeltaCore(bi)
    val acct = acctDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(acct.head._2 == "init", s"round 1 is the direct aggregation: ${acct.toSeq}")
    assert(acct.exists(a => a._2 == "delta" && a._3 > 0),
      s"a sub-half frontier must execute semi-naive: ${acct.toSeq}")
    val fronts = acct.map(_._3)
    assert(fronts.zip(fronts.tail).forall { case (a, b) => b <= a },
      s"frontier must shrink: ${fronts.toSeq}")

    // differential: the adaptive execution must agree label-for-label
    // with a naive driver-side synchronous LP over the same graph
    def naiveLp(rounds: Int): Map[Long, Long] = {
      val bidir = edges ++ edges.map { case (x, y) => (y, x) }
      val adj = bidir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to rounds)
        lbl = adj.map { case (n, ns) =>
          val byLbl = ns.groupBy(lbl).view.mapValues(_.size)
          n -> -byLbl.toSeq.map { case (l, c) => (c, -l) }.max._2
        }
      lbl
    }
    val expect = naiveLp(3).values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = communities.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"adaptive ≠ naive: got $got, expected $expect")
  }

  test("p13: min labels trickle one hop per round; components and fixpoint exact") {
    import spark.implicits._
    // chain 10-11-12-13 (min 10 needs 3 rounds to reach node 13),
    // edge 20-21, edge 30-31 → 3 components; hand-simulated curve
    val und = Seq((10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L), (30L, 31L)).toDF("a", "b")
    val bi = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val got = GraphOps.ccDeltaCore(bi).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 5L, 5L, 143L), // 11,12,13,21,31 improve; labels 10,10,11,12,20,20,30,30
      (2L, 2L, 4L, 141L), // 12→10, 13→11
      (3L, 1L, 3L, 140L), // 13→10 — the min walked the whole chain
      (4L, 0L, 3L, 140L), // fixpoint
      (5L, 0L, 3L, 140L)), got.toString) // flat tail, edges untouched
  }

  test("p05: chain layers count out exactly; an unreachable island grades as -1") {
    // path 0-1-2-3-4 (each layer 1 node) + disconnected pair 90-91
    val und = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (90L, 91L))
    val out = GraphOps.bfsLayersOn(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(-1L -> 2L, 0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"expected one node per layer 0..4 and the island at -1, got $out")
  }

  test("p08: delta BFS census ≡ p05 on the chain; each round touches only the frontier; drains early") {
    // same planted graph as the p05 case: the censuses must be identical
    val und = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (90L, 91L))
    val (census, sizes) = GraphOps.bfsDeltaLayersOn(und)
    val out = census.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(-1L -> 2L, 0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"delta census must equal p05's: $out")
    // the chain discovers exactly ONE node per round — the frontier
    // sizes ARE the proof that round k moved frontier rows, not |V|
    assert(sizes == Seq(1L, 1L, 1L, 1L), s"frontier per round: $sizes")
    // a short chain drains the frontier and the loop exits EARLY:
    // round 3 discovers nothing and no round 4 executes
    val short = undirected((0L, 1L), (1L, 2L))
    val (census2, sizes2) = GraphOps.bfsDeltaLayersOn(short)
    assert(sizes2 == Seq(1L, 1L, 0L), s"expected early drain, got $sizes2")
    val out2 = census2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), out2)
  }

  test("p11: weight relaxation corrects an early hop-cheap path; frontier shrinks; drains early") {
    import spark.implicits._
    // 0→1→2 costs 10+10 = 20, but the direct 0→2 edge costs 100: round 1
    // reaches 2 at 100 (hop-cheap, weight-expensive), round 2 IMPROVES
    // it to 20 through the frontier — the exact case BFS layers cannot
    // express and the delta discipline must re-open a settled node for.
    // 5→6 is an unreachable island (never enters the distance frame).
    val edges = Seq((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 100L), (5L, 6L, 1L))
      .toDF("src", "dst", "w")
    val (acct, fronts) = GraphOps.ssspDeltaCore(edges)
    val rows = acct.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // round 1: nodes 1 (10) and 2 (100) appear → reached {0,1,2} sum 110
    // round 2: node 2 improves 100 → 20 → sum 30
    // round 3: node 2 has no improving out-edges → fixpoint, flat tail
    assert(rows == Seq((1L, 2L, 3L, 110L), (2L, 1L, 3L, 30L),
      (3L, 0L, 3L, 30L), (4L, 0L, 3L, 30L)), rows.toString)
    assert(fronts == Seq(2L, 1L, 0L, 0L),
      s"the improved set must shrink to the one reweighted node: $fronts")
  }

  test("p09: neighborhood function is monotone and saturates once balls cover components") {
    // triangle 1-2-3 with tail 3-4 (diameter 2) + island pair (diameter
    // 1): every ball stops growing by r=2, so N(3) must EQUAL N(2) —
    // the register fixpoint — while N(0) < N(1) < N(2) strictly
    val und = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (90L, 91L))
    val out = GraphOps.hyperballOn(und).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0, 1, 2, 3))
    assert(out.values.map(_._1).toSet == Set(6L), s"constant node census: $out")
    val n = (0 to 3).map(out(_)._2)
    assert(n(0) < n(1) && n(1) < n(2), s"N(r) must grow while balls grow: $n")
    assert(n(2) == n(3), s"saturated graph: N(3) must equal N(2): $n")
  }

  test("p10: delta iteration lands on p09's exact curve with a shrinking frontier") {
    // same saturating fixture: registers hit their fixpoint by r=2, so
    // the round-2 frontier must be EMPTY and round 3 must be skipped —
    // yet the emitted curve must equal full (p09) propagation EXACTLY
    val und = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (90L, 91L))
    val full = GraphOps.hyperballOn(und).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val fronts = scala.collection.mutable.Map.empty[Int, Long]
    val out = GraphOps.hyperballDeltaOn(und, (r, f) => fronts(r) = f).collect()
    val curve = out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(curve == full, s"delta must equal full propagation:\n$curve\n$full")
    // frontier discipline: round 1 moves nodes, round 2 saturates (the
    // triangle+tail has diameter 2, the island diameter 1), round 3 is
    // the short-circuit fill
    assert(fronts(1) > 0, s"round-1 frontier must be non-empty: $fronts")
    assert(fronts(2) == 0 || fronts(2) < fronts(1),
      s"frontier must shrink: $fronts")
    assert(fronts.contains(3) && fronts(3) == 0, s"round 3 must be skipped: $fronts")
    // the readout columns: npermille is monotone to 1000; exactly one
    // at_eff_diameter row, at the first radius reaching 90%
    val permille = out.sortBy(_.getInt(0)).map(_.getLong(3))
    assert(permille.last == 1000L, s"last radius is the max: ${permille.toSeq}")
    assert(permille.sameElements(permille.sorted), s"monotone: ${permille.toSeq}")
    val eff = out.filter(_.getBoolean(4)).map(_.getInt(0)).toSeq
    val expected = out.sortBy(_.getInt(0)).find(_.getLong(3) >= 900).map(_.getInt(0)).toSeq
    assert(eff == expected, s"eff-diameter flag must mark the first ≥90% radius: $eff vs $expected")
  }

  test("p06: path graph predicts both skip-links; square scores double wedges; edges excluded") {
    import spark.implicits._
    // path 1-2-3-4: candidates (1,3) and (2,4), one wedge each, jac 500
    val path = GraphOps.commonNeighborsOn(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(path.toSeq == Seq((1L, 3L, 1L, 2L, 500L), (2L, 4L, 1L, 2L, 500L)), path.toSeq)
    // 4-cycle 1-2-3-4-1: both diagonals close TWO wedges; jac = 1000
    val square = GraphOps.commonNeighborsOn(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(square.toSeq == Seq((1L, 3L, 2L, 1000L), (2L, 4L, 2L, 1000L)), square.toSeq)
    // triangle 1-2-3: every wedge closes over an EXISTING edge → no candidates
    val tri = GraphOps.commonNeighborsOn(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"))
    assert(tri.count() == 0L, "closed triangle must yield no link predictions")
  }

  test("p06: the CapA cut bounds a hub's wedge fan-out to its first 10 neighbors") {
    import spark.implicits._
    // star center 0 with 15 leaves: uncapped would give C(15,2)=105
    // candidate pairs; the cap admits only leaves 1..10 → C(10,2)=45,
    // and top-20 returns the first 20 in (cn DESC, u, v) order
    val star = GraphOps.commonNeighborsOn((1L to 15L).map(i => (0L, i)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.length == 20)
    assert(star.forall { case (u, v) => u >= 1L && v <= 10L && u < v },
      s"only capped leaves may pair: ${star.toSeq}")
    // (1,·) gives 9 pairs, (2,·) 8 more, then (3,4),(3,5),(3,6) fill to 20
    assert(star.head == (1L, 2L) && star.last == (3L, 6L), star.toSeq)
  }

  test("p07: teleport concentrates rank on the seeds; top non-seeds trade with them") {
    val sf = "/root/testdata/sf0.001"
    val rows = GraphOps.personalizedPagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 15)
    // the PPR property that holds at ANY scale: teleport mass makes
    // every seed outrank every NON-seed customer (on the tiny sf0.001
    // graph the handful of suppliers absorb all customers' 85% flow and
    // can out-rank seeds — that part is size-dependent, so the lock is
    // on the customer ordering, not the global one)
    val seeds = rows.filter(_._3 == 1L)
    assert(seeds.length == 5 && seeds.forall(t => t._1 == "cust" && t._2 < 5L),
      s"all five seeds must make the top-15: ${rows.toSeq}")
    val minSeedRank = seeds.map(_._4).min
    val nonSeedCust = rows.filter(t => t._1 == "cust" && t._3 == 0L)
    assert(nonSeedCust.forall(_._4 < minSeedRank),
      s"every non-seed customer must rank below every seed: ${rows.toSeq}")
    // every ranked supplier must actually trade with a seed customer
    // (rank can only flow along edges from the teleport set)
    val seedSupp = graft.tables.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_custkey") < 5)
      .join(graft.tables.Tables.lineitem(spark, sf),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    val listedSupp = rows.filter(_._1 == "supp").map(_._2)
    assert(listedSupp.nonEmpty)
    assert(listedSupp.forall(seedSupp.contains),
      s"top non-seeds must be seed trading partners: ${listedSupp.toSeq}")
  }

  test("p02: orientation is a permutation of the edge set (no edge lost or duplicated)") {
    // a hub node with high degree: orientation must still preserve m
    val hub = (1L to 12L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L))
    val und = { import spark.implicits._; hub.toDF("a", "b") }
    val r = GraphOpsSpecHelper.census(und)
    assert(r == (14L, 13L), s"14 edges / 13 nodes expected, got $r")
  }
}

private object GraphOpsSpecHelper {
  def census(und: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val row = GraphOps.triangleCountOn(und).collect().head
    (row.getLong(1), row.getLong(2))
  }
}
