package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the approximate paths trade recall for pruning — make
  * the tradeoff measured, not assumed. */
class VectorRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  val d = "/root/testdata/sf0.001"

  private def hits(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.all(name).fn(spark, d)
      .select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("v07's bucketed pairs are a subset of v02's truth; recall tracks (1−θ/π)⁸") {
    val d01 = "/root/testdata/sf0.01"
    val exact = VectorOps.cosineNearDupPairs(spark, d01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val bucketed = VectorOps.lshNearDupPairs(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must produce ≥0.45-cosine pairs")
    // precision 1.0 by construction: candidates verify on exact cosine,
    // so a bucketed pair outside the truth set means the verify broke
    assert((bucketed -- exact.keySet).isEmpty,
      s"bucketed pairs must verify exactly: ${(bucketed -- exact.keySet).take(3)}")
    // recall is the ADVERTISED sign-LSH collision rate: a pair at angle
    // θ shares all 8 planes with probability (1−θ/π)⁸ — on this corpus
    // (merely-similar pairs, θ ≈ 60°) that is a few percent BY DESIGN
    // (true duplicates at θ ≈ 0 survive with near-1). The planes are a
    // fixed hash, so the measured recall is deterministic; assert it
    // sits within an order of magnitude of the analytic prediction.
    val predicted = exact.values
      .map(c => math.pow(1 - math.acos(math.min(c, 1.0)) / math.Pi, 8)).sum
    val recall = bucketed.size.toDouble / exact.size
    info(f"v07 vs v02 truth: found ${bucketed.size}/${exact.size} " +
      f"(recall $recall%.3f), analytic expectation ${predicted / exact.size}%.3f")
    assert(bucketed.size <= math.max(4 * predicted, 8),
      s"found ${bucketed.size} vs predicted $predicted — collision rate far above (1−θ/π)⁸")
    assert(bucketed.size >= predicted / 4 - 2,
      s"found ${bucketed.size} vs predicted $predicted — collision rate far below (1−θ/π)⁸")
  }

  test("IVF(2-probe) and LSH top-5 recall vs exact top-5") {
    val exact = hits("v01_cosine_topk").map { case (q, s) => q -> s.take(5) }
    // exact top-5 = first 5 ranks of v01's top-10 — recompute properly:
    val exact5 = graft.SparkEntry.all("v01_cosine_topk").fn(spark, d)
      .filter(org.apache.spark.sql.functions.col("rk") <= 5)
      .select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact5.map { case (q, ex) =>
        approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0d)
      }
      per.sum / per.size
    }
    val rIvf = recall(hits("v08_ivf_topk"))
    val rLsh = recall(hits("v06_ann_lsh_topk"))
    val rSq8 = recall(hits("v09_sq8_topk"))
    val rPq = recall(hits("v12_pq_adc_topk"))
    val rTrunc = recall(hits("v13_truncated_rerank"))
    val rIvfPq = recall(hits("v24_ivfpq_topk"))
    val rIvfPqR = recall(hits("v25_ivfpq_residual_topk"))
    val rOpq = recall(hits("v33_ivfpq_opq_topk"))
    info(f"recall@5: IVF(2/16 cells)=$rIvf%.2f, LSH(16 buckets)=$rLsh%.2f, " +
      f"SQ8=$rSq8%.2f, PQ-ADC(8×16)=$rPq%.2f, trunc16+rerank=$rTrunc%.2f, " +
      f"IVFPQ(2/16 + 8×64)=$rIvfPq%.2f, IVFPQ-residual=$rIvfPqR%.2f, " +
      f"IVFPQ-OPQ=$rOpq%.2f")
    // the composite can only lose candidates relative to its parts: its
    // recall is bounded above by BOTH the IVF routing (which prunes
    // cells) and the PQ ranking (which blurs scores) — but with the
    // round-8 64-codeword rung it must hold its LIFTED operating point
    // (deterministic pipeline: 16 codewords measured 0.32 at sf0.001,
    // 64 codewords 0.46 — frozen, not flaky; v32 grades the curve)
    assert(rIvfPq >= 0.4, s"IVFPQ recall below the 64-codeword rung: $rIvfPq")
    assert(rIvfPq <= rIvf + 1e-9,
      s"IVFPQ cannot beat its own coarse router: $rIvfPq > $rIvf")
    // v25 (residual codes + trained codebook) lands within fixture
    // noise of v24 here (±1–3 hits at 10 queries × 5 slots — verified
    // against an independent numpy model of the same pipeline); the
    // assertions pin determinism and the router bound, not a winner
    assert(rIvfPqR >= 0.2, s"residual IVFPQ recall degenerate: $rIvfPqR")
    assert(rIvfPqR <= rIvf + 1e-9,
      s"residual IVFPQ cannot beat its own coarse router: $rIvfPqR > $rIvf")
    // v33: the Hadamard OPQ rotation at the same 64-codeword budget —
    // at sf0.01 it lifts v24 0.42 → 0.48 (measured, deterministic);
    // at this 500-vector fixture assert it holds a lifted floor and
    // the router ceiling
    assert(rOpq >= 0.4, s"OPQ-rotated IVFPQ recall degenerate: $rOpq")
    assert(rOpq <= rIvf + 1e-9,
      s"OPQ IVFPQ cannot beat its own coarse router: $rOpq > $rIvf")
    // v32's 64-codeword point is pinned EQUAL to v24's realized recall
    // (same candidate frame, same router — curve and operator cannot
    // drift; the v29/v15 discipline), and the curve's far end must not
    // fall below its start (more codewords, same router)
    val curve = graft.SparkEntry.all("v32_ivfpq_codebook_curve").fn(spark, d)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(curve(64) - rIvfPq) < 1e-6,
      s"v32's 64-codeword rung (${curve(64)}) must equal v24's realized recall ($rIvfPq)")
    assert(curve(64) >= curve(16) - 1e-9,
      s"codebook curve regressed: K=64 ${curve(64)} < K=16 ${curve(16)}")
    assert(rIvf >= 0.3, s"IVF recall degenerate: $rIvf")
    assert(rLsh >= 0.3, s"LSH recall degenerate: $rLsh")
    // SQ8 scans everything (no pruning) — quantization noise only, so
    // recall should be near-exact, far above the pruned paths
    assert(rSq8 >= 0.8, s"SQ8 recall degenerate: $rSq8")
    // PQ compresses 256 B → 4 B (64×): real reconstruction loss with a
    // 16-seed codebook is expected, but the ranking must stay far from
    // random (random recall@5 over 500 candidates ≈ 0.01)
    assert(rPq >= 0.2, s"PQ-ADC recall degenerate: $rPq")
    // the 16-dim prefix keeps 50 candidates before the exact rerank, so
    // it should land near SQ8 despite scanning a quarter of each vector
    assert(rTrunc >= 0.5, s"truncated-rerank recall degenerate: $rTrunc")
    assert(exact.nonEmpty)
  }

  test("margin-ranked multi-probe beats naive Hamming probing at the same scan (sf0.01)") {
    // the round-6 weak rung: naive Hamming≤1 probing (v06) measured
    // recall@5 0.40 at sf0.001 / 0.62 at sf0.01 for a 5-bucket scan.
    // v23's margin-ranked probe sequence spends the SAME 5 probes on the
    // masks whose flipped planes the query is closest to. Measured at
    // sf0.01 (the corpus where neighbor structure is meaningful; the
    // 500-vector fixture is sampling noise at 50 neighbor slots):
    // margin-ranked 0.66 vs naive 0.62. Both paths are deterministic
    // (fixed planes, fixed data), so this is a frozen measurement, not
    // a flaky bound.
    val d01 = "/root/testdata/sf0.01"
    val curve = graft.SparkEntry.all("v23_lsh_probe_curve").fn(spark, d01)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // curve must be monotone: more probes only add candidates
    assert(curve(1) <= curve(3) && curve(3) <= curve(5) && curve(5) <= curve(8),
      s"recall must be monotone in probes: $curve")
    val exact5 = graft.SparkEntry.all("v01_cosine_topk").fn(spark, d01)
      .filter(org.apache.spark.sql.functions.col("rk") <= 5)
      .select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val naive = graft.SparkEntry.all("v06_ann_lsh_topk").fn(spark, d01)
      .select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val nFound = exact5.map { case (q, ex) => (naive.getOrElse(q, Set.empty) & ex).size }.sum
    val rNaive = nFound.toDouble / exact5.map(_._2.size).sum
    info(f"recall@5 at 5/16 probes, sf0.01: margin-ranked=${curve(5)}%.2f naive=$rNaive%.2f")
    assert(curve(5) >= rNaive,
      f"margin-ranked probing must not trail naive at the same scan: ${curve(5)}%.2f < $rNaive%.2f")
  }

  test("v27 composed stack (IVF route → binary shortlist → exact rerank) recall@5, measured") {
    import org.apache.spark.sql.functions.col
    val exact5 = graft.SparkEntry.all("v01_cosine_topk").fn(spark, d)
      .filter(col("rk") <= 5).select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val composed = hits("v27_ivf_binary_topk")
    val recall = exact5.keys.toSeq.map { q =>
      (composed(q) & exact5(q)).size.toDouble / exact5(q).size
    }.sum / exact5.size
    info(f"v27 composed recall@5 vs exact: $recall%.2f " +
      f"(2/16 cells routed, 16 B/vector shortlist scan, 20-row exact rerank)")
    // the composition cannot beat its router: v19 measured IVF-2-probe
    // at 0.94; the binary shortlist loses a little more. Floor well
    // above the lone binary rung (0.21) — the rerank is what recovers it
    assert(recall > 0.5, f"composed recall collapsed: $recall%.2f")
  }

  test("v30 matryoshka curve: recall is monotone non-decreasing in prefix dim, measured") {
    val rows = graft.SparkEntry.all("v30_matryoshka_recall_curve").fn(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 48))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2,
        s"a longer prefix must not lose exact-baseline hits: $lo vs $hi")
    }
    info(rows.map { case (dim, _, r) => f"dim=$dim r=$r%.2f" }.mkString("v30 curve: ", " ", ""))
    // the measured position: the quantized-prefix INNER-PRODUCT ranking
    // recovers baseline hits slowly on this isotropic synthetic corpus —
    // exactly why v22 reranks its truncated coarse stage with exact
    // cosine instead of trusting the prefix order
    assert(rows.last._3 > rows.head._3, "the curve must actually rise")
  }

  test("v31 filtered ANN: post-filter hits are a prefix of pre-filter's; deficits are real") {
    val rows = graft.SparkEntry.all("v31_filtered_ann").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.length == 10)
    rows.foreach { case (q, elig, pre, post, ovl, deficit) =>
      assert(pre == math.min(5L, elig), s"pre-filter must fill every available slot: q=$q")
      // the post path's survivors are by construction the best-cosine
      // eligible candidates — exactly pre's top prefix
      assert(ovl == post, s"post hits must be a prefix of pre hits: q=$q")
      assert(post <= pre && deficit == 5L - post)
    }
    val lost = rows.map(_._6).sum
    info(s"v31: post-filtering loses $lost of ${rows.length * 5} slots at shortlist 20")
    assert(lost > 0, "the fixture must exhibit the post-filter starvation the operator measures")
  }

  test("v26 binary-hamming recall@10 vs exact cosine — the 16 B/vector rung, measured") {
    val exact = hits("v01_cosine_topk")
    val binary = hits("v26_binary_hamming_topk")
    val recall = exact.keys.toSeq.map { q =>
      (binary(q) & exact(q)).size.toDouble / exact(q).size
    }.sum / exact.size
    info(f"v26 binary-hamming recall@10 vs exact: $recall%.2f (16 B vs 256 B per vector)")
    // sign bits keep coarse direction: well above chance (10/499 ≈ 0.02),
    // well below the float rungs — the documented position on the ladder
    assert(recall > 0.15, f"binary recall collapsed: $recall%.2f")
  }

  test("v37 probe curve: recall and candidate volume are monotone in probes") {
    val rows = graft.SparkEntry.all("v37_ivf_probe_recall_curve").fn(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4), rows.mkString(", "))
    // every query probes at every p (p cells per query always exist)
    assert(rows.forall(_._2 == rows.head._2), "constant query census")
    // probing more cells can only ADD candidates and never lose a hit:
    // the p-probe candidate set contains the (p−1)-probe set by
    // construction, so both series must be non-decreasing — a dip means
    // the expansion or the per-p ranking broke
    assert(rows.map(_._3).sliding(2).forall(w => w(0) < w(1)),
      s"candidate volume must grow with probes: ${rows.toSeq}")
    assert(rows.map(_._5).sliding(2).forall(w => w(0) <= w(1)),
      s"recall must be non-decreasing in probes: ${rows.toSeq}")
    info(s"v37 curve (probes → recall‰ @ candidates): " +
      rows.map(r => s"${r._1} → ${r._5}‰ @ ${r._3}").mkString(", "))
  }

  test("v40 staleness curve: recall climbs with the build point; 100% row ≡ v37's 2-probe row") {
    val rows = graft.SparkEntry.all("v40_ivf_staleness_curve").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(70L, 80L, 90L, 100L), rows.mkString(", "))
    // a later build point can only ADD indexed rows: candidates and
    // recall must be non-decreasing — a dip means the cut filter leaked
    assert(rows.map(_._3).sliding(2).forall(w => w(0) <= w(1)),
      s"candidates must grow with the build point: ${rows.toSeq}")
    assert(rows.map(_._5).sliding(2).forall(w => w(0) <= w(1)),
      s"recall must be non-decreasing in the build point: ${rows.toSeq}")
    // cross-lock: a 100 % build point IS the full 2-probe index, which
    // is exactly v37's n_probes = 2 configuration — the two curves must
    // meet at that point or one of the candidate builders drifted
    val v37at2 = graft.SparkEntry.all("v37_ivf_probe_recall_curve").fn(spark, d)
      .collect().find(_.getInt(0) == 2).get.getLong(4)
    assert(rows.last._5 == v37at2,
      s"v40@100% (${rows.last._5}‰) must equal v37@2 probes ($v37at2‰)")
    info(s"v40 curve (build % → recall‰): " +
      rows.map(r => s"${r._1} → ${r._5}‰").mkString(", "))
  }

  test("v41 sampled calibration: k=1 row ≡ v39's exact audit; samples restrict the truth") {
    val d01 = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.all("v41_sampled_pair_recall").fn(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L), rows.mkString(", "))
    // the k=1 "sample" is the whole corpus: its row must be EXACTLY
    // v39's exact audit or the sampled path drifted from the v02 frame
    val v39 = graft.SparkEntry.all("v39_cell_pair_recall").fn(spark, d01)
      .collect().head
    assert((rows.head._2, rows.head._3, rows.head._4, rows.head._5) ==
      (v39.getLong(0), v39.getLong(1), v39.getLong(2), v39.getLong(3)),
      s"v41@k=1 ${rows.head} must equal v39 exact audit $v39")
    // a sampled truth set is a RESTRICTION of the exact one — counts
    // can only shrink as k grows... for the truth side, which samples
    // nested buckets ONLY at k=1 (bucket-0 of k=4 ⊄ bucket-0 of k=2 in
    // general) — so assert each sample is bounded by the exact counts
    rows.tail.foreach { r =>
      assert(r._2 <= rows.head._2, s"sampled truth exceeds exact: $r")
      assert(r._3 <= rows.head._3, s"sampled candidates exceed exact: $r")
      assert(r._4 <= r._2, s"hits exceed truth: $r")
    }
    // the fixture must actually exercise the sampled estimator (a 0-pair
    // sample would grade nothing — the -1 sentinel says so loudly)
    assert(rows.exists(r => r._1 > 1 && r._2 > 0),
      s"no k>1 sample captured any truth pair — fixture too thin: ${rows.toSeq}")
    info("v41 fidelity (k → recall‰): " +
      rows.map(r => s"${r._1} → ${r._5}‰ (${r._4}/${r._2})").mkString(", "))
  }
}
