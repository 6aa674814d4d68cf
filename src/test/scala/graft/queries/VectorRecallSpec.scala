package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the approximate paths trade recall for pruning — make
  * the tradeoff measured, not assumed. */
class VectorRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  val d = "/root/testdata/sf0.001"

  private def hits(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.all(name).fn(spark, d)
      .select("q_id", "hit_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

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
    info(f"recall@5: IVF(2/16 cells)=$rIvf%.2f, LSH(16 buckets)=$rLsh%.2f, " +
      f"SQ8=$rSq8%.2f, PQ-ADC(8×16)=$rPq%.2f, trunc16+rerank=$rTrunc%.2f")
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
}
