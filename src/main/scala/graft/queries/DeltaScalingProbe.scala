package graft.queries

import org.apache.spark.sql.functions._

/** Round-21 (round-20 verdict #6 / r19 #6): the O(|delta|) lifecycle
  * scaling evidence — roll and reap wall time at TWO delta sizes
  * (mod-100 = 1% vs mod-10 = 10% of the id space) against the full
  * O(|corpus|) rebuild, using the PRODUCTION slice-banding and reap
  * builders (bandsOfSlice / rolledBands / docDeletionSet-shaped
  * anti-join — the Q52Probe no-drift rule). If the lifecycle claim
  * holds, roll work tracks the slice size (plus a fixed scan/plan
  * constant) and never the corpus; the reap is one anti-join whose
  * cost is the index scan regardless of deletion-set size.
  *
  * Usage: runMain graft.queries.DeltaScalingProbe [sfDir] [passes] */
object DeltaScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.Harness.withSession(cpus, logLevel = "ERROR") { spark =>
      def best(label: String)(body: => Long): Unit = {
        val xs = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          val rows = body
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (t, rows) = xs.minBy(_._1)
        println(f"[deltaprobe] $label%-34s best ${t}%7.3f s  " +
          f"(all ${xs.map(x => f"${x._1}%.2f").mkString("/")}; $rows rows)")
      }
      // untimed: absorb JIT/codegen/first-scan
      try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
      // the rolled index the reap anti-joins against (artifact-served
      // after the first build; built untimed here so the reap lines
      // measure the reap, not the roll)
      val rolled = TextOps.rolledBands(spark, sfDir)
      rolled.count()
      best("rebuild: band ALL docs (corpus)") {
        TextOps.bandsOfSlice(spark, sfDir, lit(true)).count()
      }
      best("roll work: delta = 10% (mod 10)") {
        TextOps.bandsOfSlice(spark, sfDir,
          pmod(col("doc_id"), lit(10L)) === 7L).count()
      }
      best("roll work: delta = 1% (mod 100)") {
        TextOps.bandsOfSlice(spark, sfDir,
          pmod(col("doc_id"), lit(100L)) === 7L).count()
      }
      val del10 = graft.tables.Tables.documents(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(10L)) === 4L).select("doc_id")
      val del1 = graft.tables.Tables.documents(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(100L)) === 4L).select("doc_id")
      best("reap: deletions = 10% (mod 10)") {
        rolled.join(del10, Seq("doc_id"), "left_anti").count()
      }
      best("reap: deletions = 1% (mod 100)") {
        rolled.join(del1, Seq("doc_id"), "left_anti").count()
      }
    }
  }
}
