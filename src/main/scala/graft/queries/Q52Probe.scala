package graft.queries

import org.apache.spark.sql.functions._

/** Stage-split probe for q52's candidate build (round-14 brief #1):
  * times each CUMULATIVE prefix of the SymSpell pipeline so the
  * marginal cost of every stage is a subtraction. The stage frames
  * come from [[Relational2.fuzzyStages]] — the SAME frames the
  * production query composes (a copy-pasted probe pipeline drifted
  * from the real one within a single round). Stages:
  *
  *   A  sigs      — signature array build + 19× explode + xxhash64 +
  *                  (id, sig64) distinct: the diet's one ok-shuffle
  *   B  candIds   — sig64 self-join + id<id2 + pair distinct
  *   C  joined    — the two id join-backs + the fused levenshtein
  *   D  cand      — + the short-circuited exact arrays_overlap recheck
  *                  (dist ≤ 1 rows skip the probe — the SymSpell lemma)
  *   E  full      — + checkpoint + census/top-20 (the registered q52)
  *
  * Marginal(stage) = t(stage) − t(previous); multiple passes are
  * printed so the warm passes (what Bench grades) are the ones read.
  * Usage: runMain graft.queries.Q52Probe [sfDir] [nPasses]. */
object Q52Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.Harness.withSession(cpus, logLevel = "ERROR") { spark =>
      val c = graft.tables.Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("id"), col("c_name").as("nm"))
      (1 to n).foreach { pass =>
        val st = Relational2.fuzzyStages(c)
        val cand = Relational2.fuzzyCandUncached(c)
        def t(label: String)(body: => Long): Double = {
          val t0 = System.nanoTime()
          val rows = body
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[q52probe] pass $pass $label%-10s ${sec}%7.3f s  ($rows rows)")
          sec
        }
        val ta = t("A_sigs")(st.sigs.count())
        val tb = t("B_candIds")(st.candIds.count())
        val tc = t("C_joined")(st.joined.count())
        val td = t("D_recheck")(cand.count())
        val te = t("E_full")(Relational2.fuzzyBlockedMatchOn(c).count())
        println(f"[q52probe] pass $pass marginals: A=${ta}%.3f B=${tb - ta}%.3f " +
          f"C=${tc - tb}%.3f D=${td - tc}%.3f E=${te}%.3f (E is independent end-to-end)")
      }
    }
  }
}
