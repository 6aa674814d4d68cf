package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** t62's learning contract: the fixed-point descent must actually
  * DESCEND (monotone SSE), the distilled gate must end non-degenerate,
  * and the final scorer must beat the majority-class baseline — i.e.
  * the weights encode real signal, not just the base rate. */
class T62Spec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  test("SSE decreases every epoch; final gate beats the majority baseline") {
    val rows = graft.SparkEntry.all("t62_trained_quality_scorer").fn(spark, d)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == TextOps.T62Epochs)
    val sse = rows.map(_.getLong(5)).toSeq
    assert(sse.sliding(2).forall(w => w(1) < w(0)),
      s"SSE must strictly decrease across epochs: $sse")
    val f = TextOps.t62Features(spark, d)
    val n = f.count()
    val nPos = f.filter("y > 0").count()
    val majority = math.max(nPos, n - nPos)
    val lastAgree = rows.last.getLong(7)
    assert(lastAgree > majority,
      s"final agreement $lastAgree must beat predict-majority ($majority of $n)")
    // the gate itself must be non-degenerate: some docs pass, some fail
    val lastPass = rows.last.getLong(6)
    assert(lastPass > 0 && lastPass < n,
      s"final pass census must split the corpus: $lastPass of $n")
    info(s"trajectory sse=${sse.mkString(" > ")}; " +
      s"final agree $lastAgree/$n (majority $majority), pass $lastPass")
  }

  test("weights encode the distilled signal: longer docs score LOWER (diversity falls with length)") {
    val rows = graft.SparkEntry.all("t62_trained_quality_scorer").fn(spark, d)
      .collect().sortBy(_.getLong(0))
    // w_len is column 2 — the fixture's diversity gate anti-correlates
    // with length, so a trained scorer must learn a negative length
    // weight by the final epoch (epoch 1's positive overshoot is the
    // prototyped warm-up, not the converged sign)
    assert(rows.last.getLong(2) < 0,
      s"final w_len must be negative: ${rows.last}")
  }

  test("t63 applies the epoch-6 weights: confusion census reconciles with t62's trajectory row") {
    val traj = graft.SparkEntry.all("t62_trained_quality_scorer").fn(spark, d)
      .collect().sortBy(_.getLong(0)).last
    val census = graft.SparkEntry.all("t63_trained_gate_apply").fn(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val n = TextOps.t62Features(spark, d).count()
    def cell(p: Long, a: Long) = census.getOrElse((p, a), (0L, 0L))._1
    // t62's final n_pass / n_agree are marginals of t63's confusion
    // matrix — if t63 applied ANY other weights they would not add up
    assert(cell(1, 0) + cell(1, 1) == traj.getLong(6),
      s"pred-keep marginal must equal t62 epoch-6 n_pass: $census vs $traj")
    assert(cell(0, 0) + cell(1, 1) == traj.getLong(7),
      s"diagonal must equal t62 epoch-6 n_agree: $census vs $traj")
    assert(census.values.map(_._1).sum == n, "cells must partition the corpus")
  }

  test("s33 gates the stream with the same weights: census equals t63's batch census") {
    val batch = graft.SparkEntry.all("t63_trained_gate_apply").fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val stream = graft.SparkEntry.all("s33_stream_trained_gate").fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch,
      s"per-batch mergeable partials must reproduce the corpus census:\n$stream\nvs\n$batch")
  }
}
