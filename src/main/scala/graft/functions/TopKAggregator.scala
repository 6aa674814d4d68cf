package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (`Aggregator[IN, BUF, OUT]`, SURVEY.md §2.7):
  * keeps the k largest (score, id) pairs per group with a bounded
  * buffer — the partial-aggregation alternative to the window-rank
  * top-n (q09): the buffer is ≤k on every executor, merged
  * associatively, so no per-group sort or full shuffle of group rows.
  *
  * Ties break on ascending id, making results deterministic and equal
  * to the ROW_NUMBER() formulation (ScoredTopKSpec proves equality).
  */
case class ScoredTopK(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], List[(Long, Double)]] {

  private def trim(xs: List[(Long, Double)]): List[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }.take(k)

  override def zero: List[(Long, Double)] = Nil
  override def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] =
    trim(a :: b)
  override def merge(x: List[(Long, Double)], y: List[(Long, Double)]): List[(Long, Double)] =
    trim(x ++ y)
  override def finish(b: List[(Long, Double)]): List[(Long, Double)] = trim(b)
  override def bufferEncoder: Encoder[List[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[(Long, Double)]] = ExpressionEncoder()
}

/** Element-wise max of fixed-width int arrays — the HLL-register merge
  * (p09): a node's radius-r registers are the max over its neighbors'.
  * A true partial aggregate: the buffer is ONE n-int array per group
  * per map task, merged associatively, so a round of register
  * propagation shuffles |groups|·n ints instead of |edges|·occupancy
  * exploded rows (the long-format join fan-out measured 76M
  * intermediate rows per round at sf0.1 — this deleted it). */
case class RegMax(n: Int)
    extends Aggregator[Array[Int], Array[Int], Array[Int]] {
  override def zero: Array[Int] = new Array[Int](n)
  // Array[Int] end-to-end: the primitive-array encoder decodes an
  // UnsafeArrayData in one copy, where the earlier Seq[Int] signature
  // boxed every element of every edge message per round
  override def reduce(b: Array[Int], a: Array[Int]): Array[Int] = {
    var i = 0
    while (i < n) { val v = a(i); if (v > b(i)) b(i) = v; i += 1 }
    b
  }
  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < n) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }
  override def finish(b: Array[Int]): Array[Int] = b
  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder()
}

/** [[RegMax]] over BYTE-packed registers — the |E|-scale message width
  * cut (round 14): an HLL register is ≤ 55, so the per-edge message
  * payload is 64 BYTES (BinaryType), not 64 ints (~272 B as
  * UnsafeArrayData) — 4× less traffic through the join→partial-agg
  * pipeline and the agg exchange, the difference that matters when the
  * edge frame is 10^11 rows. The |V|-scale frames stay array<int> so
  * the register expressions (init, estimate, delta merge) keep their
  * existing HOF form; only the propagation hot path packs. */
case class RegMaxB(n: Int)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](n)
  override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < n) { val v = a(i); if (v > b(i)) b(i) = v; i += 1 }
    b
  }
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < n) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}
