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
