package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic lock on s28: the Complete-mode histogram state drained from
  * the stream, pushed through k04's own readout, must equal batch k04
  * row for row — the mergeability of (count, min, max) bins under ANY
  * micro-batch split IS the claim, since quantiles themselves are not
  * mergeable and the decomposition only works if the maintained
  * histogram is exact.
  */
class HistQuantStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  val d = "/root/testdata/sf0.001"

  test("streamed histogram quantiles equal batch k04 exactly") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
    val streamed = StreamOps.streamHistQuantiles(spark, d).collect().map(key).toSeq
    val batch = SketchOps.histogramQuantiles(spark, d).collect().map(key).toSeq
    assert(streamed.nonEmpty, "fixture must produce priority groups")
    assert(streamed == batch,
      s"stream/batch histogram quantiles diverged:\n$streamed\nvs\n$batch")
  }
}
