package graft.queries

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** v35's insert-overlay contract: the overlay must be result-invisible
  * (rows identical to v08's full-index search) while the PLAN carries
  * both branches — the deployed artifact scan for the base AND a live
  * dot_d assignment for the not-yet-indexed slice. */
class VectorInsertSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  test("overlay rows ≡ v08; plan reads the artifact AND assigns the delta live") {
    def rows(name: String) = graft.SparkEntry.all(name).fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows("v35_ivf_insert_overlay") == rows("v08_ivf_topk"),
      "insert overlay must be result-invisible vs the full index")
    val df = graft.SparkEntry.all("v35_ivf_insert_overlay").fn(spark, d)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ivf_affinity"),
      s"the base branch must read the deployed routing artifact:\n${p.take(2000)}")
    assert(p.contains("dot_d"),
      "the delta branch must compute live centroid assignments")
    assert(p.contains("Union"), "base and delta cells union before the search")
  }
}
