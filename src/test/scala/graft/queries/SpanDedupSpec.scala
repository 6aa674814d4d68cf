package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-overlap lock on t53's span dedup + rewrite: which spans
  * survive, in which document, is fully determined by the (doc_id, ci)
  * keep-first rule — asserted here on a corpus built to exercise the
  * cross-document repeat, the within-document repeat, and the
  * everything-is-a-repeat document.
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  // 10-word spans; "w0 .. w9" and "x0 .. x9" are two distinct spans
  private val spanA = (0 until 10).map(i => s"w$i").mkString(" ")
  private val spanB = (0 until 10).map(i => s"x$i").mkString(" ")
  private val spanC = (0 until 10).map(i => s"y$i").mkString(" ")

  test("keep-first across and within documents; all-repeat doc rewrites to empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$spanA $spanB"),      // first owner of A and B
      (2L, s"$spanB $spanC"),      // B is a repeat; C fresh
      (3L, s"$spanA"),             // all-repeat: rewrites to empty
      (4L, s"$spanC $spanC")       // within-doc repeat: second copy dropped
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedupRewriteOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(1L) == ((2L, 2L, md5Hex(s"$spanA $spanB"))))
    assert(out(2L)._1 == 2L && out(2L)._2 == 1L && out(2L)._3 == md5Hex(spanC))
    assert(out(3L) == ((1L, 0L, md5Hex(""))), s"all-repeat doc must rewrite empty: ${out(3L)}")
    // doc 4: spanC already owned by doc 2 (earlier doc_id) — both copies go
    assert(out(4L) == ((2L, 0L, md5Hex(""))), s"repeats of an earlier doc's span: ${out(4L)}")
  }

  test("rebuild preserves span order by ci, not hash order") {
    import spark.implicits._
    // spans sort differently by hash than by position; rebuilt text must
    // follow position
    val docs = Seq((7L, s"$spanB $spanA $spanC")).toDF("doc_id", "text")
    val r = TextOps.spanDedupRewriteOn(docs).collect().head
    assert(r.getString(3) == md5Hex(s"$spanB $spanA $spanC"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
