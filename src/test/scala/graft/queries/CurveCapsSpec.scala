package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property locks on t56 (per-source document caps) and v29 (SemDeDup
  * threshold curve). The DuckDB twins grade the values; these pin the
  * cross-query invariants the twins can't see:
  *   - t56's ledger is self-consistent and its cap binds exactly where
  *     an independent Scala recompute says it should.
  *   - v29 is monotone in τ, and its τ = 0.45 point equals what the
  *     graded v15 dedup actually does at that threshold — curve and
  *     operator can never drift apart.
  */
class CurveCapsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("t56: ledger is self-consistent; kept set equals the Scala-ranked top-Cap per source") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    val out = TextOps.sourceCaps(spark, sf).collect()
    assert(out.nonEmpty && out.length == bySource.size)
    out.foreach { r =>
      val src = r.getString(0)
      val (nDocs, nKept, nDropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (charsTotal, charsKept, cutoff) = (r.getLong(4), r.getLong(5), r.getLong(6))
      val ranked = bySource(src).sortBy(t => (-t._3, t._1))
      val kept = ranked.take(TextOps.SourceCap)
      assert(nDocs == ranked.length && nKept + nDropped == nDocs)
      assert(nKept == kept.length)
      assert(charsTotal == ranked.map(_._3).sum)
      assert(charsKept == kept.map(_._3).sum, s"kept chars drift on $src")
      assert(cutoff == kept.map(_._3).min, s"cut-off must be the min kept length on $src")
    }
  }

  test("t58: the waterfall only ever narrows; the scrub stage drops tokens, never docs") {
    val rows = TextOps.curationWaterfall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq("0_raw", "1_holdout_removed",
      "2_quality_gate", "3_near_dup", "4_decontam_scrub"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"a gate cannot ADD documents: $a -> $b")
      assert(b._3 <= a._3, s"a gate cannot ADD tokens: $a -> $b")
    }
    // decontamination scrubs SPANS, not documents (the scrub-don't-drop
    // contract t41 establishes)
    assert(rows(4)._2 == rows(3)._2, s"stage 4 must keep stage 3's docs: ${rows.toSeq}")
    assert(rows.last._2 > 0, "the pipeline must leave a corpus")
  }

  test("v29: pair and victim mass are monotone non-increasing in tau; the 0.45 point IS v15") {
    val curve = VectorOps.semdedupThresholdCurve(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(curve.length == 5)
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._1 < hi._1)
      assert(lo._2 >= hi._2, s"pairs must not grow with tau: $lo vs $hi")
      assert(lo._3 >= hi._3, s"victims must not grow with tau: $lo vs $hi")
      assert(lo._5 <= hi._5, s"keep rate must not fall with tau: $lo vs $hi")
    }
    val at45 = curve.find(_._1 == 0.45).get
    val v15 = VectorOps.semanticDedup(spark, sf).collect()
    assert(at45._4 == v15.length, "n_total must be the corpus size")
    val victims = v15.count(_.getLong(3) == 0L) // is_kept = 0
    assert(at45._3 == victims,
      s"curve victims at 0.45 (${at45._3}) must equal v15's dropped count ($victims)")
  }
}
