package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DocStream
import graft.streaming.DocStream.{QuotaIn, QuotaRow, QuotaState}

/** Order-independence lock on s22's quota state function: the final
  * admitted snapshot must be identical under ANY micro-batch split of
  * the same arrivals — the property that makes the streaming cap
  * oracle-checkable against batch t56 at all. Exercised directly on
  * the state transition (no streaming harness), the way
  * ConnectedComponentsSpec drives the CC round body.
  */
class QuotaSplitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  /** Drive sourceQuotaFn over a batch sequence with a fake in-memory
    * GroupState; returns (final set, all emitted snapshots). */
  private def drive(k: Int, batches: Seq[Seq[QuotaIn]]): (Seq[(Long, Long)], Seq[QuotaRow]) = {
    var st: Option[QuotaState] = None
    val emitted = Seq.newBuilder[QuotaRow]
    batches.foreach { b =>
      val gs = new FakeGroupState(st)
      emitted ++= DocStream.sourceQuotaFn(k)("src", b.iterator, gs)
      st = gs.stored.orElse(st)
    }
    (st.map(s => s.ids.zip(s.chars)).getOrElse(Nil), emitted.result())
  }

  private val docs = Seq(
    QuotaIn("src", 1L, 50L), QuotaIn("src", 2L, 90L), QuotaIn("src", 3L, 90L),
    QuotaIn("src", 4L, 10L), QuotaIn("src", 5L, 70L), QuotaIn("src", 6L, 99L),
    QuotaIn("src", 7L, 70L), QuotaIn("src", 8L, 5L))

  // K=4 over the 8 docs: (6,99) (2,90) (3,90) then the 70-tie keeps
  // doc 5 over doc 7 (id tie-break)
  private val expect = Seq((6L, 99L), (2L, 90L), (3L, 90L), (5L, 70L))

  test("s22: every split of the same arrivals converges to the same admitted set") {
    val splits = Seq(
      Seq(docs),                                  // one batch
      docs.map(Seq(_)),                           // one doc per batch
      Seq(docs.take(3), docs.drop(3)),            // uneven
      Seq(docs.reverse.take(5), docs.reverse.drop(5)), // reversed arrival
      Seq(docs.filter(_.doc_id % 2 == 0), docs.filter(_.doc_id % 2 == 1)))
    splits.foreach { sp =>
      val (fin, _) = drive(4, sp)
      assert(fin == expect, s"split $sp converged to $fin")
    }
  }

  test("s22: unchanged batches emit nothing; seq increases only on change") {
    // batch 2 arrives entirely below the admitted floor → no emission
    val (_, emitted) = drive(2, Seq(
      Seq(QuotaIn("src", 2L, 90L), QuotaIn("src", 6L, 99L)),
      Seq(QuotaIn("src", 8L, 5L), QuotaIn("src", 4L, 10L)),
      Seq(QuotaIn("src", 9L, 95L))))
    val seqs = emitted.map(_.seq).distinct
    assert(seqs == Seq(1L, 2L), s"expected exactly two snapshots, got $emitted")
    val last = emitted.filter(_.seq == 2L).map(r => (r.rk, r.doc_id, r.n_chars))
    assert(last == Seq((1, 6L, 99L), (2, 9L, 95L)), last)
  }

  test("s22: the graded stream snapshot equals batch t56's kept set at sf0.001") {
    val stream = StreamOps.streamSourceQuota(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val batch = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (src, ds) =>
        ds.sortBy(t => (-t._3, t._2)).take(TextOps.SourceCap).zipWithIndex
          .map { case ((_, id, ch), i) => (src, i + 1, id, ch) }
      }
    assert(stream.toSeq == batch, "stream snapshot must equal the batch cap's admitted set")
  }
}

/** Minimal GroupState stand-in for driving state functions directly. */
private final class FakeGroupState[S](init: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  var stored: Option[S] = init
  override def exists: Boolean = stored.isDefined
  override def get: S = stored.get
  override def getOption: Option[S] = stored
  override def update(s: S): Unit = { stored = Some(s) }
  override def remove(): Unit = { stored = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
