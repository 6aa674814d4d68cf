package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The physical half of q49's copy-on-write claim: the oracle proves
  * the DATA is right; this proves the REWRITE was scoped — every file
  * of every untouched partition identical (path, size, mtime), the
  * touched partition actually replaced. Together they are the
  * bounded-write-amplification contract of a lakehouse MERGE.
  */
class CowUpsertSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("untouched partitions keep their exact files; the touched one is rewritten") {
    val rows = CopyOnWrite.cowUpsert(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5, "all five priorities must survive the rewrite")
    assert(rows.exists(r => r.getString(0) == "1-URGENT" && r.getLong(3) > 0),
      "the delta must actually have updated urgent rows")
    assert(rows.filter(_.getString(0) != "1-URGENT").forall(_.getLong(3) == 0L),
      "no update may leak outside the touched partition")
    val (untouchedSame, touchedChanged) = CopyOnWrite.lastAudit
      .getOrElse(fail("cowUpsert must record its file audit"))
    assert(untouchedSame, "untouched partition files must be byte-identical")
    assert(touchedChanged, "the touched partition must really have been rewritten")
  }
}
