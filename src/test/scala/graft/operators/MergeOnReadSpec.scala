package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The physical half of q55's merge-on-read claim: the oracle proves
  * every version's DATA is right; this proves no commit ever touched
  * the base files (the zero-write-amplification contract CoW cannot
  * make) and that commit files are |delta|-sized. CowUpsertSpec and
  * this spec together grade the two mutation postures a lakehouse
  * chooses between per table.
  */
class MergeOnReadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("base files are byte-identical across commits; versions reconstruct monotonically") {
    val rows = MergeOnRead.morTimeTravel(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val (v1, v2, v3) = (rows(0), rows(1), rows(2))
    assert(v2._2 < v1._2, "v2 must have fewer rows than v1 (tombstoned deletes)")
    assert(v3._2 > v2._2, "v3 must have more rows than v2 (appends)")
    assert(v3._3 < 0L, "appended negated keys must surface in v3's min_key")
    assert(v1._3 >= 0L && v2._3 >= 0L, "v1/v2 must not see the appends")
    val (baseUnchanged, nTomb, nApnd) = MergeOnRead.lastAudit
      .getOrElse(fail("morTimeTravel must record its file audit"))
    assert(baseUnchanged, "no commit may rewrite a base data file")
    assert(nTomb == v1._2 - v2._2, "tombstone file must be exactly the deleted keys")
    assert(nApnd == v3._2 - v2._2, "append file must be exactly the inserted rows")
  }

  test("q57: compaction is result-invisible and resets the read path to a plain scan") {
    val rows = MergeOnRead.morCompaction(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2)
    val (pre, post) = (rows(0), rows(1))
    assert(pre.getString(0) == "1_pre_compaction" && post.getString(0) == "2_post_compaction")
    // result-invisibility, column by column
    (1 until pre.length).foreach(i => assert(pre.get(i) == post.get(i),
      s"compaction changed column $i: $pre vs $post"))
    val (nCompacted, nTomb, nApnd) = MergeOnRead.lastCompactAudit
      .getOrElse(fail("morCompaction must record its audit"))
    assert(nTomb > 0 && nApnd > 0, "the log must be non-trivial for the test to mean anything")
    assert(nCompacted == pre.getLong(1),
      "the compacted base must hold exactly the logical snapshot")
  }
}
