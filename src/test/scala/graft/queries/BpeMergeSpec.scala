package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic lock on t39: pair counts are word-frequency-weighted
  * adjacent character pairs, ranked (count DESC, pair ASC) — the
  * classic BPE textbook corpus, checked position by position.
  */
class BpeMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("hand-computed merge candidates on the textbook corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe")
      .toFile.getAbsolutePath
    // vocab: low×3, lower×2, newest×1 →
    //   lo = 3+2 = 5, ow = 3+2 = 5, we = 2+1 = 3, er = 2,
    //   es = ew = ne = st = 1
    Seq(
      (0L, "low low low", "en", "fixture"),
      (1L, "lower lower newest", "en", "fixture")
    ).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TextOps.bpeMergeCandidates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.take(4).toSeq == Seq(
      (1L, "lo", 5L), (2L, "ow", 5L), (3L, "we", 3L), (4L, "er", 2L)),
      s"top-4 merges: ${out.take(4).mkString(", ")}")
    // the four singleton pairs tie-break lexicographically
    assert(out.drop(4).map(_._2).toSeq == Seq("es", "ew", "ne", "st"),
      s"tie order: ${out.drop(4).mkString(", ")}")
    assert(out.forall(_._3 >= 1L))
  }
}
