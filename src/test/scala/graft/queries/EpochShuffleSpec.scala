package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** t65's permutation contract, recomputed from first principles: the
  * epoch order is ascending 60-bit md5(doc_id || ":ep" || epoch) — the
  * spec derives the expected order with the JVM's own MessageDigest
  * (independent of both Spark and DuckDB) and checks head/tail/checksum
  * per epoch, so the engine's conv/substring/md5 chain can't drift. */
class EpochShuffleSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session

  private def eh(docId: Long, epoch: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$docId:ep$epoch".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("epoch order = ascending salted hash; checksum pins the whole permutation") {
    import spark.implicits._
    val ids = (1L to 20L).toSeq
    val docs = ids.map(i => (i, 0L)).toDF("doc_id", "shard")
    val epochs = Seq(0L, 1L).toDF("epoch")
    val out = TextOps.epochShuffleOn(docs, epochs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.length == 2) // one shard, two epochs
    val expected = Seq(0L, 1L).map { ep =>
      val order = ids.sortBy(i => (eh(i, ep), i))
      val checksum = order.zipWithIndex
        .map { case (id, idx) => (idx + 1L) * id }.sum
      (ep, 0L, ids.size.toLong, order.head, order.last, checksum)
    }
    assert(out.toSeq == expected,
      s"engine: ${out.toSeq}\nexpected: $expected")
    // the two epochs' permutations genuinely differ for this doc set
    // (computed, not assumed — the salt is doing its job)
    val o0 = ids.sortBy(i => (eh(i, 0L), i))
    val o1 = ids.sortBy(i => (eh(i, 1L), i))
    assert(o0 != o1, "planted set ordered identically under both salts")
  }

  test("re-running an epoch reproduces the identical record (seeded, no RNG)") {
    import spark.implicits._
    val docs = (1L to 9L).map(i => (i, i % 3)).toDF("doc_id", "shard")
    val ep = Seq(4L).toDF("epoch")
    val a = TextOps.epochShuffleOn(docs, ep).collect().map(_.toSeq)
    val b = TextOps.epochShuffleOn(docs, ep).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
