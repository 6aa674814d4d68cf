package graft.queries

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** s32/p14's contract: the ingest-maintained capped adjacency is a
  * bounded min-CapA sketch — merging each batch's arrivals into the
  * carried lists and re-cutting must EQUAL the batch cut over every
  * edge ever observed, including when a later batch displaces earlier
  * survivors — and p06 served from the artifact must match p06
  * recomputed from the snapshot row for row. */
class CappedAdjStreamSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"
  import spark.implicits._

  private def cappedBatch(und: org.apache.spark.sql.DataFrame) = {
    val nbrs = und.select(col("a").as("c"), col("b").as("nb"))
      .unionByName(und.select(col("b").as("c"), col("a").as("nb")))
    GraphOps.cappedAdjacencyOn(nbrs)
  }

  test("cross-batch displacement: later small ids evict earlier survivors, exactly as batch") {
    // batch 1: center 1000 sees neighbors 20..35 (16 > CapA=10) — the
    // carried list is 20..29; batch 2 brings 1..5, which must displace
    // 25..29 — a fold that only appends (or only keeps the first cut)
    // fails this
    val b1 = (20L to 35L).map(n => (1000L, n)).toDF("a", "b")
    val b2 = (1L to 5L).map(n => (1000L, n)).toDF("a", "b")
    val fold1 = GraphOps.cappedMergeFold(
      Seq.empty[(Long, Long)].toDF("c", "nb"), b1)
    assert(fold1.filter(col("c") === 1000L).select("nb").collect()
      .map(_.getLong(0)).sorted.toSeq == (20L to 29L),
      "first fold must carry the first-10-by-id cut")
    val fold2 = GraphOps.cappedMergeFold(fold1, b2)
    val got = fold2.filter(col("c") === 1000L).select("nb").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((1L to 5L) ++ (20L to 24L)),
      s"batch-2 small ids must displace the tail: $got")
    // and the incremental result equals the batch cut over b1 ∪ b2,
    // ON EVERY CENTER (the reverse direction c=20..35 lists too)
    val batch = cappedBatch(b1.unionByName(b2))
    assert(fold2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "incremental fold must equal the batch cut over all observed edges")
  }

  test("re-observed edges are absorbed (idempotent merge)") {
    val b = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val fold1 = GraphOps.cappedMergeFold(
      Seq.empty[(Long, Long)].toDF("c", "nb"), b)
    val fold2 = GraphOps.cappedMergeFold(fold1, b) // same edges again
    assert(fold2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      fold1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "redelivery must not duplicate or displace anything")
  }

  test("the live artifact equals the batch cut; p14 equals p06 row for row") {
    // the real ingest (order-sliced lineitem replay) vs the snapshot cut
    val art = StreamOps.cappedAdjacencyArtifact(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val li = graft.tables.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val und = li.join(li.withColumnRenamed("pk", "pk2"), "ok")
      .filter(col("pk") < col("pk2"))
      .select(col("pk").as("a"), col("pk2").as("b")).distinct()
    val batch = cappedBatch(und)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(art == batch,
      s"artifact and snapshot cut differ: ${(art diff batch).take(3)} / ${(batch diff art).take(3)}")
    // the graded equivalence, asserted locally too: p14's whole output
    // equals p06's (both also share the oracle text in the defs map)
    val p06 = graft.SparkEntry.all("p06_common_neighbors").fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val p14 = graft.SparkEntry.all("p14_common_neighbors_artifact").fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(p14 == p06, "artifact-served p06 must match the snapshot recompute")
  }
}
