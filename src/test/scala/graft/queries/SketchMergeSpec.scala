package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes t46's mergeability claim: because MIN is idempotent and
  * associative, the sketch of a union equals the slotwise min of the
  * shard sketches — sketch(A ∪ B) = min(sketch(A), sketch(B)) — with
  * overlapping shards allowed (idempotence). This is what lets ingest
  * shards sketch independently and merge in any order at 100 TB.
  */
class SketchMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("sketch(A ∪ B) == slotwise min of shard sketches, shards overlapping") {
    import spark.implicits._
    // deterministic synthetic gram ids for one source, 60-bit-ish range
    val gids = (1 to 400).map(i => (i * 2654435761L + 987654321L) & ((1L << 60) - 1))
    val all = gids.map(g => ("srcX", g)).toDF("source", "gid")
    // overlapping shards: A = first 260, B = last 260 (120 shared)
    val a = gids.take(260).map(g => ("srcX", g)).toDF("source", "gid")
    val b = gids.drop(140).map(g => ("srcX", g)).toDF("source", "gid")

    def slots(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val r = TextOps.gramSketch(df).collect().head
      (0 until 16).map(j => r.getAs[Long](s"mh$j"))
    }
    val whole = slots(all)
    val merged = slots(a).zip(slots(b)).map { case (x, y) => math.min(x, y) }
    assert(whole == merged,
      s"union sketch must equal slotwise shard-min:\nwhole=$whole\nmerged=$merged")
  }
}
