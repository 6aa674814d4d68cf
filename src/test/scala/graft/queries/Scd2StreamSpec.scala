package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary lock on s18's temporal version selection: events strictly
  * before the SCD2 cutoff enrich with the OLD segment, events at or
  * after it with the NEW one — [valid_from, valid_to) half-open on
  * both the engine and oracle side. Driven as a batch frame through the
  * same factored enrichment body the stream runs.
  */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("events at the cutoff boundary select the version by event time, half-open") {
    import spark.implicits._
    val dim = StreamOps.scd2TimeDim(spark, sf)
    // custkey 0 is ≡0 mod 7 → it has two versions around the cutoff
    val oldSeg = dim.filter(col("c_custkey") === 0 && col("segment") =!= "AUTOMOBILE")
      .collect()
    assume(oldSeg.nonEmpty, "fixture custkey 0 must be a changed customer")
    val cutUs = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC)
    val ev = Seq(
      (1L, java.sql.Timestamp.from(cutUs.minusMillis(1)), 0L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.from(cutUs), 0L, "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.from(cutUs.plusMillis(1)), 0L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = StreamOps.asOfEnrich(dim)(ev)
      .select("event_id", "segment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 3, s"every event must enrich exactly once: $out")
    assert(out(1L) == oldSeg.head.getString(1), s"pre-cutoff event must see the old version: $out")
    assert(out(2L) == "AUTOMOBILE", s"event AT the cutoff belongs to the new version: $out")
    assert(out(3L) == "AUTOMOBILE", s"post-cutoff event must see the new version: $out")
  }

  test("every version pair partitions time: no gaps, no overlaps") {
    val dim = StreamOps.scd2TimeDim(spark, sf)
    // per customer: intervals must tile [1900, 2100) — total coverage
    // equal per customer and no double-coverage at any probe instant
    val bad = dim.groupBy("c_custkey")
      .agg(count(lit(1)).as("n_vers"),
        min("valid_from").as("lo"), max("valid_to").as("hi"),
        sum(unix_micros(col("valid_to")) - unix_micros(col("valid_from"))).as("cov"))
      .filter(
        unix_micros(col("hi")) - unix_micros(col("lo")) =!= col("cov") ||
          col("lo") =!= lit("1900-01-01").cast("timestamp") ||
          col("hi") =!= lit("2100-01-01").cast("timestamp"))
      .count()
    assert(bad == 0L, "SCD2 intervals must tile time exactly once per customer")
  }
}
