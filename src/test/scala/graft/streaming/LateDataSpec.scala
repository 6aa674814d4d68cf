package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Watermark late-data semantics, locked: an event arriving AFTER the
  * watermark has passed its window's end must be dropped from the
  * append-mode windowed aggregation — the contract that bounds state on
  * an unbounded stream (without it, every historical window stays open
  * forever). The batch control on the same files counts the late row,
  * proving the drop is watermark semantics, not data loss.
  */
class LateDataSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  // divisible by 300 s so the 5-min window starts exactly here
  private val base = 1699999800L

  private def ev(id: Long, epochS: Long): (Long, Timestamp, Long, String, Double, String) =
    (id, new Timestamp(epochS * 1000), id, "click", 1.0, "{}")

  /** Write rows as a single parquet file named `name` inside srcDir with
    * a controlled mtime (the file source processes oldest-first). */
  private def writeBatch(srcDir: java.nio.file.Path, name: String, mtime: Long,
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_late_tmp")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = srcDir.resolve(name)
    java.nio.file.Files.move(part, dst)
    dst.toFile.setLastModified(mtime)
  }

  test("append-mode windowed agg drops a late event; the batch twin counts it") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_late")
    // The watermark contract is one-directional: state is GUARANTEED to
    // survive until the watermark passes, but a late row is only
    // guaranteed dropped once the window's state has been EVICTED in an
    // earlier batch. So the window must finalize (batch 2) strictly
    // before the late row arrives (batch 3).
    // batch 1: three on-time events in window [base, base+300), plus one
    // at base+3600; end-of-batch watermark → base+3000
    writeBatch(srcDir, "a.parquet", 1000000L,
      Seq(ev(1, base + 60), ev(2, base + 120), ev(3, base + 180), ev(4, base + 3600)))
    // batch 2 (watermark base+3000): window [base, +300) EMITS with n=3
    // and its state evicts; end-of-batch watermark → base+6600
    writeBatch(srcDir, "b.parquet", 2000000L, Seq(ev(5, base + 7200)))
    // batch 3 (watermark base+6600): the late row's window is long
    // evicted → guaranteed dropped
    writeBatch(srcDir, "c.parquet", 3000000L, Seq(ev(10, base + 60)))

    val src = spark.readStream.schema(EventStream.schema).format("parquet")
      .option("path", srcDir.toString).option("maxFilesPerTrigger", "1").load()
    val q = EventStream.tumblingCounts(src).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("late_tumb").start()
    try { q.processAllAvailable() } finally q.stop()
    q.recentProgress.foreach(p => info(
      s"batch ${p.batchId}: rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")}"))

    val rows = spark.table("late_tumb").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toSeq
    assert(rows.count(_._1 == base) == 1,
      s"the finalized window must emit exactly once (no late re-emission): $rows")
    val got = rows.toMap
    assert(got.get(base).contains(3L),
      s"late event must be dropped from the finalized window: $got")
    assert(got.get(base + 3600).contains(1L), s"on-time window must emit: $got")
    assert(!got.contains(base + 7200), s"still-open window must not emit: $got")

    // batch control over the SAME files: no watermark, late row counts
    val batch = spark.read.schema(EventStream.schema).parquet(srcDir.toString)
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "5 minutes"))
      .count().collect()
      .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000) -> r.getLong(1)).toMap
    assert(batch(base) == 4L, s"batch twin must count the late row: $batch")
  }
}
