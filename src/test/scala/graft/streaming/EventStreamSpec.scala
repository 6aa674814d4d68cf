package graft.streaming

import graft.queries.EventOps
import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch parity: the streaming plans replayed over the fixture
  * must agree with their batch twins in graft.queries.EventOps. */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** Stream source dir: fixture events re-written with µs timestamps
    * (the raw fixture is TIMESTAMP(NANOS), unreadable as a stream). */
  lazy val srcDir: String = {
    val d = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("tumbling 5-min counts: stream == batch") {
    val streamed = EventStream.runOnce(spark, EventStream.tumblingCounts, srcDir, "tumb")
      .select("w_start_epoch", "event_type", "n")
      .orderBy("w_start_epoch", "event_type").collect().map(_.toSeq)
    val batch = EventOps.tumbling5min(spark, sfDir).collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("tumbling counts across MULTIPLE micro-batches == batch (incremental state)") {
    // 4 parquet files + maxFilesPerTrigger=1 → ≥4 micro-batches; the
    // windowed aggregation accumulates state across batches (Complete
    // mode keeps all windows), so the final table must equal the batch
    // twin no matter how the rows were sliced into batches
    val d4 = java.nio.file.Files.createTempDirectory("evstream4").toString
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4).write.mode("overwrite").parquet(d4)
    val src = spark.readStream.schema(EventStream.schema).format("parquet")
      .option("path", d4).option("maxFilesPerTrigger", "1").load()
    val q = EventStream.tumblingCounts(src).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("tumb_mb").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.map(_.batchId).max >= 3, "must replay as several micro-batches")
    val streamed = spark.table("tumb_mb")
      .orderBy("w_start_epoch", "event_type").collect().map(_.toSeq)
    val batch = EventOps.tumbling5min(spark, sfDir).collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful sessionization: closed stream sessions == batch sessions") {
    val streamed = EventStream.runSessionsOnce(spark, srcDir, "sess")
      .select(col("user_id"), col("sess_id"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    // batch twin, excluding each user's final (still-open) session
    val batch = EventOps.sessionize(spark, sfDir)
    val lastSess = batch.groupBy("user_id").agg(max("sess_id").as("last"))
    val closed = batch.join(lastSess, "user_id")
      .filter(col("sess_id") < col("last"))
      .select(col("user_id"), col("sess_id"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty, "fixture must contain closed sessions")
  }
}
