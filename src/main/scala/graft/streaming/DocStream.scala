package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection over a DOCUMENT stream — the
  * incremental dedup index a continuously-ingesting training-data
  * pipeline runs: every arriving document is SimHash-fingerprinted in
  * the stream (a stateless per-row map), routed to its pigeonhole
  * sub-band buckets, and compared ONLY against the documents already
  * indexed in those buckets (t13's banding, kept as streaming state).
  *
  * Order-independence is the design property that makes this
  * oracle-checkable: for any near-dup pair, whichever document arrives
  * second finds the first in their shared band's index, so the emitted
  * pair SET equals the batch t13 pair set under ANY micro-batch split
  * — state recovery and arrival order can shift WHEN a pair emits,
  * never WHETHER.
  *
  * Scale notes: the fingerprint map is stateless; the only shuffle is
  * the band-bucket grouping (3 slim rows per doc). State per key is
  * one band bucket — the same Σ|bucket|² bound that makes batch LSH
  * tractable governs the comparisons here, and the bucket lists ARE
  * the index (a production deployment would TTL or tier them to a
  * store; the fixture run keeps them in the state store). */
object DocStream {

  /** Schema of the documents table (TESTDATA.md). */
  val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  /** t04's 16-bit SimHash as ONE stateless scalar expression (no
    * aggregation, so it runs in a streaming select): per bit, the
    * majority vote over all tokens' md5-derived ids — bit-identical to
    * the batch operator and the DuckDB oracle (same tid, same
    * duplicate-token weighting, same v > 0 threshold). */
  private[streaming] val Simhash16Sql: String =
    """aggregate(
      |  transform(sequence(0, 15), b ->
      |    IF(aggregate(
      |         split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')), ' '),
      |         0L,
      |         (acc, t) -> acc + IF(CAST(FLOOR(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)
      |                                        / POW(2.0D, b)) AS BIGINT) % 2 = 1, 1L, -1L)
      |       ) > 0,
      |       CAST(POW(2.0D, b) AS BIGINT), 0L)),
      |  0L, (s, x) -> s + x)""".stripMargin

  /** One (document, sub-band) routing row. */
  final case class BandDoc(band: Int, bval: Long, doc_id: Long, h: Long)

  /** A band bucket's index: parallel id/hash lists (product-encoder
    * friendly). */
  final case class BandIndex(ids: Seq[Long], hs: Seq[Long])

  final case class NearDup(a_id: Long, b_id: Long, hamming: Int)

  /** Compare the batch's arrivals against the bucket index (and each
    * other, in doc_id order — so an intra-batch pair emits exactly once
    * per band), then append them to the index. */
  def nearDupFn(key: (Int, Long), rows: Iterator[BandDoc],
      state: GroupState[BandIndex]): Iterator[NearDup] = {
    val st = state.getOption.getOrElse(BandIndex(Vector.empty, Vector.empty))
    var ids = st.ids.toVector
    var hs = st.hs.toVector
    val out = Vector.newBuilder[NearDup]
    rows.toSeq.sortBy(_.doc_id).foreach { d =>
      var i = 0
      while (i < ids.length) {
        if (ids(i) != d.doc_id) {
          val ham = java.lang.Long.bitCount(hs(i) ^ d.h)
          if (ham <= 2) {
            val (a, b) = if (ids(i) < d.doc_id) (ids(i), d.doc_id)
                         else (d.doc_id, ids(i))
            out += NearDup(a, b, ham)
          }
        }
        i += 1
      }
      ids :+= d.doc_id
      hs :+= d.h
    }
    state.update(BandIndex(ids, hs))
    out.result().iterator
  }

  /** Drain a multi-file document snapshot through the stateful band
    * index (one micro-batch per file) and return (raw emitted pairs,
    * micro-batch count). Pairs can duplicate across shared bands — the
    * caller dedups, exactly like batch t13's candidate union. */
  def runNearDupOnce(spark: SparkSession, sourceDir: String,
      name: String): (DataFrame, Long) =
    EventStream.withStatePartitions(spark) {
      import spark.implicits._
      val src = spark.readStream.schema(docSchema).format("parquet")
        .option("path", sourceDir).option("maxFilesPerTrigger", "1").load()
      val banded = src
        .filter(length(trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " "))) >= 1) // t04's domain
        .select(col("doc_id"), expr(Simhash16Sql).as("h"))
        .select(col("doc_id"), col("h"), explode(array(
          struct(lit(0).as("band"), (col("h") % 32).as("bval")),
          struct(lit(1).as("band"), (floor(col("h") / 32).cast("long") % 32).as("bval")),
          struct(lit(2).as("band"), floor(col("h") / 1024).cast("long").as("bval"))))
          .as("bk"))
        .select(col("bk.band").as("band"), col("bk.bval").as("bval"),
          col("doc_id"), col("h"))
        .as[BandDoc]
      val q = banded.groupByKey(bd => (bd.band, bd.bval))
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(nearDupFn)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      (spark.table(name), q.recentProgress.map(_.batchId).distinct.length.toLong)
    }
}
