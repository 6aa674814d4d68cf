package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence lock on t56's two-phase source cap: on an adversarial
  * corpus — one MEGA-source holding 600 docs (every salt slice of the
  * tournament over-full) with heavy n_chars ties, one source under the
  * cap, one exactly at it — the count-prefilter + salted-tournament
  * implementation must emit EXACTLY the ledger the naive one-window-
  * over-everything formulation emits. This is the spec the scaladoc's
  * 100 TB claim rides on: the mega-source is the planted skew case that
  * a per-source row_number would funnel through one task.
  */
class SourceCapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("two-phase tournament cap ≡ naive per-source window on a planted mega-source") {
    import spark.implicits._
    // mega: 600 docs, n_chars quantized to 7 distinct values (ties broken
    // by doc_id); small: 3 docs (< cap); exact: exactly SourceCap docs.
    val rows =
      (0 until 600).map(i => (i.toLong, "mega", ((i % 7) * 100 + 50).toLong)) ++
      (600 until 603).map(i => (i.toLong, "small", (i * 10).toLong)) ++
      (603 until (603 + TextOps.SourceCap)).map(i => (i.toLong, "exact", 42L))
    val docs = rows.toDF("doc_id", "source", "n_chars")

    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val naive = docs.withColumn("rk", row_number().over(w))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= TextOps.SourceCap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > TextOps.SourceCap, 1L).otherwise(0L)).as("n_dropped"),
        sum("n_chars").as("chars_total"),
        sum(when(col("rk") <= TextOps.SourceCap, col("n_chars")).otherwise(lit(0L))).as("chars_kept"),
        min(when(col("rk") <= TextOps.SourceCap, col("n_chars"))).as("cutoff_chars"))
      .orderBy("source")
    val twoPhase = TextOps.sourceCapsOn(docs)

    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val n = rowSet(naive)
    val t = rowSet(twoPhase)
    assert(n == t, s"tournament ledger must equal the naive window's:\nnaive-only=${n.diff(t)}\ntourn-only=${t.diff(n)}")
    // sanity on the fixture: under-cap keeps all; mega drops 600 - cap
    assert(t.exists(r => r._1 == "small" && r._3 == 3L && r._4 == 0L))
    assert(t.exists(r => r._1 == "exact" && r._3 == TextOps.SourceCap.toLong && r._4 == 0L))
    assert(t.exists(r => r._1 == "mega" && r._3 == TextOps.SourceCap.toLong &&
      r._4 == (600L - TextOps.SourceCap)))
  }
}
