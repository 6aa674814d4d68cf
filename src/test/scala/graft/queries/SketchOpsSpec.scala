package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property locks on the k-family sketches (SketchOps). The DuckDB twins
  * grade the VALUES; these tests pin the properties that make each
  * sketch deployable at 100 TB:
  *   - KMV is mergeable: the sketch of a union is computable from the
  *     halves' sketches (this is what lets map-side partials combine).
  *   - CMS never undercounts, for EVERY key, not just the graded top-10.
  *   - The hash-gated sample is a deterministic subset of the population.
  *   - Histogram quantile edges bound the exact quantile within one bin.
  */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("k01: KMV estimate is exact below K and within the 2/sqrt(K) band above it") {
    val rows = SketchOps.kmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(r.fieldIndex("n_exact")), r.getLong(r.fieldIndex("kmv_est")))
      if (exact < SketchOps.KmvK) assert(est == exact, s"below K the sketch IS the set: $r")
      // 2/sqrt(K-2) ≈ 0.254 at K=64: a deterministic fixture draw can sit
      // anywhere inside the band; outside it means estimator math broke
      else assert(math.abs(est - exact).toDouble / exact < 0.30, s"estimate off-band: $r")
    }
  }

  test("k01: KMV sketch merges — union sketch from half sketches equals full sketch") {
    import spark.implicits._
    // 5000 synthetic keys split odd/even; K smallest of (K smallest of
    // each half) must equal K smallest of the full set — the mergeability
    // containment argument executed.
    val ks = (0 until 5000).map(i => ("g", s"key$i")).toDF("grp", "k")
      .select(col("grp"), conv(substring(md5(col("k")), 1, 15), 16, 10).cast("long").as("hv"),
        (length(col("k")) % 2).as("half"))
    def kSmallestNaive(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "hv").distinct()
        .withColumn("rk", row_number().over(Window.partitionBy("grp").orderBy("hv")))
        .filter(col("rk") <= SketchOps.KmvK).select("hv")
    val full = kSmallestNaive(ks).collect().map(_.getLong(0)).toSet
    val merged = kSmallestNaive(
      kSmallestNaive(ks.filter(col("half") === 0)).union(
        kSmallestNaive(ks.filter(col("half") === 1)))
        .select(lit("g").as("grp"), col("hv")))
      .collect().map(_.getLong(0)).toSet
    assert(full == merged, "KMV must be mergeable: sketch(A ∪ B) = merge(sketch(A), sketch(B))")
    assert(full.size == SketchOps.KmvK)
  }

  test("k02: CMS estimate >= exact count for every user (one-sided error)") {
    import spark.implicits._
    val d = sf
    val cnt = graft.tables.Tables.events(spark, d)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val sketch = cnt
      .select(col("user_id"), col("cnt"),
        explode(sequence(lit(0), lit(SketchOps.CmsDepth - 1))).as("j"))
      .withColumn("bucket", pmod(
        conv(substring(md5(concat(col("j"), lit("_"), col("user_id"), lit(":cms"))), 1, 8), 16, 10).cast("long"),
        lit(SketchOps.CmsWidth)))
      .groupBy("j", "bucket").agg(sum("cnt").as("bsum"))
    val under = cnt
      .select(col("user_id"), col("cnt"),
        explode(sequence(lit(0), lit(SketchOps.CmsDepth - 1))).as("j"))
      .withColumn("bucket", pmod(
        conv(substring(md5(concat(col("j"), lit("_"), col("user_id"), lit(":cms"))), 1, 8), 16, 10).cast("long"),
        lit(SketchOps.CmsWidth)))
      .join(sketch, Seq("j", "bucket"))
      .groupBy("user_id", "cnt").agg(min("bsum").as("est"))
      .filter(col("est") < col("cnt")).count()
    assert(under == 0L, "count-min must never undercount")
  }

  test("k03: the hash gate selects a deterministic subset; estimates scale it") {
    val a = SketchOps.hashSampleEstimate(spark, sf).collect()
    val b = SketchOps.hashSampleEstimate(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "hash-gated sampling must be rerunnable bit-for-bit")
    a.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_sample")) <= r.getLong(r.fieldIndex("n_exact")))
      assert(r.getLong(r.fieldIndex("n_est")) ==
        r.getLong(r.fieldIndex("n_sample")) * SketchOps.SampleMod)
    }
  }

  test("k04: each quantile edge bounds the exact quantile within one bin width") {
    val edges = SketchOps.histogramQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("p50_edge")),
        r.getDouble(r.fieldIndex("p90_edge")), r.getDouble(r.fieldIndex("p99_edge")))).toMap
    val exact = graft.tables.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").as("p99"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (e50, e90, e99) = edges(r.getString(0))
      def ok(edge: Double, ex: Double) =
        edge >= ex && edge - SketchOps.QBinWidth <= ex
      assert(ok(e50, r.getDouble(1)) && ok(e90, r.getDouble(2)) && ok(e99, r.getDouble(3)),
        s"edge must sit within one bin above the exact quantile: $r vs ${edges(r.getString(0))}")
    }
  }

  test("k06: bitmap window distinct equals naive countDistinct per window") {
    import spark.implicits._
    val bm = SketchOps.bitmapWindowDistinct(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = graft.tables.Tables.events(spark, sf).select(
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("di"),
      col("user_id"))
    val naive = e.select(col("di"), col("user_id"),
        explode(sequence(lit(0L), lit(6L))).as("o"))
      .select((col("di") + col("o")).as("wd"), col("user_id"))
      .groupBy("wd").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bm == naive, "popcount-of-ORed-bitmaps must equal exact distinct")
  }

  test("k06/s19: the bitmap aggregation is idempotent — a doubled input changes nothing") {
    // the property s19's at-least-once claim rests on, executed as batch:
    // OR-ing every event twice must produce the identical word frame
    val ev = graft.tables.Tables.events(spark, sf).select("ts", "user_id")
    val once = SketchOps.popcountDistinct(SketchOps.bitmapWords(ev)).collect()
    val twice = SketchOps.popcountDistinct(SketchOps.bitmapWords(ev.unionAll(ev))).collect()
    assert(once.toSeq == twice.toSeq, "redelivery must be invisible to an idempotent aggregate")
  }

  test("k07: AMS output is self-consistent (err derives from est/exact; both graded)") {
    val rows = SketchOps.amsF2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f2, est, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= 0 && f2 > 0)
      assert(err == math.floor(math.abs(est - f2).toDouble * 1000 / f2).toLong,
        s"err column must derive from est/exact: $r")
    }
  }

  test("k09: the window sketch from daily sketches equals the window sketch from raw hashes") {
    import spark.implicits._
    // time-windowed mergeability, executed: K-smallest of (union of
    // daily K-smallest) ≡ K-smallest of the window's full distinct set
    val rows = (0 until 2000).map(i => ((i % 10).toLong, s"u$i"))
    val hv = rows.toDF("di", "u")
      .select(col("di"), conv(substring(md5(col("u")), 1, 15), 16, 10).cast("long").as("hv"))
      .distinct()
    def kS(df: org.apache.spark.sql.DataFrame, grp: String) =
      df.withColumn("rk", row_number().over(
        Window.partitionBy(grp).orderBy("hv"))).filter(col("rk") <= SketchOps.KmvK)
        .select(col(grp), col("hv"))
    val fromDaily = kS(
      kS(hv, "di").select(col("di"), col("hv"),
          explode(sequence(lit(0L), lit(6L))).as("o"))
        .select((col("di") + col("o")).as("wd"), col("hv")).distinct(), "wd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromRaw = kS(
      hv.select(col("di"), col("hv"), explode(sequence(lit(0L), lit(6L))).as("o"))
        .select((col("di") + col("o")).as("wd"), col("hv")).distinct(), "wd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDaily == fromRaw,
      "merging daily sketches must lose nothing a full rescan would keep")
  }

  test("k05: theta-sketch intersection estimate lands within band of the exact overlap") {
    val r = SketchOps.kmvSetOps(spark, sf).collect().head
    val exact = r.getLong(r.fieldIndex("n_exact_inter"))
    val est = r.getLong(r.fieldIndex("inter_est"))
    assert(r.getLong(r.fieldIndex("n_both")) <= r.getLong(r.fieldIndex("n_union")))
    // intersection error compounds two KMV estimates; 40% band at K=64
    // catches broken math while tolerating the fixture's draw
    assert(exact == 0 || math.abs(est - exact).toDouble / math.max(exact, 1L) < 0.40,
      s"intersection estimate off-band: est=$est exact=$exact")
  }

  test("k10/s24: HLL registers are idempotent — a doubled input changes nothing") {
    // the s19 rule extended to approximate state: element-wise MAX
    // absorbs at-least-once redelivery, so the doubled replay's sketch
    // must equal the exactly-once sketch register for register
    val ev = graft.tables.Tables.events(spark, sf)
    def regs(df: org.apache.spark.sql.DataFrame) =
      SketchOps.hllRho(df).groupBy("grp", "idx")
        .agg(max("rho").as("reg")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(regs(ev.unionAll(ev)) == regs(ev))
  }

  test("k11: FPR and fill factor fall strictly as the filter grows; bit census is sane") {
    val rows = SketchOps.bloomFprCurve(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(1024L, 4096L, 16384L))
    rows.foreach { case (m, nKeys, bits, fill, _) =>
      assert(bits <= math.min(m, 3 * nKeys), s"more bits set than hashes inserted at m=$m")
      assert(fill == bits * 1000 / m)
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._5 > hi._5, s"FPR must fall as m grows: $lo vs $hi")
      assert(lo._4 > hi._4, s"fill factor must fall as m grows: $lo vs $hi")
    }
  }
}
