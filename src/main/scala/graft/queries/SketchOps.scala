package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Mergeable-sketch operators — the approximate-answer surface a 100 TB
  * deployment leans on when exact global state is too big to hold:
  * KMV/theta distinct sketches, a count-min frequency sketch, hash-gated
  * Bernoulli sampling with scale-up estimates, and fixed-bin histogram
  * quantiles.
  *
  * Why these four shapes: every one is a MERGEABLE partial aggregate —
  * sketch(A ∪ B) is computable from sketch(A) and sketch(B) — which is
  * the property that makes an estimator usable on a cluster at all
  * (map-side partials combine associatively; no pass over global state).
  * The reference pipeline re-counts its tables exactly after every load
  * (run_engine.py:173-176 row-count audit); these are the estimators
  * that replace such exact audits when the table is 10^12 rows.
  *
  * Portability contract (same as TextOps): all hashing derives from md5
  * hex prefixes, never engine-native hash functions; estimator math is
  * integer or single-expression IEEE double, so DuckDB reproduces every
  * estimate bit-for-bit. No approx_count_distinct / approx_percentile —
  * engine-native sketches differ across engines and would be untestable;
  * these deterministic twins grade the same accuracy/size trade-off with
  * a portable answer.
  *
  * Scale design: sketch builds are keyed partial aggregations (map-side
  * combine does the heavy fold); per-group K-smallest goes through the
  * salted two-level tournament (v17's shape), never one global window;
  * finished sketches are structurally bounded (K rows/group, d×w cells)
  * and only then broadcast.
  */
object SketchOps {

  /** Portable 60-bit value hash, keyed by a per-operator salt so sketch
    * hash-space and bucket assignments are independent across operators. */
  private def h60(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(":" + salt))), 1, 15), 16, 10).cast("long")

  private def h60Duck(e: String, salt: String): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR) || ':$salt'), 1, 15))::BIGINT"

  private def h32(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(":" + salt))), 1, 8), 16, 10).cast("long")

  private def h32Duck(e: String, salt: String): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR) || ':$salt'), 1, 8))::BIGINT"

  // --- KMV distinct sketch ---------------------------------------------

  /** Sketch size: K smallest hashes kept per group. 64 gives ~1/√62 ≈
    * 13% worst-case relative error — the classic size/accuracy dial. */
  private[queries] val KmvK = 64

  /** 2^60 as an exactly-representable double (6 mantissa bits used);
    * the KMV estimator runs in IEEE double on both engines with the
    * same expression shape, so results are bit-identical. */
  private val Pow60 = 1152921504606846976.0

  /** (group, hv) → the K smallest distinct hashes per group, tagged with
    * rank. Salted two-level tournament (v17's pattern): level 1 ranks
    * within (group, salt) — 32 window partitions per group, each 1/32 of
    * the group — level 2 ranks the ≤ 32·K survivors. A K-smallest value
    * is K-smallest in its salt cell, so no survivor is lost; no window
    * ever sees a whole 100 TB group. */
  private def kSmallest(hashes: DataFrame, group: String, k: Int): DataFrame = {
    val l1 = Window.partitionBy(col(group), col("salt")).orderBy(col("hv").asc)
    val l2 = Window.partitionBy(col(group)).orderBy(col("hv").asc)
    hashes
      .withColumn("salt", pmod(col("hv"), lit(32)))
      .withColumn("srk", row_number().over(l1)).filter(col("srk") <= k)
      .withColumn("rk", row_number().over(l2)).filter(col("rk") <= k)
      .select(col(group), col("hv"), col("rk"))
  }

  /** KMV distinct-count estimate of customers per order priority, graded
    * against the exact distinct count. If a group holds fewer than K
    * distinct hashes the sketch IS the distinct set (exact); otherwise
    * est = (K−1) · 2^60 / kth_smallest. err_permille is the realized
    * error — the accuracy/size trade-off as an oracle-checked number. */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    // distinct BEFORE hashing ranks: KMV is defined over the distinct
    // value set; the dedup is one keyed shuffle with map-side combine
    val hv = o.select(col("o_orderpriority").as("grp"),
        h60(col("o_custkey"), "kmv").as("hv")).distinct()
    val kth = kSmallest(hv, "grp", KmvK)
      .groupBy("grp").agg(max("hv").as("kth"), count(lit(1)).as("n_kept"))
    val exact = o.groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct("o_custkey").as("n_exact"))
    // both frames are |priorities| rows — metadata-scale join
    exact.join(kth, "grp")
      .withColumn("kmv_est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(floor(lit((KmvK - 1).toDouble) * lit(Pow60) / col("kth").cast("double")).cast("long")))
      .withColumn("err_permille",
        floor(abs(col("kmv_est") - col("n_exact")) * lit(1000) / col("n_exact")).cast("long"))
      .select("grp", "n_exact", "kmv_est", "err_permille")
      .orderBy("grp")
  }

  private val KmvDistinctDuck: String =
    s"""WITH hv AS (SELECT DISTINCT o_orderpriority AS grp,
       |    ${h60Duck("o_custkey", "kmv")} AS hv FROM orders),
       |rk AS (SELECT grp, hv,
       |    row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk FROM hv),
       |kth AS (SELECT grp, MAX(hv) AS kth, COUNT(*) AS n_kept
       |        FROM rk WHERE rk <= $KmvK GROUP BY grp),
       |exact AS (SELECT o_orderpriority AS grp,
       |    COUNT(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1)
       |SELECT e.grp, e.n_exact,
       |  CASE WHEN k.n_kept < $KmvK THEN k.n_kept
       |       ELSE CAST(FLOOR(${(KmvK - 1).toDouble} * $Pow60 / CAST(k.kth AS DOUBLE)) AS BIGINT)
       |  END AS kmv_est,
       |  CAST(FLOOR(ABS(CASE WHEN k.n_kept < $KmvK THEN k.n_kept
       |       ELSE CAST(FLOOR(${(KmvK - 1).toDouble} * $Pow60 / CAST(k.kth AS DOUBLE)) AS BIGINT)
       |  END - e.n_exact) * 1000 / e.n_exact) AS BIGINT) AS err_permille
       |FROM exact e JOIN kth k ON k.grp = e.grp
       |ORDER BY e.grp""".stripMargin

  // --- theta-sketch set operations --------------------------------------

  /** Theta-sketch intersection: estimate |urgent ∩ low| customer overlap
    * from the two groups' KMV sketches alone — the deployment answer to
    * "how much do these two 10^10-key sets overlap" without ever joining
    * them. θ = the smaller union kth (the union sketch's threshold);
    * among union-sketch hashes below θ, the in-both fraction scales the
    * union estimate. Exact overlap and realized error are graded beside
    * it, like k01. */
  def kmvSetOps(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val hv = o.filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("grp"),
        col("o_custkey"), h60(col("o_custkey"), "kmv").as("hv"))
      .distinct()
    // per-side sketches: the ONLY data-scale pass; everything after runs
    // on ≤ 2K sketch rows
    val sk = kSmallest(hv.select("grp", "hv"), "grp", KmvK).localCheckpoint()
    val kths = sk.groupBy("grp").agg(max("hv").as("kth"), count(lit(1)).as("n"))
    // θ = min of the two thresholds; a hash is "in the union sketch" if
    // below θ and in either side's sketch. 1-row frame → crossJoin it.
    val theta = kths.agg(min("kth").as("theta"))
    val union = sk.crossJoin(broadcast(theta)).filter(col("hv") < col("theta"))
      .groupBy("hv")
      .agg(countDistinct("grp").as("sides"), first("theta").as("th"))
    val est = union.agg(
      count(lit(1)).as("n_union"),
      sum(when(col("sides") === 2, 1L).otherwise(0L)).as("n_both"),
      first(col("th")).as("theta"))
    val exact = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct()
      .join(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey").distinct(),
        "o_custkey")
      .agg(count(lit(1)).as("n_exact_inter"))
    // union estimate from θ (KMV on the merged sketch), intersection =
    // union_est × in-both fraction; all double math single-expression
    est.crossJoin(exact)
      .withColumn("union_est",
        floor(col("n_union").cast("double") * lit(Pow60) / col("theta").cast("double")).cast("long"))
      .withColumn("inter_est",
        floor(col("n_both").cast("double") * lit(Pow60) / col("theta").cast("double")).cast("long"))
      .select(col("n_union"), col("n_both"), col("n_exact_inter"),
        col("union_est"), col("inter_est"))
  }

  private val KmvSetOpsDuck: String =
    s"""WITH hv AS (SELECT DISTINCT o_orderpriority AS grp,
       |    ${h60Duck("o_custkey", "kmv")} AS hv FROM orders
       |    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
       |rk AS (SELECT grp, hv,
       |    row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk FROM hv),
       |sk AS (SELECT grp, hv FROM rk WHERE rk <= $KmvK),
       |kths AS (SELECT grp, MAX(hv) AS kth FROM sk GROUP BY grp),
       |theta AS (SELECT MIN(kth) AS theta FROM kths),
       |un AS (SELECT s.hv, COUNT(DISTINCT s.grp) AS sides
       |       FROM sk s, theta t WHERE s.hv < t.theta GROUP BY s.hv),
       |est AS (SELECT COUNT(*) AS n_union,
       |    CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both FROM un),
       |ex AS (SELECT COUNT(*) AS n_exact_inter FROM
       |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       |  NATURAL JOIN
       |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'))
       |SELECT e.n_union, e.n_both, x.n_exact_inter,
       |  CAST(FLOOR(CAST(e.n_union AS DOUBLE) * $Pow60 / CAST(t.theta AS DOUBLE)) AS BIGINT) AS union_est,
       |  CAST(FLOOR(CAST(e.n_both AS DOUBLE) * $Pow60 / CAST(t.theta AS DOUBLE)) AS BIGINT) AS inter_est
       |FROM est e, ex x, theta t""".stripMargin

  // --- count-min sketch --------------------------------------------------

  private[queries] val CmsDepth = 4
  private[queries] val CmsWidth = 512

  /** Count-min frequency sketch over per-user event counts: d=4 hash
    * rows × w=512 buckets = 2048 counters regardless of user cardinality.
    * Graded: the sketch's estimate for the top-10 heaviest users beside
    * their exact counts — over_est ≥ 0 always (CMS never undercounts),
    * and the magnitude of the collision error is the oracle-checked
    * number. Build = one keyed aggregation with map-side combine (the
    * d× row explosion happens on already-aggregated |users| rows, not
    * raw events). The finished 2048-row sketch broadcasts. */
  def cmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val cnt = events(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds both the sketch build and the top-10
    val sketch = cnt
      .select(col("user_id"), col("cnt"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .withColumn("bucket",
        pmod(h32(concat(col("j"), lit("_"), col("user_id")), "cms"), lit(CmsWidth)))
      .groupBy("j", "bucket").agg(sum("cnt").as("bsum"))
    val top = cnt.orderBy(col("cnt").desc, col("user_id").asc).limit(10)
    top
      .select(col("user_id"), col("cnt").as("exact_cnt"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .withColumn("bucket",
        pmod(h32(concat(col("j"), lit("_"), col("user_id")), "cms"), lit(CmsWidth)))
      // the sketch is structurally d×w rows — broadcast is always safe
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("user_id", "exact_cnt").agg(min("bsum").as("cms_est"))
      .withColumn("over_est", (col("cms_est") - col("exact_cnt")).cast("long"))
      .select("user_id", "exact_cnt", "cms_est", "over_est")
      .orderBy(col("exact_cnt").desc, col("user_id").asc)
  }

  private val CmsHeavyHittersDuck: String =
    s"""WITH cnt AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
       |ex AS (SELECT user_id, cnt, CAST(unnest(generate_series(0, ${CmsDepth - 1})) AS BIGINT) AS j FROM cnt),
       |bk AS (SELECT user_id, cnt, j,
       |    ${h32Duck("j || '_' || user_id", "cms")} % $CmsWidth AS bucket FROM ex),
       |sketch AS (SELECT j, bucket, SUM(cnt) AS bsum FROM bk GROUP BY j, bucket),
       |top AS (SELECT user_id, cnt AS exact_cnt FROM cnt
       |        ORDER BY cnt DESC, user_id ASC LIMIT 10),
       |tb AS (SELECT t.user_id, t.exact_cnt, x.j,
       |    ${h32Duck("x.j || '_' || t.user_id", "cms")} % $CmsWidth AS bucket
       |  FROM top t, (SELECT CAST(unnest(generate_series(0, ${CmsDepth - 1})) AS BIGINT) AS j) x)
       |SELECT tb.user_id, tb.exact_cnt, CAST(MIN(sk.bsum) AS BIGINT) AS cms_est,
       |  CAST(MIN(sk.bsum) - tb.exact_cnt AS BIGINT) AS over_est
       |FROM tb JOIN sketch sk ON sk.j = tb.j AND sk.bucket = tb.bucket
       |GROUP BY tb.user_id, tb.exact_cnt
       |ORDER BY tb.exact_cnt DESC, tb.user_id ASC""".stripMargin

  // --- hash-gated Bernoulli sampling -------------------------------------

  private[queries] val SampleMod = 16

  /** Deterministic 1/16 Bernoulli sample of orders by key hash, with
    * scaled count/revenue estimates graded beside the exact values.
    * The gate is a pure function of the row key, so (a) it pushes to the
    * scan as an ordinary filter — the sample never materializes the
    * population — and (b) every engine and every run draws the SAME
    * sample (rerunnable estimates; the reference's TOP-1000 caps
    * (run_engine.py:117) are the same idea without the statistics).
    * Revenue stays in Dec(18,2) until the end — the sum is exact, so
    * the ×16 scale-up is too. */
  def hashSampleEstimate(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val smp = o.filter(pmod(h32(col("o_orderkey"), "smp"), lit(SampleMod)) === 0)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n_sample"), sum(dec("o_totalprice")).as("rev_sample"))
    val exact = o.groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n_exact"), sum(dec("o_totalprice")).as("rev_exact"))
    exact.join(smp, "grp") // |priorities| rows each side
      .withColumn("n_est", (col("n_sample") * SampleMod).cast("long"))
      .withColumn("rev_est", asDbl(col("rev_sample") * SampleMod))
      .withColumn("cnt_err_permille",
        floor(abs(col("n_est") - col("n_exact")) * lit(1000) / col("n_exact")).cast("long"))
      .select(col("grp"), col("n_exact"), col("n_sample"), col("n_est"),
        asDbl(col("rev_exact")).as("rev_exact"), col("rev_est"), col("cnt_err_permille"))
      .orderBy("grp")
  }

  private val HashSampleDuck: String =
    s"""WITH smp AS (SELECT o_orderpriority AS grp, COUNT(*) AS n_sample,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_sample
       |  FROM orders WHERE ${h32Duck("o_orderkey", "smp")} % $SampleMod = 0
       |  GROUP BY 1),
       |exact AS (SELECT o_orderpriority AS grp, COUNT(*) AS n_exact,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_exact
       |  FROM orders GROUP BY 1)
       |SELECT e.grp, e.n_exact, s.n_sample,
       |  CAST(s.n_sample * $SampleMod AS BIGINT) AS n_est,
       |  CAST(e.rev_exact AS DOUBLE) AS rev_exact,
       |  CAST(s.rev_sample * $SampleMod AS DOUBLE) AS rev_est,
       |  CAST(FLOOR(ABS(s.n_sample * $SampleMod - e.n_exact) * 1000 / e.n_exact) AS BIGINT) AS cnt_err_permille
       |FROM exact e JOIN smp s ON s.grp = e.grp
       |ORDER BY e.grp""".stripMargin

  // --- fixed-bin histogram quantiles -------------------------------------

  private[queries] val QBinWidth = 10000.0

  /** Approximate p50/p90/p99 of order value per priority from a fixed
    * $10k-bin histogram — the constant-memory quantile shape (a KLL/
    * t-digest stand-in with deterministic, portable semantics). The
    * data-scale pass is ONE keyed histogram aggregation (≤ 50 bins/
    * group); the cumulative window runs over the bins, never the rows —
    * e16's "no global NTILE" rule. Approximate answers are bin upper
    * edges: error ≤ bin width by construction, graded against the
    * per-group exact spread (min/max) for context. */
  def histogramQuantiles(s: SparkSession, d: String): DataFrame = {
    val hist = orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice") / QBinWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("bmin"), max("o_totalprice").as("bmax"))
    val byBin = Window.partitionBy("grp").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cumn", sum("n").over(byBin))
      .withColumn("total", sum("n").over(Window.partitionBy("grp")))
    def qEdge(q: Double, name: String) =
      min(when(col("cumn") >= ceil(col("total") * q), (col("bin") + 1) * QBinWidth)).as(name)
    cum.groupBy("grp")
      .agg(first("total", ignoreNulls = true).as("n_rows") /* same for all bins */,
        qEdge(0.50, "p50_edge"), qEdge(0.90, "p90_edge"), qEdge(0.99, "p99_edge"),
        min("bmin").as("v_min"), max("bmax").as("v_max"))
      .select("grp", "n_rows", "p50_edge", "p90_edge", "p99_edge", "v_min", "v_max")
      .orderBy("grp")
  }

  private val HistogramQuantilesDuck: String =
    s"""WITH hist AS (SELECT o_orderpriority AS grp,
       |    CAST(FLOOR(o_totalprice / $QBinWidth) AS BIGINT) AS bin,
       |    COUNT(*) AS n, MIN(o_totalprice) AS bmin, MAX(o_totalprice) AS bmax
       |  FROM orders GROUP BY 1, 2),
       |cum AS (SELECT grp, bin, n, bmin, bmax,
       |    SUM(n) OVER (PARTITION BY grp ORDER BY bin
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
       |    SUM(n) OVER (PARTITION BY grp) AS total
       |  FROM hist)
       |SELECT grp, CAST(MIN(total) AS BIGINT) AS n_rows,
       |  MIN(CASE WHEN cumn >= CEIL(total * 0.50) THEN CAST((bin + 1) * $QBinWidth AS DOUBLE) END) AS p50_edge,
       |  MIN(CASE WHEN cumn >= CEIL(total * 0.90) THEN CAST((bin + 1) * $QBinWidth AS DOUBLE) END) AS p90_edge,
       |  MIN(CASE WHEN cumn >= CEIL(total * 0.99) THEN CAST((bin + 1) * $QBinWidth AS DOUBLE) END) AS p99_edge,
       |  MIN(bmin) AS v_min, MAX(bmax) AS v_max
       |FROM cum GROUP BY grp ORDER BY grp""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "k01_kmv_distinct" -> QueryDef(kmvDistinct _, KmvDistinctDuck),
    "k02_cms_heavy_hitters" -> QueryDef(cmsHeavyHitters _, CmsHeavyHittersDuck),
    "k03_hash_sample_estimate" -> QueryDef(hashSampleEstimate _, HashSampleDuck),
    "k04_histogram_quantiles" -> QueryDef(histogramQuantiles _, HistogramQuantilesDuck),
    "k05_kmv_set_ops" -> QueryDef(kmvSetOps _, KmvSetOpsDuck)
  )
}
