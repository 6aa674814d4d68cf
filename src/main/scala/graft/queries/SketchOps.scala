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
  private[queries] def h60(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(":" + salt))), 1, 15), 16, 10).cast("long")

  private[queries] def h60Duck(e: String, salt: String): String =
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

  /** THE salted two-level tournament — the ONE body behind every
    * per-key top/bottom-cap in the engine (t56's source caps, p06's
    * hub-adjacency caps, the KMV kSmallest below; a second copy could
    * silently drift from the containment proof all of them cite):
    * level 1 ranks inside (keys, saltOn % SaltSlices) so a hot key becomes SaltSlices
    * bounded slices; only the ≤ 32·cap level-1 survivors reach the
    * level-2 per-key window. Exact under any TOTAL `order`
    * (CellSampleSpec's containment argument: a global top-cap row
    * ranks ≤ cap inside its own salt slice). Returns the ≤ cap rows
    * per key with their final rank in `__rk`. */
  /** Level-1 slice count of the tournament. Named so re-tuning is one
    * edit — but deliberately NOT part of any persisted artifact's key:
    * by the containment proof above, the tournament's OUTPUT is exact
    * under any total order for any slice count, so the capped_adj
    * artifact folds in only CapA (which does change the cut) and a
    * slice re-tune never forces a spurious artifact rebuild. */
  private[queries] val SaltSlices = 32
  private[queries] def saltedRank(df: DataFrame, keys: Seq[Column],
      saltOn: Column, order: Seq[Column], cap: Int): DataFrame = {
    val l1 = Window.partitionBy(keys :+ col("__salt"): _*).orderBy(order: _*)
    val l2 = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__salt", pmod(saltOn, lit(SaltSlices)))
      .withColumn("__srk", row_number().over(l1)).filter(col("__srk") <= cap)
      .withColumn("__rk", row_number().over(l2)).filter(col("__rk") <= cap)
      .drop("__salt", "__srk")
  }

  /** Rank-free view of [[saltedRank]] — the t56/p06 cap shape. */
  private[queries] def saltedCap(df: DataFrame, keys: Seq[Column],
      saltOn: Column, order: Seq[Column], cap: Int): DataFrame =
    saltedRank(df, keys, saltOn, order, cap).drop("__rk")

  /** (group, hv) → the K smallest distinct hashes per group, tagged with
    * rank — [[saltedRank]] under the KMV ordering (hv ascending, hv as
    * its own salt). No window ever sees a whole 100 TB group. */
  private def kSmallest(hashes: DataFrame, group: String, k: Int): DataFrame =
    saltedRank(hashes, Seq(col(group)), col("hv"), Seq(col("hv").asc), k)
      .select(col(group), col("hv"), col("__rk").as("rk"))

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
  def histogramQuantiles(s: SparkSession, d: String): DataFrame =
    histQuantileRead(ordersHist(orders(s, d)))

  /** The k04 histogram-build as a reusable body: orders rows →
    * per-(priority, bin) (n, bmin, bmax). Every column is MERGEABLE
    * (count/min/max), which is the whole point: the streaming twin
    * (s28) maintains exactly this aggregate as Complete-mode state and
    * must land on the batch histogram — one body, no drift. */
  private[queries] def ordersHist(o: DataFrame): DataFrame =
    o.groupBy(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice") / QBinWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("bmin"), max("o_totalprice").as("bmax"))

  /** The k04 read-side quantile derivation over a (grp, bin, n, bmin,
    * bmax) histogram — |bins| rows, never the raw data. Shared by the
    * streaming twin so the serve path is literally the same code. */
  private[queries] def histQuantileRead(hist: DataFrame): DataFrame = {
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

  private[queries] val HistogramQuantilesDuck: String =
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

  // --- bitmap sliding-window distinct ------------------------------------

  /** k06 — distinct users per trailing 7-day window via BITMAP words:
    * each user sets one bit in word (user div 32 — 32-bit words: a shift of 63 overflows SIGNED int64 in strict engines, 31 never does); daily bitmaps OR
    * into window bitmaps (OR is idempotent + mergeable — no pre-dedup,
    * map-side combine does the fold); distinct = Σ popcount(word).
    * This is the roaring-bitmap warehouse pattern that replaces
    * COUNT(DISTINCT) over sliding windows: state per window is
    * |user-space|/32 words (10^9 users → 32M words, keyed, mergeable),
    * and windows build from day partials — never a rescan. The sliding
    * window itself is e13's fixed 7× fan-out restatement, not a global
    * range window. */
  /** The k06 bitmap-word aggregation as a reusable body: (ts, user_id)
    * rows → (wd, word, bits). Shared verbatim by the streaming twin
    * (s19), whose at-least-once duplicate absorption rests on THIS
    * aggregation being idempotent — one body, no drift. */
  private[queries] def bitmapWords(ev: DataFrame): DataFrame =
    ev.select(
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("di"),
        col("user_id"))
      .select(col("di"), col("user_id"),
        explode(sequence(lit(0L), lit(6L))).as("o"))
      .select((col("di") + col("o")).as("wd"), col("user_id"))
      .groupBy(col("wd"), expr("user_id div 32").as("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(user_id % 32 as int)))").as("bits"))

  /** Popcount roll-up of a bitmap-word frame — the second shared half. */
  private[queries] def popcountDistinct(bm: DataFrame): DataFrame =
    bm.groupBy("wd")
      .agg(sum(bit_count(col("bits"))).cast("long").as("n_distinct"))
      .orderBy("wd")

  def bitmapWindowDistinct(s: SparkSession, d: String): DataFrame =
    popcountDistinct(bitmapWords(events(s, d)))

  private val BitmapWindowDuck: String =
    """WITH d AS (SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
      |    user_id FROM events),
      |fan AS (SELECT di + CAST(unnest(generate_series(0, 6)) AS BIGINT) AS wd,
      |    user_id FROM d),
      |bm AS (SELECT wd, user_id // 32 AS word,
      |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
      |  FROM fan GROUP BY wd, word)
      |SELECT wd, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct
      |FROM bm GROUP BY wd ORDER BY wd""".stripMargin

  /** k09 — sliding-window distinct from DAILY SKETCHES alone: each day
    * folds to its K-smallest user-hash sketch once; a trailing 7-day
    * window then merges seven sketches (K smallest of ≤ 7K candidate
    * rows) and estimates — the window NEVER rescans raw events. This is
    * the time-windowed form of k01's mergeability and the sketch-path
    * complement to k06: at 10^9 users even bitmap words are heavy, and
    * the KMV window costs K rows per day forever. Exact distinct is
    * graded beside it (err_permille), like every estimator here.
    *
    * Scale: the raw pass is one keyed (day, hash) dedup; daily
    * K-smallest via the salted tournament; window merges rank ≤ 7K rows
    * per window — bounded by construction, not by data. */
  def kmvWindowDistinct(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("di"),
      col("user_id"))
    val hv = e.select(col("di"), h60(col("user_id"), "kmvw").as("hv")).distinct()
      .localCheckpoint() // feeds the daily sketches AND the exact counts
    val daily = kSmallest(hv.withColumnRenamed("di", "grp"), "grp", KmvK)
      .select(col("grp").as("di"), col("hv"))
    // window merge: K smallest of the union of the 7 daily sketches —
    // the fan-out touches only sketch rows (≤ 7K per window)
    val win = daily
      .select(col("di"), col("hv"), explode(sequence(lit(0L), lit(6L))).as("o"))
      .select((col("di") + col("o")).as("wd"), col("hv"))
      .distinct() // a hash present in several days merges once
      .withColumn("rk", row_number().over(
        Window.partitionBy("wd").orderBy(col("hv").asc)))
      .filter(col("rk") <= KmvK)
      .groupBy("wd").agg(max("hv").as("kth"), count(lit(1)).as("n_kept"))
    val exact = hv
      .select(col("di"), col("hv"), explode(sequence(lit(0L), lit(6L))).as("o"))
      .select((col("di") + col("o")).as("wd"), col("hv"))
      .groupBy("wd").agg(countDistinct("hv").as("n_exact"))
    exact.join(win, "wd") // |windows| rows each side
      .withColumn("kmv_est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(floor(lit((KmvK - 1).toDouble) * lit(Pow60) / col("kth").cast("double")).cast("long")))
      .withColumn("err_permille",
        floor(abs(col("kmv_est") - col("n_exact")) * lit(1000) / col("n_exact")).cast("long"))
      .select("wd", "n_exact", "kmv_est", "err_permille")
      .orderBy("wd")
  }

  private val KmvWindowDuck: String =
    s"""WITH hv AS (SELECT DISTINCT
       |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
       |    ${h60Duck("user_id", "kmvw")} AS hv FROM events),
       |dr AS (SELECT di, hv,
       |    row_number() OVER (PARTITION BY di ORDER BY hv) AS rk FROM hv),
       |daily AS (SELECT di, hv FROM dr WHERE rk <= $KmvK),
       |fan AS (SELECT DISTINCT
       |    di + CAST(unnest(generate_series(0, 6)) AS BIGINT) AS wd, hv FROM daily),
       |wr AS (SELECT wd, hv,
       |    row_number() OVER (PARTITION BY wd ORDER BY hv) AS rk FROM fan),
       |win AS (SELECT wd, MAX(hv) AS kth, COUNT(*) AS n_kept
       |        FROM wr WHERE rk <= $KmvK GROUP BY wd),
       |ex AS (SELECT wd, COUNT(DISTINCT hv) AS n_exact FROM (
       |    SELECT di + CAST(unnest(generate_series(0, 6)) AS BIGINT) AS wd, hv
       |    FROM hv) f GROUP BY wd)
       |SELECT e.wd, e.n_exact,
       |  CASE WHEN w.n_kept < $KmvK THEN w.n_kept
       |       ELSE CAST(FLOOR(${(KmvK - 1).toDouble} * $Pow60 / CAST(w.kth AS DOUBLE)) AS BIGINT)
       |  END AS kmv_est,
       |  CAST(FLOOR(ABS(CASE WHEN w.n_kept < $KmvK THEN w.n_kept
       |       ELSE CAST(FLOOR(${(KmvK - 1).toDouble} * $Pow60 / CAST(w.kth AS DOUBLE)) AS BIGINT)
       |  END - e.n_exact) * 1000 / e.n_exact) AS BIGINT) AS err_permille
       |FROM ex e JOIN win w ON w.wd = e.wd
       |ORDER BY e.wd""".stripMargin

  // --- AMS second-moment sketch ------------------------------------------

  private[queries] val AmsD = 5

  /** k07 — AMS (tug-of-war) F2 sketch per event type: F2 = Σ c_u² is the
    * self-join size / skew statistic; the sketch estimates it from d=5
    * signed sums S_j = Σ sign_j(u)·c_u, est = median(S_j²) — one keyed
    * pass over per-user counts, d fixed rows of state per group, vs the
    * exact Σc² which needs every per-user count. Signs derive from md5
    * parity, the median of 5 integers is an exact sort-and-pick — both
    * engines reproduce the ESTIMATE bit-for-bit (E[S²] = F2; single-
    * sketch spread is ±√2·F2, so the realized err_permille is graded as
    * data, not asserted small). */
  def amsF2(s: SparkSession, d: String): DataFrame = {
    val cnt = events(s, d).groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the exact F2 and the d sketch rows
    val est = cnt
      .select(col("event_type"), col("cnt"), col("user_id"),
        explode(sequence(lit(0), lit(AmsD - 1))).as("j"))
      .withColumn("sign",
        lit(1L) - lit(2L) * pmod(h32(concat(col("j"), lit("_"), col("user_id")), "ams"), lit(2)))
      .groupBy("event_type", "j").agg(sum(col("sign") * col("cnt")).as("sj"))
      .withColumn("estj", col("sj") * col("sj"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("estj").asc, col("j").asc)))
      .filter(col("rk") === (AmsD + 1) / 2) // median of 5 = 3rd smallest
      .select(col("event_type"), col("estj").as("ams_est"))
    val exact = cnt.groupBy("event_type")
      .agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
    exact.join(est, "event_type") // |types| rows each side
      .withColumn("err_permille",
        floor(abs(col("ams_est") - col("f2_exact")) * lit(1000) / col("f2_exact")).cast("long"))
      .select("event_type", "f2_exact", "ams_est", "err_permille")
      .orderBy("event_type")
  }

  private val AmsF2Duck: String =
    s"""WITH cnt AS (SELECT event_type, user_id, COUNT(*) AS cnt
       |  FROM events GROUP BY event_type, user_id),
       |ex AS (SELECT event_type, user_id, cnt,
       |    CAST(unnest(generate_series(0, ${AmsD - 1})) AS BIGINT) AS j FROM cnt),
       |sj AS (SELECT event_type, j,
       |    CAST(SUM((1 - 2 * (${h32Duck("j || '_' || user_id", "ams")} % 2)) * cnt) AS BIGINT) AS sj
       |  FROM ex GROUP BY event_type, j),
       |md AS (SELECT event_type, sj * sj AS estj,
       |    row_number() OVER (PARTITION BY event_type ORDER BY sj * sj ASC, j ASC) AS rk
       |  FROM sj),
       |f2 AS (SELECT event_type, CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact
       |  FROM cnt GROUP BY event_type)
       |SELECT f.event_type, f.f2_exact, m.estj AS ams_est,
       |  CAST(FLOOR(ABS(m.estj - f.f2_exact) * 1000 / f.f2_exact) AS BIGINT) AS err_permille
       |FROM f2 f JOIN md m ON m.event_type = f.event_type AND m.rk = ${(AmsD + 1) / 2}
       |ORDER BY f.event_type""".stripMargin

  // --- column profiler ----------------------------------------------------

  /** k08 — table profiling (the pre-training "know your data" pass a
    * Deequ-style checker runs): per categorical column of orders —
    * priority, status, order year — row/null/distinct counts, the top
    * value with its frequency, and the KMV distinct estimate beside the
    * exact count (on a 10^12-row table the exact count is the column
    * you'd drop; the sketch column is why it's here).
    *
    * Scale: the melt is a map-side explode (×3 slim rows); per-(column,
    * value) counts are one keyed agg; every per-column reduction is a
    * MERGEABLE aggregate — top value via max(struct(freq, value)), no
    * window anywhere, so a column with 10^9 distinct values cannot
    * funnel through one task (the profiler trap: rank-by-frequency per
    * column is a global sort in disguise; the struct-max is its
    * aggregate twin, ties resolved to the LARGER value in both
    * engines). */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val melted = orders(s, d).select(
      explode(map(
        lit("o_orderpriority"), col("o_orderpriority"),
        lit("o_orderstatus"), col("o_orderstatus"),
        lit("order_year"), year(col("o_orderdate")).cast("string")
      )).as(Seq("c", "v")))
    val counts = melted.groupBy("c", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the profile and the KMV sketch
    val prof = counts.groupBy("c").agg(
      sum("cnt").as("n_rows"),
      sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
      sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_distinct"),
      // null values are excluded from the top-value race (max ignores
      // the null branch), mirroring the oracle's WHERE v IS NOT NULL
      max(when(col("v").isNotNull, struct(col("cnt"), col("v")))).as("top"))
    val kmv = kSmallest(
        counts.filter(col("v").isNotNull)
          .select(col("c").as("grp"), h60(col("v"), "kmv").as("hv")),
        "grp", KmvK)
      .groupBy("grp").agg(max("hv").as("kth"), count(lit(1)).as("n_kept"))
      .withColumn("kmv_distinct_est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(floor(lit((KmvK - 1).toDouble) * lit(Pow60) / col("kth").cast("double")).cast("long")))
      .select(col("grp").as("c"), col("kmv_distinct_est"))
    prof.join(kmv, "c") // |columns| rows each side
      .select(col("c").as("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("top.v").as("top_value"),
        col("top.cnt").as("top_freq"), col("kmv_distinct_est"))
      .orderBy("column_name")
  }

  private val ColumnProfileDuck: String =
    s"""WITH m AS (
       |  SELECT 'o_orderpriority' AS c, o_orderpriority AS v FROM orders
       |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
       |  UNION ALL SELECT 'order_year',
       |    CAST(CAST(EXTRACT(year FROM o_orderdate) AS INT) AS VARCHAR) FROM orders),
       |cnts AS (SELECT c, v, COUNT(*) AS cnt FROM m GROUP BY c, v),
       |top AS (SELECT c, v AS top_value, cnt AS top_freq,
       |    row_number() OVER (PARTITION BY c ORDER BY cnt DESC, v DESC) AS rn
       |  FROM cnts WHERE v IS NOT NULL),
       |prof AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS n_rows,
       |    CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_nulls,
       |    CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct
       |  FROM cnts GROUP BY c),
       |hv AS (SELECT c AS grp, ${h60Duck("v", "kmv")} AS hv
       |       FROM cnts WHERE v IS NOT NULL),
       |rk AS (SELECT grp, hv,
       |    row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk FROM hv),
       |kth AS (SELECT grp, MAX(hv) AS kth, COUNT(*) AS n_kept
       |        FROM rk WHERE rk <= $KmvK GROUP BY grp)
       |SELECT p.c AS column_name, p.n_rows, p.n_nulls, p.n_distinct,
       |  t.top_value, t.top_freq,
       |  CASE WHEN k.n_kept < $KmvK THEN k.n_kept
       |       ELSE CAST(FLOOR(${(KmvK - 1).toDouble} * $Pow60 / CAST(k.kth AS DOUBLE)) AS BIGINT)
       |  END AS kmv_distinct_est
       |FROM prof p
       |JOIN top t ON t.c = p.c AND t.rn = 1
       |JOIN kth k ON k.grp = p.c
       |ORDER BY p.c""".stripMargin

  // --- k10: HyperLogLog register sketch --------------------------------

  /** 0.709 · m² · 2^55 for m = 64 registers: the HLL estimator numerator
    * (α_64 from Flajolet et al. 2007, Table 1), premultiplied in ONE
    * Scala double so both engines divide the identical literal by the
    * identical integer — the whole estimate is a single IEEE division. */
  private[queries] val HllNum: Double = 0.709 * 4096.0 * 36028797018963968.0

  /** Small-range (linear-counting) correction, BAKED as integers: when
    * the raw estimate is ≤ 2.5·m and V registers are empty, HLL switches
    * to E = m·ln(m/V) — but a live `ln` would be the one cross-engine
    * float op whose last ulp differs between libm implementations. V has
    * only 64 possible values, so the whole correction is this lookup
    * table (index V), computed once here and INTERPOLATED into the
    * DuckDB twin — both engines read identical literals, no runtime
    * transcendentals anywhere in the sketch. */
  private[queries] val HllLcTable: IndexedSeq[Long] =
    (0 to 64).map(v => if (v == 0) 0L else math.floor(64.0 * math.log(64.0 / v)).toLong)

  /** HLL distinct-user sketch per event type, graded against the exact
    * distinct count — the 64-registers-per-group estimator that replaces
    * KMV when the sketch must be FIXED-SIZE (64 small ints vs K hashes)
    * and mergeable by plain element-wise MAX (k01's KMV needs a k-smallest
    * tournament to merge; HLL registers union with one keyed max — the
    * cheapest possible combine on a 1000-way tree).
    *
    * Portability: register index = h60 mod 64; rank ρ = leading zeros of
    * the remaining 54 bits + 1, computed as 55 − length(bin(v)) — integer
    * string-length arithmetic, no float log2 whose last ulp could flip a
    * register between engines (p03's discipline). The harmonic sum
    * Σ 2^−M_j is held as the EXACT integer Σ 2^(55−M_j) ≤ 2^61 (empty
    * registers contribute 2^55 = 2^−0 scaled), so the only float ops are
    * one int64→double conversion (identical round-to-nearest in both
    * engines) and one division by the premultiplied constant. No
    * small/large-range corrections: the fixture's per-type cardinality
    * sits in HLL's plain-estimator band (occupied is emitted so the
    * oracle would expose a regime change).
    *
    * Scale: groupBy (type, register) MAX is a map-side-combining partial
    * agg to |types|·64 rows — metadata scale from there on. */
  def hllRegisters(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    hllEstimate(s, ev, hllRho(ev).groupBy("grp", "idx").agg(max("rho").as("reg")))
  }

  /** Per-row (grp, idx, ρ) columns — STATELESS, so the identical
    * expressions run inside a stream (s24) and in batch (k10). */
  private[queries] def hllRho(ev: DataFrame): DataFrame =
    ev.select(col("event_type").as("grp"), h60(col("user_id"), "hll").as("hv"))
      .withColumn("idx", pmod(col("hv"), lit(64)).cast("int"))
      .withColumn("v", expr("hv div 64"))
      .withColumn("rho",
        when(col("v") === 0, lit(55)).otherwise(lit(55) - length(bin(col("v")))))

  /** Densify registers, fold the exact-integer harmonic sum, estimate —
    * shared by k10 and the streaming twin s24 (whose registers arrive
    * from the state store instead of a batch aggregate). */
  private[queries] def hllEstimate(s: SparkSession, ev: DataFrame,
      regs: DataFrame): DataFrame = {
    // densify to all 64 registers (empty register ⇒ ρ = 0): |types|×64 rows
    val allIdx = regs.select("grp").distinct()
      .crossJoin(broadcast(s.range(0, 64).select(col("id").cast("int").as("idx"))))
    val full = allIdx.join(regs, Seq("grp", "idx"), "left")
      .select(col("grp"), coalesce(col("reg"), lit(0)).as("reg"))
    val sums = full.groupBy("grp").agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - reg AS INT))")).as("isum"),
      sum(when(col("reg") > 0, 1L).otherwise(0L)).as("occupied"))
    val exact = ev.groupBy(col("event_type").as("grp"))
      .agg(countDistinct("user_id").as("n_exact"))
    exact.join(sums, "grp")
      .withColumn("raw", lit(HllNum) / col("isum").cast("double"))
      .withColumn("hll_est",
        when(col("occupied") < 64 && col("raw") <= 160.0,
          element_at(lit(HllLcTable.toArray),
            (lit(64L) - col("occupied")).cast("int") + 1))
          .otherwise(floor(col("raw")).cast("long")))
      .withColumn("err_permille",
        floor(abs(col("hll_est") - col("n_exact")) * lit(1000) / col("n_exact")).cast("long"))
      .select("grp", "n_exact", "occupied", "isum", "hll_est", "err_permille")
      .orderBy("grp")
  }

  private[queries] val HllRegistersDuck: String =
    s"""WITH hv AS (SELECT event_type AS grp,
       |    ${h60Duck("user_id", "hll")} AS hv FROM events),
       |r AS (SELECT grp, hv % 64 AS idx, hv // 64 AS v FROM hv),
       |mx AS (SELECT grp, idx,
       |    MAX(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END) AS reg
       |  FROM r GROUP BY 1, 2),
       |g AS (SELECT DISTINCT grp FROM mx),
       |a AS (SELECT g.grp, i.idx FROM g
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS idx) i),
       |f AS (SELECT a.grp, COALESCE(mx.reg, 0) AS reg FROM a
       |  LEFT JOIN mx ON mx.grp = a.grp AND mx.idx = a.idx),
       |sums AS (SELECT grp,
       |    CAST(SUM(CAST(1 AS BIGINT) << (55 - reg)) AS BIGINT) AS isum,
       |    CAST(SUM(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS occupied
       |  FROM f GROUP BY grp),
       |exact AS (SELECT event_type AS grp, COUNT(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY 1),
       |est AS (SELECT grp, occupied, isum,
       |    CASE WHEN occupied < 64 AND ($HllNum / CAST(isum AS DOUBLE)) <= 160.0
       |         THEN (LIST_VALUE(${HllLcTable.mkString(", ")}))[CAST(64 - occupied AS INT) + 1]
       |         ELSE CAST(FLOOR($HllNum / CAST(isum AS DOUBLE)) AS BIGINT)
       |    END AS hll_est
       |  FROM sums)
       |SELECT e.grp, e.n_exact, s.occupied, s.isum, CAST(s.hll_est AS BIGINT) AS hll_est,
       |  CAST(FLOOR(ABS(s.hll_est - e.n_exact) * 1000 / e.n_exact) AS BIGINT) AS err_permille
       |FROM exact e JOIN est s ON e.grp = s.grp
       |ORDER BY e.grp""".stripMargin

  // --- k11: Bloom-filter FPR tuning curve ------------------------------

  /** k11 — a deterministic Bloom filter with its false-positive rate
    * MEASURED, at m ∈ {1024, 4096, 16384} bits (k = 3 hashes): insert
    * the distinct ordering customers, probe 2000 keys from a disjoint
    * domain, count how many probe all-3-bits set. The size/accuracy
    * dial behind every runtime bloom pushdown (the automatic
    * InjectRuntimeFilter, t26's cross-query bloom) as an oracle-checked
    * table: fill factor and realized FPR per size, falling ~8× per 4×
    * bits at this load.
    *
    * Portability: bit positions come from Kirsch–Mitzenmacher double
    * hashing g_j = (h1 + j·h2) mod m over two salted md5 h60s — pure
    * int64 (max h1 + 2·h2 < 2^62, no overflow), no engine-native hash.
    * Everything graded is an integer count; the permille rates are
    * floor arithmetic.
    *
    * Scale: the filter IS a keyed (m, pos) set built by one distinct
    * partial agg — mergeable by union, the property runtime filters
    * rely on; probes join it KEYED on (m, pos). The |bits| frame stays
    * distributed — no driver-side bitmap. */
  def bloomFprCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ms = broadcast(Seq(1024L, 4096L, 16384L).toDF("m"))
    val js = broadcast(Seq(0L, 1L, 2L).toDF("j"))
    def positions(keys: DataFrame) = keys
      .withColumn("h1", h60(col("key"), "bloom1"))
      .withColumn("h2", h60(col("key"), "bloom2"))
      .crossJoin(ms).crossJoin(js)
      .withColumn("pos", pmod(col("h1") + col("j") * col("h2"), col("m")))
    val keys = orders(s, d).select(col("o_custkey").as("key")).distinct()
    val bits = positions(keys).select("m", "pos").distinct().localCheckpoint()
    val fill = bits.groupBy("m").agg(count(lit(1)).as("n_bits_set"))
    val nKeys = keys.agg(count(lit(1)).as("n_keys"))
    // probe domain derived as max(key)+1 .. max(key)+2000 — provably
    // disjoint from the inserted keys at ANY scale factor (a fixed base
    // like 1e6 would collide with custkeys once sf ≥ 7 and silently
    // count true members as "false positives")
    val probes = keys.agg(max(col("key")).as("mx"))
      .select(explode(expr("sequence(mx + 1, mx + 2000)")).as("key"))
    val probed = positions(probes)
      .join(bits.withColumn("hit", lit(1L)), Seq("m", "pos"), "left")
      .groupBy("m", "key")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("nhit"))
    val fps = probed.groupBy("m")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("nhit") === 3, 1L).otherwise(0L)).as("n_fp"))
    fill.join(fps, "m").crossJoin(broadcast(nKeys))
      .select(col("m"), col("n_keys"), col("n_bits_set"),
        floor(col("n_bits_set") * lit(1000) / col("m")).cast("long").as("fill_permille"),
        col("n_probes"), col("n_fp"),
        floor(col("n_fp") * lit(1000) / col("n_probes")).cast("long").as("fp_permille"))
      .orderBy("m")
  }

  private val BloomFprDuck: String =
    s"""WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
       |ms AS (SELECT CAST(unnest([1024, 4096, 16384]) AS BIGINT) AS m),
       |js AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS j),
       |kh AS (SELECT key, ${h60Duck("key", "bloom1")} AS h1,
       |              ${h60Duck("key", "bloom2")} AS h2 FROM keys),
       |bits AS (SELECT DISTINCT ms.m, (kh.h1 + js.j * kh.h2) % ms.m AS pos
       |  FROM kh, ms, js),
       |fill AS (SELECT m, COUNT(*) AS n_bits_set FROM bits GROUP BY m),
       |nk AS (SELECT COUNT(*) AS n_keys FROM keys),
       |mx AS (SELECT MAX(key) AS mx FROM keys),
       |pr AS (SELECT CAST(unnest(generate_series(mx + 1, mx + 2000)) AS BIGINT) AS key FROM mx),
       |ph AS (SELECT key, ${h60Duck("key", "bloom1")} AS h1,
       |              ${h60Duck("key", "bloom2")} AS h2 FROM pr),
       |pp AS (SELECT ms.m, ph.key, (ph.h1 + js.j * ph.h2) % ms.m AS pos
       |  FROM ph, ms, js),
       |probed AS (SELECT pp.m, pp.key,
       |    SUM(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) AS nhit
       |  FROM pp LEFT JOIN bits ON bits.m = pp.m AND bits.pos = pp.pos
       |  GROUP BY pp.m, pp.key),
       |fps AS (SELECT m, COUNT(*) AS n_probes,
       |    CAST(SUM(CASE WHEN nhit = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
       |  FROM probed GROUP BY m)
       |SELECT f.m, nk.n_keys, CAST(f.n_bits_set AS BIGINT) AS n_bits_set,
       |  CAST(FLOOR(f.n_bits_set * 1000 / f.m) AS BIGINT) AS fill_permille,
       |  fps.n_probes, fps.n_fp,
       |  CAST(FLOOR(fps.n_fp * 1000 / fps.n_probes) AS BIGINT) AS fp_permille
       |FROM fill f JOIN fps ON fps.m = f.m, nk
       |ORDER BY f.m""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "k11_bloom_fpr_curve" -> QueryDef(bloomFprCurve _, BloomFprDuck),
    "k10_hll_registers" -> QueryDef(hllRegisters _, HllRegistersDuck),
    "k06_bitmap_window_distinct" -> QueryDef(bitmapWindowDistinct _, BitmapWindowDuck),
    "k07_ams_f2" -> QueryDef(amsF2 _, AmsF2Duck),
    "k08_column_profile" -> QueryDef(columnProfile _, ColumnProfileDuck),
    "k09_kmv_window_distinct" -> QueryDef(kmvWindowDistinct _, KmvWindowDuck),
    "k01_kmv_distinct" -> QueryDef(kmvDistinct _, KmvDistinctDuck),
    "k02_cms_heavy_hitters" -> QueryDef(cmsHeavyHitters _, CmsHeavyHittersDuck),
    "k03_hash_sample_estimate" -> QueryDef(hashSampleEstimate _, HashSampleDuck),
    "k04_histogram_quantiles" -> QueryDef(histogramQuantiles _, HistogramQuantilesDuck),
    "k05_kmv_set_ops" -> QueryDef(kmvSetOps _, KmvSetOpsDuck)
  )
}
