package graft.operators

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Merge-on-read time travel — the OTHER lakehouse mutation posture,
  * beside q49's copy-on-write: commits never rewrite data files. A
  * delete lands as a TOMBSTONE file (Iceberg v2 position/equality
  * deletes, Delta deletion vectors), an insert as an APPEND file, and a
  * read at version v reconstructs the snapshot as
  * base ∖ tombstones(≤v) ∪ appends(≤v) — one keyed anti-join plus a
  * union, paid at READ time. CoW pays write amplification for clean
  * reads; MoR pays a read-side anti-join for O(|delta|) commits — at
  * 100 TB the choice is per-table (hot ingest → MoR, scan-heavy → CoW),
  * and this operator grades the MoR half of that pair.
  *
  * The graded query (q55) commits three versions of orders (full
  * snapshot; delete keys ≡ 0 mod 101; append negated keys ≡ 0 mod 103 —
  * q54's derivation, so the two operators cross-check) and emits each
  * version's census. The DuckDB oracle restates the three snapshots
  * over raw parquet — the log-structured layout must be
  * result-invisible. MergeOnReadSpec asserts the physical half: the
  * base data files stay BYTE-IDENTICAL across both commits (no rewrite
  * — the exact claim CoW cannot make), and the commit files are
  * |delta|-sized.
  */
object MergeOnRead {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  /** (base-files-unchanged-across-commits, tombstone+append rows) of the
    * last build — the physical claim, exposed for MergeOnReadSpec. */
  @volatile private[operators] var lastAudit: Option[(Boolean, Long, Long)] = None

  def clearCaches(): Unit = { cache.clear(); compactCache.clear() }

  private def listing(dir: Path): Map[String, (Long, Long)] = {
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def walk(p: Path): Unit =
      if (Files.isDirectory(p)) {
        val st = Files.list(p); try st.forEach(walk(_)) finally st.close()
      } else if (!p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith(".")) {
        out(dir.relativize(p).toString) =
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }
    walk(dir)
    out.toMap
  }

  def morTimeTravel(s: SparkSession, d: String): DataFrame = {
    cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    cache.getOrElseUpdate((s, d), {
      val root = Files.createTempDirectory("graft_mor")
      try {
        val base = orders(s, d)
          .select(col("o_orderkey").as("k"), dec(col("o_totalprice")).as("p"))
        val baseDir = root.resolve("base")
        base.write.parquet(baseDir.toString)
        val before = listing(baseDir)

        // commit 2: tombstone file (delete keys ≡ 0 mod 101)
        val tombDir = root.resolve("tombstones_v2")
        base.filter(pmod(col("k"), lit(101)) === 0).select("k")
          .write.parquet(tombDir.toString)
        // commit 3: append file (negated keys ≡ 0 mod 103)
        val apndDir = root.resolve("appends_v3")
        base.filter(pmod(col("k"), lit(103)) === 0)
          .select((-col("k")).as("k"), col("p"))
          .write.parquet(apndDir.toString)
        val after = listing(baseDir)

        val baseDf = s.read.parquet(baseDir.toString)
        val tomb = s.read.parquet(tombDir.toString)
        val apnd = s.read.parquet(apndDir.toString)
        lastAudit = Some((before == after, tomb.count(), apnd.count()))

        def snapshot(v: Int): DataFrame = {
          val afterDeletes =
            if (v >= 2) baseDf.join(tomb, Seq("k"), "left_anti") else baseDf
          if (v >= 3) afterDeletes.unionByName(apnd) else afterDeletes
        }
        (1 to 3).map { v =>
          snapshot(v).agg(count(lit(1)).as("n_rows"),
              asDbl(sum(col("p"))).as("sum_price"),
              min(col("k")).as("min_key"), max(col("k")).as("max_key"))
            .select(lit(v).as("version"), col("n_rows"), col("sum_price"),
              col("min_key"), col("max_key"))
        }.reduce(_ unionByName _)
          .orderBy("version")
          .localCheckpoint() // pin before the scratch dir is deleted
      } finally {
        def rm(p: Path): Unit = {
          if (Files.isDirectory(p)) {
            val st = Files.list(p); try st.forEach(rm(_)) finally st.close()
          }
          Files.deleteIfExists(p)
        }
        rm(root)
      }
    })
  }

  @volatile private[operators] var lastCompactAudit: Option[(Long, Long, Long)] = None
  private val compactCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** q57 — COMPACTION, the maintenance pass that closes q55's loop: the
    * accumulated tombstone/append log is folded into a fresh base (one
    * anti-join ∪ union write — the read path's plan, paid once), after
    * which reads are plain scans again and the log files retire. The
    * graded frame is the latest-version census read BOTH ways — through
    * the log ('pre') and from the compacted base ('post') — and
    * compaction is RESULT-INVISIBLE, so the oracle states the same
    * snapshot twice. MergeOnReadSpec's sibling test pins the physical
    * half: the compacted base row count equals the logical snapshot and
    * the scratch log is gone from the read path.
    *
    * At 100 TB this is the background job that bounds read
    * amplification: MoR's per-read anti-join cost grows with the log,
    * and compaction resets it — scheduled off the same
    * tombstone/append byte accounting this operator emits. */
  def morCompaction(s: SparkSession, d: String): DataFrame = {
    compactCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    compactCache.getOrElseUpdate((s, d), {
      val root = Files.createTempDirectory("graft_morc")
      try {
        val base = orders(s, d)
          .select(col("o_orderkey").as("k"), dec(col("o_totalprice")).as("p"))
        val baseDir = root.resolve("base")
        base.write.parquet(baseDir.toString)
        val tombDir = root.resolve("tombstones")
        base.filter(pmod(col("k"), lit(101)) === 0).select("k")
          .write.parquet(tombDir.toString)
        val apndDir = root.resolve("appends")
        base.filter(pmod(col("k"), lit(103)) === 0)
          .select((-col("k")).as("k"), col("p"))
          .write.parquet(apndDir.toString)

        val baseDf = s.read.parquet(baseDir.toString)
        val tomb = s.read.parquet(tombDir.toString)
        val apnd = s.read.parquet(apndDir.toString)
        val logRead = baseDf.join(tomb, Seq("k"), "left_anti").unionByName(apnd)

        // the compaction pass: fold the log into a fresh base, once
        val newBaseDir = root.resolve("base_compacted")
        logRead.write.parquet(newBaseDir.toString)
        val compacted = s.read.parquet(newBaseDir.toString)
        lastCompactAudit = Some((compacted.count(), tomb.count(), apnd.count()))

        def census(df: DataFrame, phase: String) =
          df.agg(count(lit(1)).as("n_rows"), asDbl(sum(col("p"))).as("sum_price"),
              min(col("k")).as("min_key"), max(col("k")).as("max_key"))
            .select(lit(phase).as("phase"), col("n_rows"), col("sum_price"),
              col("min_key"), col("max_key"))
        census(logRead, "1_pre_compaction")
          .unionByName(census(compacted, "2_post_compaction"))
          .orderBy("phase")
          .localCheckpoint() // pin before the scratch dir is deleted
      } finally {
        def rm(p: Path): Unit = {
          if (Files.isDirectory(p)) {
            val st = Files.list(p); try st.forEach(rm(_)) finally st.close()
          }
          Files.deleteIfExists(p)
        }
        rm(root)
      }
    })
  }

  /** Compaction is result-invisible: the oracle states the SAME latest
    * snapshot for both phases. */
  val compactionOracle: String =
    """WITH cur AS (SELECT o_orderkey AS k,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      |s3 AS (SELECT k, p FROM cur WHERE k % 101 != 0
      |       UNION ALL SELECT -k, p FROM cur WHERE k % 103 = 0),
      |c AS (SELECT COUNT(*) AS n_rows, CAST(SUM(p) AS DOUBLE) AS sum_price,
      |    MIN(k) AS min_key, MAX(k) AS max_key FROM s3)
      |SELECT '1_pre_compaction' AS phase, n_rows, sum_price, min_key, max_key FROM c
      |UNION ALL
      |SELECT '2_post_compaction', n_rows, sum_price, min_key, max_key FROM c
      |ORDER BY phase""".stripMargin

  val oracle: String =
    """WITH cur AS (SELECT o_orderkey AS k,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      |s1 AS (SELECT k, p FROM cur),
      |s2 AS (SELECT k, p FROM cur WHERE k % 101 != 0),
      |s3 AS (SELECT k, p FROM cur WHERE k % 101 != 0
      |       UNION ALL SELECT -k, p FROM cur WHERE k % 103 = 0)
      |SELECT 1 AS version, COUNT(*) AS n_rows, CAST(SUM(p) AS DOUBLE) AS sum_price,
      |  MIN(k) AS min_key, MAX(k) AS max_key FROM s1
      |UNION ALL SELECT 2, COUNT(*), CAST(SUM(p) AS DOUBLE), MIN(k), MAX(k) FROM s2
      |UNION ALL SELECT 3, COUNT(*), CAST(SUM(p) AS DOUBLE), MIN(k), MAX(k) FROM s3
      |ORDER BY version""".stripMargin
}
