package graft.load

import java.sql.DriverManager
import graft.ddl.Catalog
import graft.gen.GeneratePipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One row of the load audit (g07's schema). */
final case class TableLoadReport(table_name: String, n_loaded: Long,
    n_readback: Long, n_fk_bad: Long, pk_rearmed: Boolean,
    n_fks: Int, n_fks_rearmed: Int)

/** The reference's flagship behavior — bulk-append into a LIVE relational
  * database with constraints out of the way (run_engine.py:227-260) —
  * run for real against embedded Derby:
  *
  *   probe/create DB (S9, apply_mssql.py:27-43) → deploy retargeted DDL
  *   (§2.8) → generate FK-consistent rows → distributed JDBC append (K1)
  *   → re-arm constraints (K4) → read back through spark.read.jdbc and
  *   audit counts + referential integrity.
  *
  * In-memory Derby is a local-mode harness (executors share the JVM); on
  * a real cluster the same code points the URL at a network database and
  * nothing else changes — the writer is one connection per partition,
  * `batchsize` rows per round trip.
  */
object JdbcRoundTrip {

  private val dbCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def run(spark: SparkSession, catalog: Catalog, rowCount: Long = 15,
      seed: Long = 42): Seq[TableLoadReport] = {
    val db = s"graft_rt_${dbCounter.incrementAndGet()}_${System.nanoTime()}"
    val url = s"jdbc:derby:memory:$db"
    try runOn(spark, catalog, url, rowCount, seed)
    finally dropDatabase(url)
  }

  /** S9: existence probe — can the database be opened as-is? */
  def databaseExists(url: String): Boolean =
    try { DriverManager.getConnection(url).close(); true }
    catch { case _: java.sql.SQLException => false }

  /** CREATE DATABASE if absent (apply_mssql.py:27-43). */
  def ensureDatabase(url: String): Unit =
    if (!databaseExists(url)) DriverManager.getConnection(s"$url;create=true").close()

  private def dropDatabase(url: String): Unit =
    try DriverManager.getConnection(s"$url;drop=true").close()
    catch { case _: java.sql.SQLException => () } // 08006 == dropped OK

  private def runOn(spark: SparkSession, catalog: Catalog, url: String,
      rowCount: Long, seed: Long): Seq[TableLoadReport] = {
    val target = JdbcSink.Target(url, "", "")
    ensureDatabase(url)

    // Deploy bare tables (constraints unarmed = "disabled" posture).
    val targets = catalog.order.filterNot(GeneratePipeline.skipTable)
    JdbcSink.execute(target, targets.map(t => DerbyDdl.createTableSql(catalog(t))))
      .zip(targets).foreach { case (err, t) =>
        err.foreach(e => sys.error(s"create $t failed: $e"))
      }

    // Generate + bulk-append (K1). Constraints are not armed, so the
    // writes need no toggling and no ordering beyond the generator's own
    // parent-key waves.
    val loaded = scala.collection.mutable.Map.empty[String, Long]
    val results = GeneratePipeline.run(spark, catalog, rowCount, seed, (t, df) => {
      JdbcSink.appendGenerated(df, catalog(t), target, toggleConstraints = false,
        quoteTable = DerbyDdl.q)
      loaded(t) = rowCount
    })
    results.filterNot(_.ok).foreach(r => sys.error(s"generate ${r.table}: ${r.error}"))

    // Re-arm constraints (K4 "enable" equivalent) — per-statement error
    // tolerance like apply_mssql.py:94-102; Derby validates on ADD, so a
    // failure here is a real integrity signal, recorded per table.
    val pkOk: Map[String, Boolean] = targets.map { t =>
      t -> DerbyDdl.addPkSql(catalog(t)).forall(sql =>
        JdbcSink.execute(target, Seq(sql)).head.isEmpty)
    }.toMap
    val fkOk: Map[String, Int] = targets.map { t =>
      t -> catalog(t).fks.count(fk =>
        JdbcSink.execute(target, Seq(DerbyDdl.addFkSql(fk))).head.isEmpty)
    }.toMap

    // Read back through the JDBC source and audit.
    def readback(t: String): DataFrame =
      spark.read.jdbc(url, DerbyDdl.q(t), JdbcSink.props(target))
    val frames = targets.map(t => t -> readback(t)).toMap

    targets.sorted.map { t =>
      val td = catalog(t)
      val fkBad = td.fks.filter(f => frames.contains(f.refTable)).map { f =>
        frames(t).select(col(f.column)).filter(col(f.column).isNotNull)
          .join(frames(f.refTable).select(col(f.refColumn).as(f.column)),
            Seq(f.column), "left_anti").count()
      }.sum
      TableLoadReport(t, loaded.getOrElse(t, 0L), frames(t).count(), fkBad,
        pkOk(t), td.fks.size, fkOk(t))
    }
  }
}
