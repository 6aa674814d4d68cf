package graft.ddl

import graft.load.JdbcSink

/** DDL deployment — the apply_mssql surface (SURVEY.md §2.8, K2):
  * script → GO batches → filter/rewrite → error-tolerant sequential
  * execution on a JDBC target.
  *
  * Batch semantics mirrored from apply_mssql.py:45-107:
  *  - skip batches containing CREATE DATABASE or `FILENAME =`;
  *  - drop short `USE [master]` stubs (< 20 chars);
  *  - retarget the scripted database name to the deploy target
  *    (bracketed and bare forms);
  *  - per-batch try/catch; a failing batch logs and continues.
  */
object DdlDeploy {

  final case class BatchResult(index: Int, skipped: Boolean, error: Option[String])

  /** Filter + rewrite one batch; None = skip. */
  def rewriteBatch(batch: String, oldDb: String, newDb: String): Option[String] = {
    val sql = batch.trim
    val upper = sql.toUpperCase
    if (sql.isEmpty) None
    else if (upper.contains("CREATE DATABASE")) None
    else if (upper.contains("FILENAME =")) None
    else if (sql.toLowerCase.contains("use [master]") && sql.length < 20) None
    else {
      val renamed =
        if (sql.contains(oldDb))
          sql.replace(s"[$oldDb]", s"[$newDb]").replace(oldDb, newDb)
        else sql
      Some(renamed)
    }
  }

  /** Prepare the full deployable batch list from a script file. */
  def prepare(scriptPath: String, oldDb: String, newDb: String): Seq[String] =
    DdlParser.splitGoBatches(DdlParser.readSqlFile(scriptPath))
      .flatMap(rewriteBatch(_, oldDb, newDb))

  /** Deploy against a JDBC target, tolerating per-batch errors (K2). */
  def deploy(target: JdbcSink.Target, scriptPath: String,
      oldDb: String, newDb: String): Seq[BatchResult] = {
    val batches = prepare(scriptPath, oldDb, newDb)
    JdbcSink.execute(target, batches).zipWithIndex.map { case (err, i) =>
      BatchResult(i + 1, skipped = false, err)
    }
  }
}
