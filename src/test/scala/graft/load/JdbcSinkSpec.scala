package graft.load

import graft.ddl.DdlParser
import graft.gen.Generator
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  lazy val cat = DdlParser.parseFile("/root/reference/script.sql")

  test("insert projection drops identity / unsafe / system columns") {
    val banka = Generator.tableDf(spark, cat("Banka"), 5, 42)
    val proj = JdbcSink.insertProjection(banka, cat("Banka"))
    assert(!proj.columns.contains("Id"), "identity must not be inserted")
    assert(proj.columns.contains("UlkeNumKod"))

    val ch = Generator.tableDf(spark, cat("CariHareket"), 5, 42)
    val projCh = JdbcSink.insertProjection(ch, cat("CariHareket"))
    assert(!projCh.columns.contains("RowVersion"), "rowversion must not be inserted")
    // every projected column is generation-safe and non-system
    val md = cat("CariHareket").schema
    projCh.columns.foreach { c =>
      assert(md(c).metadata.getBoolean(DdlParser.MetaSafe))
      assert(!Generator.SkipCols.contains(c))
    }
  }

  test("constraint-toggle statement sequences match the reference") {
    assert(JdbcSink.DisableAll.exists(_.contains("NOCHECK CONSTRAINT all")))
    assert(JdbcSink.DisableAll.exists(_.contains("DISABLE TRIGGER all")))
    assert(JdbcSink.EnableAll.exists(_.contains("CHECK CONSTRAINT all")))
    assert(JdbcSink.EnableAll.exists(_.contains("ENABLE TRIGGER all")))
  }

  test("jdbc writer options: batching + isolation") {
    val p = JdbcSink.props(JdbcSink.Target("jdbc:x", "u", "p"))
    assert(p.getProperty("batchsize") == "1000")
    assert(p.getProperty("isolationLevel") == "READ_UNCOMMITTED")
  }
}
