package graft.ddl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-corpus test (SURVEY.md §5): the full reference DDL parses to
  * exactly the counted inventory — 85 tables, 131 FKs, 85 PKs, 4 identity
  * columns — and representative tables (FIXTURES.md §B) map to the right
  * Catalyst types. */
class DdlParserSpec extends AnyFunSuite {
  lazy val cat: Catalog = DdlParser.parseFile("/root/reference/script.sql")

  test("parses the whole corpus: 85 tables / 131 FKs / 85 PKs / 4 identity") {
    assert(cat.order.size == 85)
    assert(cat.allFks.size == 131)
    assert(cat.tables.values.count(_.pk.nonEmpty) == 85)
    val identCols = cat.tables.values.flatMap(_.schema.fields)
      .count(_.metadata.getBoolean(DdlParser.MetaIdentity))
    assert(identCols == 4)
  }

  test("column census matches the survey (1431 data_rules columns ⊆ parsed)") {
    val total = cat.tables.values.map(_.schema.size).sum
    assert(total >= 1431, s"expected >=1431 columns, got $total")
  }

  test("Ulke: nvarchar PK, GUID tenant (FIXTURES.md B1)") {
    val u = cat("Ulke")
    assert(u.pk == Seq("NumKod"))
    assert(u.schema("NumKod").dataType == StringType)
    assert(u.schema("NumKod").metadata.getLong(DdlParser.MetaMaxLength) == 3)
    assert(u.schema("Ad").metadata.getLong(DdlParser.MetaMaxLength) == 100)
    assert(u.schema("TenantId").dataType == StringType)
    assert(!u.schema("NumKod").nullable)
  }

  test("Banka: identity int PK + FK to Ulke (FIXTURES.md B2)") {
    val b = cat("Banka")
    assert(b.pk == Seq("Id"))
    assert(b.schema("Id").dataType == IntegerType)
    assert(b.schema("Id").metadata.getBoolean(DdlParser.MetaIdentity))
    val fk = b.fks.find(_.column == "UlkeNumKod").get
    assert(fk.refTable == "Ulke" && fk.refColumn == "NumKod")
  }

  test("CariHareket: widest type mix (FIXTURES.md B4)") {
    val c = cat("CariHareket")
    assert(c.schema("Tutar").dataType == DecimalType(25, 6))
    assert(c.schema("KdvOran").dataType == FloatType)
    assert(c.schema("BelgeTarih").dataType == DateType)
    assert(c.schema("FormBaBsTarih").dataType == TimestampType)
    assert(c.schema("DvzTL").dataType == ShortType)
    // rowversion excluded from generation via the whitelist
    assert(!c.schema("RowVersion").metadata.getBoolean(DdlParser.MetaSafe))
    assert(c.schema("BelgeNo").metadata.getLong(DdlParser.MetaMaxLength) == 20)
  }

  test("rarity cases: nvarchar(max) = -1, time→string, bigint, cascade FKs") {
    val maxCols = cat.tables.values.flatMap(_.schema.fields).filter(f =>
      f.metadata.getString(DdlParser.MetaSqlType) == "nvarchar" &&
        f.metadata.getLong(DdlParser.MetaMaxLength) == -1)
    assert(maxCols.size == 64, s"expected 64 nvarchar(max), got ${maxCols.size}")
    assert(cat.allFks.count(_.onDeleteCascade) == 19)
    val timeCols = cat.tables.values.flatMap(_.schema.fields)
      .filter(_.metadata.getString(DdlParser.MetaSqlType) == "time")
    assert(timeCols.nonEmpty && timeCols.forall(_.dataType == StringType))
  }

  test("SQL-script decoding: BOM sniff + NUL heuristic (S1)") {
    import java.nio.charset.StandardCharsets._
    val sql = "CREATE TABLE [T](\r\n [Id] int NOT NULL\r\n)\r\nGO\r\n"
    // BOM-directed paths
    assert(DdlParser.decodeSqlBytes(("﻿" + sql).getBytes(UTF_16LE)) == sql)
    assert(DdlParser.decodeSqlBytes(("﻿" + sql).getBytes(UTF_16BE)) == sql)
    assert(DdlParser.decodeSqlBytes(
      Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ sql.getBytes(UTF_8)) == sql)
    // BOM-less UTF-16 (SSMS without BOM): ~50% NULs → UTF-16 path, with
    // the byte order recovered from NUL offset parity (BE and LE both)
    assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_16BE)) == sql)
    assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_16LE)) == sql)
    // legacy single-byte encodings (no NULs, not valid UTF-8) fall back
    // to lenient UTF-8 — accented bytes become U+FFFD, structure survives
    val legacy = DdlParser.decodeSqlBytes(
      (sql + "-- açıklama\n").getBytes("windows-1254"))
    assert(legacy.startsWith(sql) && legacy.contains("-- a"))
    // BOM-less ASCII/UTF-8 of EVEN length: zero NULs → must decode as
    // UTF-8, not "successfully" as CJK garbage via big-endian UTF-16
    assert(sql.length % 2 == 0 && sql.getBytes(UTF_8).length % 2 == 0)
    assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_8)) == sql)
    val turkish = sql + "-- açıklama: şube\n"
    assert(DdlParser.decodeSqlBytes(turkish.getBytes(UTF_8)) == turkish)
    // NUL-parity TIE (equal even/odd NULs): must break toward LE — strict
    // BE would "successfully" decode these LE bytes as garbage (every
    // 16-bit unit here is a valid BE code point). Ā (U+0100) puts its NUL
    // at even offsets in LE, balancing the ASCII chars' odd-offset NULs.
    val tied = "GOĀĀ"
    val tiedLe = tied.getBytes(UTF_16LE)
    val even = tiedLe.indices.count(i => i % 2 == 0 && tiedLe(i) == 0)
    val odd = tiedLe.indices.count(i => i % 2 == 1 && tiedLe(i) == 0)
    assert(even == odd && even > 0, s"fixture not tied: even=$even odd=$odd")
    assert(DdlParser.decodeSqlBytes(tiedLe) == tied)
    // ...and the SQL-token sanity check rescues the tied BE case too:
    // strict LE "succeeds" on these bytes as tokenless garbage, so the
    // BE decode (which contains GO) wins despite losing the parity tie
    assert(DdlParser.decodeSqlBytes(tied.getBytes(UTF_16BE)) == tied)
  }

  test("decode round-trips every encoding x content class (S1 property)") {
    import java.nio.charset.StandardCharsets._
    val scripts = Seq(
      "CREATE TABLE [A](\r\n [Id] int NOT NULL\r\n)\r\nGO\r\n",                  // plain ASCII
      "CREATE TABLE [Şube](\r\n [Açıklama] nvarchar(50)\r\n)\r\nGO\r\n",         // Turkish letters
      "CREATE TABLE [T](\r\n [C] int -- 的是了\r\n)\r\nGO\r\n",                   // CJK comment
      "USE [db]\r\nGO\r\nALTER TABLE [X] ADD [Ü] bit\r\nGO\r\n-- İĞ ş 的\r\n")   // mixed
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    scripts.foreach { sql =>
      assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_8)) == sql, "utf8")
      assert(DdlParser.decodeSqlBytes(bom8 ++ sql.getBytes(UTF_8)) == sql, "utf8+bom")
      assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_16)) == sql, "utf16 bom")
      assert(DdlParser.decodeSqlBytes(("﻿" + sql).getBytes(UTF_16LE)) == sql, "utf16le+bom")
      assert(DdlParser.decodeSqlBytes(("﻿" + sql).getBytes(UTF_16BE)) == sql, "utf16be+bom")
      assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_16LE)) == sql, "utf16le bare")
      assert(DdlParser.decodeSqlBytes(sql.getBytes(UTF_16BE)) == sql, "utf16be bare")
    }
  }

  test("GO splitter + batch filters (apply_mssql.py semantics)") {
    val batches = DdlParser.splitGoBatches("A\nGO\nB\n  go  \nC")
    assert(batches == Seq("A", "B", "C"))
    val kept = DdlParser.filterBatches(Seq(
      "CREATE DATABASE [x]", "USE [master]", "CREATE TABLE t(...)",
      "ALTER DATABASE x MODIFY FILE ( FILENAME = 'x' )"))
    assert(kept == Seq("CREATE TABLE t(...)"))
  }
}
