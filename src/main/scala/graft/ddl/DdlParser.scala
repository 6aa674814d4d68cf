package graft.ddl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import scala.util.matching.Regex

/** Foreign-key edge of the relational catalog.
  * Mirrors the reference's FK-catalog scan output (run_engine.py:122-140). */
final case class Fk(table: String, column: String, refTable: String,
    refColumn: String, onDeleteCascade: Boolean)

/** One table of the catalog: Spark schema + constraint metadata.
  * Field-level facts (SQL type, declared length, precision/scale,
  * identity flag, generation-safety) live in StructField.metadata, the
  * Spark-native place for column metadata (SURVEY.md §1.1/§1.2). */
final case class TableDef(name: String, schema: StructType, pk: Seq[String], fks: Seq[Fk]) {
  def safeFields: Seq[StructField] =
    schema.fields.toSeq.filter(f => f.metadata.getBoolean(DdlParser.MetaSafe) &&
      !f.metadata.getBoolean(DdlParser.MetaIdentity))
}

/** Parsed catalog of the full DDL script. */
final case class Catalog(tables: Map[String, TableDef], order: Seq[String]) {
  def apply(name: String): TableDef = tables(name)
  def allFks: Seq[Fk] = order.flatMap(t => tables(t).fks)
}

/** Minimal T-SQL DDL reader for SSMS-generated scripts — the Spark-side
  * equivalent of the reference's schema introspection: instead of querying
  * INFORMATION_SCHEMA at runtime (run_engine.py:85-140), we parse the DDL
  * once into a driver-side catalog of StructTypes and drive everything
  * from it. Scope is exactly what the 85-table corpus needs (SURVEY.md
  * §7.4): column grammar, PK/FK/IDENTITY, encoding fallback, GO split,
  * batch filters. Index/WITH(...) physical noise is ignored.
  */
object DdlParser {
  val MetaSqlType = "sqlType"
  val MetaMaxLength = "maxLength"   // -1 == nvarchar(max), like CHARACTER_MAXIMUM_LENGTH
  val MetaPrecision = "precision"
  val MetaScale = "scale"
  val MetaIdentity = "identity"
  val MetaSafe = "safe"             // in the generation whitelist (run_engine.py:28-34)

  /** SQL-script file source: UTF-16 with UTF-8(-BOM) fallback
    * (reference behavior: apply_mssql.py:7-10,124-129). Unlike Python's
    * decode, `new String(bytes, UTF_16)` never throws (malformed input
    * becomes U+FFFD), so the fallback must be driven by a strict
    * CharsetDecoder (REPORT) plus a BOM sniff — otherwise a UTF-8 script
    * silently decodes as garbage and the parse yields an empty catalog. */
  def readSqlFile(path: String): String =
    decodeSqlBytes(Files.readAllBytes(Paths.get(path)))

  private[ddl] def decodeSqlBytes(bytes: Array[Byte]): String = {
    def strict(cs: java.nio.charset.Charset): String = {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    }
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
    else if (bytes.length >= 2 &&
        ((bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte) ||
         (bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)))
      new String(bytes, StandardCharsets.UTF_16) // BOM-directed, like SSMS output
    else {
      // Content heuristics — strict decoding alone does NOT close the
      // holes: (a) BOM-less ASCII/UTF-8 of even length decodes
      // "successfully" as big-endian UTF-16 CJK garbage (almost every
      // 16-bit unit is a valid code point), and (b) BOM-less UTF-16LE
      // likewise survives a big-endian decode as garbage. Real UTF-16
      // SQL text is ~50% NUL bytes, and their OFFSET PARITY reveals the
      // byte order: LE puts the NUL high byte at odd offsets, BE at
      // even. A NUL-free input is UTF-8/ASCII.
      val nulEven = bytes.indices.count(i => i % 2 == 0 && bytes(i) == 0)
      val nulOdd = bytes.indices.count(i => i % 2 == 1 && bytes(i) == 0)
      val attempts: Seq[java.nio.charset.Charset] =
        // NUL-free SQL cannot be UTF-16 (every ASCII char would carry a
        // NUL byte) — never attempt it, or strict BE "succeeds" on
        // legacy single-byte text as CJK garbage
        if (nulEven + nulOdd == 0) Seq(StandardCharsets.UTF_8)
        // Parity ties (mostly non-ASCII text) break toward LE — the
        // overwhelmingly common SSMS/Windows byte order — because strict
        // BE can "successfully" decode balanced-parity LE bytes as
        // plausible garbage; trying LE first closes that hole.
        else if (nulOdd >= nulEven) Seq(StandardCharsets.UTF_16LE, StandardCharsets.UTF_16BE)
        else Seq(StandardCharsets.UTF_16BE, StandardCharsets.UTF_16LE)
      // SQL-token sanity: wrong-endian UTF-16 can strict-decode as
      // plausible garbage (each 16-bit unit a valid code point), and the
      // parity heuristic cannot distinguish the orders on a tie — so a
      // decode that yields no SQL token at all loses to one that does.
      def looksLikeSql(s: String): Boolean = {
        // Locale.ROOT: under a Turkish default locale "insert".toUpperCase
        // is "İNSERT" (dotted capital I) and the token check would miss
        val u = s.toUpperCase(java.util.Locale.ROOT)
        Seq("CREATE", "ALTER", "INSERT", "USE ", "GO").exists(u.contains)
      }
      // LazyList: the second strict decode only runs if the first one
      // fails or decodes to tokenless garbage (the common path stops
      // after one decode, memoized for the headOption fallback)
      val decoded = attempts.to(LazyList).flatMap(cs =>
        try Some(strict(cs))
        catch { case _: java.nio.charset.CharacterCodingException => None })
      decoded.find(looksLikeSql).orElse(decoded.headOption).getOrElse {
        // last resort, mirroring the reference's tolerant posture
        // (apply_mssql.py:124-129): lenient UTF-8 — malformed bytes
        // become U+FFFD but the script still parses
        stripBom(new String(bytes, StandardCharsets.UTF_8))
      }
    }
  }
  private def stripBom(s: String) = if (s.startsWith("﻿")) s.substring(1) else s

  /** GO-batch splitter: `^\s*GO\s*$`, multiline + case-insensitive
    * (apply_mssql.py:12-15). */
  def splitGoBatches(sql: String): Seq[String] =
    sql.split("(?mi)^\\s*GO\\s*$").toSeq.map(_.trim).filter(_.nonEmpty)

  /** DDL batch filters (apply_mssql.py:69-83): drop CREATE DATABASE /
    * FILENAME= batches and USE [master] stubs. */
  def filterBatches(batches: Seq[String]): Seq[String] =
    batches.filterNot { b =>
      val u = b.toUpperCase
      u.contains("CREATE DATABASE") || u.contains("FILENAME =") ||
        (u.contains("USE [MASTER]") && b.length < 40)
    }

  /** The generator's type whitelist (SAFE_TYPES, run_engine.py:28-34). */
  val SafeTypes: Set[String] = Set(
    "int", "bigint", "smallint", "tinyint", "bit",
    "decimal", "numeric", "money", "smallmoney", "float", "real",
    "datetime", "smalldatetime", "date", "time", "datetime2",
    "char", "varchar", "nchar", "nvarchar", "text", "ntext",
    "uniqueidentifier")

  /** MSSQL type → Catalyst type (SURVEY.md §1.2 table). */
  def sparkType(sqlType: String, precision: Int, scale: Int): DataType = sqlType match {
    case "int" => IntegerType
    case "bigint" => LongType
    case "smallint" => ShortType
    case "tinyint" => ShortType
    case "bit" => BooleanType
    case "decimal" | "numeric" => DecimalType(math.max(precision, 1), math.max(scale, 0))
    case "money" => DecimalType(19, 4)
    case "smallmoney" => DecimalType(10, 4)
    case "float" => DoubleType
    case "real" => FloatType
    case "date" => DateType
    case "datetime" | "smalldatetime" | "datetime2" | "datetimeoffset" => TimestampType
    case "time" => StringType        // Spark has no TIME type (§1.2)
    case "timestamp" => BinaryType   // rowversion; excluded from generation
    case "varbinary" | "binary" | "image" => BinaryType
    case _ => StringType             // n(var)char, (n)text, uniqueidentifier, xml…
  }

  private val ColRe: Regex =
    """^\s*\[(\w+)\]\s+\[(\w+)\](?:\((\d+|max)(?:,\s*(\d+))?\))?\s*(IDENTITY\(\d+,\s*\d+\)\s*)?(NOT NULL|NULL)\s*,?\s*$""".r
  private val CreateRe: Regex = """(?s)CREATE TABLE \[dbo\]\.\[(\w+)\]\((.*)""".r
  private val PkColRe: Regex = """\[(\w+)\]\s+(?:ASC|DESC)""".r
  private val FkRe: Regex =
    """(?s)ALTER TABLE \[dbo\]\.\[(\w+)\]\s+WITH (?:NO)?CHECK ADD\s+CONSTRAINT \[\w+\] FOREIGN KEY\(\[(\w+)\]\)\s*REFERENCES \[dbo\]\.\[(\w+)\] \(\[(\w+)\]\)(\s*ON DELETE CASCADE)?""".r

  /** Parse a full SSMS script into the catalog. */
  def parse(sql: String): Catalog = {
    val batches = filterBatches(splitGoBatches(sql))
    var tables = Vector.empty[(String, StructType, Seq[String])]
    var fks = Vector.empty[Fk]

    batches.foreach {
      case CreateRe(name, body) =>
        // Column section runs until the CONSTRAINT/closing lines.
        val fields = body.linesIterator.takeWhile(l =>
          !l.trim.startsWith("CONSTRAINT") && !l.trim.startsWith(") ON")).flatMap {
          case ColRe(col, typ, len, scale, ident, nullness) =>
            val precision = (Option(len), typ) match {
              case (Some("max"), _) => -1
              case (Some(p), _) => p.toInt
              case (None, "datetime2" | "datetimeoffset" | "time") => 7
              case _ => 0
            }
            val sc = Option(scale).map(_.toInt).getOrElse(0)
            val isIdent = ident != null
            val md = new MetadataBuilder()
              .putString(MetaSqlType, typ)
              .putLong(MetaMaxLength,
                if (Set("char", "varchar", "nchar", "nvarchar", "text", "ntext").contains(typ))
                  precision.toLong else 0L)
              .putLong(MetaPrecision, precision.toLong)
              .putLong(MetaScale, sc.toLong)
              .putBoolean(MetaIdentity, isIdent)
              .putBoolean(MetaSafe, SafeTypes.contains(typ))
              .build()
            Some(StructField(col, sparkType(typ, precision, sc), nullness == "NULL", md))
          case _ => None
        }.toVector
        val pk = {
          val pkSection = body.split("PRIMARY KEY", 2)
          if (pkSection.length == 2)
            PkColRe.findAllMatchIn(pkSection(1).split("\\)WITH")(0)).map(_.group(1)).toSeq
          else Seq.empty
        }
        tables :+= ((name, StructType(fields), pk))
      case b => FkRe.findFirstMatchIn(b).foreach { m =>
        fks :+= Fk(m.group(1), m.group(2), m.group(3), m.group(4), m.group(5) != null)
      }
    }

    val fksByTable = fks.groupBy(_.table)
    val defs = tables.map { case (n, st, pk) =>
      n -> TableDef(n, st, pk, fksByTable.getOrElse(n, Vector.empty))
    }.toMap
    Catalog(defs, tables.map(_._1))
  }

  /** Parse the reference script (convenience for tests/pipeline). */
  def parseFile(path: String): Catalog = parse(readSqlFile(path))
}
