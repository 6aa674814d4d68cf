package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog join/aggregation shapes over synthetic sys.*-shaped frames
  * (no live database in this container; the SQL texts themselves are
  * string-asserted). */
class CatalogJdbcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("J1/A1: fk edge join + map build") {
    import spark.implicits._
    val fks = Seq((101L, "Banka"), (102L, "BankaSube"))
      .toDF("object_id", "table_name")
    val fkCols = Seq(
      (101L, "UlkeNumKod", "Ulke", "NumKod"),
      (102L, "BankaId", "Banka", "Id"),
      (102L, "IlKod", "Il", "Kod"))
      .toDF("constraint_object_id", "column_name", "referenced_table", "referenced_column")
    val edges = CatalogJdbc.fkEdges(fks, fkCols)
    assert(edges.count() == 3)
    val m = CatalogJdbc.fkMap(edges).collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    assert(m("BankaSube") == Map("BankaId" -> "Banka", "IlKod" -> "Il"))
    assert(m("Banka") == Map("UlkeNumKod" -> "Ulke"))
  }

  test("J2: pk discovery with default on miss") {
    import spark.implicits._
    val tcs = Seq(("PK_Banka", "Banka", "PRIMARY KEY"), ("UQ_Banka", "Banka", "UNIQUE"))
      .toDF("CONSTRAINT_NAME", "TABLE_NAME", "CONSTRAINT_TYPE")
    val ccu = Seq(("PK_Banka", "Banka", "Id"), ("UQ_Banka", "Banka", "Kod"))
      .toDF("CONSTRAINT_NAME", "TABLE_NAME", "COLUMN_NAME")
    assert(CatalogJdbc.discoverPk(tcs, ccu, "Banka") == "Id")
    assert(CatalogJdbc.discoverPk(tcs, ccu, "Yok") == "Id") // default
  }

  test("catalog SQL texts carry the reference predicates") {
    assert(CatalogJdbc.TableListSql.contains("TABLE_TYPE = 'BASE TABLE'"))
    assert(CatalogJdbc.columnsSql("Banka").contains("IsIdentity"))
    assert(CatalogJdbc.columnsSql("O'Brien").contains("O''Brien")) // escaping
    assert(CatalogJdbc.pkSampleSql("Ulke", "NumKod") ==
      "SELECT TOP 1000 [NumKod] FROM [Ulke] WITH (NOLOCK)")
    assert(CatalogJdbc.databaseExistsSql("GRAFTDB").contains("sys.databases"))
  }
}
