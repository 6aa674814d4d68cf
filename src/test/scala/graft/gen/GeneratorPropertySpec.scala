package graft.gen

import graft.ddl.{Catalog, DdlParser}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based generator checks (SURVEY.md §5): for arbitrary seeds
  * and tables, generated frames satisfy the declared constraints.
  * Raw ScalaCheck (Prop + Test.check) — the scalatest bridge artifact
  * is not in the offline cache. */
class GeneratorPropertySpec extends AnyFunSuite {

  private def check(minTests: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }
  lazy val spark: SparkSession = graft.TestSpark.session

  lazy val cat: Catalog = DdlParser.parseFile("/root/reference/script.sql")

  // a representative spread of tables (type variety per FIXTURES.md §B)
  val tableGen: Gen[String] = Gen.oneOf("Ulke", "Banka", "CariHareket", "Il", "Doviz")
    .suchThat(cat.tables.contains)
  val seedGen: Gen[Long] = Gen.choose(0L, 1000000L)

  test("constraints hold for arbitrary (table, seed)") {
    check(8)(Prop.forAll(tableGen, seedGen) { (t, seed) =>
      val td = cat(t)
      val rows = Generator.tableDf(spark, td, 12, seed).collect()
      assert(rows.length == 12)
      td.schema.fields.foreach { f =>
        val declared = f.metadata.getLong(DdlParser.MetaMaxLength).toInt
        val i = td.schema.fieldIndex(f.name)
        rows.foreach { r =>
          if (!r.isNullAt(i)) (f.dataType, r.get(i)) match {
            case (StringType, v: String) =>
              val cap = if (declared == -1) 100 else if (declared == 0) Int.MaxValue else declared
              assert(v.length <= cap, s"$t.${f.name} length ${v.length} > $cap (seed $seed)")
            case (dt: DecimalType, v: java.math.BigDecimal) =>
              assert(BigDecimal(v).abs < BigDecimal(10).pow(dt.precision - dt.scale))
            case (ShortType, v: Short) => // in range by type
            case _ => ()
          }
        }
      }
      true
    })
  }

  test("determinism: equal seeds agree, for arbitrary seeds") {
    check(4)(Prop.forAll(seedGen) { seed =>
      val a = Generator.tableDf(spark, cat("Banka"), 8, seed).collect().map(_.toSeq).toSeq
      val b = Generator.tableDf(spark, cat("Banka"), 8, seed).collect().map(_.toSeq).toSeq
      a == b
    })
  }
}
