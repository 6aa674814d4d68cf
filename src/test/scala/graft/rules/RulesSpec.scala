package graft.rules

import graft.ddl.DdlParser
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RulesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  test("parses the full data_rules.json corpus (85 tables / 1431 rules)") {
    val cfg = RulesConfig.load(spark, "/root/reference/data_rules.json")
    assert(cfg.size == 85)
    val all = cfg.values.flatMap(_.values).toSeq
    assert(all.size == 1431)
    // distribution from SURVEY.md §2.6
    assert(all.count(_ == Rule.Sentence(10)) == 1062)
    assert(all.count(_.isInstanceOf[Rule.ForeignKey]) == 131)
    assert(all.count(_.isInstanceOf[Rule.PyFloat]) == 91)
    assert(all.count(_ == Rule.DateThisDecade) == 60)
    assert(all.count(_.isInstanceOf[Rule.RandomInt]) == 23)
    assert(all.count(_ == Rule.Email) == 12)
    assert(all.count(_.isInstanceOf[Rule.Numerify]) == 3)
  }

  test("rule DSL parse: every FIXTURES.md B6 string") {
    assert(Rule.parse("foreign_key:Ulke") == Rule.ForeignKey("Ulke"))
    assert(Rule.parse("random_int:0,100") == Rule.RandomInt(0, 100))
    assert(Rule.parse("pyfloat:right_digits=2,positive=True,min_value=10,max_value=50000") ==
      Rule.PyFloat(2, positive = true, Some(10), Some(50000)))
    assert(Rule.parse("pyfloat:right_digits=2,positive=True") ==
      Rule.PyFloat(2, positive = true, None, None))
    assert(Rule.parse("numerify:###########") == Rule.Numerify("###########"))
    assert(Rule.parse("sentence:10") == Rule.Sentence(10))
    assert(Rule.parse("date_this_decade") == Rule.DateThisDecade)
    assert(Rule.parse("uuid4") == Rule.Uuid4)
    assert(Rule.parse("boolean") == Rule.BooleanRule)
    assert(Rule.parse("word") == Rule.Word)
    assert(Rule.parse("gibberish_rule") == Rule.Word) // catch-all
  }

  test("keyword dispatch precedence: FK > keyword > type (run_engine.py:155-177)") {
    val cat = DdlParser.parseFile("/root/reference/script.sql")
    val banka = cat("Banka")
    // FK beats the ULKE keyword
    val ulkeCol = banka.schema("UlkeNumKod")
    assert(RuleInference.infer(ulkeCol, Some("Ulke")) == Rule.ForeignKey("Ulke"))
    // keyword fires without FK — ULKE keyword → constant
    assert(RuleInference.infer(ulkeCol, None) == Rule.UlkeConst)
    // type default when nothing matches
    val tutar = cat("CariHareket").schema("Tutar")
    assert(RuleInference.infer(tutar, None) == Rule.PriceUniform) // TUTAR keyword
  }

  test("insertion-order quirks are preserved (AD before SOYAD/ADRES)") {
    import org.apache.spark.sql.types._
    def strField(name: String) = StructField(name, StringType, nullable = true,
      new MetadataBuilder().putString(DdlParser.MetaSqlType, "nvarchar")
        .putLong(DdlParser.MetaMaxLength, 50).putLong(DdlParser.MetaPrecision, 50)
        .putLong(DdlParser.MetaScale, 0).putBoolean(DdlParser.MetaIdentity, false)
        .putBoolean(DdlParser.MetaSafe, true).build())
    // 'AD' ⊂ 'SOYAD' and 'AD' iterates first — reference behavior
    assert(RuleInference.infer(strField("Soyad"), None) == Rule.FirstName)
    assert(RuleInference.infer(strField("Adres"), None) == Rule.FirstName)
    assert(RuleInference.infer(strField("Aciklama"), None) == Rule.Sentence(5))
  }

  test("detect_provider cascade (generate_config_v2.py:8-60)") {
    import RuleInference.detectProvider
    // description beats name
    assert(detectProvider("X", "telefon numarası", "nvarchar", "T") == Rule.PhoneNumber)
    assert(detectProvider("X", "fiyat bilgisi", "numeric", "T") ==
      Rule.PyFloat(2, positive = true, Some(10), Some(50000)))
    // FK-looking name with int type
    assert(detectProvider("MusteriId", "", "int", "Banka") == Rule.RandomInt(1, 100))
    assert(detectProvider("MusteriId", "", "uniqueidentifier", "Banka") == Rule.Uuid4)
    // name fallback
    assert(detectProvider("Barkod", "", "nvarchar", "T") == Rule.Ean13)
    assert(detectProvider("AktifMi", "", "nvarchar", "T") == Rule.BooleanRule)
    // type defaults
    assert(detectProvider("Xyz", "", "bit", "T") == Rule.BooleanRule)
    assert(detectProvider("Xyz", "", "datetime2", "T") == Rule.DateThisDecade)
    assert(detectProvider("Xyz", "", "nvarchar", "T") == Rule.Word)
  }
}
