package graft.rules

import graft.ddl.DdlParser
import org.apache.spark.sql.types.StructField

/** Rule inference: which generator a column gets.
  *
  * Faithful port of the reference's two dispatch cascades:
  *
  *  1. runtime dispatch `generate_smart_value` (run_engine.py:155-203):
  *     FK sample → first KEYWORD_MAP substring match (dict insertion
  *     order!) → type-driven default. The insertion-order scan is
  *     preserved verbatim, including its quirks ('AD' matching before
  *     'SOYAD'/'ADRES', 'IL' matching inside longer names) — they are
  *     observable behavior of the reference, not accidents to fix.
  *
  *  2. offline config inference `detect_provider`
  *     (generate_config_v2.py:8-60): name-looks-like-FK → description
  *     keywords (Turkish) → column-name keywords → type defaults → word.
  *
  * Unlike the reference (runtime, row-at-a-time), dispatch here happens
  * once per column at plan-build time — the output is a Rule that
  * compiles to a single Catalyst Column expression (SURVEY.md §2.7).
  */
object RuleInference {
  import Rule._

  /** KEYWORD_MAP in exact insertion order (run_engine.py:50-79). */
  val KeywordMap: Seq[(String, Rule)] = Seq(
    "TCKN" -> Numerify("###########"),
    "VKN" -> Numerify("##########"),
    "VERGI" -> Numerify("##########"),
    "IBAN" -> Iban,
    "MAIL" -> Email,
    "EPOSTA" -> Email,
    "TEL" -> PhoneNumber,
    "GSM" -> PhoneNumber,
    "UNVAN" -> Company,
    "SIRKET" -> Company,
    "AD" -> FirstName,
    "SOYAD" -> LastName,
    "ADRES" -> Address,
    "SEHIR" -> City,
    "IL" -> City,
    "ILCE" -> City,
    "ULKE" -> UlkeConst,
    "ACIKLAMA" -> Sentence(5),
    "NOT" -> Sentence(3),
    "BARKOD" -> Ean13,
    "STOKADI" -> ProductName,
    "URUNADI" -> ProductName,
    "KOD" -> AutoCode,
    "FIYAT" -> PriceUniform,
    "TUTAR" -> PriceUniform,
    "MIKTAR" -> RandomInt(1, 100),
    "WEB" -> Url,
    "URL" -> Url)

  /** Runtime-dispatch port: rule for one column of one table.
    * @param fkParent Some(parent) if an FK constraint covers the column. */
  def infer(field: StructField, fkParent: Option[String]): Rule = {
    fkParent match {
      case Some(p) => ForeignKey(p)
      case None =>
        val upper = field.name.toUpperCase
        KeywordMap.collectFirst { case (k, r) if upper.contains(k) => r }
          .getOrElse(typeDefault(field))
    }
  }

  /** Type-driven default (run_engine.py:177-203). */
  def typeDefault(field: StructField): Rule = {
    val md = field.metadata
    TypeDefault(
      md.getString(DdlParser.MetaSqlType),
      md.getLong(DdlParser.MetaPrecision).toInt,
      md.getLong(DdlParser.MetaScale).toInt,
      md.getLong(DdlParser.MetaMaxLength).toInt)
  }

  /** Offline-config inference port (`detect_provider`,
    * generate_config_v2.py:8-60). `description` is the Turkish column
    * description when available (the reference reads it from a JSONL
    * schema dump; empty works and falls through, exactly like the
    * reference with a missing description). */
  def detectProvider(colName: String, description: String, dataType: String,
      tableName: String): Rule = {
    val name = colName.toUpperCase
    val desc = description.toLowerCase
    val typ = dataType.toUpperCase

    def hasD(ks: String*) = ks.exists(desc.contains)

    // 1. name-looks-like-FK guess (generate_config_v2.py:19-23)
    if ((name.contains("ID") || name.contains("KOD")) && !name.contains(tableName.toUpperCase)) {
      if (typ.contains("INT")) return RandomInt(1, 100)
      if (typ.contains("UNIQUEIDENTIFIER")) return Uuid4
    }
    // 2. description keywords (generate_config_v2.py:26-41)
    if (hasD("telefon", "gsm")) return PhoneNumber
    if (hasD("email", "e-posta")) return Email
    if (hasD("adres")) return Address
    if (hasD("iban")) return Iban
    if (hasD("tc kimlik", "tckn")) return Numerify("###########")
    if (hasD("vergi no", "vkn")) return Numerify("##########")
    if (hasD("şehir", "il ")) return City
    if (hasD("ülke")) return Country
    if (hasD("tarih")) return DateThisDecade
    if (hasD("fiyat", "tutar", "bakiye"))
      return PyFloat(2, positive = true, Some(10), Some(50000))
    if (hasD("miktar")) return RandomInt(1, 1000)
    if (hasD("şirket", "firma", "unvan")) return Company
    if (desc.contains("ad ") && !desc.contains("soyad")) return FirstName
    if (hasD("soyad")) return LastName
    if (hasD("açıklama", "not")) return Sentence(10)
    // 3. column-name fallback (generate_config_v2.py:44-49)
    if (name.contains("TEL")) return PhoneNumber
    if (name.contains("MAIL")) return Email
    if (name.contains("BARKOD")) return Ean13
    if (name.contains("VERGIDAIRESI")) return CitySuffix
    if (name.contains("DURUM") || name.contains("AKTIF")) return BooleanRule
    if (name.contains("PARA") || name.contains("DOVIZ")) return CurrencyCode
    // 4. type defaults (generate_config_v2.py:52-57)
    val lt = dataType.toLowerCase
    if (lt.contains("bit") || lt.contains("boolean")) return BooleanRule
    if (lt.contains("date") || lt.contains("time")) return DateThisDecade
    if (lt.contains("int") || lt.contains("smallint")) return RandomInt(0, 100)
    if (lt.contains("decimal") || lt.contains("numeric") || lt.contains("float"))
      return PyFloat(2, positive = true, None, None)
    if (lt.contains("uniqueidentifier")) return Uuid4
    Word
  }
}
