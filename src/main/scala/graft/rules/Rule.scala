package graft.rules

/** The generator-rule DSL (SURVEY.md §2.6).
  *
  * Covers every rule string that appears in the reference's
  * `data_rules.json` plus every rule `generate_config_v2.detect_provider`
  * can emit, plus the KEYWORD_MAP generators of `run_engine.py:50-79`
  * (modeled as rules so keyword dispatch and config-driven dispatch
  * compile through one path).
  */
sealed trait Rule

object Rule {
  // data_rules.json / detect_provider surface
  final case class ForeignKey(parent: String) extends Rule
  final case class RandomInt(lo: Long, hi: Long) extends Rule
  final case class PyFloat(rightDigits: Int, positive: Boolean,
      minValue: Option[Double], maxValue: Option[Double]) extends Rule
  /** e.g. `numerify:###########` — '#' is a random digit, other chars literal. */
  final case class Numerify(pattern: String) extends Rule
  final case class Sentence(nWords: Int) extends Rule
  case object Word extends Rule
  case object BooleanRule extends Rule
  case object Email extends Rule
  case object Iban extends Rule
  case object PhoneNumber extends Rule
  case object Address extends Rule
  case object City extends Rule
  case object Country extends Rule
  case object Company extends Rule
  case object FirstName extends Rule
  case object LastName extends Rule
  case object Ean13 extends Rule
  case object CurrencyCode extends Rule
  case object CitySuffix extends Rule
  case object Uuid4 extends Rule
  case object DateThisDecade extends Rule

  // KEYWORD_MAP-only generators (run_engine.py:50-79)
  /** `AUTO-<1000..9999>` (run_engine.py:73) */
  case object AutoCode extends Rule
  /** adjective+noun product name (run_engine.py:71-72) */
  case object ProductName extends Rule
  /** `round(uniform(10,5000),2)` (run_engine.py:74-75) */
  case object PriceUniform extends Rule
  case object Url extends Rule
  /** constant "Türkiye" (run_engine.py:67) */
  case object UlkeConst extends Rule

  // type-driven defaults (run_engine.py:177-203)
  final case class TypeDefault(sqlType: String, precision: Int, scale: Int, length: Int) extends Rule

  /** Parse a `data_rules.json` rule string. Unknown strings → Word,
    * mirroring the reference's catch-all (generate_config_v2.py:60). */
  def parse(s: String): Rule = {
    val (kind, arg) = s.indexOf(':') match {
      case -1 => (s, "")
      case i => (s.substring(0, i), s.substring(i + 1))
    }
    kind match {
      case "foreign_key" => ForeignKey(arg)
      case "random_int" =>
        val Array(lo, hi) = arg.split(",", 2).map(_.trim.toLong)
        RandomInt(lo, hi)
      case "pyfloat" =>
        val kv = arg.split(",").map(_.trim).filter(_.nonEmpty).flatMap { t =>
          t.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
        }.toMap
        PyFloat(
          kv.get("right_digits").map(_.toInt).getOrElse(2),
          kv.get("positive").forall(_.equalsIgnoreCase("true")),
          kv.get("min_value").map(_.toDouble),
          kv.get("max_value").map(_.toDouble))
      case "numerify" => Numerify(arg)
      case "sentence" => Sentence(if (arg.isEmpty) 6 else arg.toInt)
      case "word" => Word
      case "boolean" => BooleanRule
      case "email" => Email
      case "iban" => Iban
      case "phone_number" => PhoneNumber
      case "address" => Address
      case "city" => City
      case "country" => Country
      case "company" => Company
      case "first_name" => FirstName
      case "last_name" => LastName
      case "ean13" => Ean13
      case "currency_code" => CurrencyCode
      case "city_suffix" => CitySuffix
      case "uuid4" => Uuid4
      case "date_this_decade" => DateThisDecade
      case _ => Word
    }
  }
}
