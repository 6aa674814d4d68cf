package graft.sources

import graft.rules.{Rule, RuleInference}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL schema-description source + rule-config inference + JSON config
  * sink — the Spark-native `generate_config_v2` pipeline (SURVEY.md §3.3,
  * operators S3/J4/K3).
  *
  * Input shape (one JSON object per line, tolerant of bad lines —
  * generate_config_v2.py:69-97):
  * {{{
  * {"table_name": "Banka",
  *  "columns": [{"column_name": "Ad", "description_tr": "banka adı",
  *               "data_type": "nvarchar"}, …],
  *  "foreign_keys": [{"column": "UlkeNumKod", "references": "Ulke.NumKod"}]}
  * }}}
  *
  * Dataflow (all declarative): JSONL → PERMISSIVE json scan →
  * explode(columns) ⟕ explode(foreign_keys) on column name (J4) →
  * FK rule | detect_provider cascade → config map → JSON sink (K3).
  */
object SchemaJsonl {

  /** S3: JSONL scan. PERMISSIVE mode plays the try/except role — bad
    * lines land in _corrupt_record instead of failing the read. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Flatten to one row per column, with the FK parent joined on
    * (J4: explode foreign_keys ⋈ columns on column name). */
  def columnRelation(schemaDf: DataFrame): DataFrame = {
    val base = schemaDf.filter(col("table_name").isNotNull)
    val cols = base.select(col("table_name"),
        explode(col("columns")).as("c"))
      .select(col("table_name"), col("c.column_name"),
        coalesce(col("c.description_tr"), lit("")).as("description_tr"),
        coalesce(col("c.data_type"), lit("")).as("data_type"))
    val fks = base.select(col("table_name"),
        explode(col("foreign_keys")).as("f"))
      .filter(col("f.references").isNotNull)
      .select(col("table_name"), col("f.column").as("column_name"),
        split(col("f.references"), "\\.").getItem(0).as("fk_parent"))
    cols.join(fks, Seq("table_name", "column_name"), "left")
  }

  /** Infer the full rule config (FK rule wins; else detect_provider). */
  def inferConfig(spark: SparkSession, path: String): Map[String, Map[String, Rule]] = {
    val rel = columnRelation(load(spark, path))
      .select("table_name", "column_name", "description_tr", "data_type", "fk_parent")
      .collect()
    rel.groupBy(_.getString(0)).map { case (t, rows) =>
      t -> rows.map { r =>
        val rule = Option(r.getString(4)) match {
          case Some(parent) => Rule.ForeignKey(parent)
          case None => RuleInference.detectProvider(
            r.getString(1), r.getString(2), r.getString(3), t)
        }
        r.getString(1) -> rule
      }.toMap
    }
  }

  /** K3: JSON config sink (driver-side, the config is metadata-scale). */
  def saveConfig(path: String, cfg: Map[String, Map[String, Rule]]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = cfg.toSeq.sortBy(_._1).map { case (t, cols) =>
      s"  ${q(t)}: {\n" + cols.toSeq.sortBy(_._1).map { case (c, r) =>
        s"    ${q(c)}: ${q(ruleString(r))}"
      }.mkString(",\n") + "\n  }"
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }

  /** Inverse of Rule.parse for the rule kinds detect_provider emits. */
  def ruleString(r: Rule): String = r match {
    case Rule.ForeignKey(p) => s"foreign_key:$p"
    case Rule.RandomInt(lo, hi) => s"random_int:$lo,$hi"
    case Rule.PyFloat(rd, pos, minV, maxV) =>
      val opts = Seq(s"right_digits=$rd", s"positive=${if (pos) "True" else "False"}") ++
        minV.map(v => s"min_value=${v.toLong}") ++ maxV.map(v => s"max_value=${v.toLong}")
      s"pyfloat:${opts.mkString(",")}"
    case Rule.Numerify(p) => s"numerify:$p"
    case Rule.Sentence(n) => s"sentence:$n"
    case Rule.Word => "word"
    case Rule.BooleanRule => "boolean"
    case Rule.Email => "email"
    case Rule.Iban => "iban"
    case Rule.PhoneNumber => "phone_number"
    case Rule.Address => "address"
    case Rule.City => "city"
    case Rule.Country => "country"
    case Rule.Company => "company"
    case Rule.FirstName => "first_name"
    case Rule.LastName => "last_name"
    case Rule.Ean13 => "ean13"
    case Rule.CurrencyCode => "currency_code"
    case Rule.CitySuffix => "city_suffix"
    case Rule.Uuid4 => "uuid4"
    case Rule.DateThisDecade => "date_this_decade"
    case other => "word"
  }
}
