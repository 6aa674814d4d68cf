package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{MapType, StringType}

/** Reader for `data_rules.json`-shaped configs:
  * `{table: {column: ruleString}}` (reference: data_rules.json,
  * written by generate_config_v2.py:100-101).
  */
object RulesConfig {

  /** Load + parse a rule config into the Rule ADT. */
  def load(spark: SparkSession, path: String): Map[String, Map[String, Rule]] = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"),
        MapType(StringType, MapType(StringType, StringType))).as("m"))
      .head().getMap[String, Map[String, String]](0)
    raw.map { case (t, cols) => t -> cols.map { case (c, r) => c -> Rule.parse(r) } }.toMap
  }
}
