package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator of the engine's query surface.
  *
  * @param fn     Spark implementation: (session, fixture dir) => result
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None for ops not expressible in portable SQL — those get
  *               the driver's weaker rows-only check plus ScalaTest specs).
  *
  * Contract (see SparkEntry): result column names match the oracle's
  * aliases exactly; every query ends in a deterministic total ORDER BY;
  * derived floats go through exact decimal arithmetic and a single final
  * cast so both engines produce bit-identical values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
}
