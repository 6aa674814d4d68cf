package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Spark's own bloom-filter expressions (the pair behind AQE runtime
  * filtering, SPARK-32268) surfaced as callable functions:
  *
  *   - `bloom_agg(longCol, estItems, numBits)` → BINARY sketch
  *   - `bloom_contains(sketch, longCol)`       → BOOLEAN (no false negatives)
  *
  * Spark builds and probes these sketches internally for join pruning but
  * does not expose them in the public function surface; registering the
  * catalyst classes in the session registry (the same stable route as
  * `dot_d`) makes the engine's bloom-prefilter operators (t26) pure
  * Catalyst expressions — codegen'd probe, no UDF, no serialization of a
  * driver-side filter object beyond the sketch bytes themselves.
  */
object BloomExpressions {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** The ONE bloom_agg builder — shared by the temp-function route
    * (register) and the session-extension route (GraftExtensions), so
    * name/arity/semantics cannot drift between the two registries.
    * Arity is validated here: a wrong argument count must surface as a
    * clear analysis-time error, not a raw IndexOutOfBoundsException. */
  private[graft] def buildAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"bloom_agg expects 3 arguments (value, estItems, numBits), got ${exprs.length}")
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
  }

  /** The ONE bloom_contains builder (same single-sourcing rule). */
  private[graft] def buildContains(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bloom_contains expects 2 arguments (sketch, value), got ${exprs.length}")
    BloomFilterMightContain(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    FunctionRegistrar.registerIfAbsent(spark, "bloom_agg", buildAgg)
    FunctionRegistrar.registerIfAbsent(spark, "bloom_contains", buildContains)
  }

  /** Aggregate a LONG column into a bloom sketch (BINARY). */
  def bloomAgg(value: Column, estItems: Column, numBits: Column): Column =
    call_function("bloom_agg", value, estItems, numBits)

  /** Probe a sketch for a LONG value; `bloom` must be foldable (a
    * literal), which is exactly how the sketch is used: built once,
    * shipped to every task as a constant, probed map-side. */
  def bloomContains(bloom: Column, value: Column): Column =
    call_function("bloom_contains", bloom, value)
}
