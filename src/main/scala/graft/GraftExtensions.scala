package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProductD

/** Session extensions for the graft engine — the Catalyst-native way to
  * ship the engine's custom expressions so they are available to SQL and
  * to every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * Currently injects:
  *   - `dot_d(array<double>, array<double>) → double`
  *     (whole-stage-codegen'd dot product; see graft.functions)
  *   - `bloom_agg(long, estItems, numBits) → binary` and
  *     `bloom_contains(binary, long) → boolean` — Spark's own runtime-
  *     filter bloom expressions surfaced for the engine's prefilter
  *     operators (see graft.functions.BloomExpressions)
  *   - `nibble_counts(binary) → array<long>` — fused one-pass nibble
  *     histogram behind m08's entropy signal
  *     (see graft.functions.BinaryExpressions)
  *   - `marker_counts(string, array<string>) → array<int>` — fused
  *     multi-marker occurrence counter behind t05's language ID
  *     (see graft.functions.StringExpressions)
  *   - `fwht(array<double>) → array<double>` — codegen'd fast
  *     Walsh–Hadamard butterfly behind v33's OPQ rotation
  *     (see graft.functions.HadamardExpressions)
  *   - the AS-OF JOIN planner strategy (graft.plans.AsOfJoinStrategy)
  *     — the custom LogicalPlan + SparkStrategy rung of the §2.7
  *     ladder; sessions without extensions get it lazily via
  *     `AsOfJoin.register`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfPushDown)
    // rung (d): ASOF [LEFT] JOIN in SQL text — delegating parser rewrite
    // + ON-clause flag function + lowering rule (graft.plans.AsOfSql)
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    ext.injectFunction(graft.plans.AsOfSql.flagFunction)
    ext.injectResolutionRule(_ => graft.plans.AsOfSqlRule)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import graft.functions.BloomExpressions
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_d expects 2 arguments (array<double>, array<double>), got ${exprs.length}")
        DotProductD(exprs(0), exprs(1))
      }))
    // bloom builders delegate to BloomExpressions — the temp-function
    // and extension registries must share ONE definition per function
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      BloomExpressions.buildAgg _))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_contains"),
      BloomExpressions.buildContains _))
    ext.injectFunction((
      FunctionIdentifier("nibble_counts"),
      new ExpressionInfo(classOf[graft.functions.NibbleCounts].getName, "nibble_counts"),
      graft.functions.BinaryExpressions.buildNibbleCounts _))
    ext.injectFunction((
      FunctionIdentifier("marker_counts"),
      new ExpressionInfo(classOf[graft.functions.MarkerCounts].getName, "marker_counts"),
      graft.functions.StringExpressions.buildMarkerCounts _))
    ext.injectFunction((
      FunctionIdentifier("fwht"),
      new ExpressionInfo(classOf[graft.functions.Fwht].getName, "fwht"),
      graft.functions.HadamardExpressions.buildFwht _))
  }
}
