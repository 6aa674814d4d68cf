package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: constructing a
  * Dataset from a custom LogicalPlan (graft.plans.AsOfJoin). Spark
  * deliberately keeps `Dataset.ofRows` internal; extension libraries
  * that ship their own plan nodes conventionally host a small bridge in
  * this package (the same technique Spark-native connector/lakehouse
  * projects use). Nothing else of the internal surface is exposed. */
object GraftSqlBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Case-sensitivity-aware name resolver for the session (honors
    * spark.sql.caseSensitive), for custom operators that resolve
    * columns by name outside the analyzer. */
  def resolver(s: SparkSession): (String, String) => Boolean =
    s.asInstanceOf[classic.SparkSession].sessionState.analyzer.resolver

  // check-then-append on the experimental mutable Seqs is not atomic;
  // parallel suites sharing one session (every AsOfJoin.join calls
  // register) would race and append duplicates — synchronize to make
  // registration idempotent under concurrency
  def registerStrategy(s: SparkSession, strategy: execution.SparkStrategy): Unit =
    synchronized {
      val cs = s.asInstanceOf[classic.SparkSession]
      if (!cs.experimental.extraStrategies.contains(strategy))
        cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
    }

  /** Spec hook: a freshly-built session's experimental strategies are
    * empty (extension-injected strategies live in the session state,
    * not here) — non-emptiness proves a recycled session. */
  def experimentalStrategies(s: SparkSession): Seq[execution.SparkStrategy] =
    s.asInstanceOf[classic.SparkSession].experimental.extraStrategies

  def registerOptimization(s: SparkSession,
      rule: catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]): Unit =
    synchronized {
      val cs = s.asInstanceOf[classic.SparkSession]
      if (!cs.experimental.extraOptimizations.contains(rule))
        cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ rule
    }
}
