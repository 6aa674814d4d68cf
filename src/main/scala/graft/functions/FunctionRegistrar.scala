package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration that GRAFT STILL OWNS.
  *
  * `createOrReplaceTempFunction` logs a
  * `WARN SimpleFunctionRegistry: The function X replaced a previously
  * registered function` on every call after the first, so per-query
  * `register(spark)` calls (the graft convention — every operator that
  * needs a custom Expression registers it on entry) littered bench and
  * gate logs with dozens of spurious WARNs. A bare `functionExists`
  * probe would silence them but also silently KEEP a foreign function
  * that happened to claim the name first (a wrong-results class the old
  * replace-always semantics made impossible) — so registration replaces
  * unless THIS registrar already installed the name into THIS registry:
  * graft's builder always wins (one honest WARN if it displaces a
  * foreign binding), repeats are silent no-ops. Races are harmless —
  * every builder is a pure function of its argument expressions, so
  * whichever call lands last installs an identical builder.
  */
object FunctionRegistrar {
  // keyed by registry identity: each session (and each cloned streaming
  // micro-batch session with its own registry) tracks its own ownership
  private val owned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  def registerIfAbsent(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val key = (System.identityHashCode(reg), name)
    if (!owned.contains(key) || !reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
      owned.add(key)
    }
  }
}
