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
  // keyed WEAKLY by the registry object itself (round-12 advice: an
  // identityHashCode key could — however unlikely — collide across two
  // registries and skip a needed registration, and a strong key would
  // pin every cloned streaming micro-batch session's registry forever);
  // the value is the exact builder WE installed, so ownership is
  // verifiable against what the registry holds NOW, not just "we
  // registered this name once"
  private val owned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef,
      java.util.concurrent.ConcurrentHashMap[String, Seq[Expression] => Expression]]())

  def registerIfAbsent(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val perReg = owned.synchronized {
      var m = owned.get(reg)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Seq[Expression] => Expression]()
        owned.put(reg, m)
      }
      m
    }
    // skip ONLY when the registry still holds the builder this registrar
    // installed (reference identity — builders are pure, but a foreign
    // createOrReplaceTempFunction of the same name must not be silently
    // kept just because graft claimed the name first)
    val mine = perReg.get(name)
    val current = reg.lookupFunctionBuilder(FunctionIdentifier(name))
    if (mine == null || !current.exists(_ eq mine)) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
      perReg.put(name, builder)
    }
  }
}
