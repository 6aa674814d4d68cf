package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class plan node — the §2.7 ladder's rung (c),
  * used where composition genuinely cannot express the PLAN we want:
  * q24 composes as-of semantics with a window over the UNION of both
  * streams (right rows ride the left's sort), which works when both
  * sides are the same table but (a) forces the union through one sort
  * whose width is the union schema and (b) cannot express two-table
  * as-of without first gluing schemas. The native operator is the
  * kdb/QuestDB/DuckDB ASOF JOIN shape: both sides hash-cluster on the
  * join keys and sort by (keys, time) — exactly the SMJ layout — and
  * ONE forward-only merge pass pairs each left row with the latest
  * right row at or before (strict: before) its time. Per-partition
  * state is ONE retained row; nothing is buffered, nothing rescanned.
  *
  * At 100 TB this is the trade the planner can't reach by rewriting:
  * shuffle each side once on its own (narrow) schema, then stream. The
  * merge is O(|L| + |R|) per partition with O(1) memory — against the
  * union-window's O((|L|+|R|) · union-width) sort buffer.
  *
  * Semantics (LEFT OUTER): every left row appears once; unmatched
  * left rows carry nulls on the right. Null join keys and null times
  * never match (SQL equi-join convention). Ties in (key, time) on the
  * right are broken by whichever sorts last — callers that need
  * determinism dedup the right side to unique (key, time) first (q60
  * does, with max(event_id) — the same tie rule its oracle states).
  *
  * Skew honesty: AQE's skew-join splitting only rewrites SMJ/SHJ, so a
  * hot key lands in one task here. The merge itself is benign — O(|L_k|
  * + |R_k|) streaming with O(1) state — so the skew cost is the child
  * Sort, which spills externally; for a pathological key the standard
  * mitigation is range-bucketing the TIME dimension per key upstream
  * (as-of state cannot salt across buckets without a boundary
  * hand-off, the same constraint streaming joins have).
  *
  * Wiring: `AsOfJoin.register(session)` adds the strategy to the
  * session's experimental strategies (idempotent); sessions built with
  * `.withExtensions(new GraftExtensions)` get it injected via
  * `injectPlannerStrategy`. The logical node is constructed with
  * RESOLVED attributes by `AsOfJoin.join`, so no analyzer rule is
  * needed; EnsureRequirements supplies the exchanges and sorts the
  * exec declares — visible in `.explain` as one exchange + one sort
  * per side feeding AsOfJoinExec (AsOfSpec freezes this shape). */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    strict: Boolean) extends BinaryNode {
  // NO structural requires here: a LogicalPlan's constructor re-runs on
  // CANONICALIZED copies (plan-cache lookups normalize both sides'
  // attrs to `none#0,1,2...` — which WOULD intersect); the input
  // validation lives in AsOfJoin.join instead.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Build an as-of-joined DataFrame: for each left row, the latest
    * right row with equal keys and rightTime ≤ leftTime (strict: <),
    * LEFT OUTER. Key pairs are (leftCol, rightCol) names; the two
    * frames must not share column names (alias the right side). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTime: String, rightTime: String, strict: Boolean = false): DataFrame = {
    val lp = GraftSqlBridge.planOf(left)
    val rp = GraftSqlBridge.planOf(right)
    require(keys.nonEmpty, "as-of join needs at least one equi-key pair")
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides must not share attributes — alias the right side")
    // conf-aware resolution (honors spark.sql.caseSensitive) — plain
    // string equality would reject a differently-cased name that normal
    // DataFrame resolution accepts
    val resolve = GraftSqlBridge.resolver(left.sparkSession)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.filter(a => resolve(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous (${many.size} matches) — alias the inputs")
      }
    val (lk, rk) = (keys.map(k => attr(lp, k._1)), keys.map(k => attr(rp, k._2)))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // the merge compares RIGHT rows through orderings built from the
    // LEFT types — mismatched types would read garbage bytes, not error
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}: ${a.dataType.simpleString} vs " +
          s"${b.name}: ${b.dataType.simpleString} — cast before joining") }
    require(lt.dataType == rt.dataType,
      s"time type mismatch: ${lt.dataType.simpleString} vs " +
        s"${rt.dataType.simpleString} — cast before joining")
    register(left.sparkSession)
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, lk, rk, lt, rt, strict))
  }

  def register(s: SparkSession): Unit = {
    GraftSqlBridge.registerStrategy(s, AsOfJoinStrategy)
    GraftSqlBridge.registerOptimization(s, AsOfPushDown)
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(lk, rk, lt, rt, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Predicate pushdown THROUGH the as-of join — the custom
  * Rule[LogicalPlan] half of the §2.7 rung-(c) triad. Catalyst's own
  * PushDownPredicates cannot see through a foreign node, so without
  * this rule a `Filter` above an AsOfJoin sticks there: the join (and
  * its per-side exchange + sort) processes every left row and the
  * filter runs last — at 100 TB that is a full-corpus shuffle for a
  * 1% slice. Left-only conjuncts push onto the LEFT child (each left
  * row appears exactly once in the LEFT OUTER output, so pre- vs
  * post-filtering left rows is semantics-preserving). How far the
  * predicate then travels depends on the wiring: sessions built with
  * GraftExtensions run this rule inside the operator-optimization
  * batch, so Catalyst's own rules carry it all the way into the scan
  * (data-source pushdown); the `AsOfJoin.register` path runs it in
  * experimental.extraOptimizations, AFTER the main pushdown batches,
  * so there the filter lands just above the left child — still before
  * the join's exchange+sort (the part that matters for shuffle volume)
  * but not into the scan itself. Right-referencing conjuncts must stay
  * above in either wiring: the right
  * side is the outer (nullable) side, and a predicate on it also
  * encodes "unmatched" semantics post-join. Deterministic conjuncts
  * only — the standard pushdown guard. */
object AsOfPushDown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  private object Splitter extends PredicateHelper {
    def split(cond: Expression): Seq[Expression] = splitConjunctivePredicates(cond)
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoin) =>
      val (pushable, kept) = Splitter.split(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical sort-merge as-of join. Declares the SMJ contract — both
  * children clustered on their keys and sorted by (keys, time) — and
  * streams both sorted iterators once per partition, retaining only the
  * current candidate row. */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val strictL = strict
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val ltBound = BindReferences.bindReference(lTime: Expression, lOut)
        val rtBound = BindReferences.bindReference(rTime: Expression, rOut)
        val keyOrdering =
          RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
        val timeOrdering = TypeUtils.getInterpretedOrdering(lTime.dataType)
        // bind against the NULLABLE view of the right schema: the right
        // child's attrs may be non-nullable, but unmatched lefts emit a
        // null row — binding on the raw schema would skip the null check
        // and read garbage zeros
        val resultProj = UnsafeProjection.create(outAttrs,
          lOut ++ rOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        // the whole per-partition state: the latest admissible right row
        var matchRow: InternalRow = null
        var matchKey: UnsafeRow = null
        lIter.map { l =>
          val lt = ltBound.eval(l)
          val lk = lKeyProj(l)
          if (lk.anyNull || lt == null) {
            resultProj(joined(l, nullRight))
          } else {
            var scan = true
            while (scan && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r)
              if (rk.anyNull) { rBuf.next(); () } // null keys never match
              else {
                val kc = keyOrdering.compare(rk, lk)
                if (kc < 0) { // right is on an earlier key: discard state
                  rBuf.next(); matchRow = null; matchKey = null
                } else if (kc == 0) {
                  val rt = rtBound.eval(r)
                  if (rt == null) { rBuf.next(); () } // null time never matches
                  else {
                    val tc = timeOrdering.compare(rt, lt)
                    if (if (strictL) tc < 0 else tc <= 0) {
                      matchRow = r.copy(); matchKey = rk.copy(); rBuf.next()
                    } else scan = false // right is ahead in time: keep for later lefts
                  }
                } else scan = false // right is on a later key
              }
            }
            val hit = matchRow != null && keyOrdering.compare(matchKey, lk) == 0
            resultProj(joined(l, if (hit) matchRow else nullRight))
          }
        }
    }
  }
}
