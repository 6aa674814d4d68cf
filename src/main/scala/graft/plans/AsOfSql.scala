package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** SQL syntax for the native as-of join — the §2.7 extension ladder's
  * rung (d), on top of rung (c)'s LogicalPlan/Strategy/Exec: a session
  * built with GraftExtensions accepts
  *
  *   {{{ left ASOF [LEFT] JOIN right ON l.k = r.k AND l.t > r.t }}}
  *
  * (DuckDB/kdb's surface — the q60 oracle's own spelling) and lowers it
  * to [[AsOfJoin]], so SQL text reaches the one-merge-pass physical
  * operator instead of a window-over-union rewrite. `>` is the strict
  * form (latest right row strictly before the left time), `>=` the
  * inclusive one; `<`/`<=` with the sides flipped are accepted too.
  * Plain `ASOF JOIN` is the inner form — lowered as the left-outer
  * operator plus an `IS NOT NULL` filter on the right time (a right
  * match always carries a non-null time, so the filter IS the inner
  * semantics).
  *
  * Mechanics, all Spark-native extension points (nothing intercepts the
  * grammar wholesale):
  *  1. [[GraftSqlParser]] (via `injectParser`) delegates every method to
  *     the session's parser and only TEXT-rewrites the `ASOF ... JOIN
  *     <name> [alias] ON` clause into a join against the registered
  *     table function `graft_asof_marker('<name>') AS alias` — a shape
  *     the stock grammar already parses. The right side must be a named
  *     relation (table, view, or CTE); subqueries stay on the
  *     DataFrame API (`AsOfJoin.join`).
  *  2. `graft_asof_marker` (via `injectTableFunction`) resolves to
  *     [[AsOfMark]], a transparent unary node over the named relation —
  *     surviving analysis where a bare annotation could not.
  *  3. [[AsOfSqlRule]] (via `injectResolutionRule`) fires once the join
  *     children and condition are resolved: it splits the ON
  *     conjunction into equi-keys and the single time inequality,
  *     validates types (the merge compares right rows through orderings
  *     built from left types), strips the mark, and emits [[AsOfJoin]].
  *
  * GraftExtensionsSpec drives q60's exact semantics from this SQL text
  * against the composed window-over-union plan. */
object AsOfSql {

  /** `ASOF [LEFT [OUTER]] JOIN <multipart-name> [[AS] alias] ON` —
    * rewritten to a stock join against the marker table function. The
    * lookahead keeps `ON` unconsumed so nested rewrites stay local. */
  private val AsOfRe =
    ("""(?i)\bASOF\s+(LEFT\s+(?:OUTER\s+)?)?JOIN\s+""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""" +
      """(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?(?=\s+ON\b)""").r

  private[plans] def rewrite(sqlText: String): String =
    if (!sqlText.toLowerCase(java.util.Locale.ROOT).contains("asof")) sqlText
    else AsOfRe.replaceAllIn(sqlText, m => {
      val jt = Option(m.group(1)).getOrElse("")
      val rel = m.group(2)
      val alias = Option(m.group(3)).getOrElse(rel.split('.').last)
      scala.util.matching.Regex.quoteReplacement(
        s"${jt}JOIN graft_asof_marker('$rel') AS $alias")
    })

  /** The marker table function: parks the named relation under an
    * [[AsOfMark]] so [[AsOfSqlRule]] can recognize the join later. */
  val markerFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_asof_marker"),
    new ExpressionInfo(classOf[AsOfMark].getName, "graft_asof_marker"),
    (args: Seq[Expression]) => args match {
      case Seq(Literal(s, StringType)) if s != null =>
        AsOfMark(UnresolvedRelation(s.toString.split('.').toIndexedSeq))
      case other => throw new IllegalArgumentException(
        "graft_asof_marker expects one string literal naming a relation " +
          s"(internal ASOF JOIN rewrite), got $other")
    })
}

/** Transparent annotation over the right side of an `ASOF JOIN` between
  * parse and lowering. Never reaches the planner: [[AsOfSqlRule]]
  * removes it when it builds the [[AsOfJoin]] node. */
case class AsOfMark(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): AsOfMark =
    copy(child = newChild)
}

/** Lowers a marked, fully-resolved Join into the native [[AsOfJoin]].
  * Runs in the analyzer's resolution batch, so it iterates with relation
  * and column resolution until the children and condition are ready. */
object AsOfSqlRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case Join(l, r, jt, Some(cond), _)
        if l.resolved && r.resolved && cond.resolved &&
          r.exists { case _: AsOfMark => true; case _ => false } =>
      val clean = r.transformUp { case AsOfMark(c) => c }
      val lset = l.outputSet
      val rset = clean.outputSet
      val lk = scala.collection.mutable.ArrayBuffer.empty[Attribute]
      val rk = scala.collection.mutable.ArrayBuffer.empty[Attribute]
      var time: Option[(Attribute, Attribute, Boolean)] = None
      def addKey(a: Attribute, b: Attribute): Unit =
        if (lset.contains(a) && rset.contains(b)) { lk += a; rk += b }
        else if (lset.contains(b) && rset.contains(a)) { lk += b; rk += a }
        else fail(s"equi-key ${a.name} = ${b.name} must reference one column from each side")
      // hi > lo (or hi >= lo): hi must be the LEFT time, lo the RIGHT —
      // "the latest right row at or before the left time"
      def setTime(hi: Attribute, lo: Attribute, strict: Boolean): Unit = {
        if (!(lset.contains(hi) && rset.contains(lo)))
          fail("the time inequality must bound a RIGHT time by a LEFT time " +
            "(l.t > r.t, l.t >= r.t, or flipped with </<=)")
        if (time.isDefined) fail("exactly one time inequality is allowed")
        time = Some((hi, lo, strict))
      }
      conjuncts(cond).foreach {
        case EqualTo(a: Attribute, b: Attribute) => addKey(a, b)
        case GreaterThan(a: Attribute, b: Attribute) => setTime(a, b, strict = true)
        case GreaterThanOrEqual(a: Attribute, b: Attribute) => setTime(a, b, strict = false)
        case LessThan(a: Attribute, b: Attribute) => setTime(b, a, strict = true)
        case LessThanOrEqual(a: Attribute, b: Attribute) => setTime(b, a, strict = false)
        case other => fail(s"unsupported ON conjunct ${other.sql} — " +
          "use column equi-keys plus one time inequality")
      }
      if (lk.isEmpty) fail("at least one equi-key pair is required")
      val (lt, rt, strict) = time.getOrElse(fail("a time inequality is required"))
      lk.zip(rk).foreach { case (a, b) =>
        if (a.dataType != b.dataType)
          fail(s"key type mismatch: ${a.name}: ${a.dataType.simpleString} vs " +
            s"${b.name}: ${b.dataType.simpleString} — cast before joining") }
      if (lt.dataType != rt.dataType)
        fail(s"time type mismatch: ${lt.dataType.simpleString} vs " +
          s"${rt.dataType.simpleString} — cast before joining")
      val asof = AsOfJoin(l, clean, lk.toSeq, rk.toSeq, lt, rt, strict)
      jt match {
        case LeftOuter => asof
        case Inner =>
          // inner as-of = left-outer + matched-only; a match always
          // carries a non-null right time (null times never match)
          val rtOut = asof.output.find(_.exprId == rt.exprId).getOrElse(
            fail("internal: right time attribute lost in AsOfJoin output"))
          Filter(IsNotNull(rtOut), asof)
        case other => fail(s"only JOIN and LEFT JOIN are supported, got $other")
      }
  }
}

/** Delegating parser that text-rewrites the `ASOF ... JOIN` clause (see
  * [[AsOfSql.rewrite]]) and hands everything — including the rewritten
  * text — to the session's stock parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsOfSql.rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsOfSql.rewrite(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(AsOfSql.rewrite(sqlText), ctx)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
