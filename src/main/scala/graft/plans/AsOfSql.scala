package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

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
  *     <name> [alias] ON` clause into the stock `JOIN <name> alias ON
  *     graft_asof_flag() AND ...` — the right side stays an ordinary
  *     named relation through parse and analysis, so tables, views AND
  *     CTE names all resolve through the stock path (an earlier marker
  *     table function materialized its `UnresolvedRelation` after
  *     `CTESubstitution` had already run, so CTE right sides could not
  *     resolve). A parenthesized subquery right side gets the same
  *     treatment through a balanced-paren scan (regexes cannot nest).
  *     The rewrite is literal- and comment-aware: `ASOF JOIN ... ON`
  *     inside a string literal, quoted identifier, line comment or
  *     bracketed comment is left untouched — and any ASOF head left
  *     standing after the rewrite fails immediately with the operator's
  *     own guidance instead of the stock parser's bare syntax error.
  *  2. `graft_asof_flag()` (via `injectFunction`) resolves to
  *     [[AsOfFlag]], an unevaluable boolean leaf that tags the join
  *     condition — surviving analysis where bare text could not, and
  *     never reaching execution (the lowering rule strips it; a join it
  *     cannot lower fails analysis with the operator's own message).
  *  3. [[AsOfSqlRule]] (via `injectResolutionRule`) fires once the join
  *     children and condition are resolved: it splits the ON
  *     conjunction into equi-keys and the single time inequality,
  *     validates types (the merge compares right rows through orderings
  *     built from left types), drops the flag, and emits [[AsOfJoin]].
  *
  * GraftExtensionsSpec drives q60's exact semantics from this SQL text
  * against the composed window-over-union plan. */
object AsOfSql {

  /** `ASOF [LEFT [OUTER]] JOIN <multipart-name> [[AS] alias] ON` —
    * rewritten to a stock join whose ON clause leads with the
    * [[AsOfFlag]] conjunct. The `ON` keyword is consumed so the flag
    * lands inside the right join's condition. Parenthesized subquery
    * right sides are handled separately ([[rewriteSubqueries]] — a
    * regex cannot balance their parens). */
  private val AsOfRe =
    ("""(?i)\bASOF\s+(LEFT\s+(?:OUTER\s+)?)?JOIN\s+""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""" +
      """(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+ON\b""").r

  /** The head of a subquery right side: `ASOF [LEFT [OUTER]] JOIN (`. */
  private val AsOfSubqRe =
    """(?i)\bASOF\s+(LEFT\s+(?:OUTER\s+)?)?JOIN\s*(?=\()""".r

  /** Any ASOF JOIN head — the post-rewrite remnant detector. */
  private val AsOfAnyRe = """(?i)\bASOF\s+(?:LEFT\s+(?:OUTER\s+)?)?JOIN\b""".r

  /** Spans of the text the rewrite must not touch: string literals
    * (single- or double-quoted, with backslash escapes and quote
    * doubling), backtick-quoted identifiers (with backtick doubling),
    * `--` line comments, and nested bracketed comments — Spark's own
    * lexical shapes. */
  private[plans] def protectedSpans(sql: String): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val start = i; i += 1
        var open = true
        while (i < n && open) {
          val ch = sql.charAt(i)
          if (ch == '\\' && i + 1 < n) i += 2
          else if (ch == c && i + 1 < n && sql.charAt(i + 1) == c) i += 2
          else if (ch == c) { open = false; i += 1 }
          else i += 1
        }
        spans += ((start, i))
      } else if (c == '`') {
        val start = i; i += 1
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == '`' && i + 1 < n && sql.charAt(i + 1) == '`') i += 2
          else if (sql.charAt(i) == '`') { open = false; i += 1 }
          else i += 1
        }
        spans += ((start, i))
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val start = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        spans += ((start, i))
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val start = i; i += 2
        var depth = 1
        while (i < n && depth > 0) {
          if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
            depth += 1; i += 2
          } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
            depth -= 1; i += 2
          } else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.toSeq
  }

  private[plans] def rewrite(sqlText: String): String =
    if (!sqlText.toLowerCase(java.util.Locale.ROOT).contains("asof")) sqlText
    else {
      val named = {
        val spans = protectedSpans(sqlText)
        // the regex never matches a quote character, so a match starting
        // outside every protected span lies entirely outside them
        AsOfRe.replaceAllIn(sqlText, m =>
          if (spans.exists(s => m.start >= s._1 && m.start < s._2))
            scala.util.matching.Regex.quoteReplacement(m.matched)
          else {
            val jt = Option(m.group(1)).getOrElse("")
            val rel = m.group(2)
            // keep the user's alias if one was written; never invent one —
            // a forced `AS t` on a multipart name replaces the [db, t]
            // qualifier with [t] and breaks `db.t.col` references that the
            // stock join would resolve
            val alias = Option(m.group(3)).map(a => s" AS $a").getOrElse("")
            scala.util.matching.Regex.quoteReplacement(
              s"${jt}JOIN $rel$alias ON graft_asof_flag() AND")
          })
      }
      val full = rewriteSubqueries(named)
      // remnant detector (round-11 advice): an ASOF head the rewrite
      // could not complete would otherwise reach the stock parser and
      // die with a bare `ASOF` syntax error — fail with the operator's
      // own guidance instead
      val leftover = {
        val spans = protectedSpans(full)
        AsOfAnyRe.findAllMatchIn(full)
          .find(m => !spans.exists(s => m.start >= s._1 && m.start < s._2))
      }
      leftover.foreach { m =>
        val snippet = full.substring(m.start, math.min(full.length, m.start + 80))
        throw new IllegalArgumentException(
          "ASOF JOIN: could not be lowered — the right side must be a named " +
            "relation (table, view, CTE) or a parenthesized subquery, " +
            "followed by an optional alias and an ON clause with column " +
            s"equi-keys plus one time inequality; near: $snippet")
      }
      full
    }

  /** Balanced-paren pass for `ASOF ... JOIN (SELECT …) [alias] ON`: the
    * subquery body is copied verbatim (its own protected spans and
    * nested parens respected), only the head and the ON keyword are
    * rewritten — exactly the named-relation treatment, so the flagged
    * join reaches [[AsOfSqlRule]] with a stock subquery-alias child. */
  private def rewriteSubqueries(sqlText: String): String = {
    val spans = protectedSpans(sqlText)
    def inProtected(i: Int) = spans.exists(s => i >= s._1 && i < s._2)
    val heads = AsOfSubqRe.findAllMatchIn(sqlText)
      .filter(m => !inProtected(m.start)).toList
    if (heads.isEmpty) sqlText
    else {
      val out = new StringBuilder
      var pos = 0
      // whitespace, single-level bracketed comments, and line comments
      // may sit between the subquery, its alias, and ON (nested
      // bracketed comments fall through to the remnant error, which at
      // least carries the operator's guidance)
      val skip = """(?:\s|/\*(?:[^*]|\*(?!/))*\*/|--[^\n]*)"""
      val AliasOnRe =
        s"""(?i)^$skip*(?:(?:AS\\s+)?([A-Za-z_]\\w*)$skip+)?ON\\b""".r
      heads.foreach { m =>
        if (m.start >= pos) {
          // scan the balanced subquery: depth over parens OUTSIDE
          // protected spans (a paren inside a literal never counts)
          var i = m.end // at '('
          var depth = 0
          var end = -1
          while (i < sqlText.length && end < 0) {
            if (inProtected(i))
              i = spans.find(s => i >= s._1 && i < s._2).get._2
            else {
              sqlText.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1; if (depth == 0) end = i
                case _ => ()
              }
              i += 1
            }
          }
          if (end >= 0) {
            AliasOnRe.findFirstMatchIn(sqlText.substring(end + 1)) match {
              case Some(am) =>
                val jt = Option(m.group(1)).getOrElse("")
                // recurse into the body: an ASOF subquery head NESTED
                // inside this subquery was skipped by the outer pass
                // (its text is copied verbatim) — the named-relation
                // pass already ran over the whole statement, so only
                // subquery heads can remain inside
                val sub =
                  "(" + rewriteSubqueries(sqlText.substring(m.end + 1, end)) + ")"
                val alias = Option(am.group(1)).map(a => s" AS $a").getOrElse("")
                out.append(sqlText.substring(pos, m.start))
                out.append(s"${jt}JOIN $sub$alias ON graft_asof_flag() AND")
                pos = end + 1 + am.end
              case None => () // no ON — leave it; the remnant detector fails it
            }
          }
        }
      }
      out.append(sqlText.substring(pos, sqlText.length))
      out.toString
    }
  }

  /** The flag function: a zero-arg boolean that tags the rewritten ON
    * clause so [[AsOfSqlRule]] can recognize the join later. */
  val flagFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_asof_flag"),
    new ExpressionInfo(classOf[AsOfFlag].getName, "graft_asof_flag"),
    (args: Seq[Expression]) => {
      require(args.isEmpty,
        s"graft_asof_flag takes no arguments (internal ASOF JOIN rewrite), got $args")
      AsOfFlag()
    })
}

/** Unevaluable boolean leaf marking a join condition as `ASOF` between
  * parse and lowering. Never reaches execution: [[AsOfSqlRule]] strips
  * it when it builds the [[AsOfJoin]] node, and a join it cannot lower
  * fails analysis inside the rule first. */
case class AsOfFlag() extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
}

/** Lowers a flagged, fully-resolved Join into the native [[AsOfJoin]].
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
          conjuncts(cond).exists(_.isInstanceOf[AsOfFlag]) =>
      val lset = l.outputSet
      val rset = r.outputSet
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
      // analyzer type coercion wraps mismatched attributes in Cast BEFORE
      // this rule fires, so a bare-attribute match would route real
      // key/time type mismatches to the generic "unsupported conjunct"
      // message (round-11 advice) — unwrap casts to DETECT the mismatch
      // and surface the dedicated guidance
      def underCast(e: Expression): Option[Attribute] = e match {
        case a: Attribute => Some(a)
        case c: Cast => underCast(c.child)
        case _ => None
      }
      def mismatch(kind: String, x: Expression, y: Expression): Unit =
        (underCast(x), underCast(y)) match {
          case (Some(a), Some(b)) =>
            fail(s"$kind type mismatch: ${a.name}: ${a.dataType.simpleString} vs " +
              s"${b.name}: ${b.dataType.simpleString} — cast before joining")
          case _ => ()
        }
      conjuncts(cond).foreach {
        case AsOfFlag() => ()
        case EqualTo(a: Attribute, b: Attribute) => addKey(a, b)
        case GreaterThan(a: Attribute, b: Attribute) => setTime(a, b, strict = true)
        case GreaterThanOrEqual(a: Attribute, b: Attribute) => setTime(a, b, strict = false)
        case LessThan(a: Attribute, b: Attribute) => setTime(b, a, strict = true)
        case LessThanOrEqual(a: Attribute, b: Attribute) => setTime(b, a, strict = false)
        case other =>
          other match {
            case EqualTo(x, y) => mismatch("key", x, y)
            case b: BinaryComparison => mismatch("time", b.left, b.right)
            case _ => ()
          }
          fail(s"unsupported ON conjunct ${other.sql} — " +
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
      val asof = AsOfJoin(l, r, lk.toSeq, rk.toSeq, lt, rt, strict)
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
