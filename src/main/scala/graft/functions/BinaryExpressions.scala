package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Whole-stage-codegen'd nibble histogram over a binary column: one pass
  * over the payload bytes → `array<long>` of 16 counts (high and low
  * nibble of every byte). The expression behind m08's entropy signal.
  *
  * Why a custom Expression (SURVEY-brief preference (b)): the built-in
  * restatement is 16 `length(regexp_replace(hex(content), ...))` passes
  * — 16 regex traversals of a 2n-char string per row plus the hex
  * materialization itself. This compiles to a single tight byte loop
  * with two array increments per byte inside WholeStageCodegen; the
  * DuckDB oracle keeps the length-replace restatement, which is exactly
  * the cross-engine check that the fused loop counts the same nibbles.
  */
case class NibbleCounts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nibble_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nibble_counts expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      counts(b >> 4) += 1L
      counts(b & 0xf) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |long[] $counts = new long[16];
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  int $b = $bytes[$i] & 0xff;
         |  $counts[$b >> 4] += 1L;
         |  $counts[$b & 0xf] += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NibbleCounts =
    copy(child = newChild)
}

object BinaryExpressions {

  /** The ONE builder both registries share (temp-function + extension
    * injection), so name/arity/semantics can never drift. */
  def buildNibbleCounts(exprs: Seq[Expression]): NibbleCounts = {
    require(exprs.length == 1,
      s"nibble_counts expects 1 argument (binary), got ${exprs.length}")
    NibbleCounts(exprs.head)
  }

  /** Register `nibble_counts` in the session registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionRegistrar.registerIfAbsent(spark, "nibble_counts", buildNibbleCounts)

  /** Column API (requires register(spark) once). */
  def nibble_counts(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nibble_counts", c)
}
