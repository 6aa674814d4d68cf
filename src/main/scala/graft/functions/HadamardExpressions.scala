package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fast Walsh–Hadamard transform of an array<double> whose length is a
  * power of two: returns H·x for the natural-ordered Hadamard matrix
  * h(i,j) = (−1)^popcount(i∧j) — the OPQ-style fixed rotation v33
  * quantizes in. The in-place butterfly is n·log n adds/subtracts
  * (64 dims: 384 ops) versus the n² = 4096-term expression tree the
  * SQL higher-order-function formulation builds — which is ALSO what
  * blew whole-stage codegen past the 64 KB method limit and forced the
  * interpreted fallback on the artifact build. Sums of grid integers
  * stay exactly representable in doubles (≪ 2^53), so the butterfly's
  * result is bit-identical to the naive matrix product, and the DuckDB
  * oracle keeps the naive formulation — the spec pins the equivalence.
  * Null ELEMENTS are rejected at runtime with a diagnosable error:
  * `toDoubleArray()` on UnsafeArrayData ignores the null bits, so
  * without the check a null element would silently read as 0.0 and
  * produce a wrong transform (the type can't carry the guarantee —
  * Spark types most array columns containsNull = true even when no
  * null ever occurs, so rejecting nullable element TYPES would break
  * legitimate callers). */
case class Fwht(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "fwht"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fwht expects array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    Fwht.checkNoNullElements(in)
    val a = in.toDoubleArray()
    val n = a.length
    Fwht.checkPow2(n)
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        val end = i + h
        while (j < end) {
          val x = a(j); val y = a(j + h)
          a(j) = x + y; a(j + h) = x - y
          j += 1
        }
        i += (h << 1)
      }
      h <<= 1
    }
    new GenericArrayData(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val a = ctx.freshName("a")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |graft.functions.Fwht.checkNoNullElements($in);
         |double[] $a = $in.toDoubleArray();
         |int $n = $a.length;
         |graft.functions.Fwht.checkPow2($n);
         |for (int $h = 1; $h < $n; $h <<= 1)
         |  for (int $i = 0; $i < $n; $i += $h << 1)
         |    for (int $j = $i; $j < $i + $h; $j++) {
         |      double $x = $a[$j]; double $y = $a[$j + $h];
         |      $a[$j] = $x + $y; $a[$j + $h] = $x - $y;
         |    }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fwht =
    copy(child = newChild)
}

object Fwht {
  /** Shared by the interpreted and codegen paths (called from generated
    * Java, hence the plain static-style method): a non-power-of-two
    * length would die mid-butterfly with a raw AIOOBE at a(j+h) instead
    * of a diagnosable error. n = 0 is legal — the loop never runs and
    * the empty array passes through unchanged. */
  def checkPow2(n: Int): Unit =
    if ((n & (n - 1)) != 0)
      throw new IllegalArgumentException(
        s"fwht requires a power-of-two array length, got $n")

  /** Shared by both eval paths (called from generated Java too):
    * UnsafeArrayData.toDoubleArray ignores null bits, so a null element
    * would otherwise silently read as 0.0 and corrupt the transform
    * (and the interpreted GenericArrayData path would NPE unhelpfully).
    * Fail with a diagnosable error instead. */
  def checkNoNullElements(a: ArrayData): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"fwht does not support null array elements (null at index $i)")
      i += 1
    }
  }
}

object HadamardExpressions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionRegistrar.registerIfAbsent(spark, "fwht", buildFwht)

  /** Column API for Fwht (requires register(spark) once). */
  def fwht(a: Column): Column =
    org.apache.spark.sql.functions.call_function("fwht", a)

  def buildFwht(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"fwht expects 1 argument, got ${exprs.length}")
    Fwht(exprs.head)
  }
}
