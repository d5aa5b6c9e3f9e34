package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two double arrays, with `doGenCode` —
  * the one place (SURVEY §2.10) where a custom expression beats every
  * built-in alternative: `zip_with`/`aggregate` are CodegenFallback
  * (interpreted, ~3× slower at millions of pairs — round-1 bench), and a
  * literal `element_at` unroll fixes the dimensionality at plan time and
  * overflows janino's nesting depth when several chains share a codegen
  * method (round-2 ERROR CodeGenerator). The generated loop is tiny,
  * dimension-agnostic, and stays inside whole-stage codegen.
  *
  * Accumulation is sequential left-to-right from 0.0 — bit-identical to
  * the `aggregate(zip_with(...))` fold it replaces, so oracle hashes are
  * unchanged. Array elements are assumed non-null (embedding columns);
  * a null array yields null via the standard null-safe contract.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // manual check (ExpectsInputTypes is private[sql]): both sides must be
  // array<double>; callers cast, there is no implicit coercion here
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: `dot(a, b)` over `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    ExprBridge.column(
      DotProduct(ExprBridge.expression(a), ExprBridge.expression(b)))
}
