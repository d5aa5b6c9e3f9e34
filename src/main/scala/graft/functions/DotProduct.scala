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
  * unchanged.
  *
  * Null contract (matches the `aggregate(zip_with(...))` form this
  * replaced): a null array, arrays of different lengths, or a null
  * element all yield NULL — never a silently-truncated partial sum. An
  * upstream dimensionality bug must surface as a visible null, not a
  * plausible wrong similarity (round-2 review finding). The per-element
  * null check is only generated when an input's `containsNull` says it
  * can fire, so trusted pipelines pay nothing for it.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Nullable even when both children are non-null: a length mismatch or
    * a null element produces null regardless of input nullability. */
  override def nullable: Boolean = true

  // manual check (ExpectsInputTypes is private[sql]): both sides must be
  // array<double>; callers cast, there is no implicit coercion here
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got ($l, $r)")
    }

  /** Whether either input can legally hold null elements; parquet array
    * columns say true, literals (the LSH hyperplanes) say false. Lazy val,
    * not def: the interpreted path reads it per row (round-4 advice). */
  private lazy val elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nullElementGuard = if (elementsNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${ev.isNull} = true;
           |    ${ev.value} = 0.0;
           |    break;
           |  }""".stripMargin
      else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElementGuard
         |    ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |  }
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
