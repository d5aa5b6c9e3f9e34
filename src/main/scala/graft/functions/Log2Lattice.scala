package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, DecimalType, LongType, StructField, StructType}

/** Shared evaluator for [[Log2MicroLattice]] — one implementation for the
  * interpreted and generated paths (the house EntropyScan discipline).
  *
  * This is the SAME integer log₂ scheme `graft.ops.Text`'s
  * jsDivergence family documents and its DuckDB oracle twin unrolls in
  * SQL (SparkEntry.jsCtesThroughM6), computed imperatively: the greedy
  * exponent search over [[graft.ops.Text.JsLog2Steps]], the 1/1000
  * mantissa-grid quantization (one truncating division), the
  * [[graft.ops.Text.JsLog2TableNano]] lattice lookup with half-away
  * linear interpolation, and the nano→micro half-away fold. Every
  * operation is exact BigInteger arithmetic on DECIMAL(38,0) inputs —
  * bit-identical to the Column spelling it replaced (TextSpec's
  * independent BigInt fold pins every stage, and the cross-engine
  * sweep compares the DuckDB CTE chain at seven corpora). */
object Log2Scan extends Serializable {
  private val K1000 = BigInteger.valueOf(1000)

  /** (l6µ, grid index i, exponent shift s) of log₂(num/den) for
    * positive integral num, den with num/den ∈ (0, 2]. */
  def eval(numD: org.apache.spark.sql.types.Decimal,
           denD: org.apache.spark.sql.types.Decimal): InternalRow = {
    val num = numD.toJavaBigDecimal.toBigIntegerExact
    val den = denD.toJavaBigDecimal.toBigIntegerExact
    var k = 0L
    var m = BigInteger.ONE
    val steps = graft.ops.Text.JsLog2Steps
    var si = 0
    while (si < steps.length) {
      val st = steps(si)
      if (num.multiply(m).shiftLeft(st).compareTo(den) <= 0) {
        m = m.shiftLeft(st); k += st
      }
      si += 1
    }
    val geq = num.compareTo(den) >= 0
    val shift = if (geq) 0L else k + 1
    val mm = if (geq) BigInteger.ONE else m.shiftLeft(1)
    val u = num.multiply(mm).multiply(K1000)
    val i = u.divide(den).longValueExact
    val tbl = graft.ops.Text.JsLog2TableNano
    val t0 = tbl((i - 1000).toInt)
    val t1 = tbl((i - 999).toInt)
    // nano = t0 + halfAway(rem·(t1−t0), den): rem = u − i·den ≥ 0 and
    // the lattice is non-decreasing, so the numerator is nonnegative
    // and halfAway is (2·x + den) div (2·den) — truncating division on
    // positive operands, the ratioScaled twin
    val rem = u.subtract(den.multiply(BigInteger.valueOf(i)))
    val x = rem.multiply(BigInteger.valueOf(t1 - t0))
    val interp =
      x.shiftLeft(1).add(den).divide(den.shiftLeft(1)).longValueExact
    val lpn = t0 + interp - shift * 1000000000L
    // micro fold: sign·((2·|lpn| + 1000) div 2000)
    val mag = (2L * math.abs(lpn) + 1000L) / 2000L
    val l6u = if (lpn >= 0) mag else -mag
    new GenericInternalRow(Array[Any](l6u, i, shift))
  }
}

/** Native integer-lattice log₂: `log2_micro_lattice(num, den)` →
  * `struct<l6u: bigint, i: bigint, s: bigint>` — micro-units of
  * log₂(num/den), the mantissa-grid index and the exponent shift.
  *
  * Exists for PLANNING cost, not arithmetic (round-20 Probe
  * decomposition of text_js_divergence): the unrolled Column spelling
  * of this chain needed ~20 eager analysis passes per prefix, and at
  * ~15 ms of fixed analyzer cost per pass the op's warm bench time was
  * 0.74 s of pure driver-side planning over a 0.16 s execution floor.
  * As ONE expression node the whole chain plans in a single pass and
  * evaluates inside whole-stage codegen (a static call on the shared
  * [[Log2Scan]]), with the interpreted path shared verbatim. */
case class Log2MicroLattice(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("l6u", LongType, nullable = false),
    StructField("i", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))
  override def prettyName: String = "log2_micro_lattice"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DecimalType(), DecimalType()) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"log2_micro_lattice expects (decimal, decimal), got ($a, $b)")
    }

  override def nullSafeEval(num: Any, den: Any): Any =
    Log2Scan.eval(num.asInstanceOf[org.apache.spark.sql.types.Decimal],
      den.asInstanceOf[org.apache.spark.sql.types.Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (num, den) => {
      val scan = ctx.addReferenceObj("log2Scan", Log2Scan, Log2Scan.getClass.getName)
      s"${ev.value} = $scan.eval($num, $den);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Log2MicroLattice {
  /** Column entry point. */
  def log2MicroLattice(num: Column, den: Column): Column =
    ExprBridge.column(Log2MicroLattice(
      ExprBridge.expression(num), ExprBridge.expression(den)))
}
