package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared scanner for [[SimHash64]] — one implementation for both the
  * interpreted and generated paths, like [[ShingleScan]]. */
object SimHashScan extends Serializable {

  /** 64-bit SimHash of a token array: each token's `xxhash64` (seed 42)
    * votes +1/−1 per bit position; the result sets bit b iff the vote sum
    * is positive — bit-identical to the explode → 64 ×
    * `sum(when(shiftright(xxhash64(tok), b) & 1 = 1, 1).otherwise(-1))`
    * aggregate stack it replaces (a null token contributes the seed's
    * bits, exactly as Spark's hash expressions pass the seed through).
    * Duplicates vote once per occurrence — SimHash is frequency-weighted
    * by definition. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else {
          val t = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        }
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native one-pass SimHash: `simhash64(toks)` over `array<string>` → the
  * 64-bit frequency-weighted fingerprint.
  *
  * Why a custom expression (SURVEY §2.10, same preference order as
  * [[MinHashSig]]): the column form explodes every token into a row and
  * runs a 64-buffer conditional-sum hash aggregate — the corpus's full
  * token stream shuffles to compute what is a per-document projection.
  * This expression hashes each token once and updates 64 vote counters
  * in-place inside whole-stage codegen: no explode, no shuffle, no
  * aggregation state. An empty array yields 0L (no votes); `split` never
  * produces one in practice (empty text → [""]). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashScan.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val scan = ctx.addReferenceObj("simhashScan", SimHashScan, SimHashScan.getClass.getName)
      s"${ev.value} = $scan.simhash64($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column entry point: 64-bit SimHash of an `array<string>` column. */
  def simhash64(toks: Column): Column =
    ExprBridge.column(SimHash64(ExprBridge.expression(toks)))
}
