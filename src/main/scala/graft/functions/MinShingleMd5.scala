package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scanner for [[MinShingleMd5]] — one implementation for both the
  * interpreted and generated paths. A MessageDigest is not thread-safe
  * and tasks share the expression's reference objects, so each executor
  * thread keeps its own instance. */
object ShingleScan extends Serializable {

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** Minimum MD5 over all `width`-CHAR shingles of `text`, as lowercase
    * hex — bit-identical to
    * `array_min(transform(sequence(1, greatest(length(text)-width+1, 1)),
    *            i -> md5(substring(text, i, width))))`:
    * windows step by character (substring semantics), each window hashes
    * its UTF-8 bytes, and unsigned byte-order comparison of digests is
    * exactly lexicographic order of their lowercase-hex strings (hex
    * digits ascend in ASCII), so only the winning digest is ever
    * hex-encoded. Texts shorter than `width` hash the whole text once,
    * matching substring's past-end clamp. */
  def minShingleMd5(text: UTF8String, width: Int): UTF8String = {
    val b = text.getBytes
    val n = b.length
    val digest = md5.get()
    var min: Array[Byte] = null
    // end0 = byte offset after the first window's `width` chars
    var end = 0
    var chars = 0
    while (end < n && chars < width) {
      end += UTF8String.numBytesForFirstByte(b(end))
      chars += 1
    }
    var start = 0
    var done = false
    while (!done) {
      digest.reset()
      digest.update(b, start, end - start)
      val d = digest.digest()
      if (min == null || unsignedLess(d, min)) min = d
      if (end >= n) done = true
      else {
        start += UTF8String.numBytesForFirstByte(b(start))
        end += UTF8String.numBytesForFirstByte(b(end))
      }
    }
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((min(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(min(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** Native winnowing fingerprint: `min_shingle_md5(text, w)` ≡
  * `array_min(transform(sequence(1, greatest(length(text)-w+1, 1)),
  *            i -> md5(substring(text, i, w))))`.
  *
  * Why a custom expression (SURVEY §2.10, same preference order as
  * [[MinHashSig]]): the column form is an interpreted `transform` lambda
  * (higher-order functions are CodegenFallback) that materializes a
  * sequence array AND an array of 32-char md5 strings per row — for a
  * 4 KB document that is ~4 000 intermediate UTF8Strings — before
  * `array_min` scans them. This expression slides one two-cursor window
  * over the UTF-8 bytes, keeps the minimum 16-byte digest, and encodes
  * hex once per ROW, inside whole-stage codegen. */
case class MinShingleMd5(child: Expression, width: Int) extends UnaryExpression {

  require(width > 0, s"min_shingle_md5: width must be positive: $width")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_shingle_md5 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleScan.minShingleMd5(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val scan = ctx.addReferenceObj("shingleScan", ShingleScan, ShingleScan.getClass.getName)
      s"${ev.value} = $scan.minShingleMd5($text, $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleMd5 {
  /** Column entry point: min MD5 over `width`-char shingles of `text`. */
  def minShingleMd5(text: Column, width: Int): Column =
    ExprBridge.column(MinShingleMd5(ExprBridge.expression(text), width))
}
