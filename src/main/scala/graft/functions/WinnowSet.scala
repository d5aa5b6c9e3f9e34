package graft.functions

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scanner for [[WinnowSet]] — the winnowing (MOSS) fingerprint
  * SET: the distinct minima of md5 over every `window`-shingle sliding
  * window of `width`-char shingles. Where [[ShingleScan.minShingleMd5]]
  * keeps ONE global minimum (a 1-value sketch good for identical-doc
  * detection), winnowing keeps one minimum PER WINDOW, which guarantees
  * any shared substring of ≥ width+window−1 chars contributes at least
  * one SHARED fingerprint — the published property that makes
  * substring-level overlap detectable from the set intersection. */
object WinnowScan extends Serializable {

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".getBytes

  private object UnsignedBytes extends Ordering[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val x = a(i) & 0xff
        val y = b(i) & 0xff
        if (x != y) return x - y
        i += 1
      }
      0
    }
  }

  /** Distinct per-window md5 minima, sorted ascending, as lowercase-hex
    * strings. Shingle walk and clamp semantics are byte-identical to
    * [[ShingleScan.minShingleMd5]] (texts shorter than `width` hash once;
    * fewer than `window` shingles yield one window over all of them),
    * and digest comparison is unsigned byte order ≡ lexicographic order
    * of the hex strings — so the SQL twin (`min(h) OVER (ROWS BETWEEN
    * CURRENT ROW AND window−1 FOLLOWING)` over the shingle stream, full
    * windows only, then DISTINCT) reproduces the set exactly. */
  def winnowSet(text: UTF8String, width: Int, window: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    val digest = md5.get()
    val digs = mutable.ArrayBuffer.empty[Array[Byte]]
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
      digs += digest.digest()
      if (end >= n) done = true
      else {
        start += UTF8String.numBytesForFirstByte(b(start))
        end += UTF8String.numBytesForFirstByte(b(end))
      }
    }
    val m = digs.length
    val nwin = math.max(m - window + 1, 1)
    val mins = mutable.TreeSet.empty[Array[Byte]](UnsignedBytes)
    var p = 0
    while (p < nwin) {
      var mn = digs(p)
      val lim = math.min(p + window, m)
      var j = p + 1
      while (j < lim) {
        if (UnsignedBytes.compare(digs(j), mn) < 0) mn = digs(j)
        j += 1
      }
      mins += mn
      p += 1
    }
    val out = new Array[AnyRef](mins.size)
    var i = 0
    mins.foreach { d =>
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexDigits((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = hexDigits(d(k) & 0xf)
        k += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native winnowing fingerprint set: `winnow_set(text, width, window)` —
  * the distinct per-window minima of md5 over `width`-char shingles,
  * `window` shingles per window (SURVEY §2.10 preference order: the
  * column spelling is an interpreted higher-order-function stack that
  * materializes a per-position `list_slice` — measured 45× slower in the
  * DuckDB twin and CodegenFallback in Spark; this expression computes the
  * digests once and scans windows over the digest buffer in one pass
  * inside whole-stage codegen). */
case class WinnowSet(child: Expression, width: Int, window: Int)
    extends UnaryExpression {

  require(width > 0, s"winnow_set: width must be positive: $width")
  require(window > 0, s"winnow_set: window must be positive: $window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_set"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_set expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowScan.winnowSet(input.asInstanceOf[UTF8String], width, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val scan = ctx.addReferenceObj("winnowScan", WinnowScan, WinnowScan.getClass.getName)
      s"${ev.value} = $scan.winnowSet($text, $width, $window);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSet {
  /** Column entry point: distinct winnowing fingerprints of `text`. */
  def winnowSet(text: Column, width: Int, window: Int): Column =
    ExprBridge.column(WinnowSet(ExprBridge.expression(text), width, window))
}
