package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scanner for [[JsonGetLong]] — ONE implementation called by both
  * the interpreted and the generated path, so the two cannot drift.
  * Scans raw UTF-8 bytes (JSON structural chars are ASCII; multi-byte
  * sequences all have the high bit set, so byte-wise scanning is safe)
  * and never allocates a parser, token stream, or substring. */
object JsonScan extends Serializable {

  /** Value of top-level `key` as a boxed Long; null when the input is not
    * a JSON object, the key is absent (or appears only nested), the value
    * is not a bare integer (quoted, fractional, exponent, true/false/null,
    * object, array), the integer overflows a long, or the JSON is
    * malformed at or before the match point. First match wins. */
  def extractLong(json: UTF8String, key: Array[Byte]): java.lang.Long = {
    val n = json.numBytes()
    var i = skipWs(json, 0, n)
    if (i >= n || json.getByte(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(json, i, n)
      if (i >= n) return null
      if (json.getByte(i) == '}') return null // clean end, key absent
      if (!first) {
        if (json.getByte(i) != ',') return null
        i = skipWs(json, i + 1, n)
        if (i >= n) return null
      }
      first = false
      if (json.getByte(i) != '"') return null
      val keyStart = i + 1
      i = skipString(json, i, n)
      if (i < 0) return null
      val keyEnd = i - 1
      i = skipWs(json, i, n)
      if (i >= n || json.getByte(i) != ':') return null
      i = skipWs(json, i + 1, n)
      if (i >= n) return null
      if (matches(json, keyStart, keyEnd, key)) return parseLong(json, i, n)
      i = skipValue(json, i, n)
      if (i < 0) return null
    }
    null
  }

  private def skipWs(s: UTF8String, from: Int, n: Int): Int = {
    var i = from
    while (i < n && { val b = s.getByte(i); b == ' ' || b == '\t' || b == '\n' || b == '\r' }) i += 1
    i
  }

  /** `from` sits on the opening quote; returns the index just after the
    * closing quote, or -1 if unterminated. Backslash escapes skipped. */
  private def skipString(s: UTF8String, from: Int, n: Int): Int = {
    var i = from + 1
    while (i < n) {
      val b = s.getByte(i)
      if (b == '\\') i += 2
      else if (b == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** `from` sits on the first byte of a value at object depth 1; returns
    * the index of the byte after the value, or -1 on malformed input. */
  private def skipValue(s: UTF8String, from: Int, n: Int): Int = {
    val b = s.getByte(from)
    if (b == '"') skipString(s, from, n)
    else if (b == '{' || b == '[') {
      var depth = 1
      var i = from + 1
      while (i < n && depth > 0) {
        val c = s.getByte(i)
        if (c == '"') {
          i = skipString(s, i, n)
          if (i < 0) return -1
        } else {
          if (c == '{' || c == '[') depth += 1
          else if (c == '}' || c == ']') depth -= 1
          i += 1
        }
      }
      if (depth == 0) i else -1
    } else {
      // bare scalar: runs to the next member/object delimiter
      var i = from
      while (i < n && { val c = s.getByte(i); c != ',' && c != '}' }) i += 1
      i
    }
  }

  private def matches(s: UTF8String, start: Int, end: Int, key: Array[Byte]): Boolean = {
    if (end - start != key.length) return false
    var i = 0
    while (i < key.length) {
      if (s.getByte(start + i) != key(i)) return false
      i += 1
    }
    true
  }

  /** Bare-integer parse with overflow rejection; trailing content after
    * the digits must be a valid value terminator. */
  private def parseLong(s: UTF8String, from: Int, n: Int): java.lang.Long = {
    var i = from
    var neg = false
    if (i < n && s.getByte(i) == '-') { neg = true; i += 1 }
    if (i >= n || s.getByte(i) < '0' || s.getByte(i) > '9') return null
    // accumulate NEGATIVE, JDK Long.parseLong-style: the magnitude bound
    // is asymmetric (|Long.MinValue| = Long.MaxValue + 1), and the old
    // positive accumulator rejected exactly -9223372036854775808 while
    // DuckDB's json_type/TRY_CAST accepts it — a one-value cross-engine
    // divergence on the oracle's int64 boundary
    val limit = if (neg) Long.MinValue else -Long.MaxValue
    val multmin = limit / 10
    var v = 0L
    while (i < n && s.getByte(i) >= '0' && s.getByte(i) <= '9') {
      val d = s.getByte(i) - '0'
      if (v < multmin) return null  // v*10 would overflow
      v *= 10
      if (v < limit + d) return null // v - d would overflow
      v -= d
      i += 1
    }
    // fractions/exponents/garbage are not integers; a valid value ends at
    // ws, ',' or '}' (depth 1)
    val j = skipWs(s, i, n)
    if (j < n && { val b = s.getByte(j); b != ',' && b != '}' }) return null
    java.lang.Long.valueOf(if (neg) v else -v)
  }
}

/** Native top-level JSON integer extraction:
  * `json_get_long(props, 'k')` ≡ `get_json_object(props, '$.k')` for bare
  * integer values, restricted to depth-1 keys without escape sequences.
  *
  * Why a custom expression (SURVEY §2.10, same preference order as
  * [[MinHashSig]]/[[DotProduct]]): `GetJsonObject` is a CodegenFallback —
  * one appearance knocks the ENTIRE enclosing stage out of whole-stage
  * codegen and pays a Jackson parser per row, which is exactly where the
  * telemetry-props hot path (`{"k": 76}`-shaped, millions of rows per
  * partition) spends its CPU. This expression scans the bytes once inside
  * whole-stage codegen, allocating nothing.
  *
  * Contract divergences from get_json_object, all deliberate and tested:
  * quoted numbers ({"k":"76"}), floats, and booleans yield NULL (the
  * typed contract is "bare integer or nothing"); keys written with JSON
  * escape sequences are not matched. Use `get_json_object` when the
  * documents are not flat telemetry. */
case class JsonGetLong(child: Expression, key: String) extends UnaryExpression {

  require(key.nonEmpty, "json_get_long: empty key")

  override def dataType: DataType = LongType
  override def prettyName: String = "json_get_long"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"json_get_long expects string, got $t")
  }

  private lazy val keyBytes: Array[Byte] =
    key.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    JsonScan.extractLong(input.asInstanceOf[UTF8String], keyBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, json => {
      // the scanner object and key bytes ride along as references; the
      // call stays inside whole-stage codegen (no CodegenFallback)
      val scan = ctx.addReferenceObj("jsonScan", JsonScan, JsonScan.getClass.getName)
      val kb = ctx.addReferenceObj("jsonKey", keyBytes, "byte[]")
      val r = ctx.freshName("jl")
      s"""
         |java.lang.Long $r = $scan.extractLong($json, $kb);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonGetLong {
  /** Column entry point: top-level `key` of a JSON string column as long. */
  def jsonGetLong(json: Column, key: String): Column =
    ExprBridge.column(JsonGetLong(ExprBridge.expression(json), key))
}
