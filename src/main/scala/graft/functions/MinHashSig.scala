package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass MinHash signature over a token array: element i of the
  * result is `min over tokens t of XXH64(t, seed_i)` with
  * `seed_i = XXH64(i, 42)` — bit-identical to the
  * `array_min(transform(toks, t => xxhash64(lit(i), t)))` column stack it
  * replaces (Spark's `xxhash64(a, b)` chains child hashes, and min over
  * duplicates equals min over the distinct set, so the old
  * `array_distinct` was semantically redundant too).
  *
  * Why a custom expression (SURVEY §2.10): the column form is 32
  * CodegenFallback `transform` lambdas — 32 interpreted array traversals
  * per row, each allocating an intermediate array — where this is ONE
  * traversal hashing each token `numHashes` times inside whole-stage
  * codegen, no intermediates. Same preference order as
  * [[DotProduct]]: built-ins compose the semantics but fall out of
  * codegen exactly where the CPU goes.
  *
  * Null contract: a null token array yields NULL (UnaryExpression
  * null-intolerance); a null TOKEN contributes `seed_i` itself, exactly
  * like the old form (Spark hash expressions skip null children, passing
  * the seed through). Token arrays are never empty in practice
  * (`split` returns [""] for empty text); an empty array yields NULL
  * rather than 32 MAX_VALUE sentinels. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, s"minhash_sig: numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got $t")
  }

  /** seed_i = XXH64(i, 42): the chained-hash prefix of xxhash64(lit(i), t). */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < numHashes) { if (seeds(i) < mins(i)) mins(i) = seeds(i); i += 1 }
      } else {
        val t = arr.getUTF8String(j)
        val (base, off, len) = (t.getBaseObject, t.getBaseOffset, t.numBytes)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUnsafeBytes(base, off, len, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      // XXH64 is a Java class of statics — the same name Spark's own
      // hash-expression codegen emits
      val xxh = classOf[XXH64].getName
      val (n, j, i, mins, t, base, off, len, h) =
        (ctx.freshName("n"), ctx.freshName("j"), ctx.freshName("i"),
          ctx.freshName("mins"), ctx.freshName("t"), ctx.freshName("base"),
          ctx.freshName("off"), ctx.freshName("len"), ctx.freshName("h"))
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) {
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        if ($seedsRef[$i] < $mins[$i]) $mins[$i] = $seedsRef[$i];
         |      }
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($j);
         |      final Object $base = $t.getBaseObject();
         |      final long $off = $t.getBaseOffset();
         |      final int $len = $t.numBytes();
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        final long $h = $xxh.hashUnsafeBytes($base, $off, $len, $seedsRef[$i]);
         |        if ($h < $mins[$i]) $mins[$i] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column entry point:
    * `minhash(toks, n)` over an `array<string>` column → `array<long>`. */
  def minhash(toks: Column, numHashes: Int): Column =
    ExprBridge.column(MinHashSig(ExprBridge.expression(toks), numHashes))
}
