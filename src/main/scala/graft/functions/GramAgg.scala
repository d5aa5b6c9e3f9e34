package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram-matrix accumulator over an integer-quantized vector
  * column — the typed-`Aggregator` scale path for
  * [[graft.ops.Vectors.dimCorrelation]] (the MinK §2.10 precedent).
  *
  * The inline row fan-out it replaces emitted d(d−1)/2 pair structs PER
  * ROW into a d²-keyed hash aggregate — scale-safe (the shuffle was
  * pairs-sized) but constant-heavy: ~2 000 aggregate-map probes per row
  * at d = 64. This aggregator keeps the WHOLE upper-triangle Gram state
  * in one flat long array per task — `[d, n, s₁..s_d, G₁₁, G₁₂, …,
  * G_dd]` (row-major upper triangle including the diagonal) — so the
  * per-row cost is a tight multiply-add loop inside the partial
  * aggregate and only ~(d²/2 + d + 2) longs per TASK ever shuffle.
  *
  * Exactness: inputs are 6-dp micro-unit longs, every accumulation is
  * `Math.addExact` — a sum that would leave the long range FAILS LOUD
  * (ArithmeticException) instead of wrapping. Envelope: |Σ vᵢvⱼ| <
  * 2⁶³ holds to ~10⁶ unit-norm vectors per aggregation at micro
  * quantization (|v| ≲ 10⁶ ⇒ |vᵢvⱼ| ≲ 10¹²); past that, shard the
  * aggregation (e.g. by a vector-id bucket) and merge the shards in
  * DECIMAL(38,0) — the overflow throw names this remedy.
  *
  * Determinism: addition of exact longs is associative and commutative,
  * so partial-aggregation order cannot move any statistic — the same
  * argument as the cents rule. Vectors of differing lengths fail loud
  * (a ragged embedding column is a data defect, not a state shape). */
class GramAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf0: Array[Long], v: Array[Long]): Array[Long] = {
    val d = v.length
    val buf =
      if (buf0.nonEmpty) buf0
      else {
        val b = new Array[Long](2 + d + d * (d + 1) / 2)
        b(0) = d
        b
      }
    require(buf(0) == d,
      s"GramAgg: ragged embedding column (dim ${buf(0)} vs $d)")
    buf(1) = Math.addExact(buf(1), 1L)
    var i = 0
    var g = 2 + d
    while (i < d) {
      val vi = v(i)
      buf(2 + i) = Math.addExact(buf(2 + i), vi)
      var j = i
      while (j < d) {
        buf(g) = Math.addExact(buf(g), Math.multiplyExact(vi, v(j)))
        g += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a(0) == b(0),
      s"GramAgg: ragged embedding column (dim ${a(0)} vs ${b(0)})")
    var i = 1
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = GramAgg.arrayEnc
  override def outputEncoder: Encoder[Array[Long]] = GramAgg.arrayEnc
}

object GramAgg {
  /** Catalyst-native Array[Long] encoder (primitive UnsafeArrayData in
    * the agg buffer — no object serialization on the hot path). */
  private[functions] val arrayEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
