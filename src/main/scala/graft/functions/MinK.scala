package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded smallest-k typed `Aggregator` — the §2.10 UDAF surface.
  *
  * Top-k-per-group via `row_number().over(window)` sorts EVERY group
  * member under the partition sort: at 100 TB the shuffle carries the
  * full row stream and the sort pays n log n per group for an answer of
  * size k. This aggregator keeps the answer-sized state instead — a
  * sorted ≤k-element array per group — so the map side combines down to
  * k values per group per task BEFORE the exchange, and the merge is an
  * O(k) two-pointer union. The trade against [[graft.ops.Relational
  * .windowTopkPerGroup]]: the window form carries whole rows (and ranks
  * them); this form aggregates bare values — use it when the k extreme
  * VALUES are the question, the window when the k extreme ROWS are.
  *
  * Determinism: the result is the sorted smallest-k multiset of the
  * group's values — a pure function of the data, independent of
  * partitioning and arrival order (ties beyond the k boundary drop
  * identically whichever duplicate arrived first). Both reduce and merge
  * preserve the sorted invariant, so finish is the identity.
  */
class MinK(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0, s"MinK: k must be positive: $k")

  override def zero: Array[Double] = Array.emptyDoubleArray

  /** Sorted-insert one value, dropping the largest element past k.
    * O(k) array copy per kept row; rows above the current k-th minimum
    * (the common case on sorted-ish or heavy groups) return the buffer
    * unchanged without allocating. */
  override def reduce(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length == k && v >= buf(k - 1)) return buf
    val pos = {
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo
    }
    val n = math.min(buf.length + 1, k)
    val out = new Array[Double](n)
    System.arraycopy(buf, 0, out, 0, pos)
    out(pos) = v
    System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
    out
  }

  /** Two-pointer merge of two sorted buffers, truncated at k. */
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val n = math.min(a.length + b.length, k)
    val out = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      if (j >= b.length || (i < a.length && a(i) <= b(j))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] = MinK.arrayEnc
  override def outputEncoder: Encoder[Array[Double]] = MinK.arrayEnc
}

object MinK {
  /** Catalyst-native Array[Double] encoder (UnsafeArrayData in the agg
    * buffer — no object serialization on the hot path). */
  private[functions] val arrayEnc: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
