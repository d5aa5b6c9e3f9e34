package graft

import graft.functions.MinK
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** The bounded top-k Aggregator's algebra (scalacheck): reduce/merge vs
  * sort-take-k under arbitrary splits — the partial-buffer paths the real
  * shuffle exercises. Seeded for determinism. */
object MinKProps extends Properties("mink") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60).withInitialSeed(Seed(42L))

  private val agg = new MinK(5)

  property("reduce+merge == sort.take(k) for any inputs and split; merge commutes") =
    forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6)), Gen.chooseNum(0, 64)) {
      (xs: List[Double], cut: Int) =>
        val expect = xs.sorted.take(5)
        val (l, r) = xs.splitAt(math.min(cut, xs.length))
        val lb = l.foldLeft(agg.zero)(agg.reduce)
        val rb = r.foldLeft(agg.zero)(agg.reduce)
        agg.merge(lb, rb).toList == expect && agg.merge(rb, lb).toList == expect
    }
}

/** End-to-end and boundary behavior through the real agg path. */
class MinKSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("merge truncates at k and keeps duplicate boundary values") {
    val agg = new MinK(3)
    assert(agg.merge(Array(1.0, 2.0, 2.0), Array(2.0, 3.0, 4.0)).toList
      === List(1.0, 2.0, 2.0))
  }

  test("end-to-end: query matches a local sort over the raw column") {
    val prices = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expect = prices.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(5).toList).toMap
    val got = ops.Relational.topkValuesAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 5).map(r.getDouble).toList).toMap
    assert(got === expect)
  }
}
