package graft

import graft.ops.Selection
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** ScalaCheck property: on random value distributions — duplicates,
  * constants, mixed magnitudes, negatives — valueAtRanks agrees with a
  * driver-side sort for every in-range rank. This machinery underpins
  * quantile_summary, the percentile_disc plan family and the round-11
  * ntile selection form, so randomized assurance here covers all three.
  * Seeded for determinism; each evaluation runs real Spark jobs. */
object SelectionProps extends Properties("selection") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withInitialSeed(Seed(11L))

  private val genGroups: Gen[Map[String, List[Double]]] = for {
    nGroups <- Gen.choose(1, 3)
    groups <- Gen.sequence[List[(String, List[Double])], (String, List[Double])](
      (1 to nGroups).map { g =>
        for {
          n <- Gen.choose(1, 60)
          // duplicate-heavy small ints scaled by a per-group magnitude
          mag <- Gen.oneOf(1e-3, 1.0, 1e6)
          vs <- Gen.listOfN(n, Gen.choose(-10, 10).map(_ * mag))
        } yield (s"g$g", vs)
      }.toList)
  } yield groups.toMap

  property("matches a driver-side sort at random ranks") = forAll(genGroups) {
    groups =>
      val spark = TestSpark.spark
      import spark.implicits._
      val base = groups.toSeq.flatMap { case (g, vs) => vs.map((g, _)) }
        .toDF("g", "v")
      val ranks = groups.toSeq.flatMap { case (g, vs) =>
        // probe first, last, middle and an arbitrary interior rank
        val n = vs.length.toLong
        Seq(1L, n, (n + 1) / 2, math.min(n, 3L)).distinct.map((g, _))
      }.toDF("g", "rank")
      val got = Selection.valueAtRanks(base, Seq("g"), "v", ranks).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      groups.forall { case (g, vs) =>
        val sorted = vs.sorted
        val n = vs.length.toLong
        Seq(1L, n, (n + 1) / 2, math.min(n, 3L)).distinct.forall { k =>
          got.get((g, k)).contains(sorted((k - 1).toInt))
        }
      }
  }
}
