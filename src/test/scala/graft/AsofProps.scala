package graft

import graft.ops.Asof
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** ScalaCheck property: on random timelines, asofJoin agrees with a
  * driver-side reference (latest right row at-or-before, per key).
  * Seeded for determinism; each evaluation runs a real Spark job. */
object AsofProps extends Properties("asof") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withInitialSeed(Seed(7L))

  private val genTimeline: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Double)])] = for {
    nLeft <- Gen.choose(1, 25)
    nRight <- Gen.choose(0, 15)
    keys <- Gen.listOfN(nLeft, Gen.choose(1L, 4L))
    times <- Gen.listOfN(nLeft, Gen.choose(0L, 100L))
    rKeys <- Gen.listOfN(nRight, Gen.choose(1L, 4L))
    rTimes <- Gen.listOfN(nRight, Gen.choose(0L, 100L))
  } yield (
    keys.zip(times),
    // dedupe right to one row per (key, time) — the documented contract
    rKeys.zip(rTimes).distinct.map { case (k, t) => (k, t, k * 1000.0 + t) })

  property("matches the driver-side reference") = forAll(genTimeline) {
    case (lefts, rights) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val left = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rights.toDF("k", "rt", "rv")
      // output column order: k, lid, t, rt, rv
      val got = Asof.asofJoin(left, right, "k", "t", "rt").collect()
        .map(r => r.getLong(1) -> (Option(r.get(3)), Option(r.get(4)))).toMap
      lefts.zipWithIndex.forall { case ((k, t), i) =>
        val expect = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        got(i.toLong) == ((expect.map(_._2), expect.map(_._3)))
      }
  }
}
