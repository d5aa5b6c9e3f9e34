package graft

import graft.ops.Text
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** ScalaCheck property (SURVEY §5.3): the 32-hash MinHash signature
  * agreement estimates true Jaccard within 4σ (σ = √(J(1−J)/32) ≤ 0.09).
  * Seeded for determinism; each evaluation runs a real Spark job. */
object MinhashProps extends Properties("minhash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withInitialSeed(Seed(42L))

  private val genSets: Gen[(Set[String], Set[String])] = for {
    shared <- Gen.choose(0, 60)
    onlyA <- Gen.choose(1, 40)
    onlyB <- Gen.choose(1, 40)
  } yield (
    (0 until shared).map(i => s"s$i").toSet ++ (0 until onlyA).map(i => s"a$i"),
    (0 until shared).map(i => s"s$i").toSet ++ (0 until onlyB).map(i => s"b$i"))

  property("signature agreement ≈ Jaccard") = forAll(genSets) { case (a, b) =>
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, a.toSeq), (2L, b.toSeq)).toDF("doc_id", "toks")
    val sig = Text.minhashSignatures(df).collect()
      .map(r => r.getLong(0) -> (1 to 32).map(r.getLong)).toMap
    val est = sig(1L).zip(sig(2L)).count { case (x, y) => x == y } / 32.0
    val trueJ = a.intersect(b).size.toDouble / a.union(b).size
    math.abs(est - trueJ) <= 0.36
  }
}
