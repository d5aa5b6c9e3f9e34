package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** ScalaCheck property for the recon row checksum's injection-safety
  * claim (Recon.rowChecksum scaladoc): two rows collide iff their value
  * tuples are equal. The generator deliberately draws from the attack
  * alphabet — the '|' delimiter, the ':' length separator, the literal
  * "~null~" marker, empty strings, and real nulls — the exact shapes
  * that forge collisions in a naive concat_ws hash. Seeded, real Spark
  * evaluation per case. */
object ChecksumProps extends Properties("rowChecksum") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30).withInitialSeed(Seed(7L))

  private val genVal: Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None),
    2 -> Gen.const(Some("~null~")),
    2 -> Gen.const(Some("")),
    6 -> Gen.listOf(Gen.oneOf('a', 'b', '|', ':', '1')).map(l => Some(l.mkString)))

  private val genRow: Gen[(Option[String], Option[String], Option[String])] =
    for (a <- genVal; b <- genVal; c <- genVal) yield (a, b, c)

  property("checksums collide iff value tuples are equal") =
    forAll(genRow, genRow) { (a, b) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val hs = Seq(a, b).toDF("c1", "c2", "c3")
        .select(graft.ops.Recon.rowChecksum(Seq("c1", "c2", "c3")).as("h"))
        .collect().map(_.getString(0))
      (hs(0) == hs(1)) == (a == b)
    }
}
