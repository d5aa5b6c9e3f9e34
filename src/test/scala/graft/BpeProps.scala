package graft

import graft.ops.Text
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the BPE trainer ([[Text.bpeTrain]]):
  * checked against an INDEPENDENT naive reference implementation
  * (different pair counting — sliding windows; different selection —
  * full sort of candidates; different merge application — recursive
  * list rebuild), plus the order-invariance the distributed word-count
  * collection relies on: the driver receives the dictionary in
  * whatever order the TakeOrdered emits, so the trajectory must not
  * depend on it. Pure driver-side — no Spark job per evaluation. */
object BpeProps extends Properties("bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60).withInitialSeed(Seed(1234L))

  private def u8key(s: String): Seq[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq.map(_ & 0xff)

  /** Naive reference: same contract, independently spelled. */
  private def reference(wc: Seq[(String, Long)]): Seq[(Int, String, String, Long)] = {
    implicit val ord: Ordering[Seq[Int]] = Ordering.Implicits.seqOrdering
    def merge(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: merge(rest, l, r)
        case a :: rest                          => a :: merge(rest, l, r)
        case Nil                                => Nil
      }
    var words = wc.map { case (w, c) =>
      // codePoints() gives the same units as the trainer's manual walk
      (w.codePoints().toArray.toList.map(Character.toString), c)
    }
    (1 to Text.BpeIterations).flatMap { step =>
      val counts = words.flatMap { case (syms, c) =>
        syms.sliding(2).collect { case List(a, b) => ((a, b), c) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) None
      else {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, u8key(a), u8key(b)) }.head
        words = words.map { case (syms, c) => (merge(syms, l, r), c) }
        Some((step, l, r, cnt))
      }
    }
  }

  private val genDict: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(1, 30)
    words <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      w <- Gen.listOfN(len, Gen.oneOf("abcdeé€".toList)).map(_.mkString)
      c <- Gen.choose(1L, 50L)
    } yield (w, c))
  } yield words.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq

  property("trainer equals the independent reference") = forAll(genDict) { wc =>
    Text.bpeTrain(wc) == reference(wc)
  }

  property("trajectory is dictionary-order invariant") = forAll(genDict) { wc =>
    Text.bpeTrain(wc) == Text.bpeTrain(wc.reverse) &&
      Text.bpeTrain(wc) == Text.bpeTrain(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(wc))
  }

  property("pair counts never increase along the trajectory") = forAll(genDict) { wc =>
    val cnts = Text.bpeTrain(wc).map(_._4)
    cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b } &&
      cnts.forall(_ > 0)
  }
}
