package graft

import java.security.MessageDigest

import graft.ops.Text
import org.apache.spark.sql.functions._

/** Native winnow_set vs an independent driver recompute, the published
  * shared-substring guarantee, and the dedup_winnow pair op on a
  * planted copied-passage fixture. */
class WinnowSetSpec extends GraftSpec {

  /** Independent recompute: char shingles (code-point slicing), md5 per
    * shingle, min per sliding window (full windows only, single clamped
    * window when short), distinct + sorted hex. */
  private def winnowRef(text: String, width: Int, window: Int): Seq[String] = {
    val md = MessageDigest.getInstance("MD5")
    // slice by CODE POINTS like the UTF-8 cursor walk (surrogate-safe)
    val cps = text.codePoints().toArray
    val nsh = math.max(cps.length - width + 1, 1)
    val digs = (0 until nsh).map { i =>
      val sh = new String(cps, i, math.min(width, cps.length - i) max 0)
      md.reset()
      md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val nwin = math.max(digs.length - window + 1, 1)
    (0 until nwin).map(p => digs.slice(p, p + window).min).distinct.sorted
  }

  private def run(texts: Seq[String]): Seq[Seq[String]] = {
    val spark0 = spark
    import spark0.implicits._
    texts.toDF("text")
      .select(graft.functions.WinnowSet.winnowSet(col("text"), 8, 16).as("w"))
      .collect().toSeq.map(_.getSeq[String](0).toSeq)
  }

  test("winnow_set matches the independent recompute, incl. edges") {
    val texts = Seq(
      "",                            // empty: single md5("") fingerprint
      "short",                       // shorter than the shingle width
      "exactly8",                    // one shingle exactly
      "abcdefghijklmnopqrstuvwxyz",  // fewer shingles than the window
      "café naïve résumé über alles und so weiter genau",
      "😀emoji pad padding beyond the window size here ok",
      ("the quick brown fox jumps over the lazy dog " * 5).trim)
    run(texts).zip(texts.map(winnowRef(_, 8, 16))).zipWithIndex.foreach {
      case ((got, want), i) => assert(got === want, s"text #$i")
    }
    // real corpus docs too
    val real = Tables.documents(spark, sf).select("text")
      .orderBy("doc_id").limit(30).collect().map(_.getString(0)).toSeq
    run(real).zip(real.map(winnowRef(_, 8, 16))).zipWithIndex.foreach {
      case ((got, want), i) => assert(got === want, s"real doc #$i")
    }
  }

  test("shared-substring guarantee: a copied >=23-char passage always overlaps") {
    val passage = "this exact sentence was copied verbatim between documents"
    val a = s"totally unrelated preamble text here $passage and a different tail"
    val b = s"zzz other document prefix material $passage closing words differ"
    val Seq(wa, wb) = run(Seq(a, b))
    assert(wa.toSet.intersect(wb.toSet).nonEmpty,
      "winnowing must fingerprint a shared passage of >= k+w-1 chars")
    // and two disjoint-alphabet texts share nothing
    val Seq(wc, wd) = run(Seq("aaaa bbbb cccc dddd eeee ffff gggg hhhh",
      "1111 2222 3333 4444 5555 6666 7777 8888"))
    assert(wc.toSet.intersect(wd.toSet).isEmpty)
  }

  test("decontaminate_winnow: eval passage pasted in a train doc is flagged") {
    val spark0 = spark
    import spark0.implicits._
    val d = s"$tmpDir/decontwinfix"
    val evalPassage = "what is the capital of france answer paris of course " +
      "this is benchmark item forty two exactly"
    val docs = Seq(
      // the eval split (src0)
      TextFixture.Doc(1, s"benchmark header $evalPassage benchmark footer",
        "en", "src0", 1),
      TextFixture.Doc(2, "another eval item entirely different wording here",
        "en", "src0", 1),
      // contaminated train doc: the passage verbatim inside other text
      TextFixture.Doc(3, s"web page scraped preamble $evalPassage trailing junk",
        "en", "src1", 1),
      // clean train doc
      TextFixture.Doc(4, "completely unrelated training prose with zero " +
        "overlap in any character window of this text stream", "en", "src2", 1))
      .map(dc => dc.copy(n_chars = dc.text.length.toLong))
    docs.toDF().write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Text.decontaminateWinnow(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(3L) && got(3L) >= 1L,
      "verbatim eval passage must produce shared winnow fingerprints")
    assert(!got.contains(4L), "clean doc must not be flagged")
  }

  test("dedup_winnow: planted copied passage surfaces as the top pair") {
    val spark0 = spark
    import spark0.implicits._
    val d = s"$tmpDir/winnowfix"
    val passage = "the shared boilerplate disclaimer paragraph that both " +
      "documents embed verbatim with enough length to winnow"
    val docs = Seq(
      TextFixture.Doc(1, s"first document unique opening $passage unique close one",
        "en", "fx", 1),
      TextFixture.Doc(2, s"second doc other start text $passage different ending two",
        "en", "fx", 1),
      TextFixture.Doc(3, "entirely different content with no overlap whatsoever " +
        "in any window of its character stream at all", "en", "fx", 1))
      .map(dc => dc.copy(n_chars = dc.text.length.toLong))
    docs.toDF().write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Text.dedupWinnow(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), "copied-passage pair must surface")
    assert(got((1L, 2L)) >= 2L, "passage long enough for >= 2 shared fingerprints")
    assert(!got.keySet.exists { case (x, y) => x == 3L || y == 3L },
      "the disjoint doc pairs with nobody")
  }
}
