package graft

import graft.functions.MinHashSig
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Native minhash_sig expression (pairwise-independent affine family
  * over 2^61−1 on md5 slices since round 12): exact parity with an
  * independent BigInt reimplementation of the same arithmetic (the
  * DuckDB-oracle formula), null-token contract, codegen execution,
  * single evaluation under the h_i projection, and type check. */
class MinHashSigSpec extends GraftSpec {

  private val P = BigInt(MinHashSig.P)

  /** Independent arithmetic path (BigInt, no Math.multiplyHigh): exactly
    * what the DuckDB oracle evaluates on HUGEINT —
    * min over tokens of (a_i·x + b_i) mod P with x the 60-bit md5 slice. */
  private def reference(toks: Seq[String], n: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val xs = toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.take(15), 16)
    }
    (0 until n).map { i =>
      xs.map(x => ((BigInt(MinHashSig.coeffA(i)) * x + BigInt(MinHashSig.coeffB(i))) mod P)
        .toLong).min
    }
  }

  test("exact parity with the BigInt reimplementation of the oracle formula") {
    val spark0 = spark
    import spark0.implicits._
    val fixtures = Seq(
      (1L, Seq("alpha", "beta", "gamma", "beta", "alpha")), // duplicates
      (2L, Seq("", "x", "|", "~null~")),                    // odd tokens
      (3L, Seq("solo")),
      (4L, Seq("héllo", "漢字")))                            // multi-byte UTF-8
    val docs = fixtures.toDF("doc_id", "toks")
    val n = 32
    val got = docs.select(col("doc_id"), MinHashSig.minhash(col("toks"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fixtures.foreach { case (id, toks) =>
      assert(got(id).toSeq === reference(toks, n), s"doc $id")
    }
  }

  test("every h_i lies in [0, 2^61-1): exact field arithmetic, no overflow") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, (0 until 200).map(i => s"tok$i"))).toDF("doc_id", "toks")
    val sig = docs.select(MinHashSig.minhash(col("toks"), 32).as("s"))
      .collect().head.getSeq[Long](0)
    sig.foreach(v => assert(v >= 0L && v < MinHashSig.P, s"h out of range: $v"))
  }

  test("agreement votes are independent across i: the correlated-family regression") {
    // the Kirsch–Mitzenmacher form this replaced estimated J({s8},{s8,""})
    // as 0 or 1 (the comparison flips at most once across i); the affine
    // family must land near the true 0.5
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, Seq("s8")), (2L, Seq("s8", ""))).toDF("doc_id", "toks")
    val sig = Text.minhashSignatures(df).collect()
      .map(r => r.getLong(0) -> (1 to 32).map(r.getLong)).toMap
    val est = sig(1L).zip(sig(2L)).count { case (x, y) => x == y } / 32.0
    assert(math.abs(est - 0.5) <= 0.36, s"correlated votes: est $est vs J = 0.5")
  }

  test("null tokens are skipped; null/empty/all-null arrays are null") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, Some(Seq(Some("a"), None))),
      (2L, Some(Seq(Some("a")))),
      (3L, None: Option[Seq[Option[String]]]),
      (4L, Some(Seq(None: Option[String]))))
      .toDF("doc_id", "toks")
    val n = 4
    val got = docs.select(col("doc_id"), MinHashSig.minhash(col("toks"), n).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq))).toMap
    assert(got(1L) === got(2L), "a null token must not contribute (array_min null-skip)")
    assert(got(3L) === None)
    assert(got(4L) === None, "all-null token array yields null, like array_min")
  }

  test("runs inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/minhash_codegen"
    Seq((1L, Seq("a", "b", "c")), (2L, Seq("d")), (3L, Seq("a", "d")))
      .toDF("doc_id", "toks").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("doc_id"), MinHashSig.minhash(col("toks"), 16).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("minhash_sig"), plan)
    val fromParquet = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // same rows through the interpreted (local-relation) path
    val interpreted = Seq((1L, Seq("a", "b", "c")), (2L, Seq("d")), (3L, Seq("a", "d")))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), MinHashSig.minhash(col("toks"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fromParquet === interpreted)
  }

  test("minhashSignatures evaluates the expression once, not once per h_i") {
    // over a real scan (a local relation is constant-folded away entirely)
    val docToks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val optimized = Text.minhashSignatures(docToks).queryExecution.optimizedPlan.toString
    val evals = "minhash_sig".r.findAllIn(optimized).length
    assert(evals === 1, s"CollapseProject must not duplicate the signature:\n$optimized")
  }

  test("rejects non-string arrays at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq((1L, Seq(1, 2, 3))).toDF("doc_id", "toks")
    intercept[Exception] {
      bad.select(MinHashSig.minhash(col("toks"), 4)).collect()
    }
  }
}
