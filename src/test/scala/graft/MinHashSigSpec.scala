package graft

import graft.functions.MinHashSig
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Native minhash_sig expression: bit-parity with the column stack it
  * replaced, null-token contract, codegen execution, single evaluation
  * under the h_i projection, and type check. */
class MinHashSigSpec extends GraftSpec {

  /** The round-5 formulation this expression must match bit-for-bit. */
  private def legacy(i: Int) =
    array_min(transform(array_distinct(col("toks")), t => xxhash64(lit(i), t)))

  test("bit-identical to the array_min(transform(xxhash64)) stack") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, Seq("alpha", "beta", "gamma", "beta", "alpha")), // duplicates
      (2L, Seq("", "x", "|", "~null~")),                    // odd tokens
      (3L, Seq("solo")))
      .toDF("doc_id", "toks")
    val n = 8
    val got = docs.select(col("doc_id"), MinHashSig.minhash(col("toks"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = docs.select(col("doc_id") +: (0 until n).map(i => legacy(i).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to n).map(r.getLong)).toMap
    got.foreach { case (id, s) => assert(s.toSeq === want(id).toSeq, s"doc $id") }
  }

  test("null token contributes the seed (like xxhash64's null-skip); null array is null") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, Some(Seq(Some("a"), None))),
      (2L, Some(Seq(Some("a")))),
      (3L, None: Option[Seq[Option[String]]]))
      .toDF("doc_id", "toks")
    val n = 4
    val got = docs.select(col("doc_id"), MinHashSig.minhash(col("toks"), n).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq))).toMap
    val want = docs.select(col("doc_id") +: (0 until n).map(i => legacy(i).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((1 to n).map(r.getLong).toSeq))).toMap
    assert(got(1L) === want(1L), "null token must shrink the minimum exactly like xxhash64")
    assert(got(1L) !== got(2L), "the null token must actually contribute")
    assert(got(3L) === None)
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
