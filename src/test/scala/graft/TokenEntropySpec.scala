package graft

import graft.functions.TokenEntropy.tokenEntropy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native `token_entropy` vs the aggregate stack it replaced
  * (explode → per-(doc, token) count → per-doc algebraic entropy).
  * Summation order differs (open-addressed map walk vs hash-agg partition
  * order), so doubles agree to final-ulp terms, not bits — asserted at
  * 1e-9 absolute, far inside the op's 4-dp presentation rounding. */
class TokenEntropySpec extends GraftSpec {

  /** The pre-round-8 column stack, as the reference implementation. */
  private def aggStack(df: DataFrame): Map[Long, (Double, Long)] =
    df.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((log2(sum(col("c"))) - sum(col("c") * log2(col("c"))) / sum(col("c")))
        .as("entropy"),
        sum(col("c")).as("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def native(df: DataFrame): Map[Long, (Double, Long)] =
    df.select(col("doc_id"), tokenEntropy(col("text")).as("te"))
      .select(col("doc_id"), col("te.entropy"), col("te.n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def check(df: DataFrame): Unit = {
    val (exp, got) = (aggStack(df), native(df))
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, (e, n)) =>
      assert(got(id)._2 === n, s"n_tokens for doc $id")
      assert(math.abs(got(id)._1 - e) < 1e-9, s"entropy for doc $id: ${got(id)._1} vs $e")
    }
  }

  test("parity with the aggregate stack on sf0.001 documents") {
    check(Tables.documents(spark, sf).select("doc_id", "text"))
  }

  test("parity on adversarial texts: empties, space runs, multi-byte, repeats") {
    val spark0 = spark
    import spark0.implicits._
    val texts = Seq(
      "",                                  // one empty token, entropy 0
      "a",                                 // single token
      "a a a a",                           // zero entropy
      "a b c d",                           // max entropy = log2(4)
      "  leading and  double  spaces ",    // empty tokens count
      "héllo wörld 漢字 テスト héllo",     // multi-byte UTF-8 with a repeat
      "tab\tis one word")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    check(texts)
    // spot values: 4 identical tokens → 0 bits; 4 distinct → 2 bits
    val got = native(texts)
    assert(got(2L) === ((0.0, 4L)))
    assert(got(3L) === ((2.0, 4L)))
  }

  test("parity on 200 random space-heavy strings") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "ab é "
    val texts = Seq.tabulate(200)(i => (i.toLong,
      (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)).toDF("doc_id", "text")
    check(texts)
  }

  test("null text yields null; non-string input rejected at analysis") {
    val spark0 = spark
    import spark0.implicits._
    val res = Seq(Some("a b"), None).toDF("text")
      .select(tokenEntropy(col("text")).as("te")).collect()
    assert(!res(0).isNullAt(0))
    assert(res(1).isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("x").select(tokenEntropy(col("x"))).collect()
    }
  }

  test("executes inside whole-stage codegen over a parquet scan, evaluated once") {
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/entropy_codegen"
    Seq((1L, "w1 w2 w2"), (2L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("doc_id"), tokenEntropy(col("text")).as("te"))
      .select(col("doc_id"), col("te.entropy").as("e"), col("te.n_tokens").as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("token_entropy"), plan)
    // both struct fields must come from ONE evaluation of the expression
    assert("token_entropy".r.findAllIn(plan).length === 1,
      s"token_entropy must be evaluated once:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val third = 1.0 / 3.0
    val expected = -(third * math.log(third) + 2 * third * math.log(2 * third)) / math.log(2.0)
    assert(math.abs(got(1L)._1 - expected) < 1e-12 && got(1L)._2 === 3L)
    assert(got(2L) === ((0.0, 1L)))
  }
}
