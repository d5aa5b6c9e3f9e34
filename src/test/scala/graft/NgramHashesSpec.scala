package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.NgramHashes.ngramHashes

/** Native ngram_hashes expression: bit-parity with the column stack it
  * replaced (split → transform/slice/concat_ws → array_distinct →
  * xxhash64), which is possible because `functions.xxhash64` hashes a
  * string's UTF-8 bytes with seed 42 — the exact call the native scanner
  * makes per gram byte-region. Plus edge cases, codegen execution, and
  * the type check. */
class NgramHashesSpec extends GraftSpec {

  /** The replaced column form, hashed: distinct xxhash64 of the word
    * n-grams as strings. Short texts guarded to an empty array (sequence
    * with stop < start would count DOWN). */
  private def reference(n: Int): Column =
    when(size(split(col("text"), " ")) >= n,
      expr(s"transform(array_distinct(transform(sequence(1, " +
        s"size(split(text, ' ')) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))), g -> xxhash64(g))"))
      .otherwise(array().cast("array<long>"))

  private def check(texts: Seq[String], n: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val rows = texts.toDF("text")
      .select(sort_array(ngramHashes(col("text"), n)).as("native"),
        sort_array(reference(n)).as("ref"), col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        s"n=$n diverged on: [${r.getString(2)}]")
    }
  }

  test("bit-parity with the xxhash64'd string-gram column stack") {
    val adversarial = Seq(
      "a b c d e",
      "one two three",
      "dup x dup x dup x dup x",          // repeated grams → distinct
      "a  b   c",                          // runs of spaces → empty words
      " leading and trailing ",            // boundary empty words
      "",                                  // one empty word
      " ",                                 // two empty words
      "   ",                               // four empty words
      "single",
      "two words",
      "héllo wörld 漢字 テスト mixed",      // multi-byte UTF-8
      "a é a é a",                         // multi-byte with repeats
      "tab\tis one word",                  // tabs are NOT separators
      "a b c")
    for (n <- Seq(1, 2, 3, 5)) check(adversarial, n)
  }

  test("bit-parity on 200 random space-heavy strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab é "                  // tiny alphabet → many dups/runs
    val texts = Seq.fill(200)(
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    for (n <- Seq(2, 3)) check(texts, n)
  }

  test("short texts yield empty; null yields null") {
    val spark0 = spark
    import spark0.implicits._
    val res = Seq(Some("a b"), Some(""), None).toDF("text")
      .select(ngramHashes(col("text"), 3).as("h")).collect()
    assert(res(0).getSeq[Long](0).isEmpty)
    assert(res(1).getSeq[Long](0).isEmpty)
    assert(res(2).isNullAt(0))
  }

  test("executes inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/ngram_codegen"
    Seq("w1 w2 w3 w4", "x y").toDF("text").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(sort_array(ngramHashes(col("text"), 2)).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("ngram_hashes"), plan)
    val fromParquet = df.collect().map(_.getSeq[Long](0)).sortBy(_.length)
    val local = Seq("w1 w2 w3 w4", "x y").toDF("text")
      .select(sort_array(ngramHashes(col("text"), 2)).as("h"))
      .collect().map(_.getSeq[Long](0)).sortBy(_.length)
    assert(fromParquet.toSeq === local.toSeq)
    assert(fromParquet.map(_.length).toSeq === Seq(1, 3))
  }

  test("rejects non-string input at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    intercept[Exception] {
      Seq(1L).toDF("text").select(ngramHashes(col("text"), 3)).collect()
    }
  }
}
