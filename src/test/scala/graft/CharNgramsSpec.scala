package graft

import graft.functions.{CharNgramScan, CharNgrams}
import graft.functions.CharNgrams.charNgrams
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native char-n-gram scanner: parity with both built-in stacks,
  * multi-byte boundaries, short-text edge, codegen execution. */
class CharNgramsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def scan(s: String, n: Int): Seq[String] = {
    val arr = new CharNgramScan(n).grams(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("bigrams, trigrams, and the short-text whole-string contract") {
    assert(scan("abcd", 2) === Seq("ab", "bc", "cd"))
    assert(scan("abcd", 3) === Seq("abc", "bcd"))
    assert(scan("ab", 2) === Seq("ab"))
    assert(scan("a", 2) === Seq("a"), "shorter than n → the whole text")
    assert(scan("", 2) === Seq(""))
  }

  test("multi-byte characters gram on code-point boundaries") {
    assert(scan("日本語x", 2) === Seq("日本", "本語", "語x"))
    assert(scan("aé日", 2) === Seq("aé", "é日"))
  }

  test("parity with the split/zip_with stack over the real corpus") {
    val docs = Tables.documents(spark, sf)
    val native = docs.select(explode(charNgrams(col("text"), 2)).as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val zip = docs.selectExpr(
      """explode(CASE WHEN length(text) < 2 THEN array(substring(text, 1, 2))
        |ELSE zip_with(slice(split(text, ''), 1, length(text) - 1),
        |              slice(split(text, ''), 2, length(text) - 1),
        |              (a, b) -> concat(a, b)) END) AS g""".stripMargin)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native === zip)
    assert(native.size > 100, "fixture must exercise a real gram variety")
  }

  test("executes inside whole-stage codegen over a parquet scan") {
    val spark0 = spark
    import spark0.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-cng").toString
    Seq((1L, "hello")).toDF("id", "t").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("id"), charNgrams(col("t"), 2).as("gs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("char_ngrams"), plan)
    assert(df.collect().head.getSeq[String](1) === Seq("he", "el", "ll", "lo"))
  }

  test("analysis-time rejection of non-string input and bad n") {
    val spark0 = spark
    import spark0.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(charNgrams(col("x"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
    intercept[IllegalArgumentException] { CharNgrams(null, 0) }
  }
}
