package graft

import graft.functions.MinShingleMd5.minShingleMd5
import org.apache.spark.sql.functions._

/** Native min_shingle_md5 expression: bit-parity with the
  * array_min(transform(md5(substring))) stack it replaced — including
  * multi-byte characters, short and empty texts — plus codegen execution
  * and type check. */
class MinShingleMd5Spec extends GraftSpec {

  private def legacy(w: Int) = expr(
    s"array_min(transform(sequence(1, greatest(length(text)-${w - 1}, 1)), i -> md5(substring(text, i, $w))))")

  test("bit-identical to the array_min(transform(md5(substring))) stack") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "exactly8!"),          // 9 chars: two windows
      (3L, "exact8ch"),           // one full window
      (4L, "short"),              // shorter than the window
      (5L, ""),                   // empty: md5 of empty string
      (6L, "déjà vu — naïve café ångström"), // multi-byte chars: char windows, byte hashing
      (7L, "aaaaaaaaaaaaaaaaaa"), // identical windows
      (8L, "日本語のテキストです、シングル試験")) // fully multi-byte
      .toDF("doc_id", "text")
    for (w <- Seq(3, 8)) {
      val got = docs.select(col("doc_id"), minShingleMd5(col("text"), w).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = docs.select(col("doc_id"), legacy(w).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got.foreach { case (id, fp) => assert(fp === want(id), s"doc $id width $w") }
    }
  }

  test("runs inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val fixtures = Seq((1L, "some document text here"), (2L, "tiny"))
    val path = s"$tmpDir/shingle_codegen"
    fixtures.toDF("doc_id", "text").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("doc_id"), minShingleMd5(col("text"), 8).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("min_shingle_md5"), plan)
    val fromParquet = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val interpreted = fixtures.toDF("doc_id", "text")
      .select(col("doc_id"), minShingleMd5(col("text"), 8).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromParquet === interpreted)
  }

  test("rejects non-string input at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq((1L, 2L)).toDF("doc_id", "text")
    intercept[Exception] {
      bad.select(minShingleMd5(col("text"), 8)).collect()
    }
  }
}
