package graft

import graft.functions.BloomMightContainLong.mightContain
import graft.ops.Text
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom_might_contain expression + the join-free decontamination
  * scale path built on it: one-way correctness (no false negatives),
  * bounded false-positive rate, codegen execution, and agreement with
  * the exact broadcast-join path at tiny fpp. */
class BloomMightContainSpec extends GraftSpec {

  private def filterOf(xs: Range, fpp: Double): BloomFilter = {
    val bf = BloomFilter.create(xs.length.toLong, fpp)
    xs.foreach(x => bf.putLong(x.toLong))
    bf
  }

  test("no false negatives; false-positive rate within ~2x of fpp") {
    val spark0 = spark
    import spark0.implicits._
    val bf = filterOf(0 until 10000, 0.01)
    val members = (0 until 10000).map(_.toLong).toDF("h")
      .filter(mightContain(col("h"), bf)).count()
    assert(members === 10000L, "a member must never probe false")
    val fps = (100000 until 200000).map(_.toLong).toDF("h")
      .filter(mightContain(col("h"), bf)).count()
    assert(fps < 2000L, s"fp rate ${fps / 100000.0} far above the 1% target")
    assert(fps > 0L, "a 1% filter over 100k non-members should trip sometimes")
  }

  test("executes inside whole-stage codegen over a parquet scan, matching interpreted") {
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/bloom_codegen"
    val bf = filterOf(0 until 100, 0.001)
    (0L until 1000L).toDF("h").write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path).filter(mightContain(col("h"), bf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter") && plan.contains("bloom_might_contain"), plan)
    val fromParquet = df.collect().map(_.getLong(0)).sorted.toSeq
    val local = (0L until 1000L).toDF("h")
      .filter(mightContain(col("h"), bf)).collect().map(_.getLong(0)).sorted.toSeq
    assert(fromParquet === local)
    assert(fromParquet.take(100) === (0L until 100L).toSeq,
      "all members present regardless of fp noise")
  }

  test("rejects non-bigint input at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    val bf = filterOf(0 until 10, 0.01)
    intercept[Exception] {
      Seq("a").toDF("h").select(mightContain(col("h"), bf)).collect()
    }
  }

  test("decontaminateBloomFlags ≡ exact path at tiny fpp, and never undercounts") {
    val exact = Text.decontaminateNgram(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val bloomed = Text.decontaminateBloomFlags(spark, sf, fpp = 1e-9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(bloomed === exact, "at fpp=1e-9 the approximate path must match exactly")
    // at a sloppy fpp the hit counts may only grow (no false negatives)
    val sloppyByDoc = Text.decontaminateBloomFlags(spark, sf, fpp = 0.05).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (doc, hits) =>
      sloppyByDoc.get(doc).foreach(h => assert(h >= hits, s"doc $doc undercounted"))
    }
  }

  test("bloom production path plans as a scan-side filter: no join anywhere") {
    val plan = Text.decontaminateBloomFlags(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bloom_might_contain"), plan)
  }

  test("oracled harness: exact hits with the no-false-negative contract") {
    val exact = Text.decontaminateNgram(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val harness = Text.decontaminateBloom(spark, sf).collect()
    assert(harness.map(r => r.getLong(0) -> r.getLong(1)).toSeq === exact,
      "harness hits must be the engine-independent exact counts")
    harness.foreach(r => assert(r.getBoolean(2),
      s"doc ${r.getLong(0)}: bloom missed a truly-shared gram"))
  }
}
