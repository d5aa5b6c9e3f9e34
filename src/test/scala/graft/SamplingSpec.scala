package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Sampling invariants: determinism under repartitioning, nested samples
  * across fractions, allowlist semantics, binomial fraction bounds, and
  * weighted mixing composition. */
class SamplingSpec extends GraftSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("sample is a pure function of (key, seed): repartitioning changes nothing") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.sampleStratified(df, "source", "doc_id", Map("src0" -> 0.5), 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    assert(base.nonEmpty)
    assert(ids(docs.repartition(7)) === base, "partition layout must not move the sample")
    assert(ids(docs.orderBy(col("doc_id").desc)) === base, "row order must not move the sample")
  }

  test("samples nest across fractions for the same seed") {
    def ids(f: Double): Set[Long] =
      Sampling.sampleStratified(docs, "source", "doc_id", Map("src0" -> f), 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val (s10, s50, s100) = (ids(0.1), ids(0.5), ids(1.0))
    assert(s10.subsetOf(s50) && s50.subsetOf(s100), "threshold samples must nest")
    assert(s100 === docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet, "f=1 keeps the stratum")
  }

  test("strata absent from the mixture are dropped; fractions approximately honored") {
    val got = Sampling.sampleStratified(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.5), 42L)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(Set("src0", "src1")), s"allowlist violated: $got")
    val n0 = docs.filter(col("source") === "src0").count()
    val n1 = docs.filter(col("source") === "src1").count()
    assert(got("src0") === n0, "fraction 1.0 keeps everything")
    // binomial 4-sigma bound on the 0.5 stratum
    val sd = math.sqrt(0.5 * 0.5 * n1)
    assert(math.abs(got.getOrElse("src1", 0L) - 0.5 * n1) <= 4 * sd + 1,
      s"src1 kept ${got.get("src1")} of $n1")
  }

  test("mixSources composes per-source weights into one frame") {
    val a = docs.filter(col("source") === "src0")
    val b = docs.filter(col("source") === "src1")
    val mixed = Sampling.mixSources(Seq((a, 1.0, "doc_id"), (b, 0.5, "doc_id")), 42L)
    val bySrc = mixed.groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === a.count())
    // same key/seed → same membership as the stratified form
    val strat = Sampling.sampleStratified(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.5), 42L).count()
    assert(mixed.count() === strat)
  }

  test("sampling filter stays a scan projection: no shuffle, no aggregate") {
    val plan = Sampling.sampleDocuments(spark, sf).queryExecution.executedPlan.toString
    // one sort for the final ORDER BY; nothing else moves data
    assert(!plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("portable mixture: allowlist drops absent strata, w=1 keeps all, w=0 none") {
    val docs = Tables.documents(spark, sf)
    val kept = Sampling.mixSourcesPortable(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), 42L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0 = docs.filter(org.apache.spark.sql.functions.col("source") === "src0").count()
    assert(kept === Map("src0" -> src0)) // src1 empty, others allowlisted out
    // deterministic: same seed → identical membership across invocations
    val a = Sampling.mixSourcesPortable(docs, "source", "doc_id",
      Map("src2" -> 0.5), 7L).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixSourcesPortable(docs, "source", "doc_id",
      Map("src2" -> 0.5), 7L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }

  test("capPerSource: deterministic md5-rank keep-set, WindowGroupLimit plan") {
    val df = Sampling.capPerSource(spark, sf, k = 3)
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("WindowGroupLimit"),
      s"the rank filter must compile to the map-side bounded top-k:\n$exec")
    val rows = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent driver recompute of the deterministic keep-set
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def md5hex(v: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val ids = ds.map(_._2)
      val kept = ids.sortBy(id => (md5hex(id), id)).take(3)
      val got = rows(src)
      assert(got === ((ids.length.toLong, kept.length.toLong, kept.sum)), src)
    }
    assert(rows.keySet === docs.map(_._1).toSet)
  }

  test("temperature mix: 100-vs-400-token sources give the exact sqrt split") {
    val spark0 = spark
    import spark0.implicits._
    val d = s"$tmpDir/tmix"
    // A: 100 tokens, B: 400 → sqrt 10 vs 20 → weights 1/3 and 2/3;
    // natural shares 0.2/0.8 → boosts 5/3 and 5/6 exactly
    val w100 = Seq.fill(100)("w").mkString(" ")
    val rows = Seq((1L, w100, "en", "A", w100.length.toLong)) ++
      (2 to 5).map(i => (i.toLong, w100, "en", "B", w100.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Sampling.temperatureMix(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("A") === ((100L, 1L, 0.333333, 0.2, 1.666667)))
    assert(got("B") === ((400L, 4L, 0.666667, 0.8, 0.833333)))
    // sf invariants: weights sum to ~1, boost inverts with size rank
    val sfGot = Sampling.temperatureMix(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(5)))
    assert(math.abs(sfGot.map(_._2).sum - 1.0) < 1e-4, "weights normalize")
    val bySize = sfGot.sortBy(_._1)
    assert(bySize.head._3 >= bySize.last._3,
      "smaller sources boost at least as much as larger ones")
  }
}
