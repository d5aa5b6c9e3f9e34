package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-assembly sampling for LLM-training-data pipelines (task north
  * star): stratified subsampling and weighted source mixing.
  *
  * 100 TB posture: sampling is CONTENT-keyed, not `rand()`-based. The
  * per-row uniform comes from `xxhash64(key, seed)`, so membership is a
  * pure function of (row key, seed) — identical across task retries,
  * partition layouts, AQE re-plans, and cluster sizes, where `rand(seed)`
  * depends on partition index and row order and silently changes the
  * sample under a repartition. The filter is a scan-level projection:
  * no shuffle, no state, trivially parallel.
  *
  * Content-keyed thresholds also nest: the f=0.1 sample is a subset of
  * the f=0.5 sample for the same seed (asserted in tests) — the property
  * a pipeline needs to scale a mixture up or down reproducibly.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Per-row uniform in [0, 1): deterministic content hash of `key`. */
  private def unit(key: String, seed: Long) =
    (pmod(xxhash64(col(key), lit(seed)), lit(Buckets)).cast("double") / Buckets)

  /** Stratified sample: keep each row of stratum s with probability
    * `fractions(s)`; strata absent from the map are dropped (a training
    * mixture is an allowlist, not a passthrough). */
  def sampleStratified(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame = {
    require(fractions.nonEmpty, "sampleStratified: empty fraction map")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"sampleStratified: fractions must be in [0,1]: $fractions")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(unit(keyCol, seed) < frac)
  }

  /** Weighted source mixing: one (frame, weight) pair per corpus, each
    * sampled at its weight and unioned — the "oversample wiki, downsample
    * crawl" step. Weights are per-source keep probabilities (0..1). */
  def mixSources(sources: Seq[(DataFrame, Double, String)], seed: Long): DataFrame = {
    require(sources.nonEmpty, "mixSources: no sources")
    sources.map { case (df, w, keyCol) =>
      require(w >= 0 && w <= 1, s"mixSources: weight $w outside [0,1]")
      df.filter(unit(keyCol, seed) < lit(w))
    }.reduce(_ unionByName _)
  }

  /** Harness op: documents mixture keeping all of src0, half of src1, a
    * quarter of src2, dropping the other sources. Non-oracle (the
    * content-hash stream is engine-specific); determinism, nesting,
    * allowlisting and the binomial fraction bound are unit-tested. */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    sampleStratified(Tables.documents(spark, dir), "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), seed = 42L)
      .select("doc_id", "source")
      .orderBy("doc_id")
}
