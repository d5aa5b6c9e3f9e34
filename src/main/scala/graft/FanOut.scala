package graft

import org.apache.spark.sql.DataFrame

/** Task fan-out for CPU-dense row-local operators.
  *
  * A scan's task count is its split count. The small-SF fixtures are one
  * single-row-group parquet file each, so a map-heavy op (md5-per-shingle
  * fingerprinting, brute-force cosine probes, exact-percentile partials)
  * lands on ONE task while the rest of the box idles — the round-5 bench
  * showed doc_fingerprint paying 6.5x DuckDB for exactly this. At
  * production scale the input is thousands of splits and needs no help —
  * so the round-robin exchange is added ONLY when the scan under-splits
  * the box: whenever the frame already has >= cores partitions this is an
  * identity (no exchange appears in the plan; asserted in TextSpec). The
  * exchange moves the raw input once, buying cores-x throughput on the
  * per-row work that dominates.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
