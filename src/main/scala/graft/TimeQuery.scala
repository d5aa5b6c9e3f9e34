package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing utility: `runMain graft.TimeQuery <query_name>...`
  * times each named op at sf0.1 under the exact Bench methodology (two
  * untimed warm-up passes, then min/median of five `toRdd.count()`
  * materializations) — the fast feedback loop for optimizing ONE query
  * without paying the full 118-query bench (~6 min per run). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QuietLogs.silenceKnownBoundedWindowWarning()
    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    args.foreach { q =>
      for (_ <- 1 to 2) materialize(q)
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        materialize(q)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$q%s min=${ts.head}%.3f median=${ts(2)}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
