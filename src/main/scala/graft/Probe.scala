package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe: same-JVM A/B of ann_ivf_topk — lazily compounding
  * k-means lineage vs localCheckpoint-truncated iterations. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 2) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(1)}%.3f")
    }
    time("ivf full    ", ops.Vectors.annIvfTopk(spark, dir))
    time("kmeans only ", ops.Vectors.kmeansCentroids(ops.Vectors.unitVectors(spark, dir)))
    time("ivf full    ", ops.Vectors.annIvfTopk(spark, dir))
    time("kmeans only ", ops.Vectors.kmeansCentroids(ops.Vectors.unitVectors(spark, dir)))
    spark.stop()
  }
}
