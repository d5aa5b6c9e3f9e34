package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for environment behavior; not part of the library surface.
  * Currently: why doesn't OptimizeSkewedJoin fire on the fixture? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val left = spark.range(100000).select(
      when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
      md5(col("id").cast("string")).as("pad"))
    val right = spark.range(100).select(col("id").as("k"))
    val q = left.join(right, "k").agg(count(lit(1)).as("n"), max(col("pad")).as("mx"))
    println("RESULT=" + q.collect().head.getLong(0))
    println(q.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
