package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for environment behavior; not part of the library surface.
  * Currently: same-JVM A/B of json_extract_events — GetJsonObject
  * (CodegenFallback) vs the native json_get_long byte scanner. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def variantA = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("int")).as("sk"))
      .orderBy("event_type")

    def variantB = ops.Events.jsonExtract(spark, dir)

    println("A rows: " + variantA.collect().mkString("; "))
    println("B rows: " + variantB.collect().mkString("; "))
    println("A codegen spans: " + "WholeStageCodegen".r
      .findAllIn(variantA.queryExecution.executedPlan.toString).length)
    println("B codegen spans: " + "WholeStageCodegen".r
      .findAllIn(variantB.queryExecution.executedPlan.toString).length)

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("A get_json_object", variantA)
    time("B json_get_long  ", variantB)
    time("A get_json_object", variantA)
    time("B json_get_long  ", variantB)
    spark.stop()
  }
}
