package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe for environment behavior; not part of the library surface.
  * Currently: same-JVM A/B of recon_colagg_fingerprint — fused
  * one-distinct aggregate vs split branches (plain agg ⨯ distinct agg). */
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
    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(18, 4))).cast("double")

    def variantA = ops.Recon.colaggFingerprint(spark, dir)

    def variantB = {
      val li = Tables.lineitem(spark, dir)
      val plain = li.agg(
        count(lit(1)).as("cnt"),
        decSum(col("l_quantity")).as("sq"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"),
        decSum(col("l_extendedprice") * col("l_discount")).as("rev"))
      val dk = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("dk"))
      plain.crossJoin(dk)
        .select(col("cnt"), col("dk"), col("sq"), col("mn"), col("mx"), col("rev"))
    }

    println("A=" + variantA.collect().mkString(","))
    println("B=" + variantB.collect().mkString(","))

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("A fused one-distinct", variantA)
    time("B split branches    ", variantB)
    time("A fused one-distinct", variantA)
    time("B split branches    ", variantB)
    spark.stop()
  }
}
