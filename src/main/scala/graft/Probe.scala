package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe for environment behavior; not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .filter(col("label") === 0 && col("pos0") === 0)
    e.select(col("v"),
      col("v").cast(DecimalType(18, 9)).as("dec_direct"),
      col("v").cast("double").as("dbl"),
      col("v").cast("double").cast(DecimalType(18, 9)).as("dec_via_dbl"))
      .orderBy(col("v")).show(8, truncate = false)
    e.agg(sum(col("v").cast(DecimalType(18, 9))).as("s_direct"),
      sum(col("v").cast("double").cast(DecimalType(18, 9))).as("s_via_dbl"),
      count(lit(1)).as("cnt")).show(truncate = false)
    spark.stop()
  }
}
