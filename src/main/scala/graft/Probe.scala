package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe: where percentile_disc_funcs' time goes — scan+explode
  * vs counts agg vs the cumsum window vs the built-in aggregate. */
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

    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }

    def triples = Tables.lineitem(spark, dir).select(col("l_returnflag").as("rf"),
      explode(array(
        struct(lit("med_qty").as("cname"), col("l_quantity").as("v"), lit(0.5).as("q")),
        struct(lit("p90_price").as("cname"), col("l_extendedprice").as("v"), lit(0.9).as("q")),
        struct(lit("p25_disc").as("cname"), col("l_discount").as("v"), lit(0.25).as("q")))).as("t"))
      .select(col("rf"), col("t.cname"), col("t.v"), col("t.q"))

    time("scan+explode only") {
      triples.agg(count(lit(1))).collect().head.getLong(0)
    }
    time("counts agg") {
      triples.groupBy("rf", "cname", "q", "v").agg(count(lit(1)).as("c"))
        .agg(count(lit(1))).collect().head.getLong(0)
    }
    time("bucket-refine op") {
      ops.Relational.percentileDiscFuncs(spark, dir).collect().length.toLong
    }
    time("built-in disc x3") {
      Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_discount)"),
          count(lit(1)))
        .collect().length.toLong
    }
    time("built-in over FanOut") {
      FanOut(Tables.lineitem(spark, dir)).groupBy(col("l_returnflag"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_discount)"),
          count(lit(1)))
        .collect().length.toLong
    }
    time("price col only counts") {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_extendedprice")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1))).collect().head.getLong(0)
    }
    spark.stop()
  }
}
