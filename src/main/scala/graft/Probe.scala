package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe: FanOut on recon_report's md5 hash sides. */
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
    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(18, 4))).cast("double")

    def reportA = ops.Recon.report(spark, dir)

    def reportB = {
      val o = Tables.orders(spark, dir)
      val tgt = o.withColumn("o_totalprice", round(col("o_totalprice"), 0))
      def agg1(df: DataFrame, c: org.apache.spark.sql.Column): DataFrame = df.agg(c.as("v"))
      def check(name: String, src: DataFrame, t: DataFrame): DataFrame =
        src.crossJoin(t.withColumnRenamed("v", "tgt_v"))
          .select(lit(name).as("check"), col("v").as("src_v"), col("tgt_v"),
            (col("v") === col("tgt_v")).as("ok"))
      def cnt(df: DataFrame) = agg1(df, count(lit(1)).cast("double"))
      def sumP(df: DataFrame) = agg1(df, decSum(col("o_totalprice")))
      def nullK(df: DataFrame) = agg1(df, count(when(col("o_custkey").isNull, 1)).cast("double"))
      def hashes(df: DataFrame) = FanOut(df).select(col("o_orderkey").as("k"), md5(concat_ws("|",
        col("o_custkey").cast("string"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast("string"))).as("h"))
      val hashMism = hashes(o).join(hashes(tgt).withColumnRenamed("h", "h2"), "k")
        .filter(col("h") =!= col("h2")).agg(count(lit(1)).cast("double").as("v"))
      check("rowcount", cnt(o), cnt(tgt))
        .unionByName(check("sum_totalprice", sumP(o), sumP(tgt)))
        .unionByName(check("null_custkey", nullK(o), nullK(tgt)))
        .unionByName(check("hash_mismatches", hashMism,
          spark.range(1).select(lit(0.0).as("v"))))
        .orderBy("check")
    }

    println("equal: " + (reportA.collect().toSeq == reportB.collect().toSeq))
    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("report raw   ", reportA)
    time("report fanout", reportB)
    time("report raw   ", reportA)
    time("report fanout", reportB)
    spark.stop()
  }
}
