package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe: quantileSummary generations — window-rank sort form
  * (round 5) vs Selection.valueAtRanks bucket-refine (round 8) — value
  * parity and wall time. */
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

    def time(tag: String)(f: => Seq[String]): Seq[String] = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // round-5 window-rank formulation, verbatim
    def oldForm: DataFrame = {
      val w = Window.partitionBy("o_orderstatus").orderBy("v")
      val base = Tables.orders(spark, dir)
        .select(col("o_orderstatus"), col("o_totalprice").cast("double").as("v"))
      val counts = base.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      def interp(pos: org.apache.spark.sql.Column, tag: String) = Seq(
        max(when(col("rn") === floor(pos), col("v"))).as(s"lo$tag"),
        max(when(col("rn") === ceil(pos), col("v"))).as(s"hi$tag"),
        max(pos).as(s"pos$tag"))
      def pct(tag: String) = round(
        col(s"lo$tag") +
          (col(s"hi$tag") - col(s"lo$tag")) * (col(s"pos$tag") - floor(col(s"pos$tag"))),
        4).as(s"p$tag")
      val pos50 = lit(0.5) * (col("cnt") - 1)
      val pos95 = lit(0.95) * (col("cnt") - 1)
      base.withColumn("rn", row_number().over(w).cast("double") - 1)
        .join(broadcast(counts), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg((interp(pos50, "50") ++ interp(pos95, "95") :+ count(lit(1)).as("n")).head,
          (interp(pos50, "50") ++ interp(pos95, "95") :+ count(lit(1)).as("n")).tail: _*)
        .select(col("o_orderstatus"), pct("50"), pct("95"), col("n"))
        .orderBy("o_orderstatus")
    }

    val a = time("window-rank (old)") { oldForm.collect().map(_.toString).toSeq }
    val b = time("valueAtRanks (new)") {
      ops.Relational.quantileSummary(spark, dir).collect().map(_.toString).toSeq
    }
    println(s"PROBE parity ${if (a == b) "BIT-IDENTICAL" else s"MISMATCH\n$a\n$b"}")
    spark.stop()
  }
}
