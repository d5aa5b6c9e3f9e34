package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NgramHashes.ngramHashes

/** Scratch probe: find where hash-gram decontaminate diverges from the
  * string-gram version. */
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
    val n = 3
    val d = Tables.documents(spark, dir)

    // per-doc gram counts, both ways, no limit
    def gramsA(df: DataFrame) = df
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(split(text, ' ')) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))"))).as("g"))
    def gramsB(df: DataFrame) = df.select(col("doc_id"),
      explode(ngramHashes(col("text"), n)).as("g"))

    val cntA = gramsA(d).groupBy("doc_id").agg(count(lit(1)).as("a"))
    val cntB = gramsB(d).groupBy("doc_id").agg(count(lit(1)).as("b"))
    val diff = cntA.join(cntB, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("a"), lit(-1)) =!= coalesce(col("b"), lit(-1)))
    println("docs with differing distinct-gram counts: " + diff.count())
    diff.orderBy("doc_id").limit(5).collect().foreach(println)
    diff.limit(1).join(d, "doc_id").select("doc_id", "text").collect()
      .foreach(r => println("SAMPLE doc " + r.getLong(0) + ": [" +
        r.getString(1).take(300) + "]"))
    spark.stop()
  }
}
