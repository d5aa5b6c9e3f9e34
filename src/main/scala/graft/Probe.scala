package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for environment behavior; not part of the library surface.
  * Currently: same-JVM A/B of doc_fingerprint — interpreted
  * array_min(transform(md5(substring))) vs native min_shingle_md5. */
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

    def variantA = graft.FanOut(Tables.documents(spark, dir))
      .selectExpr("doc_id",
        "array_min(transform(sequence(1, greatest(length(text)-7, 1)), i -> md5(substring(text, i, 8)))) AS fp")
      .orderBy("doc_id")

    def variantB = ops.Text.fingerprint(spark, dir)

    val a = variantA.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = variantB.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    println("IDENTICAL=" + (a == b) + " n=" + a.size)

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("A transform-stack", variantA)
    time("B min_shingle    ", variantB)
    time("A transform-stack", variantA)
    time("B min_shingle    ", variantB)
    spark.stop()
  }
}
