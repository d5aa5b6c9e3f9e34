package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64.simhash64

/** Scratch probe: native simhash64 vs the explode + 64-agg column stack. */
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
    val docToks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

    def sigOld = {
      val tok = docToks.select(col("doc_id"), explode(col("toks")).as("tok"))
      val h = xxhash64(col("tok"))
      val votes = (0 until 64).map(b =>
        sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)).as(s"bit$b"))
      tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b =>
            shiftleft(when(col(s"bit$b") > 0, lit(1L)).otherwise(lit(0L)), b))
            .reduce(_ bitwiseOR _).as("simhash"))
    }
    def sigNew = docToks.select(col("doc_id"), simhash64(col("toks")).as("simhash"))

    val a = sigOld.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sigNew.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println("equal: " + (a == b) + s" (${a.size} docs)")

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("sig old (explode+64agg)", sigOld)
    time("sig new (native)       ", sigNew)
    time("full simhash old", ops.Text.dedupSimhash(spark, dir))
    time("sig old (explode+64agg)", sigOld)
    time("sig new (native)       ", sigNew)
    spark.stop()
  }
}
