package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does FanOut help the single-split 600k lineitem scans
  * under the TPC-H trio's aggregations/joins? */
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

    def q1A = ops.Relational.q1PricingSummary(spark, dir)
    def q5A = ops.Relational.q5MultiwayJoin(spark, dir)
    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")
    def q1B = FanOut(Tables.lineitem(spark, dir))
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sq"),
        decSum(col("l_extendedprice")).as("sep"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc"),
        (decSum(col("l_quantity")) / count(lit(1))).as("aq"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

    def q3B = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(FanOut(Tables.lineitem(spark, dir)), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .select(col("l_orderkey"), col("rev"), col("o_orderdate"))
      .orderBy(col("rev").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
    def q3A = ops.Relational.q3ShippingPriority(spark, dir)
    def q5B = Tables.region(spark, dir)
      .join(Tables.nation(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(FanOut(Tables.lineitem(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir),
        col("c_custkey") === col("o_custkey") && col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc, col("n_name"))

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    println("q3 equal: " + (q3A.collect().toSeq == q3B.collect().toSeq))
    println("q5 equal: " + (q5A.collect().toSeq == q5B.collect().toSeq))
    time("q3 raw   ", q3A)
    time("q3 fanout", q3B)
    time("q5 raw   ", q5A)
    time("q5 fanout", q5B)
    time("q3 raw   ", q3A)
    time("q3 fanout", q3B)
    time("q5 raw   ", q5A)
    time("q5 fanout", q5B)
    spark.stop()
  }
}
