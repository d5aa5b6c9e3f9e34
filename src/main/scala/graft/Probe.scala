package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe: does fanning out the single-split orders scan help the
  * map-heavy Expand (cube) and bucket-join (range join) queries? */
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

    def cubeA = ops.Relational.cubeAgg(spark, dir)
    def cubeB = FanOut(Tables.orders(spark, dir))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("s"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
        col("n"), col("s"))
      .orderBy("st", "pr")

    def rangeA = ops.Asof.rangeJoinOrders(spark, dir)
    def rangeB = {
      val o = FanOut(Tables.orders(spark, dir)).select(
        col("o_orderkey"), col("o_totalprice"),
        unix_date(to_date(col("o_orderdate"))).as("d"))
      val iv = spark.range(1)
        .select(explode(expr(
          "sequence(to_date('1992-01-01'), to_date('1998-12-01'), interval 1 month)"))
          .as("mstart"))
        .select(col("mstart"), unix_date(col("mstart")).as("s"))
        .withColumn("e", col("s") + 9)
      ops.Asof.rangeJoin(o, "d", iv, "s", "e", bucketWidth = 7L)
        .groupBy("mstart")
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
        .orderBy("mstart")
    }

    println("cube equal: " + (cubeA.collect().toSeq == cubeB.collect().toSeq))
    println("range equal: " + (rangeA.collect().toSeq == rangeB.collect().toSeq))

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 3) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("cube raw    ", cubeA)
    time("cube fanout ", cubeB)
    time("range raw   ", rangeA)
    time("range fanout", rangeB)
    time("cube raw    ", cubeA)
    time("cube fanout ", cubeB)
    time("range raw   ", rangeA)
    time("range fanout", rangeB)
    spark.stop()
  }
}
