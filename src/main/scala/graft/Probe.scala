package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: connectedComponents change-count — carried prev column
  * (current) vs re-join against the previous labels (old form). */
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

    def ccJoin(pairs: DataFrame, maxIter: Int = 15): DataFrame = {
      val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
        .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
        .distinct()
        .localCheckpoint(true)
      var labels = edges.select(col("u").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        val nbrMin = edges
          .join(labels.select(col("id").as("v"), col("label").as("vl")), "v")
          .groupBy(col("u").as("id")).agg(min(col("vl")).as("nl"))
        val next = labels.join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"),
            least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
          .localCheckpoint(true)
        changed = next.join(labels.withColumnRenamed("label", "old"), "id")
          .filter(col("label") =!= col("old")).count()
        labels = next
        iter += 1
      }
      labels
    }

    val pairs = ops.Text.dedupMinhash(spark, dir)
      .filter(col("est_jaccard") >= 0.8)
      .select("a_id", "b_id")
      .localCheckpoint(true)   // isolate the CC loop from minhash cost

    def viaCarried = ops.Graph.connectedComponents(pairs)
    def viaJoin = ccJoin(pairs)

    def time(name: String, mk: => DataFrame): Unit = {
      for (_ <- 1 to 2) mk.queryExecution.toRdd.count()
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    time("cc carried prev", viaCarried)
    time("cc join count  ", viaJoin)
    time("cc carried prev", viaCarried)
    time("cc join count  ", viaJoin)
    spark.stop()
  }
}
