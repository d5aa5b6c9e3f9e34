package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Scale-mechanics evidence: partition pruning on date-partitioned
  * layouts, spark.sql entry-point parity, and plan-shape regression
  * guards for the joins the bench depends on. */
class ScaleSpec extends GraftSpec {

  test("date-partitioned writes prune: only matching partitions are scanned") {
    val path = s"$tmpDir/orders_part"
    Tables.orders(spark, sf)
      .withColumn("mo", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("mo").mode("overwrite").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("mo") === "1995-03")
    val exec = pruned.queryExecution.executedPlan.toString
    assert(exec.contains("PartitionFilters: [isnotnull(mo"), exec)
    // the scan must touch exactly the one matching partition directory
    val scanned = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("mo=1995-03")))
    val allMonths = spark.read.parquet(path).select("mo").distinct().count()
    assert(allMonths > 1, "fixture must actually be multi-partition")
  }

  test("spark.sql over registered views equals the DataFrame plan (E3 ≡ E1)") {
    graft.sources.Sources.registerTempViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) sq,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) sep,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) disc,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/count(*) aq,
        |  count(*) n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin).collect()
    val viaDf = Relational.q1PricingSummary(spark, sf).collect()
    assert(viaSql.map(_.toString).toSeq === viaDf.map(_.toString).toSeq)
  }

  test("bench-critical join shapes hold") {
    def plan(q: String) =
      SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
    // dimension chains must broadcast, never sort-merge
    Seq("q3_shipping_priority", "q5_multiway_join").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), q)
    }
    // the salted pair join must distribute, not broadcast onto one split
    assert(plan("dedup_ngram_jaccard").contains("ShuffledHashJoin"))
    // top-k must not globally sort
    assert(plan("q3_shipping_priority").contains("TakeOrderedAndProject"))
  }
}
