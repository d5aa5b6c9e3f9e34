package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed selection: exact value-at-rank per group without a
  * row-count-sized sort, buffer, or shuffle anywhere in the plan.
  *
  * The alternatives all hold row-count-sized state somewhere: Spark's
  * exact `percentile`/`percentile_disc` aggregates buffer every value
  * per group in an imperative map (OOM on continuous columns at scale),
  * and the sort+row_number formulation externally sorts the full stream
  * per group. This is the classic two-round selection instead: histogram
  * counts locate each rank's bucket, then only that bucket's rows (≈
  * 1/buckets of the data) are examined exactly. Every intermediate frame
  * is group- or bucket-sized; the only full-stream operations are scans
  * with map-side-combinable aggregates. At 100 TB this is the difference
  * between a metadata-sized shuffle and spilling the fact table.
  */
object Selection {

  /** For every (group, rank) row of `ranks`, the rank-th smallest value
    * (1-based) of `vCol` within that group of `base`.
    *
    * Three passes over `base`, each ending in a tiny frame:
    *   0. (min, max) per group → per-group bucket width — no hand-tuned
    *      scale constants, any value distribution;
    *   1. counts per (group, bucket); a cumsum over the bucket-sized
    *      frame locates each rank's bucket and its preceding-rank
    *      offset;
    *   2. rows of the target buckets only, counted per distinct value;
    *      the offset-adjusted cumsum picks the exact value.
    *
    * Output: groupCols :+ ("rank", "value"). Preconditions: `vCol`
    * non-null/non-NaN, every rank within [1, group row count]; ranks
    * outside the range yield no output row for that (group, rank).
    */
  def valueAtRanks(base: DataFrame, groupCols: Seq[String], vCol: String,
                   ranks: DataFrame, buckets: Int = 1024): DataFrame = {
    require(groupCols.nonEmpty, "valueAtRanks: need at least one group column")
    require(buckets > 1, s"valueAtRanks: need buckets > 1: $buckets")
    require(ranks.columns.contains("rank"),
      s"valueAtRanks: ranks frame needs a 'rank' column, got ${ranks.columns.mkString(", ")}")
    require(groupCols.forall(ranks.columns.contains),
      s"valueAtRanks: ranks frame must carry the group columns ${groupCols.mkString(", ")}")
    val gcols = groupCols.map(col)
    val scratch = Seq("__mn", "__mx", "__w", "__b", "__c", "__cum", "__tb",
      "__prev", "rank", "value")
    scratch.foreach { c =>
      require(!base.columns.contains(c) || c == vCol,
        s"valueAtRanks: base must not already contain a '$c' column")
    }

    val stats = base.groupBy(gcols: _*)
      .agg(min(vCol).as("__mn"), max(vCol).as("__mx"))
      .withColumn("__w", when(col("__mx") > col("__mn"),
        (col("__mx") - col("__mn")) / buckets).otherwise(lit(1.0)))
    def bucketed = base.join(broadcast(stats), groupCols)
      .withColumn("__b", floor((col(vCol) - col("__mn")) / col("__w")))

    val bcounts = bucketed.groupBy((gcols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c")
        .over(Window.partitionBy(gcols: _*).orderBy("__b")))
    val targets = ranks.join(bcounts, groupCols)
      .filter(col("__cum") >= col("rank"))
      .groupBy((gcols :+ col("rank")): _*)
      .agg(min_by(struct(col("__b").as("__tb"),
        (col("__cum") - col("__c")).as("__prev")), col("__b")).as("__t"))
      .select((gcols :+ col("rank") :+ col("__t.__tb") :+ col("__t.__prev")): _*)

    bucketed
      .join(broadcast(targets.withColumnRenamed("__tb", "__b")),
        groupCols :+ "__b")
      .groupBy((gcols ++ Seq(col("rank"), col("__prev"), col(vCol))): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", col("__prev") + sum("__c")
        .over(Window.partitionBy((gcols :+ col("rank")): _*).orderBy(vCol)))
      .filter(col("__cum") >= col("rank"))
      .groupBy((gcols :+ col("rank")): _*)
      .agg(min(vCol).as("value"))
  }
}
