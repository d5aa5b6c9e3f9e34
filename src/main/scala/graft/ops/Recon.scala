package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reconciliation core — the reference's own capability surface
  * (SURVEY.md §2.1; reference reconstruction [D], repo empty at survey time).
  *
  * 100 TB posture: every op here is a pure scan→agg/join pipeline with no
  * driver-side state. Row-hash compare (`hashDiff`) shuffles both sides on
  * the key — at scale the two sides would be bucketed on the key so the
  * join is co-located; the checksum itself is computed map-side so only
  * (key, hash) pairs ever move, not full rows.
  */
object Recon {
  /** Money-exact aggregation: sum as DECIMAL so partial-aggregation order
    * cannot change final ulps (SURVEY §7.4.1), surfaced as double. */
  private[ops] def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Per-table row counts — the most basic source/target compare. */
  def rowcount(spark: SparkSession, dir: String): DataFrame = {
    def one(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
    one("orders", Tables.orders(spark, dir))
      .unionByName(one("lineitem", Tables.lineitem(spark, dir)))
      .orderBy("tbl")
  }

  /** Per-column fingerprint: count / distinct / sum / min / max — localizes
    * which column diverged between source and target. */
  def colaggFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("cnt"),
      countDistinct(col("l_orderkey")).as("dk"),
      decSum(col("l_quantity")).as("sq"),
      min(col("l_extendedprice")).as("mn"),
      max(col("l_extendedprice")).as("mx"),
      decSum(col("l_extendedprice") * col("l_discount")).as("rev"))

  /** Row-level checksum compare: md5 over normalized column text on both
    * sides, join on key, count hash mismatches. The "target" side simulates
    * a bad load by rounding the price. Doubles are normalized through
    * DECIMAL(12,2) so the concat text is identical in any engine. */
  def hashDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def rowHash(price: Column) = md5(concat_ws("|",
      col("o_custkey").cast("string"), col("o_orderstatus"),
      price.cast(DecimalType(12, 2)).cast("string")))
    val src = o.select(col("o_orderkey").as("k"), rowHash(col("o_totalprice")).as("h_src"))
    val tgt = o.select(col("o_orderkey").as("k"), rowHash(round(col("o_totalprice"), 0)).as("h_tgt"))
    src.join(tgt, "k")
      .filter(col("h_src") =!= col("h_tgt"))
      .agg(count(lit(1)).as("mismatches"))
  }

  /** Keys present in source but absent in target (anti-join). */
  def missingRows(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n"))

  /** Partition drill-down: counts + sums per load month, to attribute a
    * mismatch to a specific load window. */
  def partitionDrill(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("s"))
      .orderBy("mo")
}
