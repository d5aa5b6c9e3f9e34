package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture surface (SURVEY §2.1 adjacency): applying an
  * upsert/delete feed to a base snapshot and building type-2 history —
  * the two operations a reconciliation pipeline runs right after it
  * finds a diff ("repair the target", "keep the audit trail").
  *
  * 100 TB posture: `applyChanges` is one anti-join plus a union — the
  * change feed is typically orders of magnitude smaller than the base
  * snapshot, so the anti-join broadcasts and the base table is touched
  * by exactly one scan-shaped pass (no shuffle of the 100 TB side).
  * `scd2` is one window per key timeline: one shuffle on the key, one
  * sort — the same discipline as sessionize.
  */
object Changes {

  /** Keep only the LAST change per key from a CDC feed (compaction):
    * one window + row_number, ordered by `seqCol` descending with the
    * key itself never needed as tiebreak (a CDC log's sequence column
    * is unique per key by construction; duplicated (key, seq) pairs
    * would make "last" meaningless for any engine). */
  def compactChanges(changes: DataFrame, key: String, seqCol: String): DataFrame = {
    require(!changes.columns.contains("__rn"),
      "compactChanges: input must not already contain a __rn column")
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply a compacted change feed (one row per key, `opCol` ∈ I/U/D) to
    * a base snapshot: rows whose key appears in the feed are superseded
    * (deleted for D, replaced for I/U), everything else passes through.
    *
    * Plan shape: left-anti join base⋉keys(changes) + union. The anti
    * join broadcasts whenever the feed fits under
    * `autoBroadcastJoinThreshold`, so the base side never shuffles —
    * the property that makes this viable when base is 100 TB and the
    * feed is a day of changes. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame = {
    val dataCols = changes.columns.filter(_ != opCol)
    require(dataCols.sorted.sameElements(base.columns.sorted),
      s"applyChanges: changes columns ${dataCols.mkString(",")} must match base ${base.columns.mkString(",")}")
    val keys = changes.select(col(key))
    base.join(keys, Seq(key), "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** Build a type-2 (SCD2) history from a versioned feed: per `key`,
    * versions ordered by (`versionCol`, `tiebreak`), each row valid from
    * its own instant until the next version's (`valid_to` null = current).
    * One shuffle on the key, one sort — lead() over the same window. */
  def scd2(df: DataFrame, key: String, versionCol: String,
           tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol), col(tiebreak))
    df.withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(versionCol, "valid_from")
  }

  /** Harness op: orders as a CDC feed over the customer's "latest order
    * state" — SCD2 history rows with validity ranges, first 500 by
    * (custkey, valid_from, orderkey). */
  def scd2Orders(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables.orders(spark, dir), "o_custkey", "o_orderdate", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
      .limit(500)

  /** Harness op: a synthetic I/U/D feed applied to a base snapshot of
    * orders, verified by per-status rowcount + exact DECIMAL money sum +
    * restated-row count of the FINAL state (any misplaced row moves a
    * sum). Base = keys not ≡0 (mod 10); inserts are the missing tenth,
    * updates restate price to whole dollars on keys ≡0 (mod 7), deletes
    * drop keys ≡0 (mod 13). */
  def mergeUpsertOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val base = o.filter(col("o_orderkey") % 10 =!= 0)
    val inserts = o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("op", lit("I"))
    val updates = o.filter(col("o_orderkey") % 10 =!= 0 &&
        col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice", round(col("o_totalprice"), 0))
      .withColumn("o_orderpriority", lit("5-RESTATED"))
      .withColumn("op", lit("U"))
    val deletes = o.filter(col("o_orderkey") % 10 =!= 0 &&
        col("o_orderkey") % 13 === 0)
      .withColumn("op", lit("D"))
    val fin = applyChanges(base, inserts.unionByName(updates).unionByName(deletes),
      "o_orderkey")
    fin.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Recon.decSum(col("o_totalprice")).as("sum_price"),
        count(when(col("o_orderpriority") === "5-RESTATED", 1)).as("n_restated"))
      .orderBy("o_orderstatus")
  }

  /** Deterministic CDC micro-batch carrying SEVERAL seq'd changes per key
    * — the feed shape [[graft.streaming.StreamingOps.applyChangesBatch]]
    * compacts before applying. Keys ≡0 (mod 7, not 13): a stale seq-1
    * price restatement (+1e6, poisoned so any survival moves the sums)
    * superseded by the seq-2 whole-dollar restatement that must win;
    * keys ≡0 (mod 13): a poisoned seq-1 update superseded by a seq-2
    * delete (the delete must survive compaction); keys ≡0 (mod 10) (not
    * in the base): uncontested seq-1 inserts. */
  def cdcFeedOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val upd7 = o.filter(col("o_orderkey") % 10 =!= 0 &&
      col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
    val del13 = o.filter(col("o_orderkey") % 10 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    upd7.withColumn("o_totalprice", col("o_totalprice") + 1000000)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      .unionByName(upd7
        .withColumn("o_totalprice", round(col("o_totalprice"), 0))
        .withColumn("o_orderpriority", lit("5-RESTATED"))
        .withColumn("op", lit("U")).withColumn("seq", lit(2L)))
      .unionByName(del13
        .withColumn("o_totalprice", col("o_totalprice") + 1000000)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L)))
      .unionByName(del13
        .withColumn("op", lit("D")).withColumn("seq", lit(2L)))
      .unionByName(o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("op", lit("I")).withColumn("seq", lit(1L)))
  }

  /** The final snapshot state [[graft.streaming.StreamingOps.applyChangesBatch]]
    * produces from [[cdcFeedOrders]]: its LITERAL transform core —
    * [[compactChanges]] (last change per key by seq) then
    * [[applyChanges]] — over the base of keys not ≡0 (mod 10). The
    * version/pointer I/O around the transform stays StreamingSpec-
    * verified (replay idempotence needs a real sink); the merge
    * semantics themselves are mode-independent and land here. */
  def cdcApplyFinal(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).filter(col("o_orderkey") % 10 =!= 0)
    val compacted = compactChanges(cdcFeedOrders(spark, dir),
      "o_orderkey", "seq").drop("seq")
    applyChanges(base, compacted, "o_orderkey")
  }

  /** Batch-parity anchor for the CONTINUOUS CDC apply twin — summarizes
    * [[cdcApplyFinal]] per status (rowcount + exact decimal money sum +
    * restated count: a stale seq-1 row surviving compaction shifts
    * sum_price by ~1e6, a lost delete shifts n), so the driver's DuckDB
    * oracle grounds the compaction+merge semantics and the StreamingSpec
    * parity test asserts a real foreachBatch run over the same feed —
    * seqs split across two micro-batches — converges to the identical
    * snapshot (the `recon_stream_hash_diff` recipe). */
  def cdcApplyParity(spark: SparkSession, dir: String): DataFrame =
    cdcApplyFinal(spark, dir).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Recon.decSum(col("o_totalprice")).as("sum_price"),
        count(when(col("o_orderpriority") === "5-RESTATED", 1)).as("n_restated"))
      .orderBy("o_orderstatus")
}
