package graft

import graft.ops.Recon
import org.apache.spark.sql.functions._

/** Reconciliation invariants (SURVEY §5.3): self-compare is clean, a
  * k-row perturbation is detected as exactly k mismatches, and the
  * missing/matched split partitions the source. */
class ReconSpec extends GraftSpec {

  test("rowcount reports the true per-table counts") {
    val rows = Recon.rowcount(spark, sf).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("orders") === Tables.orders(spark, sf).count())
    assert(rows("lineitem") === Tables.lineitem(spark, sf).count())
  }

  test("hashDiffTables(t, t) = 0 for any table") {
    for (t <- Seq("orders", "customer", "part")) {
      val df = Tables.read(spark, sf, t)
      val key = df.columns.head
      val n = Recon.hashDiffTables(df, df, key, df.columns.toSeq)
        .collect().head.getLong(0)
      assert(n === 0L, s"self-compare of $t")
    }
  }

  test("perturbing k rows yields exactly k mismatches") {
    val o = Tables.orders(spark, sf)
    val k = 7
    val keys = o.select("o_orderkey").orderBy("o_orderkey").limit(k)
      .collect().map(_.getLong(0)).toSeq
    val perturbed = o.withColumn("o_totalprice",
      when(col("o_orderkey").isin(keys: _*), col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
    val n = Recon.hashDiffTables(o, perturbed, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
      .collect().head.getLong(0)
    assert(n === k)
  }

  test("missing + matched partitions the source rowset") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val missing = Recon.missingRows(spark, sf).collect().head.getLong(0)
    val matched = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(missing + matched === o.count())
  }

  test("partition drill-down counts sum to the table count") {
    val drill = Recon.partitionDrill(spark, sf)
    assert(drill.agg(sum("n")).collect().head.getLong(0) === Tables.orders(spark, sf).count())
  }

  test("hashDiffDetail classifies mismatched, missing and extra keys") {
    val o = Tables.orders(spark, sf)
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    val keys = o.select("o_orderkey").orderBy("o_orderkey").limit(9)
      .collect().map(_.getLong(0))
    val (perturb, drop, onlyTgt) = (keys.slice(0, 3), keys.slice(3, 6), keys.slice(6, 9))
    val src = o.filter(!col("o_orderkey").isin(onlyTgt: _*))
    val tgt = o.filter(!col("o_orderkey").isin(drop: _*))
      .withColumn("o_totalprice",
        when(col("o_orderkey").isin(perturb: _*), col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
    val got = Recon.hashDiffDetail(src, tgt, "o_orderkey", cols).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(perturb.forall(k => got.get(k).contains("mismatch")))
    assert(drop.forall(k => got.get(k).contains("missing_in_target")))
    assert(onlyTgt.forall(k => got.get(k).contains("extra_in_target")))
    assert(got.size === 9)
  }

  test("null-position swaps are detected as mismatches") {
    val spark0 = spark
    import spark0.implicits._
    // same key, same non-null value, but in different columns — a naive
    // concat_ws hash would collide and miss the difference
    val src = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "a", "b")
    val tgt = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "a", "b")
    val n = Recon.hashDiffTables(src, tgt, "k", Seq("a", "b"))
      .collect().head.getLong(0)
    assert(n === 1L)
  }

  test("schemaDrift classifies type, missing, and extra columns") {
    val spark0 = spark
    import spark0.implicits._
    val src = Seq((1L, "x", 2.0)).toDF("k", "a", "b")
    val tgt = Seq((1, "x", true)).toDF("k", "a", "c")
    val got = Recon.schemaDrift(src, tgt).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("k" -> "type_mismatch", "a" -> "ok",
      "b" -> "missing_in_target", "c" -> "extra_in_target"))
  }

  test("report localizes the simulated bad load to the right checks") {
    val rows = Recon.report(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows("rowcount")._3, "row counts agree")
    assert(rows("null_custkey")._3, "null counts agree")
    assert(!rows("sum_totalprice")._3, "rounded prices must fail the sum check")
    assert(!rows("hash_mismatches")._3 && rows("hash_mismatches")._1 > 0,
      "row hashes must catch the perturbation")
  }

  test("hash_diff single-scan plan: no join, one scan") {
    val plan = Recon.hashDiff(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "hashDiff must not self-join")
  }
}
