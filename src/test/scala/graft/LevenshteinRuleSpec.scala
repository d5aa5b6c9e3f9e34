package graft

import graft.plans.LevenshteinThresholdRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-edit-distance optimizer rewrite: firing, soundness
  * against the unrewritten form, null handling, idempotence. */
class LevenshteinRuleSpec extends AnyFunSuite {
  import TestSpark.spark

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinThresholdRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinThresholdRule)
  }

  test("three-arg levenshtein contract the rewrite relies on") {
    // d <= threshold → true distance; d > threshold → -1; null → null
    val r = spark.sql(
      """SELECT levenshtein('kitten', 'sitting', 3),
        |       levenshtein('kitten', 'sitting', 2),
        |       levenshtein('abc', CAST(NULL AS STRING), 2)""".stripMargin)
      .collect().head
    assert(r.getInt(0) === 3 && r.getInt(1) === -1 && r.isNullAt(2))
  }

  test("rule fires on <=, <, and the literal-first mirror; leaves others alone") {
    val spark0 = spark
    import spark0.implicits._
    // a literal LocalRelation constant-folds away entirely — go through
    // parquet so the filter survives into the optimized plan
    val path = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(("kitten", "sitting")).toDF("a", "b").write.mode("overwrite").parquet(path)
    withRule {
      val base = spark.read.parquet(path)
      val opt = base.filter(levenshtein(col("a"), col("b")) <= 3)
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(a#") && opt.contains("Some(3)) >= 0"),
        s"expected the banded form:\n$opt")
      val lt = base.filter(levenshtein(col("a"), col("b")) < 3)
        .queryExecution.optimizedPlan.toString
      assert(lt.contains("Some(2)) >= 0"), s"< k must band at k-1:\n$lt")
      // a raw projection of the distance itself must NOT be rewritten
      val proj = base.select(levenshtein(col("a"), col("b")).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!proj.contains(">= 0"), proj)
    }
  }

  test("rewritten filter selects exactly the rows the naive form selects") {
    val spark0 = spark
    import spark0.implicits._
    val words = Seq("STANDARD", "STANDAR", "standard", "PROMO", "",
      "STANDARDIZED", "SAND", "TANDEM", "S", "STENDERD")
    val pairs = for (a <- words; b <- words) yield (a, b)
    def run() = pairs.toDF("a", "b")
      .filter(levenshtein(col("a"), col("b")) <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = run()                 // no rule registered
    val rewritten = withRule(run())
    assert(rewritten === naive)
    assert(naive.nonEmpty && naive.size < pairs.size, "fixture must discriminate")
  }

  test("null inputs stay excluded by the rewritten predicate") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((Option("abc"), Option("abd")), (None, Option("x")),
      (Option("y"), None)).toDF("a", "b")
    val got = withRule {
      df.filter(levenshtein(col("a"), col("b")) <= 2).collect()
        .map(_.getString(0)).toSeq
    }
    assert(got === Seq("abc"))
  }
}
