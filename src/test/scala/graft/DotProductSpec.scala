package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._

/** Native dot_product expression: value parity with a driver-side
  * computation, null contract, type check, and codegen execution. */
class DotProductSpec extends GraftSpec {

  test("matches a driver-side sequential fold bit-for-bit") {
    val spark0 = spark
    import spark0.implicits._
    val a = Seq(0.1, -2.5, 3.25, 1e-7, 42.0)
    val b = Seq(1.5, 0.25, -1.125, 2e3, 0.5)
    val got = Seq((a, b)).toDF("a", "b")
      .select(DotProduct.dot(col("a"), col("b"))).collect().head.getDouble(0)
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    assert(got === expected)
  }

  test("null array, mismatched lengths, and null elements all yield null") {
    val spark0 = spark
    import spark0.implicits._
    val nullArr = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    assert(nullArr.select(DotProduct.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
    // a dimensionality bug must surface as null, never a truncated sum
    val mismatched = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0)))
      .toDF("a", "b")
    assert(mismatched.select(DotProduct.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(10.0), Some(20.0))))
      .toDF("a", "b")
    assert(nullElem.select(DotProduct.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("null contract holds on the codegen (parquet-scan) path too") {
    // local-relation projections are pre-evaluated interpreted; force the
    // generated code by writing the fixtures to parquet and scanning back
    val spark0 = spark
    import spark0.implicits._
    val path = s"$tmpDir/dot_null_contract"
    Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0), Some(3.0))), Some(Seq(Some(4.0), Some(5.0), Some(6.0)))),
      (2L, Some(Seq(Some(1.0), Some(2.0), Some(3.0))), Some(Seq(Some(4.0), Some(5.0)))),
      (3L, Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(4.0), Some(5.0), Some(6.0)))),
      (4L, None: Option[Seq[Option[Double]]], Some(Seq(Some(4.0), Some(5.0), Some(6.0)))))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(path)
    val got = spark.read.parquet(path)
      .select(col("id"), DotProduct.dot(col("a"), col("b")).as("d"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_product"), plan)
    val rows = got.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows === Map(1L -> Some(32.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("rejects non-double-array inputs at analysis time") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq((Seq(1, 2), Seq(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      bad.select(DotProduct.dot(col("a"), col("b"))).collect()
    }
  }

  test("runs inside whole-stage codegen (no fallback)") {
    // a projection over local data is pre-evaluated by ConvertToLocalRelation,
    // so the codegen claim must be checked over a real (parquet) scan
    val v = col("embedding").cast("array<double>")
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"), DotProduct.dot(v, v).as("d"))
    // "*(n)" is simpleString's WholeStageCodegen marker; the projection
    // containing dot_product must carry it (a fallback loses the star)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_product"), plan)
    val got = df.orderBy("vec_id").limit(1).collect().head.getDouble(1)
    val emb = Tables.embeddings(spark, sf).orderBy("vec_id").limit(1)
      .collect().head.getSeq[Float](1).map(_.toDouble)
    assert(got === emb.foldLeft(0.0)((s, x) => s + x * x))
  }
}
