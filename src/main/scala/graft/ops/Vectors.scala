package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector / embedding block (SURVEY.md §2.9): brute-force cosine kNN,
  * per-label centroids, LSH-bucketed approximate NN.
  *
  * Dot products use `zip_with` + `aggregate` — codegen-friendly Catalyst
  * higher-order functions, no UDF, sequential fold so the double result is
  * deterministic. Vectors are cast float→double once before any join.
  *
  * 100 TB posture: brute force is the small-n baseline; the scale path is
  * [[annLshTopk]] — random-hyperplane buckets make the self-join shuffle
  * O(n × probes) instead of O(n²). Norms are computed once per row before
  * the join, never per pair.
  */
object Vectors {

  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def normalized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Nearest neighbor per vector by cosine similarity over the upper
    * triangle (vec_id < nn), exact brute force. Similarity is rounded to
    * 4 dp *before* the argmax so float-associativity noise cannot flip the
    * winner between engines (SURVEY §7.4 / Appendix A note). */
  def cosineKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = normalized(spark, dir)
    val a = e.select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("nn"), col("v").as("vb"), col("nrm").as("nb"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn"))
    a.join(b, col("vec_id") < col("nn"))
      .select(col("vec_id"), col("nn"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("vec_id")
      .limit(50)
  }

  /** Per-label centroid, emitted long-form as (label, pos, c) — 64 rows per
    * label. Sums go through DECIMAL(18,9) so partial-agg order cannot move
    * the result (same rule as money sums). */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + 1).as("pos"))
      // float→double first: Spark's float→decimal cast goes through the
      // float's shortest string (8 sig digits) and disagrees with engines
      // that round the exact value; widening to double first is exact.
      .agg((sum(col("v").cast("double").cast(DecimalType(18, 9))).cast("double") / count(lit(1))).as("c"))
      .orderBy("label", "pos")

  private val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes (SplitMix64-style mix — no RNG
    * at plan time, so the plan is stable across runs/sessions). */
  private[graft] val planes: Seq[Seq[Double]] =
    (0 until NumPlanes).map { j =>
      (0 until 64).map { i =>
        var x = (j * 64L + i + 1) * 6364136223846793005L + 1442695040888963407L
        x ^= (x >>> 33); x *= -49064778989728563L; x ^= (x >>> 33)
        x.toDouble / Long.MaxValue  // ∈ [-1, 1]
      }
    }

  /** Approximate NN: 8 random-hyperplane sign bits → 256 buckets; exact
    * cosine only within a bucket; top-1 per vector. Recall vs. brute force
    * is asserted in unit tests (no oracle — approximate by design).
    * At scale: more planes per band + multiple bands (same pattern as
    * MinHash-LSH) trade recall for bucket size. */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (0 until NumPlanes).map { j =>
      shiftleft(when(dot(col("v"), typedlit(planes(j))) > 0, lit(1L)).otherwise(lit(0L)), j)
    }.reduce(_ bitwiseOR _)
    val e = normalized(spark, dir).withColumn("bucket", bucket)
    val left = e.select(col("vec_id"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
    val right = e.select(col("vec_id").as("nn"), col("v").as("vb"), col("nrm").as("nb"), col("bucket"))
    val sim = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn"))
    left.join(right, Seq("bucket"))
      .filter(col("vec_id") =!= col("nn"))
      .select(col("vec_id"), col("nn"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("vec_id")
      .limit(50)
  }
}
