package graft

import graft.ops.Vectors
import org.apache.spark.sql.functions._

/** Vector ops against a clustered fixture where true neighbors are known
  * by construction — the verification story for ann_lsh_topk (no oracle)
  * — plus exactness checks for centroids on real data. */
class VectorsSpec extends GraftSpec {
  import VectorsFixture._

  lazy val fixtureDir: String = writeFixture(spark, tmpDir)

  test("cosine_knn: every neighbor comes from the same cluster") {
    val rows = Vectors.cosineKnn(spark, fixtureDir).collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val (id, nn, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      // the op scans the upper triangle (nn > id), so the highest id in a
      // cluster has no same-cluster candidate left — skip those five
      if (id % 10 != 9) {
        assert(cluster(id) === cluster(nn), s"vec $id paired with $nn")
        assert(sim > 0.9 && sim <= 1.0)
      }
    }
  }

  test("ann_lsh_topk: recall vs brute force on clustered data") {
    val got = Vectors.annLshTopk(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "LSH must return candidates")
    // brute-force true NN per vector (any direction, ties to lowest id,
    // sim rounded to 4 dp — mirroring the op's determinism rules)
    val vecs = embeddingRows.map(e => e.vec_id -> e.embedding.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.rint(d / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum) * 1e4) / 1e4
    }
    val trueNn = vecs.keys.map { id =>
      id -> vecs.keys.filter(_ != id)
        .map(o => (o, cos(vecs(id), vecs(o))))
        .minBy { case (o, s) => (-s, o) }._1
    }.toMap
    val hits = got.count { case (id, nn) => trueNn(id) == nn }
    val recall = hits.toDouble / got.size
    assert(recall >= 0.7, s"recall $recall (${hits}/${got.size})")
  }

  test("ann_ivf_topk: recall vs brute force on clustered data") {
    val got = Vectors.annIvfTopk(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "IVF must return candidates")
    val sameCluster = got.count { case (id, nn) => cluster(id) == cluster(nn) }
    assert(sameCluster.toDouble / got.size >= 0.8,
      s"IVF neighbor in true cluster: $sameCluster/${got.size}")
  }

  test("knn_label_accuracy: planted clusters score perfectly, guard fires") {
    // 10 tight clusters labeled by cluster id: all 5 nearest neighbors
    // of every vector share its label, so the majority vote must be
    // exact for every label class
    val rows = Vectors.knnLabelAccuracy(spark, fixtureDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) === 10L, s"label ${r.getInt(0)} n=${r.getLong(1)}")
      assert(r.getLong(2) === 10L && r.getDouble(3) === 1.0,
        s"label ${r.getInt(0)} acc=${r.getDouble(3)}")
    }
    // same fail-fast contract as cosine_knn: refuse past the row guard
    val e = intercept[IllegalArgumentException] {
      Vectors.knnLabelAccuracy(spark, fixtureDir, maxRows = 10L)
    }
    assert(e.getMessage.contains("brute force"), e.getMessage)
  }

  test("dedup_embedding flags planted near-dupes, only real ones") {
    val rows = Vectors.dedupEmbedding(spark, fixtureDir, 0.95).collect()
    val dups = rows.filter(_.getBoolean(3))
    assert(dups.nonEmpty, "clustered fixture must contain cosine near-dupes")
    dups.foreach { r =>
      assert(cluster(r.getLong(0)) === cluster(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) crosses clusters")
      assert(r.getDouble(2) >= 0.95)
    }
  }

  test("cosine_knn refuses brute force past maxRows, pointing at the ANN ops") {
    val e = intercept[IllegalArgumentException] {
      Vectors.cosineKnn(spark, fixtureDir, maxRows = 10)
    }
    assert(e.getMessage.contains("annLshTopk"), e.getMessage)
    // at-or-under the bound still runs (100-vector fixture)
    assert(Vectors.cosineKnn(spark, fixtureDir, maxRows = 100).count() === 50)
  }

  test("embed_centroids equals a driver-side mean to 1e-6") {
    val got = Vectors.embedCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val expected = raw.groupBy(_._1).flatMap { case (label, rows) =>
      (1 to 64).map { pos =>
        (label, pos) -> rows.map(_._2(pos - 1).toDouble).sum / rows.length
      }
    }
    expected.foreach { case (key, c) =>
      assert(math.abs(got(key) - c) < 1e-6, s"centroid $key")
    }
  }

  test("quantize stats: driver recompute per label, cosine near 1, counts conserve") {
    val got = Vectors.quantizeStats(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val raw = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    assert(got.values.map(_._1).sum === raw.length.toLong)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = raw.groupBy(_._1).map { case (label, rows) =>
      val per = rows.map { case (_, v) =>
        val scale = v.map(math.abs).max
        // HALF_UP like the engines' round(); rint would half-even
        val q = v.map { x =>
          BigDecimal(127 * x / scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble * scale / 127
        }
        def dot(a: Array[Double], b: Array[Double]) =
          a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
        val mse = (dot(v, v) - 2 * dot(v, q) + dot(q, q)) / v.length * 1e6
        val cos = dot(v, q) / (math.sqrt(dot(v, v)) * math.sqrt(dot(q, q)))
        (r6(scale), r6(mse), r6(cos))
      }
      label -> (per.length.toLong,
        r6(per.map(p => math.rint(p._1 * 1e6).toLong).sum / 1e6 / per.length),
        r6(per.map(p => math.rint(p._2 * 1e6).toLong).sum / 1e6 / per.length),
        r6(per.map(p => math.rint(p._3 * 1e6).toLong).sum / 1e6 / per.length))
    }
    expect.foreach { case (label, (n, sc, mse, cos)) =>
      val g = got(label)
      assert(g._1 === n, s"label $label n")
      assert(math.abs(g._2 - sc) < 2e-6, s"label $label scale")
      assert(math.abs(g._3 - mse) < 2e-6, s"label $label mse")
      assert(math.abs(g._4 - cos) < 2e-6, s"label $label cos")
      assert(g._4 > 0.999 && g._4 <= 1.0, s"label $label cosine sanity")
    }
  }
}

object VectorsFixture {
  case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  /** 10 clusters × 10 vectors: unit base direction + 5% noise, so each
    * vector's true nearest neighbor is inside its cluster. Deterministic
    * (fixed seed). */
  val embeddingRows: Seq[Emb] = {
    val rnd = new scala.util.Random(7)
    (0 until 10).flatMap { c =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 10).map { i =>
        val v = base.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
        Emb(c * 10L + i, v, c)
      }
    }
  }

  def cluster(id: Long): Long = id / 10

  def writeFixture(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import spark.implicits._
    embeddingRows.toDF().write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }
}
