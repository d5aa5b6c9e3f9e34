package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Connected-components invariants: known component structure, chain
  * convergence past several rounds, and the end-to-end minhash→cluster
  * pipeline on an identical-document flood. */
class GraphSpec extends GraftSpec {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark0 = spark
    import spark0.implicits._
    Graph.connectedComponents(edges.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components resolve to their min ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (5L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("a chain longer than a few rounds still converges to one label") {
    // path graph 10-11-...-19: min-label needs ~diameter rounds
    val got = components((10L until 19L).map(i => (i, i + 1)))
    assert(got.values.toSet === Set(10L))
    assert(got.size === 10)
  }

  test("reliable-storage checkpoint path yields the same components") {
    // checkpointDir routes lineage truncation to `checkpoint` (survives
    // executor loss on a real cluster) instead of localCheckpoint; the
    // labels must be identical and the checkpoint dir actually used
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graph-ckpt").toString
    val got = Graph.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("a_id", "b_id"),
        checkpointDir = Some(dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    def treeSize(p: java.io.File): Int =
      if (p.isDirectory) p.listFiles.map(treeSize).sum else 1
    assert(treeSize(new java.io.File(dir)) > 0,
      s"no checkpoint files written under $dir")
  }

  test("a capped non-converged run throws instead of returning split labels") {
    val spark0 = spark
    import spark0.implicits._
    // path graph of diameter 9 cannot settle in 3 rounds; silently
    // returning would split one component across several labels
    val chain = (10L until 19L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("maxIter"), e.getMessage)
  }

  test("local union-find matches distributed connectedComponents") {
    // dedupClusters' answer-sized driver path and the distributed loop
    // must agree on min-label components for the same edge list
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 7L), (9L, 8L), (8L, 4L))
    assert(Graph.unionFindLocal(edges) === components(edges))
  }

  test("flood fixture: minhash pairs collapse into a single cluster") {
    val floodDir = TextFixture.writeFlood(spark, s"$tmpDir/g")
    val rows = Graph.dedupClusters(spark, floodDir).collect()
    assert(rows.length === 1, rows.mkString(","))
    assert(rows.head.getLong(0) === 1L, "canonical id is the minimum doc id")
    // every doc that appeared in a candidate pair is in the one cluster
    val paired = graft.ops.Text.dedupMinhash(spark, floodDir)
      .filter(col("est_jaccard") >= 0.8)
      .select(explode(array(col("a_id"), col("b_id")))).distinct().count()
    assert(rows.head.getLong(1) === paired)
  }
}
