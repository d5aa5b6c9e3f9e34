package graft

import graft.ops.{Recon, Relational, Text}

/** Golden end-to-end values at sf0.001 (SURVEY §5.4): catches silent
  * semantic drift between sessions. Expected values were computed with
  * DuckDB 1.0.0 on the same parquet (tools/compare.py oracle path). */
class GoldenSpec extends GraftSpec {

  test("q1_pricing_summary golden") {
    val got = Relational.q1PricingSummary(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        math.rint(r.getDouble(4) * 1e4) / 1e4, math.rint(r.getDouble(5) * 1e6) / 1e6, r.getLong(6))
    }.toSeq
    val expected = Seq(
      ("A", "F", 13096.0, 2.673189014e7, 2.53687625198e7, 25.678431, 510L),
      ("A", "O", 13173.0, 2.726702909e7, 2.5899278959e7, 24.668539, 534L),
      ("N", "F", 15619.0, 3.178810213e7, 3.0158055965e7, 26.294613, 594L),
      ("N", "O", 13130.0, 2.777823879e7, 2.63255367587e7, 24.867424, 528L),
      ("R", "F", 13038.0, 2.854343997e7, 2.70690228592e7, 24.553672, 531L),
      ("R", "O", 13188.0, 2.767470211e7, 2.63334077788e7, 24.977273, 528L))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3 && g._7 === e._7, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 0.01 && math.abs(g._5 - e._5) < 0.01)
      assert(math.abs(g._6 - e._6) < 1e-5)
    }
  }

  test("recon_rowcount golden") {
    val got = Recon.rowcount(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === Seq("lineitem" -> 6000L, "orders" -> 1500L))
  }

  test("dedup_exact_docs golden") {
    assert(Text.dedupExact(spark, sf).collect().head.getLong(0) === 0L)
  }
}
