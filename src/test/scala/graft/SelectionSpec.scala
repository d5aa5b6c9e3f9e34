package graft

import graft.ops.Selection

/** Distributed selection against a driver-side sort recompute — edge
  * groups included: constant-valued (zero bucket width), magnitudes 1e6
  * apart (per-group auto widths), boundary ranks 1 and n. */
class SelectionSpec extends GraftSpec {

  test("valueAtRanks equals a sort-based recompute, across magnitudes") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    // a: range ~1e6; b: range ~1e-3; c: constant — one width fits none,
    // so this fails unless widths are derived per group
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to 500) yield
      (g, g match {
        case "a" => rnd.nextDouble() * 1e6
        case "b" => rnd.nextDouble() * 0.001
        case _   => 42.0
      })
    val base = rows.toDF("g", "v")
    val ranks = Seq(("a", 1L), ("a", 250L), ("a", 500L), ("b", 17L),
      ("b", 499L), ("c", 250L)).toDF("g", "rank")
    val got = Selection.valueAtRanks(base, Seq("g"), "v", ranks).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sorted = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val expected = ranks.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .map { case (g, k) => (g, k) -> sorted(g)((k - 1).toInt) }.toMap
    assert(got === expected)
  }

  test("valueAtRanks: out-of-range ranks yield no rows, in-range survive") {
    val spark0 = spark
    import spark0.implicits._
    val base = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "v")
    val ranks = Seq(("g", 2L), ("g", 4L)).toDF("g", "rank")
    val got = Selection.valueAtRanks(base, Seq("g"), "v", ranks).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got === Map(2L -> 2.0))
  }
}
