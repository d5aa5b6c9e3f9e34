package graft

import graft.ops.Asof
import org.apache.spark.sql.functions._

/** As-of join semantics against hand-computed expectations. */
class AsofSpec extends GraftSpec {

  // user 1: lefts at t=10,20,30; markers at t=15,25
  // user 2: left at t=5 (no marker before), marker at t=5 for user 3 only
  test("rangeJoin: same pairs as the naive theta join, once each, no nested loop") {
    val spark0 = spark
    import spark0.implicits._
    // intervals of varying span (0..6) so several cross bucket boundaries
    val pts = (0L until 200L).map(i => (i, i * 3 % 97)).toDF("id", "x")
    val ivs = (0L until 30L).map(j => (j, j * 5 % 80, j * 5 % 80 + j % 7)).toDF("iid", "s", "e")
    val joined = graft.ops.Asof.rangeJoin(pts, "x", ivs, "s", "e", bucketWidth = 4L)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = pts.join(ivs, col("x") >= col("s") && col("x") <= col("e"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(joined.toSet === naive)
    assert(joined.length === naive.size, "each pair must meet in exactly one bucket")
    val plan = graft.ops.Asof.rangeJoin(pts, "x", ivs, "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"bucketed range join must equi-join:\n$plan")
  }

  test("rangeJoin fails fast on a __bucket column or shared column names") {
    val spark0 = spark
    import spark0.implicits._
    val pts = Seq((1L, 5L)).toDF("id", "x")
    val ivs = Seq((1L, 0L, 9L)).toDF("iid", "s", "e")
    val clash = intercept[IllegalArgumentException] {
      Asof.rangeJoin(pts.withColumn("__bucket", lit(0)), "x", ivs, "s", "e", 4L)
    }
    assert(clash.getMessage.contains("__bucket"), clash.getMessage)
    val shared = intercept[IllegalArgumentException] {
      Asof.rangeJoin(pts, "x", ivs.withColumnRenamed("iid", "id"), "s", "e", 4L)
    }
    assert(shared.getMessage.contains("disjoint"), shared.getMessage)
  }

  test("asofJoin picks the latest right row at-or-before each left row") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "d"), (3L, 5L, "e")).toDF("k", "t", "tag")
    val right = Seq((1L, 15L, 100.0), (1L, 25L, 200.0), (3L, 5L, 300.0))
      .toDF("k", "rt", "rv")
    // output columns: k, t, tag, rt, rv
    val got = Asof.asofJoin(left, right, "k", "t", "rt").collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(got((1L, "a")) === (None, None))                    // nothing at t<=10
    assert(got((1L, "b")) === (Some(15L), Some(100.0)))        // 15 <= 20
    assert(got((1L, "c")) === (Some(25L), Some(200.0)))        // latest of 15,25
    assert(got((2L, "d")) === (None, None))                    // other key's marker invisible
    assert(got((3L, "e")) === (Some(5L), Some(300.0)))         // equality is inclusive
  }

  test("asof_join_events agrees with a driver-side recomputation") {
    val got = Asof.asofJoinEvents(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(3)), Option(r.get(4)))).toMap
    assert(got.size === 500)
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val purchases = events.filter(_._4 == "purchase")
    events.sortBy(_._1).take(500).foreach { case (id, user, ts, _, _) =>
      val expect = purchases
        .filter(p => p._2 == user && !p._3.after(ts))
        .sortBy(p => (p._3.getTime, p._1)).lastOption
      val (gotPts, gotPv) = got(id)
      assert(gotPts.map(_.getTime / 1000) === expect.map(_._3.getTime / 1000), s"event $id pts")
      assert(gotPv === expect.map(_._5), s"event $id pv")
    }
  }
}
