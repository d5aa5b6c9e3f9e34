package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Structural invariants for the relational block at sf0.001 (values are
  * oracle-checked by the driver; these pin shape and local recomputation). */
class RelationalSpec extends GraftSpec {

  test("q21: only the sole-late supplier of multi-supplier F orders counts, per line") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/q21"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "SuppA", 0, 0.0), (2L, "SuppB", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"), (5L, "F"))
      .map { case (k, st) => (k, 1L, st, 100.0, ts("2025-01-01"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val late = ts("2025-06-01"); val late2 = ts("2025-07-01")
    val ontime = ts("2025-01-15")
    Seq(
      (1L, 1L, late), (1L, 2L, ontime),  // A sole-late, multi-supplier → +1
      (2L, 1L, late), (2L, 2L, late),    // both late → neither counts
      (3L, 1L, late),                    // single-supplier → no count
      (4L, 1L, late), (4L, 2L, ontime),  // status O → excluded
      (5L, 1L, late), (5L, 1L, late2), (5L, 2L, ontime)) // two late LINES → +2
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.q21WaitingSuppliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("SuppA", "N0", 3L)))
  }

  test("basket size profile: distinct-part collapse and shares recount by hand") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/basketprofile"
    // baskets: o1={p1}, o2={p2}, o3={p1,p2} (with a duplicate line that
    // the distinct collapse must drop), o4={p1,p2,p3}
    Seq((1L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (3L, 1L),
        (4L, 1L), (4L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.basketSizeProfile(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.5), (2L, 1L, 0.25), (3L, 1L, 0.25)))
  }

  test("supplier scorecard: hand fixture incl. the exact /2^k rounding tie") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/scorecard"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val d0 = java.time.LocalDate.parse("2025-01-01")
    def ship(lag: Int) = ts(d0.plusDays(lag).toString)
    Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "SuppA", 0, 0.0), (2L, "SuppB", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, "F", 0.0, ts("2025-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // A: one late (lag 100, rev 100*0.9), one on-time (lag 10);
    // B: 16 late lines, lag sum 1035 → mean 64.6875, an EXACT binary
    // tie at 3 dp — the integer half-away spelling must give 64.688
    val aLines = Seq((1L, 1L, ship(100), 100.0, 0.1),
      (1L, 1L, ship(10), 50.0, 0.0))
    val bLines = Seq.fill(15)((1L, 2L, ship(65), 10.0, 0.0)) :+
      ((1L, 2L, ship(60), 10.0, 0.0))
    (aLines ++ bLines)
      .toDF("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.supplierScorecard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      ("SuppB", 16L, 16L, 1.0, 64.688, 160.0),
      ("SuppA", 2L, 1L, 0.5, 55.0, 90.0)))
  }

  test("q1: six (returnflag, linestatus) groups, avg consistent with sum/count") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) - r.getDouble(2) / r.getLong(6)) < 1e-9)
    }
  }

  test("window top-k: at most 3 per brand, ranks 1..3") {
    val rows = Relational.windowTopkPerGroup(spark, sf).collect()
    val byBrand = rows.groupBy(_.getString(0))
    byBrand.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getInt(3)).sorted.toSeq === (1 to g.length))
      // descending price within brand
      assert(g.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
        === g.map(_.getDouble(2)).sorted.reverse.toSeq)
    }
  }

  test("rollup: grand-total row aggregates the whole table") {
    val all = Relational.rollupAgg(spark, sf).collect()
      .find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(all.getLong(2) === 1500L)
  }

  test("set_ops: intersection is a subset of both sides") {
    val got = Relational.setOps(spark, sf).collect().map(_.getLong(0)).toSet
    val building = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val big = Tables.orders(spark, sf).filter(col("o_totalprice") > 1000)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.subsetOf(building) && got.subsetOf(big))
  }

  test("scalar funcs recompute driver-side") {
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_retailprice", "p_brand", "p_size")
      .orderBy("p_partkey").limit(100).collect()
      .map(r => r.getLong(0) -> r).toMap
    Relational.scalarFuncs(spark, sf).collect().foreach { r =>
      val p = parts(r.getLong(0))
      assert(r.getString(1) === p.getString(1).take(8).toUpperCase)
      val pr = BigDecimal(p.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * BigDecimal("1.1")
      assert(math.abs(r.getDouble(3) - pr.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getString(4) === s"${p.getString(3)}#${p.getInt(4)}")
    }
  }

  test("pivot: per-status columns sum back to the per-priority totals") {
    val rows = Relational.pivotAgg(spark, sf).collect()
    val totals = Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === totals.size)
    rows.foreach { r =>
      val n = r.getLong(1) + r.getLong(3) + r.getLong(5) // F_n + O_n + P_n
      assert(n === totals(r.getString(0)), r.getString(0))
    }
    // canonical pivot plan: (prio,status) agg shuffle + pivotfirst shuffle
    // + final sort — and NOT a scan or shuffle per pivot value
    val plan = Relational.pivotAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length <= 4, s"pivot over-shuffles:\n$plan")
    assert(plan.split("FileScan").length == 2, s"pivot must scan once:\n$plan")
  }

  test("stats battery recomputes driver-side for one flag") {
    val got = Relational.statsFuncs(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val q = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .select("l_quantity").collect().map(_.getDouble(0))
    val mean = q.sum / q.length
    val varS = q.map(x => (x - mean) * (x - mean)).sum / (q.length - 1)
    assert(math.abs(got("R").getDouble(2) - varS) < 1e-3)
    assert(math.abs(got("R").getDouble(1) - math.sqrt(varS)) < 1e-3)
    assert(got("R").getLong(5) === q.length.toLong)
  }

  test("quantileApprox: rank error within the GK bound of the exact answer") {
    val approx = Relational.quantileApprox(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val exact = Tables.orders(spark, sf).select("o_orderstatus", "o_totalprice")
      .collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getDouble(1)).sorted }
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (s, (p50, p95, n)) =>
      val vals = exact(s)
      assert(n === vals.length.toLong)
      // approx_percentile returns an actual element whose rank is within
      // n/accuracy of the target rank (+1 for the discrete step)
      def rankOf(v: Double) = vals.count(_ <= v).toDouble
      assert(math.abs(rankOf(p50) - 0.5 * n) <= n / 10000.0 + 1.0, s"$s p50")
      assert(math.abs(rankOf(p95) - 0.95 * n) <= n / 10000.0 + 1.0, s"$s p95")
    }
  }

  test("histogram: buckets partition the table, bounds sit inside their bin") {
    val rows = Relational.histogramAgg(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
      assert(mn >= b * 25000.0 && mx < (b + 1) * 25000.0, s"bucket $b: [$mn, $mx]")
      assert(mn <= mx)
    }
  }

  test("skew profile: top key is the true argmax, shares are consistent") {
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val keys = ev.select("user_id").distinct().count()
    val trueTop = ev.groupBy("user_id").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc, org.apache.spark.sql.functions.col("user_id"))
      .head()
    val rows = Relational.skewProfileEvents(spark, sf).collect()
    assert(rows.length === math.min(20L, keys))
    assert(rows.head.getLong(0) === trueTop.getLong(0))
    assert(rows.head.getLong(1) === trueTop.getLong(1))
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)), "n must be descending")
    rows.foreach { r =>
      val (n, pct, xAvg) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(pct - n.toDouble / total * 100) < 1e-3, s"pct for key ${r.getLong(0)}")
      assert(math.abs(xAvg - n.toDouble * keys / total) < 1e-3, s"x_avg for key ${r.getLong(0)}")
    }
  }

  test("percentile_disc: count-cumsum form matches the built-in aggregate") {
    // the bucketed form explicitly: the public op size-gates to the
    // built-in single-pass form on inputs this small, which would make
    // this parity check a tautology
    val got = Relational.percentileDiscBucketed(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val builtin = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_discount)"),
        count(lit(1)))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got === builtin)
  }

  test("quantile summary: single-pass and selection forms are bit-identical") {
    val small = Relational.quantileSummarySmall(spark, sf).collect().map(_.toSeq)
    val sel = Relational.quantileSummarySelection(spark, sf).collect().map(_.toSeq)
    assert(small.toSeq === sel.toSeq)
  }

  test("qty_price_bands: cells total the table, revenue reconciles") {
    val rows = Relational.qtyPriceBands(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    assert(rows.map(_.getLong(2)).sum === li.count())
    val totalRev = li.agg(graft.ops.Recon.uncents(
      sum(graft.ops.Recon.cents(col("l_extendedprice"))))).head().getDouble(0)
    assert(math.abs(rows.map(_.getDouble(3)).sum - totalRev) < 1e-6)
  }

  test("nth_value: whole-frame positions recompute from a driver-side sort") {
    val rows = Relational.nthValueFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCust = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (c, rs) =>
        c -> rs.sortBy(r => (r.getTimestamp(3).getTime, r.getLong(1)))
          .map(_.getDouble(2))
      }
    rows.foreach { r =>
      val prices = byCust(r.getLong(0))
      assert(r.getLong(5) === prices.length.toLong)
      assert(r.getDouble(3) === prices.head, "first")
      assert(r.getDouble(4) === prices.last, "last")
      if (prices.length >= 2) assert(r.getDouble(2) === prices(1), "second")
      else assert(r.isNullAt(2), "second must be null for 1-order customers")
    }
  }

  test("orders_yoy_growth: growth recomputes from the yearly revenue column") {
    val rows = Relational.yoyGrowth(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
    assert(rows.head.isNullAt(3), "first year has no prior to grow from")
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getInt(0) === prev.getInt(0) + 1, "years must be contiguous")
      val expect = BigDecimal((cur.getDouble(2) - prev.getDouble(2)) /
        prev.getDouble(2) * 100).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      // revenue is the cent sum at double presentation; recompute at 3 dp
      // (one digit looser than the op's 4) to stay clear of ulp edges
      assert((BigDecimal(cur.getDouble(3)).setScale(3,
        BigDecimal.RoundingMode.HALF_UP) - expect).abs <= BigDecimal("0.001"),
        s"year ${cur.getInt(0)}")
    }
  }

  test("ship_lag_stats: totals reconcile and the SLA share recomputes") {
    val rows = Relational.shipLagStats(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.lineitem(spark, sf).count(),
      "every line item lands in exactly one priority row")
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lag"))
    rows.foreach { r =>
      val p = r.getString(0)
      val lags = joined.filter(col("o_orderpriority") === p)
        .collect().map(_.getInt(1))
      assert(r.getInt(3) === lags.min && r.getInt(4) === lags.max, p)
      val miss = lags.count(_ > 90).toDouble / lags.length
      assert(math.abs(r.getDouble(5) - miss) < 1e-6, s"$p sla share")
    }
  }

  test("supplier_hhi: bounds hold and a driver-side recompute agrees") {
    val rows = Relational.supplierHhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9,
        s"${r.getString(0)}: HHI $hhi outside [1/$n, 1]")
      assert(top * top <= hhi + 1e-9, "top share² cannot exceed HHI")
      assert(top >= 1.0 / n - 1e-9, "top share at least the uniform share")
    }
    // independent recompute for one nation from the raw tables
    val name = rows.head.getString(0)
    val nk = Tables.nation(spark, sf).filter(col("n_name") === name)
      .select("n_nationkey").collect().head.getInt(0)
    val rev = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf).filter(col("s_nationkey") === nk),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_suppkey")
      .agg(sum(graft.ops.Recon.cents(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rc"))
      .collect().map(_.getLong(1).toDouble)
    val tot = rev.sum
    val expect = rev.map(x => (x / tot) * (x / tot)).sum
    assert(math.abs(rows.head.getDouble(2) - expect) < 1e-4)
  }

  test("customer_rfm: segments partition customers, totals reconcile") {
    val o = Tables.orders(spark, sf)
    val seg = Relational.customerRfm(spark, sf).collect()
    assert(seg.map(_.getLong(2)).sum ===
      o.select("o_custkey").distinct().count(), "n_cust must partition")
    assert(seg.map(_.getLong(3)).sum === o.count(), "n_orders must total")
    val spend = o.agg(graft.ops.Recon.uncents(
      sum(graft.ops.Recon.cents(col("o_totalprice"))))).collect().head.getDouble(0)
    assert(math.abs(seg.map(_.getDouble(4)).sum - spend) < 1e-6,
      "total_spend must reconcile with the global cent sum")
    assert(seg.map(r => (r.getString(0), r.getString(1))).distinct.length ===
      seg.length, "one row per segment pair")
  }

  test("ntile: window and selection forms are bit-identical") {
    val small = Relational.ntileFuncsSmall(spark, sf).collect().map(_.toSeq)
    val sel = Relational.ntileFuncsSelection(spark, sf).collect().map(_.toSeq)
    assert(small.toSeq === sel.toSeq)
  }

  test("ntile selection form: identical under skew (heavy boundary ties)") {
    // clone a boundary-straddling price run: a constant column where every
    // quartile boundary falls inside one giant tie group — the adversarial
    // case for prefix-sum arithmetic. Window form is ground truth.
    import org.apache.spark.sql.functions._
    val dir = s"$tmpDir/skewed"
    Tables.orders(spark, sf)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, lit(1000.0))
          .otherwise(col("o_totalprice")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val small = Relational.ntileFuncsSmall(spark, dir).collect().map(_.toSeq)
    val sel = Relational.ntileFuncsSelection(spark, dir).collect().map(_.toSeq)
    assert(small.toSeq === sel.toSeq)
  }

  test("ntile selection form: random tie-heavy populations, n % 4 != 0") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    // heavy ties (25 distinct prices) at sizes hitting every n mod 4 —
    // boundary ranks inside tie runs, the exact case the prefix-sum
    // arithmetic must get right
    for (n <- Seq(4, 5, 7, 102, 1001)) {
      val dir = s"$tmpDir/ntile_rand_$n"
      (1 to n).map(i => (i.toLong, (rnd.nextInt(25) + 1) * 25.0))
        .toDF("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val small = Relational.ntileFuncsSmall(spark, dir).collect().map(_.toSeq)
      val sel = Relational.ntileFuncsSelection(spark, dir).collect().map(_.toSeq)
      assert(small.toSeq === sel.toSeq, s"forms diverge at n=$n")
    }
  }

  test("customer_rfm plan: scalar max-date broadcasts, fact shuffles once") {
    val plan = Relational.customerRfm(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"1-row max-date frame must broadcast:\n$plan")
  }

  test("ntile selection plan: no row-count-sized single-partition window") {
    // the gate exists so large inputs never hit the global ntile window;
    // the selection plan must not contain an unpartitioned window over
    // the fact stream (bucket-frame windows with a defined partition key
    // are fine — they are 1024-row frames, not row-count-sized)
    val plan = Relational.ntileFuncsSelection(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Ntile"), "selection form must not use ntile()")
  }

  test("cume_dist: broadcast dense-rank matches the two-window form") {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val w2 = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderpriority"))
    val twoWindow = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(cume_dist().over(w1), 6).as("cd"),
        dense_rank().over(w2).cast("long").as("dr"),
        nth_value(col("o_orderkey"), 3).over(w1).as("nv"))
      .orderBy("o_orderkey").limit(200)
      .collect().map(_.toSeq)
    val got = Relational.cumeDistFuncs(spark, sf).collect().map(_.toSeq)
    assert(got.toSeq === twoWindow.toSeq)
  }

  test("q17: small-quantity rows match a driver-side threshold recompute") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = li.groupBy(_._1).map { case (pk, rs) =>
      pk -> rs.map(_._2).sum / rs.length
    }
    val small = li.filter { case (pk, q, _) => q < 0.2 * avg(pk) }
    val got = Relational.q17AvgQuantity(spark, sf).collect()
    assert(got.map(_.getLong(2)).sum === small.length.toLong)
    val expectedRevenue = small.map(_._3).sum / 7.0
    val gotRevenue = got.map(_.getDouble(1)).sum
    assert(math.abs(gotRevenue - expectedRevenue) / expectedRevenue < 1e-9)
  }

  test("q17: broadcast-threshold and window forms are bit-identical") {
    val bc = Relational.q17Broadcast(spark, sf).collect().map(_.toSeq)
    val win = Relational.q17Window(spark, sf).collect().map(_.toSeq)
    assert(bc.toSeq === win.toSeq)
  }

  test("array funcs: per-row values match JVM string ops") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Relational.arrayFuncs(spark, sf).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      assert(r.getInt(1) === toks.length)
      assert(r.getInt(2) === toks.distinct.length)
      assert(r.getString(3) === toks.distinct.sorted.take(3).mkString("|"))
      assert(r.getBoolean(4) === toks.contains("the"))
      assert(r.getString(5) === toks.head)
      assert(r.getString(6) === toks.last)
    }
  }

  test("q5: revenue sorted descending, all nations positive") {
    val rows = Relational.q5MultiwayJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1)).toSeq
    assert(revs === revs.sorted.reverse)
    assert(revs.forall(_ > 0))
  }

  test("semi/anti counts match a driver-side EXISTS replay") {
    val custs = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byCust = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
      .collect().groupBy(_.getLong(0))
    def prices(k: Long) = byCust.getOrElse(k, Array.empty).map(_.getDouble(1))
    val rows = Relational.semiAntiJoin(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === custs.map(_._2).distinct.sorted.toSeq)
    rows.foreach { r =>
      val seg = r.getString(0)
      val inSeg = custs.filter(_._2 == seg).map(_._1)
      assert(r.getLong(1) === inSeg.count(k => prices(k).exists(_ > 400000)))
      assert(r.getLong(2) === inSeg.count(k => !prices(k).exists(_ > 250000)))
    }
  }

  test("minmax_by picks the chronologically first/last order per status") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3).getTime))
    Relational.minmaxByAgg(spark, sf).collect().foreach { r =>
      val st = orders.filter(_._2 == r.getString(0))
      val first = st.minBy(o => (o._4, o._1))
      val last = st.maxBy(o => (o._4, o._1))
      assert(r.getLong(1) === first._1 && r.getDouble(2) === first._3)
      assert(r.getLong(3) === last._1 && r.getDouble(4) === last._3)
      assert(r.getLong(5) === st.length.toLong)
    }
  }

  test("corr matrix matches a driver-side Pearson recompute") {
    val xs = Tables.lineitem(spark, sf).select("l_quantity", "l_extendedprice")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = xs.length
    val (mx, my) = (xs.map(_._1).sum / n, xs.map(_._2).sum / n)
    val cov = xs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val r0 = cov / math.sqrt(xs.map(t => math.pow(t._1 - mx, 2)).sum *
      xs.map(t => math.pow(t._2 - my, 2)).sum)
    val got = Relational.corrMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.size === 6)
    assert(math.abs(got(("l_quantity", "l_extendedprice")) - r0) < 1e-3)
    assert(got.values.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("freqItemsApprox: every truly-frequent value appears (no false negatives)") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority").collect().map(_.getString(0))
    val n = rows.length.toDouble
    val trulyFrequent = rows.groupBy(identity).collect {
      case (v, xs) if xs.length / n >= 0.15 => v -> xs.length.toLong
    }.toMap
    val got = ops.Relational.freqItemsApprox(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // output = the exactly-heavy set with exact counts; `covered`
    // asserts the KPS no-false-negative contract per item
    assert(got.keySet === trulyFrequent.keySet)
    got.foreach { case (item, (cnt, covered)) =>
      assert(cnt === trulyFrequent(item), item)
      assert(covered, s"KPS missed truly-frequent item $item")
    }
  }

  test("quantileApproxCheck: every GK rank bound holds (all booleans true)") {
    val rows = Relational.quantileApproxCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    val exactN = Tables.orders(spark, sf).groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === exactN.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) === exactN(r.getString(0)))
      assert(r.getBoolean(2), s"${r.getString(0)} p50 outside GK bound")
      assert(r.getBoolean(3), s"${r.getString(0)} p95 outside GK bound")
    }
  }

  test("modeAgg: modal status per priority matches a local recount") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = rows.groupBy(_._1).map { case (pri, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // the contract's tie-break: highest count, then smallest value
      val (status, n) = counts.toSeq.minBy { case (s, n) => (-n, s) }
      pri -> ((status, n))
    }
    val got = Relational.modeAgg(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("rangeFrameWindow: trailing sum recomputes from the raw rows") {
    val raw = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000, r.getDouble(3)))
    val got = Relational.rangeFrameWindow(spark, sf).collect()
    assert(got.length === 200)
    got.foreach { r =>
      val (ck, ok) = (r.getLong(0), r.getLong(1))
      val t = raw.find(x => x._2 == ok).get._3
      val expect = raw.filter(x => x._1 == ck && x._3 >= t - 2592000 && x._3 <= t)
        .map(x => BigDecimal(x._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"custkey=$ck orderkey=$ok")
    }
  }

  test("marketBasketLift: ratios recompute from a driver-side basket fold") {
    // independent recount: collect the raw (order, brand) pairs and
    // rebuild support/confidence/lift with plain Scala collections —
    // a frame-side join/agg bug cannot self-confirm through this path
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = Tables.part(spark, sf).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = li.map { case (o, p) => (o, brandOf(p)) }.distinct
    val nOrders = baskets.map(_._1).distinct.length
    val cnt = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val byOrder =
      baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val pairCnt = byOrder.values.toSeq
      .flatMap(bs => for (a <- bs; b <- bs if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = Relational.marketBasketLift(spark, sf).collect()
    assert(got.length === math.min(30, pairCnt.size))
    got.foreach { r =>
      val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(nab === pairCnt((a, b)).toLong, s"n_ab for ($a,$b)")
      def rd(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getDouble(3) === rd(nab.toDouble / nOrders), s"support ($a,$b)")
      assert(r.getDouble(4) === rd(nab.toDouble / cnt(a)), s"confidence ($a,$b)")
      assert(r.getDouble(5) ===
        rd(nab.toDouble * nOrders / (cnt(a).toDouble * cnt(b))), s"lift ($a,$b)")
    }
    // top-30 is by lift desc with (brand_a, brand_b) tiebreak
    val lifts = got.map(r => (r.getDouble(5), r.getString(0), r.getString(1)))
    assert(lifts === lifts.sortBy { case (l, a, b) => (-l, a, b) }.toSeq)
  }

  test("trendForecast: a perfect line fits exactly; single-month group is NULL") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/trend"
    // priority P: one order per month on the exact line y = 100 + 10x
    // → slope 10, intercept 100, forecast month 6 = 160, R² = 1;
    // priority Q: a single month → denx = 0 → all metrics NULL
    val p = (0 to 5).map(x =>
      (x.toLong, "P", java.sql.Timestamp.valueOf(f"2025-${x + 1}%02d-15 00:00:00"),
        100.0 + 10.0 * x))
    val q = Seq((10L, "Q", java.sql.Timestamp.valueOf("2025-03-01 00:00:00"), 50.0))
    (p ++ q).toDF("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.trendForecast(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rp = got("P")
    assert(rp.getLong(1) === 6L)
    assert(rp.getDouble(2) === 10.0, "slope")
    assert(rp.getDouble(3) === 100.0, "intercept")
    assert(rp.getDouble(4) === 160.0, "forecast")
    assert(rp.getDouble(5) === 1.0, "R2 of a perfect line")
    val rq = got("Q")
    assert(rq.getLong(1) === 1L)
    (2 to 5).foreach(i => assert(rq.isNullAt(i), s"degenerate col $i"))
  }

  test("crosstabChisq: planted 2x2 association is exact; sf recount agrees") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/xtab"
    // 2×2 with counts 30/10/10/30: every expected count is 20, every
    // cell contributes (±10)²/20 = 5 → χ² = 20, dof = 1,
    // V = √(20/80·1) = 0.5 exactly
    val rows = Seq.fill(30)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(30)(("B", "Y"))
    rows.zipWithIndex.map { case ((s, p), i) => (i.toLong, s, p) }
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.crosstabChisq(spark, dir).collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getDouble(3) === 20.0, "expected")
      assert(r.getDouble(4) === 5.0, "contrib")
      assert(r.getDouble(5) === 20.0, "chi2")
      assert(r.getLong(6) === 1L, "dof")
      assert(r.getDouble(7) === 0.5, "cramers v")
    }
    // independent recount at sf with the same per-term 6-dp rounding
    val cells = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cells.map(_._3).sum
    val chi2Micro = cells.map { case (s, p, o) =>
      val dev = (BigInt(o) * n - BigInt(rt(s)) * ct(p)).toDouble
      val term = dev * dev / (n.toDouble * rt(s) * ct(p))
      math.round(BigDecimal(term).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    }.sum
    val sfGot = Relational.crosstabChisq(spark, sf).collect()
    assert(sfGot.length === cells.length)
    val expChi = BigDecimal(chi2Micro / 1e6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    sfGot.foreach(r => assert(r.getDouble(5) === expChi, "chi2 recount"))
  }

  test("repeatSurvival: planted gaps land in the exact thresholds") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/survival"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // c1: gap 5 (≤7); c2: gap 45 (≤60); c3: single order (no gap);
    // c4: two SAME-DAY orders — gap 0, second-by-orderkey tie-break
    val rows = Seq(
      (1L, 10L, ts("2025-01-01")), (2L, 10L, ts("2025-01-06")),
      (3L, 20L, ts("2025-01-01")), (4L, 20L, ts("2025-02-15")),
      (5L, 30L, ts("2025-01-01")),
      (6L, 40L, ts("2025-01-01")), (7L, 40L, ts("2025-01-01")))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.repeatSurvival(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === Set(7, 30, 60, 90))
    got.values.foreach { r =>
      assert(r.getLong(1) === 4L, "n_customers")
      assert(r.getLong(2) === 3L, "n_repeaters")
    }
    assert(got(7).getLong(3) === 2L && got(30).getLong(3) === 2L)
    assert(got(60).getLong(3) === 3L && got(90).getLong(3) === 3L)
    assert(got(7).getDouble(4) === 0.666667, "2/3 of repeaters within 7d")
    assert(got(7).getDouble(5) === 0.5, "2/4 of all customers within 7d")
    assert(got(60).getDouble(4) === 1.0)
    // independent recount at sf: gaps from collected first/second dates
    val firstTwo = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_orderkey").collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(x =>
        (x._1.getTime, x._2)).take(2).map(_._1).toSeq).toMap
    val nCust = firstTwo.size.toLong
    val gaps = firstTwo.values.filter(_.length == 2).map { s =>
      java.time.temporal.ChronoUnit.DAYS.between(
        s(0).toLocalDateTime.toLocalDate, s(1).toLocalDateTime.toLocalDate)
    }.toSeq
    val sfGot = Relational.repeatSurvival(spark, sf).collect()
    sfGot.foreach { r =>
      val t = r.getInt(0)
      assert(r.getLong(1) === nCust)
      assert(r.getLong(2) === gaps.length.toLong)
      assert(r.getLong(3) === gaps.count(_ <= t).toLong, s"within $t")
    }
  }

  test("priceIndex: planted baskets give the textbook indices; base is 1.0") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/pidx"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // m0: p1 u=10 (100/10), p2 u=20 (200/10); m1: p1 u=24, p2 u=10;
    // p3 appears only in m1 → excluded from both indices.
    // L = (24·10+10·10)/300 = 17/15; P = (24·5+10·10)/250 = 0.88
    val rows = Seq(
      (1L, ts("2025-01-05"), 100.0, 10.0), (2L, ts("2025-01-06"), 200.0, 10.0),
      (1L, ts("2025-02-05"), 120.0, 5.0), (2L, ts("2025-02-06"), 100.0, 10.0),
      (3L, ts("2025-02-07"), 50.0, 1.0))
    rows.toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.priceIndex(spark, dir).collect()
    assert(got.length === 2)
    assert(got(0).getLong(1) === 2L)
    assert((got(0).getDouble(2), got(0).getDouble(3), got(0).getDouble(4)) ===
      ((1.0, 1.0, 1.0)), "base month anchors at exactly 1.0")
    assert(got(1).getLong(1) === 2L)
    assert(got(1).getDouble(2) === 1.133333, "Laspeyres 17/15")
    assert(got(1).getDouble(3) === 0.88, "Paasche 220/250")
    assert(got(1).getDouble(4) === BigDecimal(
      math.sqrt((340.0 / 300) * (220.0 / 250)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, "Fisher")
    // independent recount at sf with the same term chain
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), date_trunc("month", col("l_shipdate"))
        .cast("date").cast("string").as("m"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue.longValue,
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .underlying.movePointRight(6).longValueExact())))
    val pm = raw.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2._1).sum, v.map(_._2._2).sum)).toMap
    val m0 = pm.keys.map(_._2).min
    val baseM = pm.collect { case ((p, m), rq) if m == m0 => p -> rq }.toMap
    def t6(rev: Long, qty: Long, w: Long): Long =
      math.round(BigDecimal(rev.toDouble * 100 / qty * w / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val byMonth = pm.toSeq.collect {
      case ((p, m), (rev, qty)) if baseM.contains(p) =>
        val (r0, q0) = baseM(p)
        (m, (t6(rev, qty, q0), t6(r0, q0, q0), t6(rev, qty, qty), t6(r0, q0, qty)))
    }.groupBy(_._1).view.mapValues { v =>
      val s = v.map(_._2)
      (s.size, s.map(_._1).sum, s.map(_._2).sum, s.map(_._3).sum, s.map(_._4).sum)
    }.toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Relational.priceIndex(spark, sf).collect().foreach { r =>
      val m = r.getTimestamp(0).toLocalDateTime.toLocalDate.toString
      val (np, ln, ld, pn, pd) = byMonth(m)
      assert(r.getLong(1) === np.toLong, s"$m n_parts")
      assert(r.getDouble(2) === r6(ln.toDouble / ld), s"$m laspeyres")
      assert(r.getDouble(3) === r6(pn.toDouble / pd), s"$m paasche")
    }
  }

  test("cohortLtv: planted two-cohort history accumulates exactly") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/ltv"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // cohort 2025-01: c1 (100 @age0, 50 @age2), c2 (200 @age0) →
    // size 2, ages 0 and 2; cohort 2025-02: c3 (80 @age0) → size 1
    val rows = Seq(
      (1L, 10L, ts("2025-01-03"), 100.0), (2L, 20L, ts("2025-01-20"), 200.0),
      (3L, 10L, ts("2025-03-08"), 50.0), (4L, 30L, ts("2025-02-14"), 80.0))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.cohortLtv(spark, dir).collect().map(r =>
      (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(got.size === 3)
    assert(got(("2025-01-01", 0L)) === ((2L, 2L, 300.0, 300.0, 150.0)))
    assert(got(("2025-01-01", 2L)) === ((1L, 2L, 50.0, 350.0, 175.0)))
    assert(got(("2025-02-01", 0L)) === ((1L, 1L, 80.0, 80.0, 80.0)))
    // independent recount at sf: cents-exact cohort fold
    val raw = Tables.orders(spark, sf)
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate"))
        .cast("date").cast("string").as("m"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue.longValue))
    val om = raw.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val cohortOf = om.keys.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def ageOf(cm: String, m: String) = {
      val a = java.time.LocalDate.parse(cm); val b = java.time.LocalDate.parse(m)
      java.time.temporal.ChronoUnit.MONTHS.between(a, b)
    }
    val agg = om.toSeq.groupBy { case ((c, m), _) =>
      (cohortOf(c), ageOf(cohortOf(c), m))
    }.view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val sfGot = Relational.cohortLtv(spark, sf).collect()
    assert(sfGot.length === agg.size)
    sfGot.foreach { r =>
      val k = (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getLong(1))
      val (na, rev) = agg(k)
      assert(r.getLong(2) === na, s"$k n_active")
      assert(r.getDouble(4) === BigDecimal(rev.toDouble / 10000.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$k revenue")
    }
  }

  test("backlogAging: planted ages land on the exact bucket edges") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/aging"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // as-of = 2025-12-31 (the F row sets it but is excluded from the
    // report); ages 30/31/365/366 probe every boundary, O vs P split
    val rows = Seq(
      (1L, "F", ts("2025-12-31"), 999.0),
      (2L, "O", ts("2025-12-01"), 100.0),  // age 30 → 00-030d
      (3L, "O", ts("2025-11-30"), 200.0),  // age 31 → 031-090d
      (4L, "P", ts("2024-12-31"), 300.0),  // age 365 → 091-365d
      (5L, "P", ts("2024-12-30"), 400.0))  // age 366 → 365d+
    rows.toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.backlogAging(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size === 4)
    assert(got(("O", "00-030d")) === ((1L, 100.0, 0.1)))
    assert(got(("O", "031-090d")) === ((1L, 200.0, 0.2)))
    assert(got(("P", "091-365d")) === ((1L, 300.0, 0.3)))
    assert(got(("P", "365d+")) === ((1L, 400.0, 0.4)))
    // independent recount at sf
    val raw = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue.longValue))
    val ad = raw.map(_._2).max
    def bucket(a: Long) = if (a <= 30) "00-030d" else if (a <= 90) "031-090d"
      else if (a <= 365) "091-365d" else "365d+"
    val agg = raw.filter(_._1 != "F").map { case (s, d, r4) =>
      ((s, bucket(java.time.temporal.ChronoUnit.DAYS.between(d, ad))), r4)
    }.groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val sfGot = Relational.backlogAging(spark, sf).collect()
    assert(sfGot.length === agg.size)
    sfGot.foreach { r =>
      val (n, r4) = agg((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n)
      assert(r.getDouble(3) === BigDecimal(r4.toDouble / 10000.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("seasonalityIndex: planted 2:1 winter gives exact indices; mean is 1") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/seas"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // two years: Jan revenue 200/yr, Jul 100/yr → overall monthly mean
    // 150 → indices exactly 4/3 and 2/3; weighted mean = 1 identically
    val rows = Seq(
      (1L, ts("2024-01-10"), 200.0), (2L, ts("2024-07-10"), 100.0),
      (3L, ts("2025-01-10"), 200.0), (4L, ts("2025-07-10"), 100.0))
    rows.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.seasonalityIndex(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === Set(1, 7))
    assert(got(1) === ((2L, 200.0, 1.333333)))
    assert(got(7) === ((2L, 100.0, 0.666667)))
    // sf identity: the month-count-weighted index mean is 1
    val sfGot = Relational.seasonalityIndex(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val wmean = sfGot.map { case (n, i) => n * i }.sum / sfGot.map(_._1).sum
    assert(math.abs(wmean - 1.0) < 1e-4, s"weighted index mean $wmean")
    // sf recount: cents-exact cleared-denominator replication
    val mt = Tables.orders(spark, sf)
      .select(date_trunc("month", col("o_orderdate")).cast("date")
        .cast("string").as("m"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue.longValue))
      .groupBy(_._1).view.mapValues(v => BigInt(v.map(_._2).sum)).toMap
    val tr = mt.values.sum
    val nm = mt.size
    val byMoy = mt.toSeq.groupBy(x => x._1.substring(5, 7).toInt)
    Relational.seasonalityIndex(spark, sf).collect().foreach { r =>
      val ms = byMoy(r.getInt(0))
      val rev = ms.map(_._2).sum
      assert(r.getLong(1) === ms.size.toLong)
      assert(r.getDouble(3) === BigDecimal(
        (rev * nm).toDouble / (tr * ms.size).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"index moy ${r.getInt(0)}")
    }
  }

  test("spendMigration: planted flows incl. churn/acquisition are exact") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"$tmpDir/migration"
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // 10-day span → cutoff day 4. Before (days 0-3): c1=100, c2=100,
    // c3=400 → mean 200, edges <100 / >300: c1,c2 mid-boundary?
    // 2·100·3 = 600 = Σ600·... Σ=600: 2·100·3=600 NOT < 600 → mid;
    // 2·400·3=2400 > 3·600=1800 → high. After (days 4-9): c1=10,
    // c2 absent (churn), c4=10 (acquired) → mean 10: both mid.
    val rows = Seq(
      (1L, 10L, ts("2025-01-01"), 100.0), (2L, 20L, ts("2025-01-02"), 100.0),
      (3L, 30L, ts("2025-01-03"), 400.0),
      (4L, 10L, ts("2025-01-08"), 10.0), (5L, 40L, ts("2025-01-09"), 10.0),
      (6L, 30L, ts("2025-01-10"), 980.0))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // after-period spends: c1=10, c4=10, c3=980 → Σ=1000, n=3, mean 333:
    // c1/c4: 2·10·3=60 < 1000 → low; c3: 2·980·3=5880 > 3000 → high
    val got = Relational.spendMigration(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("mid", "low")) === ((1L, 0.25)), "c1: mid → low")
    assert(got(("mid", "absent")) === ((1L, 0.25)), "c2 churned")
    assert(got(("high", "high")) === ((1L, 0.25)), "c3 stays high")
    assert(got(("absent", "low")) === ((1L, 0.25)), "c4 acquired")
    assert(got.size === 4)
    // sf invariant: flows partition all customers ever active
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    val sfGot = Relational.spendMigration(spark, sf).collect()
    assert(sfGot.map(_.getLong(2)).sum === nCust,
      "every customer appears in exactly one flow")
  }

  test("paretoAbc: exact boundary equality pushes the crossing value down a class") {
    val spark0 = spark
    import spark0.implicits._
    // 80/15/5: cumBefore(15)=80% hits the A-boundary EXACTLY (5·cumb =
    // 4·T) → strict < demotes it to B; cumBefore(5)=95% hits the
    // B-boundary exactly → C. The all-equality adversarial case.
    val dir = s"$tmpDir/abc"
    Seq((1L, 80.0), (2L, 15.0), (3L, 5.0)).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.paretoAbc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("A", 1L, 80.0, 0.8), ("B", 1L, 15.0, 0.15), ("C", 1L, 5.0, 0.05)))
  }

  test("paretoAbc: same-revenue customers share a class; sf recount agrees") {
    // independent driver fold of the DIRECT definition (desc cumBefore
    // per distinct value, exact long boundary comparisons) — must match
    // the histogram-threshold algorithm's aggregate output at sf
    val rev = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(x =>
        BigDecimal(x._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue.longValue).sum).toMap
    val t = rev.values.map(BigInt(_)).sum
    val byVal = rev.values.groupBy(identity).view
      .mapValues(vs => BigInt(vs.head) * vs.size).toMap
    val sortedVals = byVal.keys.toSeq.sortBy(-_)
    val cumBefore = sortedVals.zip(
      sortedVals.scanLeft(BigInt(0))((a, v) => a + byVal(v))).toMap
    def cls(c: Long): String = {
      val cb = cumBefore(c)
      if (cb * 5 < t * 4) "A" else if (cb * 20 < t * 19) "B" else "C"
    }
    val expect = rev.toSeq.groupBy { case (_, c) => cls(c) }.view
      .mapValues(xs => (xs.size.toLong, xs.map(x => BigInt(x._2)).sum)).toMap
    val got = Relational.paretoAbc(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq === expect.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, cents) = expect(r.getString(0))
      assert(r.getLong(1) === n, s"n_customers for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - cents.toDouble / 1e4) < 0.5,
        s"revenue for ${r.getString(0)}")
      assert(r.getDouble(3) ===
        math.round(cents.toDouble / t.toDouble * 1e6) / 1e6,
        s"revenue_share for ${r.getString(0)}")
    }
  }
}
