package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spot-bench scratch main (NOT wired into the harness): times the query
  * names given as args with the exact [[Bench]] methodology — two warm
  * passes, then min/median of five `toRdd.count()` materializations — so a
  * single op's timing can be iterated on without paying the full
  * 118-query bench wall clock. `runMain graft.Probe q1_pricing_summary …`
  * (optional first arg `sf=<dir>` overrides the data dir). */
object Probe {
  /** Candidate alternate forms under A/B timing — NOT part of the library
    * surface; winners graduate into ops/ (with the measured numbers in
    * their scaladoc) and losers are deleted, so this map is usually
    * empty between tuning sessions. Key convention: `x_<op>_<variant>`,
    * probed alongside the real op. Round-10 session: colagg split-branch,
    * q3/q4/missing_rows shuffle_hash builds and hashed-token jaccard
    * graduated, as were percent_of_total agg-broadcast and the q17
    * broadcast-threshold gate; quantile window-rank (0.64 vs 0.61),
    * q5 forced-SHJ (0.95 vs 0.74), q4 pre-agg (0.49 vs 0.41),
    * missing_rows pre-distinct (0.33 vs 0.30) and percentile_disc
    * grouping-sets phase-1 (1.01 vs 1.03 — Expand ~= Generate here)
    * lost to the shipped forms. Round-18 session: the
    * recon_stream_hash_diff decomposition (scan 0.07 / checksum-proj
    * 0.25 / full 0.70 same-JVM) drove the native RowChecksumMd5
    * expression (checksum-proj 0.25 -> 0.18) and the shuffle_hash
    * reference hint (full 0.66 -> 0.42; broadcast's driver-side
    * 148k-row HashedRelation build was the floor) -- both graduated, as
    * did market_basket_lift's SHJ self-join (1.31 -> 1.14 min same-JVM);
    * its repartition-by-k variant (1.09 min) was REJECTED after the
    * plan audit: AQE does not reuse a REPARTITION_BY_COL stage across
    * the single/tot branches, tripling the corpus scan+shuffle.
    * Round-19 session (quiet box, q1 control 0.399 vs the 81.81 s
    * battery's 0.388): q21 min/max EXISTS folding graduated (0.699 ->
    * 0.454 min same-JVM; the old (orderkey,supp) DISTINCT alone
    * measured 0.441 -- the bottleneck the fold deletes), scorecard
    * suppkey pre-agg graduated on at-scale posture (0.554 -> 0.531,
    * join floor 0.350 of the total so the local delta is small).
    * REJECTED with numbers: scorecard narrow-payload epoch-day
    * projection (0.626 -- the per-row datediff-to-epoch cost exceeds
    * the shuffle-width saving); market_basket row-local HOF pair
    * generator off one collect_set basket frame (1.431 vs 0.987 --
    * interpreted transform/flatten dominates; the basket-set agg
    * alone already costs 0.752, within noise of the 0.748 distinct
    * frame, so NO generator can beat the join by much); market_basket
    * int-encoded brands (1.110 vs 1.068 -- wash). market_basket's
    * distinct+join floor is hereby ACCEPTED and documented in
    * BASELINE.md (verdict #5 closure). Post-battery attribution A/Bs
    * (quiet, q1 0.385-0.389): the r19 battery's text_js_divergence
    * +0.28 was run-order/ambient, NOT the new tail -- same-JVM the
    * shipped nonnegative aggregate tail reads 0.838 vs the old signed
    * tail's 0.961 and the frame probe's 0.912, and a per-row
    * nonnegative candidate (verdict (c) literal, long sums) read
    * 0.987 and was NOT graduated; dedup_audit's battery 1.75 (vs r18
    * battery 1.06) reproduced on BOTH the r18 worktree and the r19
    * tree same-JVM (mins 1.17/1.56, medians 1.72/1.61, plan shapes
    * diffed IDENTICAL) -- a wide-variance allocation-heavy row, not a
    * regression. Late-session second q21 step GRADUATED: both
    * fixpoints + the late count fold into ONE conditional-aggregate
    * groupBy over the single li(join)ordF pass (every qualifying key
    * is an F order, so the full supplier set is visible there) --
    * 0.551 -> 0.471 same-JVM (q1 0.464 ambient-matched), deleting the
    * full-lineitem aggregation and the semi join.
    */
  private val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // round-20 graph_components decomposition (verdict #3): floors + levers
    "x_gc_edges" -> ((s, d) => graft.ops.Graph.copurchaseEdges(s, d)
      .filter(org.apache.spark.sql.functions.col("w") >= 2 &&
        org.apache.spark.sql.functions.col("s") <
          org.apache.spark.sql.functions.col("t"))),
    "x_gc_ccedges" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val pairs = graft.ops.Graph.copurchaseEdges(s, d)
        .filter(col("w") >= 2 && col("s") < col("t"))
        .select(col("s").as("a_id"), col("t").as("b_id"))
      pairs.select(col("a_id").as("u"), col("b_id").as("v"))
        .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
        .distinct().localCheckpoint(true)
    }),
    "x_gc_onehop" -> ((s, d) => ccProbe(s, d, hops = 1, jump = false)),
    "x_gc_twohop" -> ((s, d) => ccProbe(s, d, hops = 2, jump = false)),
    "x_gc_jump"   -> ((s, d) => ccProbe(s, d, hops = 1, jump = true)),
    "x_gc_bcast"  -> ((s, d) => ccProbe(s, d, hops = 1, jump = false, bcast = true)),
    "x_gc_bcast2" -> ((s, d) => ccProbe(s, d, hops = 2, jump = false, bcast = true)),
    "x_gc_bcastnd" -> ((s, d) =>
      ccProbe(s, d, hops = 1, jump = false, bcast = true, dedup = false)),
    // round-20 text_js decomposition (verdict #5): the explode+agg
    // floor alone — everything else in the op is 617-row work
    "x_js_sc" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.documents(s, d)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    }),
    // round-20 price_index decomposition
    "x_pi_pm" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.lineitem(s, d)
        .filter(col("l_partkey").isNotNull)
        .groupBy(col("l_partkey").as("p"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(sum(graft.ops.Recon.cents(col("l_extendedprice"))).as("rev4"),
          sum(round(round(col("l_quantity"), 6) * 1e6, 0).cast("long"))
            .as("qty6"))
        .filter(col("qty6") > 0)
    }),
    "x_pi_win" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val pm = graft.Tables.lineitem(s, d)
        .filter(col("l_partkey").isNotNull)
        .groupBy(col("l_partkey").as("p"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(sum(graft.ops.Recon.cents(col("l_extendedprice"))).as("rev4"),
          sum(round(round(col("l_quantity"), 6) * 1e6, 0).cast("long"))
            .as("qty6"))
        .filter(col("qty6") > 0)
      val b0 = pm.agg(min(struct(col("m"), col("rev4"), col("qty6"))).as("s"))
        .select(col("s").getField("m").as("m0"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p")
      pm.crossJoin(broadcast(b0))
        .withColumn("rev04",
          max(when(col("m") <=> col("m0"), col("rev4"))).over(w))
        .withColumn("qty06",
          max(when(col("m") <=> col("m0"), col("qty6"))).over(w))
        .filter(col("qty06").isNotNull)
    }),
    "x_pi_onex" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val pm = graft.Tables.lineitem(s, d)
        .filter(col("l_partkey").isNotNull)
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey").as("p"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(sum(graft.ops.Recon.cents(col("l_extendedprice"))).as("rev4"),
          sum(round(round(col("l_quantity"), 6) * 1e6, 0).cast("long"))
            .as("qty6"))
        .filter(col("qty6") > 0)
      val b0 = pm.agg(min(struct(col("m"), col("rev4"), col("qty6"))).as("s"))
        .select(col("s").getField("m").as("m0"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p")
      pm.crossJoin(broadcast(b0))
        .withColumn("rev04",
          max(when(col("m") <=> col("m0"), col("rev4"))).over(w))
        .withColumn("qty06",
          max(when(col("m") <=> col("m0"), col("qty6"))).over(w))
        .filter(col("qty06").isNotNull)
    }),
    // round-20 pagerank allocation A/B (verdict #4): the OLD decimal
    // contribution spelling, rebuilt for same-JVM comparison against
    // the shipped gated-long path
    "x_pr_dec" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.ops.Graph.pagerankRanks(
          graft.ops.Graph.copurchaseEdges(s, d), forceDecimal = true)
        .select(col("node").as("l_partkey"), col("r").as("rank_ppb"),
          graft.ops.Recon.ratioRound(col("r"), lit(1000000000L), 6).as("rank"))
        .orderBy(desc("rank_ppb"), col("l_partkey")).limit(20)
    })
  )

  /** Probe-only reimplementation of copurchaseComponents with the
    * round count levers exposed: `hops` neighbor-min steps per
    * MATERIALIZED round (same joins, fewer checkpoint jobs) and/or a
    * label-of-label pointer jump per round (log-diameter rounds, one
    * extra join each). Canonical min-label fixpoint either way. */
  private def ccProbe(spark: SparkSession, dir: String,
                      hops: Int, jump: Boolean,
                      bcast: Boolean = false,
                      dedup: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    val pairs = graft.ops.Graph.copurchaseEdges(spark, dir)
      .filter(col("w") >= 2 && col("s") < col("t"))
      .select(col("s").as("a_id"), col("t").as("b_id"))
    val undirected = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
    val edges = (if (dedup) undirected.distinct() else undirected)
      .localCheckpoint(true)
    def hint(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
    var changed = 1L; var iter = 0
    while (changed > 0 && iter < 24) {
      var stepped = labels
      for (_ <- 1 to hops) {
        val nbrMin = edges
          .join(hint(stepped.select(col("id").as("v"), col("label").as("vl"))), "v")
          .groupBy(col("u").as("id")).agg(min(col("vl")).as("nl"))
        stepped = stepped.join(hint(nbrMin), Seq("id"), "left_outer")
          .select(col("id"),
            least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      }
      if (jump) {
        val ptr = stepped.select(col("label").as("jid"), col("id"))
        stepped = ptr.join(
          stepped.select(col("id").as("jid"), col("label").as("jl")), "jid")
          .select(col("id"), col("jl").as("label"))
      }
      val obs = new org.apache.spark.sql.Observation()
      val next = labels.select(col("id"), col("label").as("prev"))
        .join(stepped, "id")
        .observe(obs, sum(when(col("label") =!= col("prev"), 1L)
          .otherwise(0L)).as("moved"))
      val ckpt = next.localCheckpoint(true)
      changed = Option(obs.get("moved")).map(_.asInstanceOf[Long]).getOrElse(0L)
      labels = ckpt.drop("prev")
      iter += 1
    }
    println(s"    [ccProbe hops=$hops jump=$jump rounds=$iter]")
    labels.groupBy("label").agg(count(lit(1)).as("cs"))
      .groupBy(col("cs").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), min("label").as("min_canonical"))
      .orderBy(desc("cluster_size"), col("min_canonical"))
  }
  def main(args: Array[String]): Unit = {
    val (sfArgs, names) = args.partition(_.startsWith("sf="))
    val dir = sfArgs.headOption.map(_.stripPrefix("sf="))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(name: String): Unit =
      if (name.endsWith("_check"))
        variants(name)(spark, dir).show(5, false)
      else
        variants.getOrElse(name, SparkEntry.queries(name))(spark, dir)
          .queryExecution.toRdd.count()
    // `plan:<name>` — time analysis+optimization+physical planning only
    // (no execution): the diagnostic that separates driver-side plan
    // cost from run cost for big unrolled plans (round-20 text_js)
    names.filter(_.startsWith("plan:")).map(_.stripPrefix("plan:")).foreach { q =>
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t2 = System.nanoTime()
        df.queryExecution.executedPlan
        val t3 = System.nanoTime()
        println(f"PROBE plan:$q total=${(t3 - t0) / 1e9}%.3f " +
          f"build=${(t1 - t0) / 1e9}%.3f opt=${(t2 - t1) / 1e9}%.3f " +
          f"phys=${(t3 - t2) / 1e9}%.3f")
      }
    }
    val targets = if (names.nonEmpty) names.filterNot(_.startsWith("plan:")).toSeq
                  else SparkEntry.benchQueries
    for (_ <- 1 to 2) targets.foreach(materialize)
    val timed = targets.map { name =>
      val samples = Seq.fill(5) {
        val t0 = System.nanoTime()
        materialize(name)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-28s min=${samples.head}%.3f med=${samples(2)}%.3f")
      name -> samples
    }
    println(f"PROBE TOTAL min=${timed.map(_._2.head).sum}%.3f med=${timed.map(_._2(2)).sum}%.3f")
    spark.stop()
  }
}
