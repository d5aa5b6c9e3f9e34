package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Executes the Structured-Streaming twins for real: events-shaped rows
  * through MemoryStream → transform → memory sink, asserting parity with
  * the same transformation applied in batch (VERDICT r1 §missing-3). */
class StreamingSpec extends GraftSpec {
  import StreamingSpec._

  private def toTyped(e: EventsFixture.RawEv): Ev =
    Ev(e.event_id, new java.sql.Timestamp(e.ts / 1000000L), e.user_id,
      e.event_type, e.value)

  test("tumbling window: streaming complete-mode output equals batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumb_sink")
      .outputMode("complete").start()
    try {
      input.addData(EventsFixture.fixtureEvents.map(toTyped))
      q.processAllAvailable()
      val streamed = spark.table("tumb_sink").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
        .toMap
      val batch = StreamingOps.tumblingCounts(
        EventsFixture.fixtureEvents.map(toTyped).toDF()).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
        .toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sliding window: streaming complete-mode output equals batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slide_sink")
      .outputMode("complete").start()
    try {
      input.addData(EventsFixture.fixtureEvents.map(toTyped))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getString(2)) -> r.getLong(3)
      val streamed = spark.table("slide_sink").collect().map(key).toMap
      val batch = StreamingOps.slidingCounts(
        EventsFixture.fixtureEvents.map(toTyped).toDF()).collect().map(key).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("events later than the watermark are dropped, not merged") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      input.addData(EventsFixture.fixtureEvents.map(toTyped))
      q.processAllAvailable()
      // push the watermark far past the fixture's hours, finalizing them
      input.addData(Ev(998L, java.sql.Timestamp.valueOf("2025-03-01 00:00:00"), 98L, "z", 0.0))
      q.processAllAvailable()
      val before = spark.table("late_sink").count()
      // this event is months behind the watermark: state for its window is
      // gone, and append mode must not emit or resurrect it
      input.addData(Ev(997L, java.sql.Timestamp.valueOf("2025-01-01 00:05:00"), 1L, "a", 1.0))
      q.processAllAvailable()
      assert(spark.table("late_sink").count() === before,
        "late event must be dropped by the watermark")
    } finally q.stop()
  }

  test("streaming dedup emits each id once across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(input.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      val evs = EventsFixture.fixtureEvents.map(toTyped)
      input.addData(evs)
      q.processAllAvailable()
      input.addData(evs.take(5))   // replayed duplicates, second batch
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").collect().map(_.getLong(0))
      assert(ids.length === ids.distinct.length, "no id may be emitted twice")
      assert(ids.sorted.toSeq === evs.map(_.event_id).sorted)
    } finally q.stop()
  }

  test("streaming dedup equals the oracle-anchored batch parity op across micro-batches") {
    // streaming_dedup registers the dropDuplicates core of dedupStream
    // in batch, DuckDB-oracled; this drives the SAME seeded feed — the
    // base events first, the mod-10 verbatim echo split across two
    // LATER micro-batches — through MemoryStream +
    // dropDuplicatesWithinWatermark and asserts the kept set and the
    // per-type summary equal the batch anchor (the
    // recon_stream_hash_diff recipe). Echo rows land either as
    // state-store duplicates (recent ts) or as watermark-late rows
    // (old ts); both paths must suppress them.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val base = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect()
    val echo = base.filter(_.event_id % 10 == 0)
    val input = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(input.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_parity_sink")
      .outputMode("append").start()
    try {
      input.addData(base.toSeq); q.processAllAvailable()
      val half = echo.length / 2
      input.addData(echo.take(half).toSeq); q.processAllAvailable()
      input.addData(echo.drop(half).toSeq); q.processAllAvailable()
      val ids = spark.table("dedup_parity_sink")
        .select("event_id").collect().map(_.getLong(0))
      assert(ids.length === ids.distinct.length, "no id may be emitted twice")
      assert(ids.sorted.toSeq === base.map(_.event_id).sorted.toSeq)
      // summarize the streamed kept rows with the op's own expressions
      // and compare to the registry anchor (value_sum → micro-longs)
      val streamed = spark.table("dedup_parity_sink")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          countDistinct(col("user_id")).as("n_users"),
          sum(round(round(col("value"), 6) * 1e6, 0).cast("long")).as("vm"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val batch = ops.Events.dedupStreamParity(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(4),
          Math.round(r.getDouble(5) * 1e6)))
        .sortBy(_._1).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("late data equals the oracle-anchored batch parity op across micro-batches") {
    // streaming_late_data registers the watermark-drop RULE in batch,
    // DuckDB-oracled; this drives the SAME seeded feed — the base
    // events in batch 0, the id % 17 echoes shifted 2 days back in
    // batch 1 — through MemoryStream + tumblingCounts (1-hour
    // watermark) and asserts the streaming side's two observable drop
    // facts: the echo batch emits NOTHING new in append mode, and the
    // state operator reports every echo row in
    // numRowsDroppedByWatermark. The batch anchor's n_kept/n_late
    // columns are then checked against the same feed arithmetic.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val base = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect()
    val echo = base.filter(_.event_id % 17 == 0).map(e =>
      e.copy(ts = new java.sql.Timestamp(e.ts.getTime - 2L * 24 * 3600 * 1000)))
    assert(echo.nonEmpty, "fixture must seed at least one straggler")
    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late_parity_sink")
      .outputMode("append").start()
    try {
      input.addData(base.toSeq); q.processAllAvailable()
      val before = spark.table("late_parity_sink").count()
      def droppedSoFar: Long = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val droppedBefore = droppedSoFar
      input.addData(echo.toSeq); q.processAllAvailable()
      assert(spark.table("late_parity_sink").count() === before,
        "the straggler batch must emit nothing in append mode")
      assert(droppedSoFar - droppedBefore === echo.length.toLong,
        "every straggler must be dropped by the watermark")
      // the batch anchor agrees with the same feed arithmetic
      val batch = ops.Events.lateDataParity(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val baseByType = base.groupBy(_.event_type).view.mapValues(_.length.toLong)
      val echoByType = echo.groupBy(_.event_type).view.mapValues(_.length.toLong)
      baseByType.foreach { case (t, nb) =>
        val ne = echoByType.getOrElse(t, 0L)
        assert(batch(t) === ((nb + ne, ne, nb)),
          s"batch anchor disagrees with the feed arithmetic for type $t")
      }
    } finally q.stop()
  }

  test("streaming hash-diff flags mismatched and unknown keys per micro-batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    // static reference: ids 1..10, value = id * 1.0
    val reference = (1L to 10L).map(i => Ev(i,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), i, "a", i * 1.0)).toDF()
    val input = MemoryStream[Ev]
    val q = StreamingOps.streamingHashDiff(input.toDF(), reference,
      "event_id", Seq("event_type", "value"))
      .writeStream.format("memory").queryName("recon_sink")
      .outputMode("append").start()
    try {
      def ev(id: Long, v: Double) = Ev(id,
        java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), id, "a", v)
      // batch 1: 1 clean, 2 mismatched, 99 unknown
      input.addData(ev(1L, 1.0), ev(2L, -5.0), ev(99L, 9.0))
      q.processAllAvailable()
      // batch 2: the mismatch arrives corrected — no longer flagged
      input.addData(ev(2L, 2.0), ev(3L, 3.0))
      q.processAllAvailable()
      val got = spark.table("recon_sink").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
      assert(got === Seq(2L -> "mismatch", 99L -> "missing_in_reference"))
    } finally q.stop()
  }

  test("stream hash-diff equals the oracle-anchored batch parity op across micro-batches") {
    // the recon_stream_hash_diff registry op runs streamingHashDiff's
    // literal code path in batch and is DuckDB-oracled by the driver;
    // this asserts the STREAMING execution of the same seeded divergence
    // emits byte-identical rows — chaining the streaming surface to the
    // oracle (round-13). p rides as decimal TEXT in the typed stream
    // rows: rowChecksum casts every column to string anyway, and a
    // product-encoder BigDecimal would widen to DECIMAL(38,18) text.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.types.DecimalType
    val base = Tables.orders(spark, sf)
    val streamRows = base.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        when(col("o_orderkey") % 97 === 0, round(col("o_totalprice"), 0))
          .otherwise(col("o_totalprice"))
          .cast(DecimalType(12, 2)).cast("string").as("p"))
      .as[HdRow].collect()
    val refDf = base.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast("string").as("p"))
    val input = MemoryStream[HdRow]
    val q = StreamingOps.streamingHashDiff(input.toDF(), refDf,
        "o_orderkey", Seq("o_custkey", "o_orderstatus", "p"))
      .writeStream.format("memory").queryName("hashdiff_parity_sink")
      .outputMode("append").start()
    try {
      val (b1, b2) = streamRows.splitAt(streamRows.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("hashdiff_parity_sink").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val batch = ops.Recon.streamHashDiffParity(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty, "seeded divergence must flag something")
      assert(batch.map(_._2).toSet ===
        Set("mismatch", "missing_in_reference"))
    } finally q.stop()
  }

  test("streaming mix drift equals the oracle-anchored batch parity op across micro-batches") {
    // the streaming_mix_drift registry op runs streamingMixDrift's
    // literal code path in batch and is DuckDB-oracled by the driver;
    // this asserts the STREAMING execution over the same event rows
    // emits identical closed windows — chaining the PSI monitor to the
    // oracle (round-14, the recon_stream_hash_diff recipe).
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Ev]
    val q = StreamingOps.streamingMixDrift(input.toDF(), ops.Events.referenceMix)
      .writeStream.format("memory").queryName("mixdrift_parity_sink")
      .outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      // flush sentinel 3 days past the end pushes the watermark beyond
      // every real window's end so they all close and emit; the
      // sentinel's own window stays open and never appears
      input.addData(Ev(-1L,
        new java.sql.Timestamp(evs.last.ts.getTime + 3 * 86400 * 1000L),
        -1L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("mixdrift_parity_sink").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val batch = ops.Events.mixDriftParity(spark, sf).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty)
      assert(batch.forall(_._3 > 0.2),
        "the reference-absent `error` share must trip the novel-type alert in every window")
    } finally q.stop()
  }

  test("mismatch streak alerts equal the oracle-anchored batch parity op across micro-batches") {
    // streaming_streak_alerts registers streakAlertsBatch (gaps-and-
    // islands, DuckDB-oracled); this drives the flatMapGroupsWithState
    // op over the SAME seeded feed through MemoryStream and asserts
    // identical alerts — the custom-state surface chained to the oracle.
    // Per-key spacing in the feed is 499 s << the 2 h idle grace, so no
    // event-time timeout fires and the two forms are provably equal.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{DiffObs, StreakAlert}
    val feed = ops.Recon.streakFeedOrders(spark, sf).as[DiffObs]
      .collect().sortBy(_.ts.getTime)
    val input = MemoryStream[DiffObs]
    val q = StreamingOps.mismatchStreakAlerts(input.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("streak_parity_sink")
      .outputMode("append").start()
    try {
      input.addData(feed.take(feed.length / 3).toSeq); q.processAllAvailable()
      input.addData(feed.slice(feed.length / 3, 2 * feed.length / 3).toSeq)
      q.processAllAvailable()
      input.addData(feed.drop(2 * feed.length / 3).toSeq); q.processAllAvailable()
      val streamed = spark.table("streak_parity_sink").as[StreakAlert].collect()
        .map(a => (a.k, a.ts.getTime, a.streak)).sorted.toSeq
      val batch = ops.Recon.streakAlertsParity(spark, sf).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(2)))
        .sorted.toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty, "the seeded feed must produce alerts")
    } finally q.stop()
  }

  test("streaming top-k equals the oracle-anchored batch parity op across micro-batches") {
    // streaming_topk registers streamingTopK's literal MinK path in
    // batch, DuckDB-oracled; this drives the same lineitem feed through
    // MemoryStream in complete mode and asserts identical sorted
    // smallest-k arrays — the UDAF state-store surface chained to the
    // oracle.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val feed = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .as[(String, Double)].collect()
    val input = MemoryStream[(String, Double)]
    val q = StreamingOps.streamingTopK(
        input.toDF().toDF("l_returnflag", "l_quantity"),
        "l_returnflag", "l_quantity", 5)
      .writeStream.format("memory").queryName("topk_parity_sink")
      .outputMode("complete").start()
    try {
      val third = feed.length / 3
      input.addData(feed.take(third).toSeq); q.processAllAvailable()
      input.addData(feed.slice(third, 2 * third).toSeq); q.processAllAvailable()
      input.addData(feed.drop(2 * third).toSeq); q.processAllAvailable()
      val streamed = spark.table("topk_parity_sink").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
      // the registry op posexplodes MinK's list for the driver
      // comparator; reassemble (flag, rank, value) rows by rank here
      val batch = ops.Relational.minkTopkParity(spark, sf).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (k, rows) => k -> rows.sortBy(_._2).map(_._3).toList }
      assert(streamed === batch)
      assert(batch.nonEmpty && batch.values.forall(_.length === 5))
      assert(batch.values.forall(v => v === v.sorted))
    } finally q.stop()
  }

  test("click attribution equals the oracle-anchored batch parity op across micro-batches") {
    // streaming_click_attribution registers attributeClicks' literal
    // code path in batch, DuckDB-oracled; this drives the same view and
    // click rows through two MemoryStreams and asserts the identical
    // pair set — the stream-stream interval-join surface chained to the
    // oracle.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    val vRows = ev.filter(_.event_type == "view")
    val cRows = ev.filter(_.event_type == "click")
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingOps.attributeClicks(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_parity_sink")
      .outputMode("append").start()
    try {
      views.addData(vRows.take(vRows.length / 2).toSeq)
      clicks.addData(cRows.take(cRows.length / 2).toSeq)
      q.processAllAvailable()
      views.addData(vRows.drop(vRows.length / 2).toSeq)
      clicks.addData(cRows.drop(cRows.length / 2).toSeq)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3))
      val streamed = spark.table("attr_parity_sink").collect().map(key).sorted.toSeq
      val batch = ops.Events.clickAttributionParity(spark, sf).collect()
        .map(key).sorted.toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty, "the events fixture must attribute some clicks")
    } finally q.stop()
  }

  test("mismatch streaks: custom state alerts once per crossing, resets on match, spans batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.{DiffObs, StreakAlert}
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$min%02d:00")
    val input = MemoryStream[DiffObs]
    val q = StreamingOps.mismatchStreakAlerts(input.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("streak_sink")
      .outputMode("append").start()
    try {
      // batch 1: key 1 mismatches twice (below threshold); key 2 clean
      input.addData(DiffObs(1L, t(1), "mismatch"), DiffObs(1L, t(2), "mismatch"),
        DiffObs(2L, t(1), "match"))
      q.processAllAvailable()
      assert(spark.table("streak_sink").isEmpty, "no alert below threshold")
      // batch 2: key 1's third consecutive → ONE alert, state carried
      // across batches; a 4th mismatch must NOT re-alert. key 2's run is
      // broken by a match mid-way and never crosses.
      input.addData(DiffObs(1L, t(3), "mismatch"), DiffObs(1L, t(4), "mismatch"),
        DiffObs(2L, t(2), "mismatch"), DiffObs(2L, t(3), "mismatch"),
        DiffObs(2L, t(4), "match"), DiffObs(2L, t(5), "mismatch"))
      q.processAllAvailable()
      val afterB2 = spark.table("streak_sink").as[StreakAlert].collect().toSeq
      assert(afterB2 === Seq(StreakAlert(1L, t(3), 3)))
      // batch 3: key 1 matches (re-arms), then three more in a row →
      // second alert for the same key, again exactly at the crossing
      input.addData(DiffObs(1L, t(5), "match"), DiffObs(1L, t(6), "mismatch"),
        DiffObs(1L, t(7), "mismatch"), DiffObs(1L, t(8), "mismatch"))
      q.processAllAvailable()
      val afterB3 = spark.table("streak_sink").as[StreakAlert].collect().toSeq
        .sortBy(_.ts.getTime)
      assert(afterB3 === Seq(StreakAlert(1L, t(3), 3), StreakAlert(1L, t(8), 3)))
    } finally q.stop()
  }

  test("mismatch streaks: idle state expires via event-time timeout, streak restarts") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    import StreamingOps.DiffObs
    def at(h: Int, min: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 $h%02d:$min%02d:00")
    val input = MemoryStream[DiffObs]
    // 1-minute lateness, 10-minute idle grace: key 1's two-mismatch run
    // must be forgotten once the watermark passes 10:01 + 10 min
    val q = StreamingOps.mismatchStreakAlerts(input.toDS(), threshold = 3,
      lateness = "1 minute", idleGrace = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("streak_ttl_sink")
      .outputMode("append").start()
    try {
      input.addData(DiffObs(1L, at(10, 0), "mismatch"), DiffObs(1L, at(10, 1), "mismatch"))
      q.processAllAvailable()                       // wm → 10:00
      input.addData(DiffObs(9L, at(11, 0), "match"))
      q.processAllAvailable()                       // wm → 10:59 (timeout not yet checked)
      input.addData(DiffObs(9L, at(11, 1), "match"))
      q.processAllAvailable()                       // wm 10:59 > 10:11 → key 1 state dropped
      // a third mismatch would alert if the n=2 state had survived
      input.addData(DiffObs(1L, at(11, 30), "mismatch"))
      q.processAllAvailable()
      assert(spark.table("streak_ttl_sink").isEmpty,
        "expired state must not contribute to a new streak")
    } finally q.stop()
  }

  test("session window: streaming append-mode output equals batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      input.addData(EventsFixture.fixtureEvents.map(toTyped))
      q.processAllAvailable()
      // append mode only emits sessions the watermark has passed: push it
      // far ahead with a flush event, then drop that event from the compare
      val flush = Ev(999L, java.sql.Timestamp.valueOf("2025-06-01 00:00:00"), 99L, "z", 0.0)
      input.addData(flush)
      q.processAllAvailable()
      val streamed = spark.table("sess_sink").collect()
        .map(r => (r.getLong(2), r.getTimestamp(0).getTime) -> r.getLong(3))
        .toMap.filter(_._1._1 != 99L)
      val batch = StreamingOps.sessionCounts(
        EventsFixture.fixtureEvents.map(toTyped).toDF()).collect()
        .map(r => (r.getLong(2), r.getTimestamp(0).getTime) -> r.getLong(3))
        .toMap
      assert(streamed === batch)
      // and the session structure matches the batch lag-based sessionizer:
      // same per-user session-size multisets
      val sessionizer = graft.ops.Events.sessionize(spark,
        EventsFixture.writeFixture(spark, tmpDir)).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.toSeq).toMap
      val windowed = batch.toSeq.map { case ((u, _), n) => (u, n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(sessionizer === windowed)
    } finally q.stop()
  }

  test("stream-stream interval join: cross-batch attribution, horizon bound, late drop") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(1735689600000L + min * 60000L)
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Ev(id, t(min), user, typ, 1.0)
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingOps.attributeClicks(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode("append").start()
    try {
      // batch 1: views only — must be buffered in the join state store
      views.addData(ev(1, 1, 0, "view"), ev(2, 1, 40, "view"), ev(3, 2, 0, "view"))
      q.processAllAvailable()
      assert(spark.table("attr_sink").count() === 0)
      // batch 2: clicks arrive later and join against the BUFFERED views.
      // user 1 @10 → view@0 only; @50 → view@40 only (view@0 is 50 min
      // back, outside the 30-min horizon); user 2 @5 → view@0.
      clicks.addData(ev(4, 1, 10, "click"), ev(5, 1, 50, "click"), ev(6, 2, 5, "click"))
      q.processAllAvailable()
      val got = spark.table("attr_sink").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(got === Set(
        (1L, t(0), t(10), 600L), (1L, t(40), t(50), 600L), (2L, t(0), t(5), 300L)))
      // push BOTH watermarks far ahead (global watermark = min of inputs),
      // then replay an old view+click pair: both are behind the watermark,
      // the evicted state cannot match them, and no stale pair may emit —
      // the bounded-state contract this join exists for.
      views.addData(ev(7, 9, 600, "view"))
      clicks.addData(ev(8, 9, 601, "click"))
      q.processAllAvailable()
      views.addData(ev(9, 1, 0, "view"))
      clicks.addData(ev(10, 1, 1, "click"))
      q.processAllAvailable()
      assert(spark.table("attr_sink").count() === got.size + 1,
        "only the in-watermark pair (user 9) may add a row; late replays must drop")
    } finally q.stop()
  }

  test("stream-stream left-outer join: unconverted views emit nulls at watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(1735689600000L + min * 60000L)
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Ev(id, t(min), user, typ, 1.0)
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingOps.attributeClicks(views.toDF(), clicks.toDF(),
      joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_sink")
      .outputMode("append").start()
    try {
      // user 1 converts; user 2's view gets no click at all
      views.addData(ev(1, 1, 0, "view"), ev(2, 2, 0, "view"))
      clicks.addData(ev(3, 1, 10, "click"))
      q.processAllAvailable()
      // the matched pair may emit now; the null row for user 2 may NOT —
      // a click could still arrive inside horizon + lateness
      val early = spark.table("attr_outer_sink").collect()
      assert(early.forall(_.getLong(0) == 1L),
        "no null-padded row before the watermark closes the horizon")
      // advance both watermarks past view@0 + horizon + lateness
      views.addData(ev(4, 9, 120, "view"))
      clicks.addData(ev(5, 9, 121, "click"))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_sink").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSet
      assert(rows.contains((1L, Some(t(10)))), "converted view keeps its click")
      assert(rows.contains((2L, None)),
        "unconverted view must emit null-padded once provably unmatched")
    } finally q.stop()
  }
}

object StreamingSpec {
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class Chg(k: Long, v: String, seq: Long, op: String)
  case class OrdChg(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                    o_orderpriority: String, op: String, seq: Long)
  case class HdRow(o_orderkey: Long, o_custkey: Long,
                   o_orderstatus: String, p: String)
}

/** Continuous CDC apply: a change stream merged into a versioned parquet
  * snapshot via foreachBatch, with replay-safe pointer commits. */
class StreamingCdcSpec extends GraftSpec {
  import StreamingSpec.Chg

  private def state(dir: String): Map[Long, String] =
    StreamingOps.readSnapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("change stream merges into the snapshot batch by batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val dir = s"$tmpDir/cdc_snap"
    StreamingOps.initSnapshot(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v"), dir)
    val input = MemoryStream[Chg]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingOps.applyChangesBatch(batch, dir, "k", "seq", "op", id)
      }
      .option("checkpointLocation", s"$tmpDir/cdc_ckpt").start()
    try {
      // batch 1: in-batch compaction (two changes for k=2, higher seq wins),
      // a delete, and an insert
      input.addData(Chg(2L, "TWO-stale", 1L, "U"), Chg(2L, "TWO", 2L, "U"),
        Chg(3L, "x", 3L, "D"), Chg(4L, "four", 4L, "I"))
      q.processAllAvailable()
      assert(state(dir) === Map(1L -> "one", 2L -> "TWO", 4L -> "four"))
      // batch 2: delete the fresh insert, update an untouched base row
      input.addData(Chg(4L, "x", 5L, "D"), Chg(1L, "ONE", 6L, "U"))
      q.processAllAvailable()
      assert(state(dir) === Map(1L -> "ONE", 2L -> "TWO"))
    } finally q.stop()
    // replaying an already-applied batch id must be a no-op (the restart-
    // from-checkpoint redelivery case)
    val replay = Seq(Chg(1L, "CLOBBER", 99L, "U")).toDF()
    StreamingOps.applyChangesBatch(replay, dir, "k", "seq", "op", 0L)
    StreamingOps.applyChangesBatch(replay, dir, "k", "seq", "op", 1L)
    assert(state(dir) === Map(1L -> "ONE", 2L -> "TWO"))
    // a genuinely new batch id applies
    StreamingOps.applyChangesBatch(replay, dir, "k", "seq", "op", 2L)
    assert(state(dir) === Map(1L -> "CLOBBER", 2L -> "TWO"))
  }

  test("continuous CDC apply converges to the oracle-anchored batch parity state") {
    // streaming_cdc_apply registers applyChangesBatch's transform core
    // (compact → merge) in batch, DuckDB-oracled; this drives the SAME
    // feed through a real foreachBatch run — seq-1 changes in micro-batch
    // 1, their seq-2 supersessions in micro-batch 2, so no single batch
    // holds the final state — and asserts the resulting snapshot is
    // row-identical to the batch op's final frame.
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = s"$tmpDir/cdc_par_snap"
    StreamingOps.initSnapshot(
      Tables.orders(spark, sf).filter(col("o_orderkey") % 10 =!= 0), dir)
    val feed = ops.Changes.cdcFeedOrders(spark, sf)
      .as[StreamingSpec.OrdChg].collect()
    val input = MemoryStream[StreamingSpec.OrdChg]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingOps.applyChangesBatch(batch, dir, "o_orderkey", "seq", "op", id)
      }
      .option("checkpointLocation", s"$tmpDir/cdc_par_ckpt").start()
    try {
      input.addData(feed.filter(_.seq == 1L).toSeq); q.processAllAvailable()
      input.addData(feed.filter(_.seq == 2L).toSeq); q.processAllAvailable()
    } finally q.stop()
    val snap = StreamingOps.readSnapshot(spark, dir)
    val fin = ops.Changes.cdcApplyFinal(spark, sf)
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    assert(snap.count() === fin.count())
    assert(ops.Recon.hashDiffTables(snap, fin, "o_orderkey", cols)
      .collect().head.getLong(0) === 0L)
    // the poisoned seq-1 restatements must not have survived compaction
    assert(snap.filter(col("o_totalprice") >= 1000000).count() === 0)
  }
}

/** The production-shaped path: file source → watermark → parquet sink
  * with a checkpoint — the readStream/writeStream/checkpoint lifecycle a
  * cluster deployment runs, not just the in-memory harness. */
class StreamingFileSpec extends GraftSpec {
  import StreamingSpec.Ev

  private def toTyped(e: EventsFixture.RawEv): Ev =
    Ev(e.event_id, new java.sql.Timestamp(e.ts / 1000000L), e.user_id,
      e.event_type, e.value)

  test("streaming z-score screen equals the batch op against static stats") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val stats = graft.ops.Events.valueStats(Tables.events(spark, sf))
    val input = MemoryStream[Ev]
    val q = StreamingOps.streamingZscore(input.toDF(), stats)
      .writeStream.format("memory").queryName("z_sink")
      .outputMode("append").start()
    try {
      // feed the whole sf0.001 table through in two micro-batches
      val evs = Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value").collect()
        .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4)))
      val (a, b) = evs.splitAt(evs.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("z_sink").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val batch = graft.ops.Events.zscoreOutliers(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming mix drift: PSI against a reference mix, hand-computed") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    // fixture mix is 5 a / 5 b = 0.5 each; reference says 0.9/0.1 → the
    // drift must register as the exact hand-computed PSI
    val ref = Map("a" -> 0.9, "b" -> 0.1)
    val q = StreamingOps.streamingMixDrift(input.toDF(), ref)
      .writeStream.format("memory").queryName("mix_sink")
      .outputMode("complete").start()
    try {
      val evs = EventsFixture.fixtureEvents.map(toTyped)
      val (x, y) = evs.splitAt(4)
      input.addData(x); q.processAllAvailable()
      input.addData(y); q.processAllAvailable()
      val rows = spark.table("mix_sink").collect()
      assert(rows.length === 1, "all fixture events fall in one day window")
      assert(rows.head.getLong(1) === evs.length.toLong)
      val expected = BigDecimal(
        (0.5 - 0.9) * math.log(0.5 / 0.9) + (0.5 - 0.1) * math.log(0.5 / 0.1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows.head.getDouble(2) === expected)
    } finally q.stop()
  }

  test("streaming mix drift: a matching mix scores zero PSI") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.streamingMixDrift(input.toDF(),
        Map("a" -> 0.5, "b" -> 0.5))
      .writeStream.format("memory").queryName("mix0_sink")
      .outputMode("complete").start()
    try {
      input.addData(EventsFixture.fixtureEvents.map(toTyped))
      q.processAllAvailable()
      val rows = spark.table("mix0_sink").collect()
      assert(rows.length === 1 && rows.head.getDouble(2) === 0.0)
    } finally q.stop()
  }

  test("streaming mix drift: a type ABSENT from the reference raises PSI") {
    // the round-11 form counted only reference types, so a novel event
    // type — the classic composition-drift signature — contributed zero
    // signal; the `other` bucket (reference share = the 1e-6 clamp
    // floor) must now trip the standard 0.2 alert threshold
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.streamingMixDrift(input.toDF(),
        Map("a" -> 0.5, "b" -> 0.5))
      .writeStream.format("memory").queryName("mixnovel_sink")
      .outputMode("complete").start()
    try {
      val known = EventsFixture.fixtureEvents.map(toTyped) // 5 a / 5 b
      val dayStartMs = 1735689600L * 1000L                 // 2025-01-01 UTC
      val novel = Seq(
        Ev(101L, new java.sql.Timestamp(dayStartMs + 3600L * 1000), 9L, "c", 1.0),
        Ev(102L, new java.sql.Timestamp(dayStartMs + 7200L * 1000), 9L, "c", 1.0))
      input.addData(known ++ novel)
      q.processAllAvailable()
      val rows = spark.table("mixnovel_sink").collect()
      assert(rows.length === 1, "all events fall in one day window")
      assert(rows.head.getLong(1) === 12L, "total must count the novel type")
      def term(p: Double, qq: Double) = (p - qq) * math.log(p / qq)
      val expected = BigDecimal(
        term(5.0 / 12, 0.5) * 2 + term(2.0 / 12, 1e-6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows.head.getDouble(2) === expected)
      assert(rows.head.getDouble(2) > 0.2, "novel type must trip the alert")
    } finally q.stop()
  }

  test("idempotent batch sink: a replayed micro-batch adds no duplicates") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val out = s"$tmpDir/idem_out"
    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .option("checkpointLocation", s"$tmpDir/idem_ckpt")
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) =>
        StreamingOps.writeBatchIdempotent(batch.toDF(), out, id))
      .start()
    val evs = EventsFixture.fixtureEvents.map(toTyped)
    try {
      input.addData(evs.take(5)); q.processAllAvailable()
      input.addData(evs.drop(5)); q.processAllAvailable()
    } finally q.stop()
    val once = spark.read.parquet(out)
    assert(once.count() === evs.length.toLong)
    assert(once.select("batch_id").distinct().count() === 2)
    // simulate the failure replay: the sink re-runs batch 1 with the
    // same rows (what Spark does when the checkpoint commit was lost)
    StreamingOps.writeBatchIdempotent(
      evs.drop(5).toDF().withColumn("ts", col("ts")), out, 1L)
    val replayed = spark.read.parquet(out)
    assert(replayed.count() === evs.length.toLong, "replay must not duplicate")
    // and the content round-trips exactly
    val got = replayed.select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === evs.map(_.event_id).sorted.toSeq)
  }

  test("parquet file source → tumbling agg → parquet sink with checkpoint") {
    val src = s"$tmpDir/in"
    val out = s"$tmpDir/out"
    val ckpt = s"$tmpDir/ckpt"
    EventsFixture.writeFixture(spark, src)
    val stream = spark.readStream
      .schema(Tables.eventsRaw)
      .parquet(s"$src/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    val q = graft.streaming.StreamingOps.tumblingCounts(stream)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; a second batch far
    // in the future closes them all, exercising checkpoint recovery too
    import spark.implicits._
    Seq(EventsFixture.RawEv(999L, 1767225600L * 1000000000L, 99L, "z", 0.0, "{}"))
      .toDF().write.mode("append").parquet(s"$src/events.parquet")
    val q2 = graft.streaming.StreamingOps.tumblingCounts(stream)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val got = spark.read.parquet(out)
      .filter($"event_type" =!= "z")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    val batch = graft.streaming.StreamingOps.tumblingCounts(
      Tables.events(spark, src).filter($"event_type" =!= "z")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("mismatch-streak state survives a query RESTART from the checkpoint") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DiffObs
    val spark0 = spark
    import spark0.implicits._
    val src = s"$tmpDir/streak_in"
    val out = s"$tmpDir/streak_out"
    val ckpt = s"$tmpDir/streak_ckpt"
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$min%02d:00")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("k LONG, ts TIMESTAMP, status STRING")
        .parquet(src).as[DiffObs]
      val q = StreamingOps.mismatchStreakAlerts(stream, threshold = 3)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // run 1: two consecutive mismatches — below threshold, no alert
    Seq(DiffObs(1L, t(0), "mismatch"), DiffObs(1L, t(1), "mismatch"))
      .toDF().write.mode("append").parquet(src)
    run()
    // run 2 (fresh query, same checkpoint): the third mismatch alerts
    // ONLY if the n=2 streak was recovered from the state store
    Seq(DiffObs(1L, t(2), "mismatch")).toDF().write.mode("append").parquet(src)
    run()
    val alerts = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSeq
    assert(alerts === Seq((1L, t(2), 3)),
      "restart must recover the streak from the checkpointed state store")
  }

  test("streaming top-k: MinK state merges across micro-batches, equals batch recompute") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = StreamingOps.streamingTopK(
        input.toDF().toDF("k", "v"), "k", "v", k = 3)
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode("complete").start()
    try {
      // three micro-batches: the store must MERGE each batch's partial
      // buffer into held state — values arrive interleaved so a correct
      // result cannot come from any single batch alone
      val batches = Seq(
        Seq("a" -> 5.0, "a" -> 1.0, "b" -> 9.0),
        Seq("a" -> 3.0, "b" -> 2.0, "b" -> 8.0, "b" -> 7.0),
        Seq("a" -> 0.5, "a" -> 4.0, "b" -> 1.5))
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("topk_sink").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
      val expect = batches.flatten.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.take(3).toList).toMap
      assert(got === expect)
      assert(got("a") === List(0.5, 1.0, 3.0) && got("b") === List(1.5, 2.0, 7.0))
    } finally q.stop()
  }
}
