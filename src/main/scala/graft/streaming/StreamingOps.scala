package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the batch event-time ops
  * (SURVEY.md §2.8). Each takes any events-shaped frame — batch or
  * `readStream` — and returns the transformed frame; the caller picks the
  * sink (`writeStream` + checkpoint in production, memory sink in tests).
  *
  * Watermarks bound state: an event later than the watermark is dropped
  * rather than held forever — the only sane policy when the state store
  * would otherwise grow with the full 100 TB history.
  */
object StreamingOps {

  /** Tumbling 1-hour per-type counts/sums; 1-hour lateness tolerance. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("v"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"))

  /** Streaming exact-dedup on an id column — the ingestion-time twin of
    * the batch `dedup_exact_docs` gate. `dropDuplicatesWithinWatermark`
    * keeps one state entry per id only until the watermark passes it, so
    * state is bounded by the lateness horizon instead of growing with the
    * full stream history — the only viable contract at 100 TB/day. */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(idCol)

  /** 30-minute-gap sessions per user via the built-in session_window —
    * the streaming twin of the batch lag→running-sum sessionizer. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n"))

  /** Continuous reconciliation — the ingestion-time twin of the batch
    * [[graft.ops.Recon.hashDiffDetail]]: every micro-batch of the stream
    * is checked against a static reference table as it arrives, emitting
    * (key, status) for rows whose checksum diverges ("mismatch") or that
    * have no reference counterpart ("missing_in_reference"). Uses the
    * same length-prefixed null-safe checksum as the batch APIs.
    *
    * Stateless by construction: a per-row stream-static LEFT join needs
    * no watermark and holds no state, so it runs forever at any rate. The
    * reference's extra-in-reference set is undefined until the stream
    * ends — a streaming full-outer against a static side would need
    * unbounded state — and stays a batch-API concern. At scale the
    * static side is broadcast (bounded dim) or bucketed on the key. */
  def streamingHashDiff(stream: DataFrame, reference: DataFrame,
                        key: String, cols: Seq[String]): DataFrame = {
    val s = stream.select(col(key).as("k"),
      graft.ops.Recon.rowChecksum(cols).as("h_src"))
    val r = reference.select(col(key).as("k"),
      graft.ops.Recon.rowChecksum(cols).as("h_tgt"))
    s.join(r, Seq("k"), "left_outer")
      .select(col("k"),
        when(col("h_tgt").isNull, "missing_in_reference")
          .when(col("h_src") =!= col("h_tgt"), "mismatch")
          .otherwise("match").as("status"))
      .filter(col("status") =!= "match")
  }
}
