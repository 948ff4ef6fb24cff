package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Exact

/** Event-time streaming transforms (SURVEY §2.8 + the pipeline extensions):
  * the watermark/window/custom-state layer a 100 TB ingest pipeline runs on.
  *
  * The reference's stream surface is notification-shaped (LIVE SELECT over
  * the change feed — see [[Live]]); its batch dialect expresses windows as
  * `time::floor` group keys (Relational.eventsWindow) and sessions as
  * gap-splits (Relational.eventsSessionize). These transforms are the
  * streaming twins of those exact operators, built on the primitives
  * Structured Streaming owns: watermarks bound state, windowed aggregation
  * keeps map-side partials, and `flatMapGroupsWithState` holds one small
  * open-session record per key — state size scales with |users|, never with
  * |events|, so the same plan runs unbounded.
  *
  * Each transform is written to run IDENTICALLY in batch (oracle-checkable
  * — watermarks are a no-op there) and in streaming (exercised end-to-end
  * in StreamSpec over MemoryStream microbatches). */
object Streams {

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * `events_window` (hourly counts + exact value sums per event type).
    * Late rows beyond `lateness` are dropped; window state is evicted as
    * the watermark passes each window end, so state is O(open windows ×
    * event types). Decimal-exact sums keep microbatch accumulation equal
    * to the batch recompute bit-for-bit. */
  def windowedAgg(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Hopping-window aggregation: 1-hour windows sliding every 15 minutes —
    * each event contributes to 4 overlapping windows. Same state story as
    * [[windowedAgg]] (watermark evicts each window as it finalizes), with
    * state ×(window/slide) — the overlap factor, a constant. Spark expands
    * the window assignment map-side, so no extra shuffle vs tumbling. */
  def slidingAgg(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Watermarked stream-stream interval join: each purchase pairs with the
    * same user's clicks from the preceding hour. Both sides carry
    * watermarks and the join condition time-bounds the click relative to
    * the purchase, so Structured Streaming can size both join-state buffers
    * and evict rows the watermark has passed — the unbounded-safe form of
    * an event-correlation join (state is O(events inside the time bound),
    * never the full stream). In batch the same plan is a plain range
    * condition the optimizer handles as an equi-join + filter. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("c_uid") &&
        col("c_ts") >= col("p_ts") - expr("interval 1 hour") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("value"))
  }

  /** Watermarked exact deduplication by event id: the streaming form keeps
    * one fingerprint per id only INSIDE the watermark window
    * (`dropDuplicatesWithinWatermark`), so state is bounded by the late-
    * arrival horizon, not the stream's lifetime — the unbounded-safe twin
    * of `dedup_exact` for an ingest pipeline. In batch the same call
    * degrades to a plain dropDuplicates. */
  def dedupStream(events: DataFrame, lateness: String = "1 hour"): DataFrame = {
    val w = events.withWatermark("ts", lateness)
    // the within-watermark variant exists only for streams; the batch twin
    // is plain distinct-by-id (same result when all rows are "on time")
    if (events.isStreaming) w.dropDuplicatesWithinWatermark("event_id")
    else w.dropDuplicates("event_id")
  }

  /** Stream-static enrichment: each event joins the (broadcastable) user
    * dimension — the canonical streaming enrich. The static side re-scans
    * per microbatch, so dimension updates are picked up without restarts;
    * no state is kept because only the stream side grows. */
  def enrich(events: DataFrame, users: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(users),
      events("user_id") === users("c_custkey"))
      .select(events("event_id"), events("user_id"), events("event_type"),
        events("value"), users("c_mktsegment"))

  /** One event on the streaming session path. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** Per-user open-session state: the ONLY state held per key. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  /** A closed session (matches the batch `events_sessionize` row shape). */
  final case class Session(user_id: Long, start_us: Long, n_events: Long,
      dur_secs: Double)

  /** Gap-based sessionization with custom event-time state — the streaming
    * twin of `events_sessionize` (a >`gap` silence starts a new session).
    * `flatMapGroupsWithState` keeps one [[OpenSession]] per user; a session
    * closes either when a later event arrives past the gap (emitted in that
    * microbatch) or when the watermark passes lastEvent+gap (event-time
    * timeout). Grouping shuffles by user once; per-key state is constant
    * size, so the operator survives any event volume. */
  def sessionize(events: Dataset[Ev], gapSecs: Long = 1800L,
      lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSecs * 1000000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          def close(s: OpenSession): Session =
            Session(uid, s.startUs, s.n, (s.lastUs - s.startUs) / 1e6)
          val evs = it.map(e => e.ts.getTime * 1000L).toSeq.sorted
          if (evs.isEmpty) {
            // event-time timeout: the watermark passed lastEvent+gap with
            // no new events — the open session is definitively closed
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            evs.foreach { t =>
              open match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  open = Some(s.copy(lastUs = t, n = s.n + 1))
                case Some(s) =>
                  closed += close(s)
                  open = Some(OpenSession(t, t, 1))
                case scala.None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSecs * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
