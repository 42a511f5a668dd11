package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the events table (an engine
  * EXTENSION — the reference has no streaming; SURVEY §2.9 notes this
  * explicitly). Every transform is written against a plain DataFrame so
  * the identical code runs in batch (oracle-checked) and behind
  * `readStream` (watermarks apply only there; `withWatermark` is a
  * no-op in batch).
  *
  * Scale notes: tumbling/session windows key the shuffle on
  * (window/user) — state is bounded by the watermark; the custom-state
  * sessionizer bounds memory per key to one open session.
  */
object EventStreams {

  /** Watermarked tumbling-window counts + exact decimal sums per
    * event type. Streaming: append-mode after watermark; batch: plain
    * group-by (hour windows align to date_trunc).
    */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
      win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Native session windows (Spark ≥3.2 `session_window`): events within
    * `gap` of each other merge into one session — Catalyst handles the
    * merge; no custom state needed for the common case. A streaming
    * source gets the watermark session aggregation REQUIRES (append
    * mode rejects a session_window aggregate without one); batch input
    * is untouched.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"), col("n_events"))
  }

  /** Dedup on event_id: bounded by the watermark when streaming (state
    * eviction past the watermark); plain dropDuplicates in batch, where
    * `dropDuplicatesWithinWatermark` is rejected by Spark — the output
    * contract is identical on the events the stream would keep.
    */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream interval join (purchase attribution): each click
    * pairs with every same-user purchase in the `horizon` before it.
    * Both sides carry watermarks and the join condition time-bounds
    * the match window, which is exactly what Spark's streaming
    * symmetric hash join needs to EVICT state: a purchase older than
    * watermark+horizon can never match a future click and is dropped
    * from the state store, so state is bounded regardless of stream
    * length. Batch input runs the identical code as a plain
    * equi+range sort-merge join (the equality key keeps it off the
    * nested-loop path) — oracle-checked by `q_click_attribution`.
    */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 day", watermark: String = "10 minutes"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val c = wm(clicks).select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val p = wm(purchases).select(col("user_id").as("__pu"),
      col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("__pu") &&
          col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $horizon") &&
          col("purchase_ts") <= col("click_ts"))
      .drop("__pu")
  }

  /** Idempotent parquet sink for `foreachBatch`: each micro-batch
    * writes to its own `batch_id=<id>` partition directory with
    * overwrite — a replayed batch (failure/retry re-delivery) rewrites
    * the SAME directory instead of appending duplicates, giving
    * exactly-once output on top of the engine's at-least-once batch
    * delivery. Readers see `path` as one partitioned dataset.
    */
  def idempotentParquetSink(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write
      .mode("overwrite")
      .parquet(s"$path/batch_id=$batchId")

  // ---- custom state: explicit sessionizer -----------------------------

  final case class Event(eventId: Long, ts: Timestamp, userId: Long,
      eventType: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int)
  final case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** `flatMapGroupsWithState` sessionizer (the
    * KeyValueGroupedDataset custom-state path the brief calls for): one
    * open session per user; an event arriving past the gap CLOSES the
    * previous session and emits it. State per key = 3 scalars.
    *
    * By default the final open session stays in state (the pinned,
    * oracle-mirrored contract). `flushOpen = true` completes it:
    *  - batch: the group is finite, so the open session IS final — it
    *    is emitted and state cleared (no dropped last session);
    *  - streaming: an EVENT-TIME TIMEOUT at `lastTs + gap` flushes the
    *    session once the watermark passes it, which also bounds state
    *    for churned users (callers must `withWatermark("ts", …)` the
    *    input — event-time timeouts require one).
    */
  def sessionizeStateful(events: Dataset[Event],
      gapMinutes: Int = 30, flushOpen: Boolean = false): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val streaming = events.isStreaming // driver-side; not the closure
    val timeoutConf =
      if (streaming && flushOpen) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start, s.lastTs, s.n))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var cur = state.getOption
            batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId)).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1))
                case Some(s) =>
                  out += ClosedSession(userId, s.start, s.lastTs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            if (flushOpen && !streaming) {
              cur.foreach(s => out += ClosedSession(userId, s.start, s.lastTs, s.n))
              state.remove()
            } else {
              cur.foreach(state.update)
              if (flushOpen && streaming)
                cur.foreach(s => state.setTimeoutTimestamp(s.lastTs + gapMs))
            }
            out.iterator
          }
      }
  }
}
