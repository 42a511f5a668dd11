package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.streaming.EventStreams

/** Streaming-shaped operators verified in batch mode over the events
  * table: the same transforms run behind readStream (StreamingSpec
  * drives them with MemoryStream); the DuckDB oracles pin the batch
  * semantics.
  */
object StreamQueries extends QueryPack {

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_event_windows",
      "Tumbling 1-hour windows per event type (watermarked streaming agg " +
        "run in batch): counts + exact decimal value sums.",
      (s, dir) =>
        EventStreams.windowedAgg(Tables.load(s, dir, "events"))
          .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
             |       event_type,
             |       COUNT(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    GQuery(
      "q_event_sessions",
      "Session windows (30-minute gap) per user via native " +
        "session_window, aggregated to per-user session stats; oracle " +
        "mirrors with a lag/gap-cumsum rewrite.",
      (s, dir) =>
        EventStreams.sessionAgg(Tables.load(s, dir, "events"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            max(col("n_events")).as("max_session_events"))
          .orderBy(col("user_id")),
      Some("""WITH e AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM e),
             |s AS (
             |  SELECT user_id,
             |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g),
             |per AS (
             |  SELECT user_id, session_id, COUNT(*) AS n_events
             |  FROM s GROUP BY user_id, session_id)
             |SELECT user_id, COUNT(*) AS n_sessions,
             |       CAST(SUM(n_events) AS BIGINT) AS n_events,
             |       MAX(n_events) AS max_session_events
             |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin)),

    GQuery(
      "q_event_sessions_stateful",
      "The flatMapGroupsWithState sessionizer run in batch: explicit " +
        "per-user state closes a session when an event arrives past the " +
        "30-minute gap. Only CLOSED sessions are emitted — each user's " +
        "final session stays open in state — so the oracle's " +
        "gaps-and-islands rewrite drops the last session per user.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id").as("eventId"), col("ts"),
            col("user_id").as("userId"), col("event_type").as("eventType"),
            col("value"))
          .as[EventStreams.Event]
        EventStreams.sessionizeStateful(ev, gapMinutes = 30).toDF()
          .select(col("userId").as("user_id"), col("startMs").as("start_ms"),
            col("endMs").as("end_ms"), col("nEvents").cast("long").as("n_events"))
          .orderBy(col("user_id"), col("start_ms"))
      },
      Some("""WITH e AS (
             |  -- truncate to ms: the sessionizer compares Timestamp.getTime
             |  -- (millisecond) gaps, and the raw data carries microseconds
             |  SELECT user_id,
             |         date_trunc('milliseconds', CAST(ts AS TIMESTAMP)) AS ts
             |  FROM events),
             |g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM e),
             |s AS (
             |  SELECT user_id, ts,
             |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM g),
             |per AS (
             |  SELECT user_id, session_id,
             |         CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
             |         CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms,
             |         COUNT(*) AS n_events
             |  FROM s GROUP BY user_id, session_id),
             |fin AS (
             |  SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS last_s
             |  FROM per)
             |SELECT user_id, start_ms, end_ms, n_events FROM fin
             |WHERE session_id < last_s
             |ORDER BY user_id, start_ms""".stripMargin)),

    GQuery(
      "q_stream_neardup",
      "Ingest-time near-dup suppression run in batch: per-band state " +
        "holds the first document per MinHash band value (event-time " +
        "order); later colliders emit candidate pairs. Oracle mirrors " +
        "the full signature arithmetic and pairs every doc with its " +
        "band-group minimum.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            timestamp_seconds(col("doc_id") + lit(1700000000L)).as("ts"),
            col("text"))
        graft.streaming.StreamDedup.nearDupCandidates(docs, "doc_id", "ts", "text")
          .toDF()
          .select(col("docId").as("doc_id"), col("earlierId").as("earlier_id"))
          .distinct()
          .orderBy(col("doc_id"), col("earlier_id"))
      },
      Some(s"""WITH ${DedupOracles.base("documents")},
              |${DedupOracles.minhashBandCtes()},
              |u AS (
              |  SELECT doc_id, 0 AS band, band0 AS val FROM bnd
              |  UNION ALL SELECT doc_id, 1, band1 FROM bnd
              |  UNION ALL SELECT doc_id, 2, band2 FROM bnd
              |  UNION ALL SELECT doc_id, 3, band3 FROM bnd),
              |f AS (SELECT band, val, MIN(doc_id) AS first_id FROM u GROUP BY band, val)
              |SELECT DISTINCT u.doc_id, f.first_id AS earlier_id
              |FROM u JOIN f ON u.band = f.band AND u.val = f.val
              |WHERE u.doc_id > f.first_id
              |ORDER BY doc_id, earlier_id""".stripMargin)),

    GQuery(
      "q_click_attribution",
      "Stream-stream interval join run in batch: each click pairs with " +
        "every same-user purchase in the preceding day. Behind " +
        "readStream the same code is a watermarked symmetric hash join " +
        "with time-bounded state eviction (StreamJoinSpec drives it); " +
        "the batch plan keeps the user_id equality key so it " +
        "sort-merge-joins, never a nested loop.",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        graft.streaming.EventStreams.purchaseAttribution(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"))
          .orderBy(col("click_id"), col("purchase_ts"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
             |      FROM events WHERE event_type = 'purchase')
             |SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
             |       p.ts AS purchase_ts, p.value AS purchase_value
             |FROM c JOIN p
             |  ON c.user_id = p.user_id
             | AND p.ts >= c.ts - INTERVAL 1 DAY AND p.ts <= c.ts
             |ORDER BY click_id, purchase_ts""".stripMargin))
  )
}
