package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.{ClosedSession, Event}

/** The streaming transforms running as REAL streams (MemoryStream →
  * memory sink): windowed agg under watermark, stateful sessionizer,
  * watermarked dedup.
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowedAgg aggregates a live stream with watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.windowedAgg(
      src.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      watermark = "10 minutes", win = "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(10), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first hour window
      src.addData(Event(4, ts(200), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, total_value FROM win_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionAgg runs as a real stream (watermarked session windows)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionAgg(
      src.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessagg_out")
      .outputMode("append").start()
    try {
      src.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "click", 0))
      q.processAllAvailable()
      // advance the watermark far past the session end to emit it
      src.addData(Event(3, ts(500), 2, "click", 0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM sessagg_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 2L)), s"session not emitted: $rows")
    } finally q.stop()
  }

  test("flushOpen completes the final session in batch") {
    import spark.implicits._
    val ev = Seq(
      Event(1, ts(0), 7, "click", 0), Event(2, ts(10), 7, "click", 0),
      Event(3, ts(120), 7, "click", 0), // gap closes first session
      Event(4, ts(5), 8, "view", 0)     // single-session user
    ).toDS()
    val default = EventStreams.sessionizeStateful(ev, gapMinutes = 30).collect()
    // pinned default: final open sessions stay in state (user 8 absent)
    assert(default.toSet == Set(ClosedSession(7, ts(0).getTime, ts(10).getTime, 2)))
    val flushed = EventStreams.sessionizeStateful(ev, gapMinutes = 30,
      flushOpen = true).collect()
    assert(flushed.toSet == Set(
      ClosedSession(7, ts(0).getTime, ts(10).getTime, 2),
      ClosedSession(7, ts(120).getTime, ts(120).getTime, 1),
      ClosedSession(8, ts(5).getTime, ts(5).getTime, 1)))
  }

  test("stateful sessionizer emits closed sessions across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionizeStateful(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 7, "click", 0), Event(2, ts(10), 7, "click", 0))
      q.processAllAvailable()
      src.addData(Event(3, ts(120), 7, "click", 0)) // 110-min gap → closes session
      q.processAllAvailable()
      val sessions = spark.sql("SELECT * FROM sess_out").as[ClosedSession].collect()
      assert(sessions.length == 1)
      assert(sessions.head == ClosedSession(7, ts(0).getTime, ts(10).getTime, 2))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.dedupEvents(
      src.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // replay of id 1
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(DISTINCT event_id) c, COUNT(*) n FROM dedup_out").head()
      assert(n.getLong(0) == 2 && n.getLong(1) == 2)
    } finally q.stop()
  }

  test("streaming near-dup suppressor flags a cross-batch duplicate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val q = StreamDedup.nearDupCandidates(
      src.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      src.addData(
        (1L, ts(0), "the quick brown fox jumps over the lazy dog today"),
        (2L, ts(1), "completely different words appear in this other document here"))
      q.processAllAvailable()
      src.addData( // exact near-dup of doc 1, arriving a batch later
        (3L, ts(2), "the quick brown fox jumps over the lazy dog today"))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT docId, earlierId FROM neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((3L, 1L)), s"got $pairs")
    } finally q.stop()
  }

  test("near-dup suppressor state TTL: a duplicate after the TTL is NOT suppressed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val dupText = "the quick brown fox jumps over the lazy dog today"
    // NOTE: with ProcessingTimeTimeout the engine runs micro-batches
    // continuously to fire expiries, so processAllAvailable() would
    // block forever (see StreamDedup scaladoc) — this test polls the
    // sink / progress metrics with deadlines instead.
    // cumulative source-row counter (recentProgress is a bounded buffer
    // that the continuous empty timeout batches would evict from)
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "neardup_ttl_out")
          inputRows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = StreamDedup.nearDupCandidates(
      src.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      stateTtl = Some(java.time.Duration.ofMillis(1000)))
      .writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    def pairs(): Set[(Long, Long)] =
      spark.sql("SELECT DISTINCT docId, earlierId FROM neardup_ttl_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def awaitInputRows(want: Long, deadlineMs: Long = 30000): Unit = {
      val t0 = System.currentTimeMillis()
      while (inputRows.get() < want && System.currentTimeMillis() - t0 < deadlineMs)
        Thread.sleep(50)
      assert(inputRows.get() >= want,
        s"stream stalled: ${inputRows.get()} of $want source rows")
    }
    try {
      src.addData((1L, ts(0), dupText))
      awaitInputRows(1)
      // batches keep running while we sleep, so doc 1's idle band state
      // fires its 1 s timeout and is removed well within this window
      Thread.sleep(3000)
      // same text again: state was forgotten, so NOT flagged — doc 3
      // becomes the new first-seen (documented post-TTL semantics)...
      src.addData((3L, ts(2), dupText))
      // ...and a prompt duplicate of doc 3 IS still flagged against it
      src.addData((4L, ts(3), dupText))
      val t0 = System.currentTimeMillis()
      while (!pairs().contains((4L, 3L)) && System.currentTimeMillis() - t0 < 30000)
        Thread.sleep(100)
      assert(pairs() == Set((4L, 3L)),
        s"expected only (4,3) — doc 1's expired state must not flag doc 3; got ${pairs()}")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("idempotentParquetSink: a replayed batch does not duplicate output") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val src = MemoryStream[Event]
    val sink = EventStreams.idempotentParquetSink(s"$dir/out") _
    val q = src.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) => sink(b, id) }
      .outputMode("append").start()
    try {
      src.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      src.addData(Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      // simulate at-least-once re-delivery: rewrite batch 1's directory
      // (materialize first — a real retry re-delivers from the SOURCE,
      // not from the sink directory being overwritten)
      val batch1Rows = spark.read.parquet(s"$dir/out/batch_id=1")
        .as[Event].collect().toSeq
      sink(batch1Rows.toDF(), 1L)
      val out = spark.read.parquet(s"$dir/out")
      assert(out.count() == 3, "replayed batch duplicated rows")
      assert(out.select("eventId").distinct().count() == 3)
    } finally q.stop()
  }

  test("a saved tokenizer encodes a live stream: stateless scan expression, no state store") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // train offline on the batch corpus, save, reload — then encode a
    // stream with the loaded model: the kernel is a scan expression,
    // so the streaming plan carries NO aggregation state
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = graft.operators.UnigramLearn.learn(docs, "text")
    val p = java.nio.file.Files.createTempDirectory("graft_tok_stream").toString + "/model"
    graft.operators.TokenizerIO.saveUnigram(spark, res.vocab, p)
    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TokenizerIO.unigramEncodeExpr(spark, p, col("text")).as("tokens"))
      .writeStream.format("memory").queryName("tok_out")
      .outputMode("append").start()
    try {
      src.addData((1L, "spark query plan"), (2L, ""))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, tokens FROM tok_out")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      // equality against the batch encode of the same text
      val batch = Seq((1L, "spark query plan"), (2L, "")).toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.operators.UnigramLearn.encodeExpr(col("text"), res.vocab).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(rows === batch)
      assert(rows(1L).nonEmpty && rows(2L).isEmpty)
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty, "encode must add no streaming state")
    } finally q.stop()
  }
}
