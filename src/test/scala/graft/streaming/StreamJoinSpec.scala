package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.Event

/** The stream-stream interval join running as a REAL two-source
  * stream: clicks and purchases arrive on independent MemoryStreams,
  * the watermarked symmetric hash join emits attributed pairs in
  * append mode, and matches outside the horizon never appear.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("clicks join same-user purchases within the horizon, not outside") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    def df(m: MemoryStream[Event]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.purchaseAttribution(
        df(clicks), df(purchases), horizon = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      purchases.addData(
        Event(100, ts(0), 1, "purchase", 10.0),   // 30 min before the click: in
        Event(101, ts(25), 1, "purchase", 20.0),  // 5 min before: in
        Event(102, ts(40), 1, "purchase", 30.0),  // AFTER the click: out
        Event(103, ts(25), 2, "purchase", 40.0))  // other user: out
      clicks.addData(Event(1, ts(30), 1, "click", 0.0))
      q.processAllAvailable()
      // a click far later only sees purchases inside ITS horizon
      clicks.addData(Event(2, ts(300), 1, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT click_id, purchase_value FROM attr_out")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows === Set((1L, 10.0), (1L, 20.0)))
    } finally q.stop()
  }

  test("batch input runs the identical code as an equi+range join") {
    import spark.implicits._
    val c = Seq(Event(1, ts(30), 1, "click", 0.0)).toDF(
      "event_id", "ts", "user_id", "event_type", "value")
    val p = Seq(
      Event(100, ts(0), 1, "purchase", 10.0),
      Event(102, ts(40), 1, "purchase", 30.0)).toDF(
      "event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.purchaseAttribution(c, p, horizon = "1 hour")
    assert(out.select($"purchase_value").as[Double].collect().toSeq === Seq(10.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
