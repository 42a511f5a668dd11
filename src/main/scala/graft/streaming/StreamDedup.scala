package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextDedup

/** Near-duplicate suppression at ingest time: each arriving document's
  * MinHash bands are checked against per-band state holding the first
  * document seen with that band value; a collision emits a candidate
  * pair as data flows — the streaming face of the batch MinHash+LSH
  * dedup (same signatures, same banding).
  *
  * The identical code runs in batch (one state call per band group,
  * rows ordered by event time) and behind readStream (state persists
  * across micro-batches). State per band value is two longs.
  *
  * State TTL (`stateTtl`): over an unbounded stream the first-seen map
  * grows with distinct band values forever, so production callers bound
  * it with a processing-time TTL sized to how long a duplicate can
  * trail its original. Documented semantics past the TTL: a band value
  * idle for longer than `stateTtl` is FORGOTTEN — a later duplicate is
  * NOT flagged and becomes the new first-seen. `None` (the default, and
  * the batch-oracle path) keeps exact unbounded first-seen semantics.
  *
  * Caveat for tests/drivers: with `ProcessingTimeTimeout` registered,
  * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is always true,
  * so the engine schedules micro-batches continuously to fire expiries
  * — `StreamingQuery.processAllAvailable()` never observes a quiescent
  * stream and blocks forever. Poll the sink (or progress metrics) with
  * a deadline instead when a TTL is set.
  */
object StreamDedup {

  final case class BandRow(docId: Long, ts: Timestamp, band: Int, value: Long)
  final case class DupCandidate(docId: Long, earlierId: Long, band: Int)

  def nearDupCandidates(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, n: Int = 3, h: Int = 16, bands: Int = 4,
      seed: Long = 42L,
      stateTtl: Option[java.time.Duration] = None): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = TextDedup.bandedSignatures(
      docs.select(col(idCol), col(tsCol), col(textCol)),
      idCol, textCol, n, h, bands, seed, carry = Seq(tsCol))
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col("band"), col("val").as("value"))
      .as[BandRow]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(r => (r.band, r.value))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the TTL with no new rows for this band value:
            // drop the first-seen entry (bounds total state)
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer[DupCandidate]()
            var first = state.getOption
            rows.toSeq.sortBy(r => (r.ts.getTime, r.docId)).foreach { r =>
              first match {
                case None => first = Some((r.ts.getTime, r.docId))
                case Some((_, fid)) if fid != r.docId =>
                  out += DupCandidate(r.docId, fid, key._1)
                case _ => ()
              }
            }
            first.foreach(state.update)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.iterator
          }
      }
  }
}
