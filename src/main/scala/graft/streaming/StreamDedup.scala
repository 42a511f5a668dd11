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
  * across micro-batches). State per band value is two longs; in
  * production streaming add a state TTL sized to how long a duplicate
  * can trail its original — unbounded state is the cost of exact
  * first-seen semantics over an unbounded stream.
  */
object StreamDedup {

  final case class BandRow(docId: Long, ts: Timestamp, band: Int, value: Long)
  final case class DupCandidate(docId: Long, earlierId: Long, band: Int)

  def nearDupCandidates(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, n: Int = 3, h: Int = 16, bands: Int = 4,
      seed: Long = 42L): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = TextDedup.bandedSignatures(
      docs.select(col(idCol), col(tsCol), col(textCol)),
      idCol, textCol, n, h, bands, seed, carry = Seq(tsCol))
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col("band"), col("val").as("value"))
      .as[BandRow]
    banded
      .groupByKey(r => (r.band, r.value))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[(Long, Long)]) =>
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
          out.iterator
      }
  }
}
