package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.CmsSketch

/** Streaming corpus statistics: a count-min grid maintained under an
  * unbounded ingest stream, queryable at any time without scanning the
  * corpus. Each micro-batch's grid (≤ depth·width cells no matter the
  * batch size) lands in its OWN `batch_id=<n>` directory with
  * overwrite — the same idempotent-sink pattern as
  * [[EventStreams.idempotentParquetSink]]: a replayed batch (failure /
  * retry re-delivery) rewrites the same directory instead of
  * double-counting, so the folded stats are exactly-once on top of
  * foreachBatch's at-least-once delivery. Readers fold the batch
  * grids by cell-wise sum (CMS merge IS addition), a bounded
  * #batches·depth·width-row aggregation — no stream pause, no state
  * store, no rescan.
  */
object StreamStats {

  /** foreachBatch sink: one bounded grid per batch, replay-idempotent. */
  def cmsSink(dir: String, valueCol: String, depth: Int, width: Int)(
      batch: DataFrame, batchId: Long): Unit =
    CmsSketch.build(batch, valueCol, depth, width)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** Maintain the grid under a stream of occurrence rows (any frame
    * carrying `valueCol` — e.g. fingerprinted tokens).
    */
  def start(occurrences: DataFrame, dir: String, checkpointDir: String,
      valueCol: String, depth: Int = 4, width: Int = 1024): StreamingQuery =
    occurrences.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(cmsSink(dir, valueCol, depth, width) _)
      .start()

  /** The folded grid across every batch written so far. */
  def readCms(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("__j"), col("__pos"))
      .agg(sum(col("__cnt")).as("__cnt"))

  /** Point estimates for `candidates` against the current stats. */
  def estimate(spark: SparkSession, dir: String, candidates: DataFrame,
      valueCol: String, depth: Int = 4, width: Int = 1024): DataFrame =
    CmsSketch.estimate(readCms(spark, dir), candidates, valueCol, depth, width)
}
