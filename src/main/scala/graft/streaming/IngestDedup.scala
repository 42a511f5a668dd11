package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextDedup

/** Durable streaming ingest dedup — the production loop the
  * materialized dedup index ([[TextDedup.writeDedupIndex]]) exists for:
  * every micro-batch is screened against everything EVER admitted (the
  * index survives restarts, unlike `flatMapGroupsWithState` state tied
  * to one checkpoint), then self-deduped within the batch, and the
  * survivors are appended to both the output corpus and the index — so
  * the next batch, and the next job, screen against them.
  *
  * Contrast with [[StreamDedup.nearDupCandidates]]: that is the
  * low-latency in-stream suppressor (band state in the state store,
  * candidates only); this is the corpus-building admit pipeline (exact
  * Jaccard verify on both the index screen and the in-batch pass, and
  * a durable, restart-proof memory).
  *
  * Scale shape per batch: screening is the one-sided banded join of
  * `dedupAgainstIndex` (batch band rows meet stored band rows keyed on
  * (band, value) with the band directories partition-pruned); in-batch
  * dedup is bounded by batch size, not corpus size; index growth is an
  * append of band/shingle files, never a rewrite.
  */
object IngestDedup {

  /** Admit one batch: screen against the index, self-dedup within the
    * batch (keep the lower id of each verified near-dup pair), append
    * survivors to `outPath` and to the index. Returns the number of
    * admitted rows. All hash parameters come from the index meta.
    */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String,
      threshold: Double): Long = graft.core.CacheBin.withScope {
    val spark = batch.sparkSession
    val (n, h, bands, seed) = TextDedup.readIndexMeta(spark, indexPath)
    val vsIndex = TextDedup.dedupAgainstIndex(
      spark, indexPath, batch, idCol, textCol, threshold)
    val dupIds = TextDedup.minhashNearDupPairs(
      vsIndex, idCol, textCol, threshold, n, h, bands, seed)
      .select(col("id2").as(idCol)).distinct()
    val admitted = vsIndex.join(dupIds, Seq(idCol), "left_anti")
      .persist()
    try {
      val nAdmitted = admitted.count()
      if (nAdmitted > 0) {
        admitted.write.mode("append").parquet(outPath)
        TextDedup.appendToDedupIndex(spark, indexPath, admitted, idCol, textCol)
      }
      nAdmitted
    } finally admitted.unpersist()
  }

  /** Attach the admit loop to a streaming frame of documents. The
    * index at `indexPath` must already exist (seed it with
    * [[TextDedup.writeDedupIndex]], possibly on an empty corpus);
    * `checkpoint` gives exactly-once batch replay on restart, and the
    * index makes the dedup memory itself restart-proof.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          admitBatch(batch.toDF(), idCol, textCol, indexPath, outPath, threshold)
        ()
      }
      .start()
}
