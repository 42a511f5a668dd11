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

  /** Admit one batch: screen against the index (ignoring a doc's OWN
    * prior index rows — the replay guard), self-dedup within the batch
    * (keep the lower id of each verified near-dup pair), then commit:
    *
    *  1. output FIRST, to a per-batch `ingest_batch=<id>` directory in
    *     overwrite mode — an idempotent write, so a replayed batch
    *     rewrites its own partition instead of appending duplicates;
    *  2. index append SECOND, re-derived from the files just written —
    *     re-appending the same rows after a crash only duplicates
    *     band/shingle rows, which screening tolerates (candidates and
    *     drops are distinct()-ed) and compaction folds away.
    *
    * Both steps are idempotent under replay (the screen self-excludes
    * a doc's own index rows and the survivor set is deterministic), so
    * the order is NOT a correctness choice — it is an execution-safety
    * one: every cached plan that READS the index must be dropped
    * before anything WRITES the index. An append into the band table
    * triggers Spark's recache-by-path on cached plans scanning it, and
    * a plan captured when the table was empty re-executes against the
    * appended layout with a stale (empty) partition schema — the
    * reader then fails its partition-values assertion. Hence the inner
    * cache scope ends before step 2, and step 2 reads the committed
    * output files instead of the screening plan.
    *
    * Net semantics: exactly-once OUTPUT, at-least-once (duplicate-row
    * tolerant) index. Returns the number of admitted rows. All hash
    * parameters come from the index meta.
    */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, threshold: Double,
      batchId: Long = 0L): Long = {
    val spark = batch.sparkSession
    val batchDir = s"$outPath/ingest_batch=$batchId"
    val nAdmitted = graft.core.CacheBin.withScope {
      val (n, h, bands, seed) = TextDedup.readIndexMeta(spark, indexPath)
      val vsIndex = TextDedup.dedupAgainstIndex(
        spark, indexPath, batch, idCol, textCol, threshold, excludeSelf = true)
      val dupIds = TextDedup.minhashNearDupPairs(
        vsIndex, idCol, textCol, threshold, n, h, bands, seed)
        .select(col("id2").as(idCol)).distinct()
      val admitted = vsIndex.join(dupIds, Seq(idCol), "left_anti")
        .persist()
      try {
        val n0 = admitted.count()
        if (n0 > 0) admitted.write.mode("overwrite").parquet(batchDir)
        n0
      } finally admitted.unpersist()
    }
    if (nAdmitted > 0)
      TextDedup.appendToDedupIndex(spark, indexPath,
        spark.read.parquet(batchDir), idCol, textCol)
    nAdmitted
  }

  /** Attach the admit loop to a streaming frame of documents. The
    * index at `indexPath` must already exist (seed it with
    * [[TextDedup.writeDedupIndex]], possibly on an empty corpus).
    * `checkpoint` replays an uncommitted batch on restart; combined
    * with [[admitBatch]]'s idempotent commits (self-excluding screen,
    * per-batch overwrite output, duplicate-tolerant index append) a
    * crash anywhere in the batch cannot duplicate or lose output rows.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          admitBatch(batch.toDF(), idCol, textCol, indexPath, outPath,
            threshold, batchId)
        ()
      }
      .start()
}
