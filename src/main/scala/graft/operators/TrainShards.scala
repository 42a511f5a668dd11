package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer — the step after [[CorpusPipeline.prepare]]'s
  * sequence packing: distribute the packed bins over `nShards` shard
  * files a training job's data loader reads sequentially.
  *
  * Shard assignment is the engine's standard multiplicative-hash draw
  * on the BIN id, so:
  *  - every document of a bin lands in one shard (a bin is one
  *    training sequence — splitting it across shards would split a
  *    sequence mid-stream);
  *  - adjacent bins decorrelate across shards (the corpus-level
  *    shuffle training readers need, done once at write time at bin
  *    granularity — readers then stream their shard in order instead
  *    of random-seeking);
  *  - the assignment is pure arithmetic on the bin id: reproducible on
  *    any engine/partitioning/cluster, no RNG state to persist.
  *
  * Scale shape: assignment is a scan-time expression; the write is one
  * `repartition(shard)` shuffle with `sortWithinPartitions(bin,
  * offset)` so each shard directory holds its sequences in reading
  * order; the manifest is a `groupBy(shard)` aggregate (nShards rows)
  * written beside the data — the loader's planning table (tokens and
  * sequence counts per shard) without opening a single data file.
  */
object TrainShards {

  /** Deterministic shard column from the bin id:
    * [[RowOps.multiplicativeDraw]] (the one shared definition — no
    * constant drift between samplers, splitters, and this assigner)
    * reduced mod nShards.
    */
  def withShard(packed: DataFrame, nShards: Int,
      binCol: String = "bin_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    packed.withColumn("shard",
      pmod(RowOps.multiplicativeDraw(col(binCol)), lit(nShards.toLong)).cast("int"))
  }

  /** Per-shard manifest: sequence (bin) count, document count, token
    * total. nShards rows — the loader plans against this, not the data.
    */
  def manifest(sharded: DataFrame, tokenCol: String = "n_tokens",
      binCol: String = "bin_id"): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(countDistinct(col(binCol)).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"))

  /** Write `path/shards` partitioned by shard — each shard's rows
    * sorted by (bin, offset) so a reader streams sequences in order —
    * and `path/manifest` beside it. Overwrites.
    */
  def writeShards(packed: DataFrame, path: String, nShards: Int,
      binCol: String = "bin_id", offsetCol: String = "bin_offset",
      tokenCol: String = "n_tokens"): Unit = {
    val sharded = withShard(packed, nShards, binCol)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(binCol), col(offsetCol))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/shards")
    manifest(sharded, tokenCol, binCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Read one shard's rows in training order (partition-pruned scan of
    * the single `shard=` directory).
    */
  def readShard(spark: SparkSession, path: String, shard: Int,
      binCol: String = "bin_id", offsetCol: String = "bin_offset"): DataFrame =
    spark.read.parquet(s"$path/shards")
      .filter(col("shard") === shard)
      .orderBy(col(binCol), col(offsetCol))
}
