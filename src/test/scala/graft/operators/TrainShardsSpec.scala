package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** The training-shard writer: bins never straddle shards, the written
  * layout is partition-pruned and in reading order, and the manifest
  * agrees with the data without opening it.
  */
class TrainShardsSpec extends SparkSpec {

  private lazy val packed = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
    SeqPack.packByBudget(docs, "doc_id", "n_tokens", budget = 512L)
  }

  test("a bin's documents all land in one shard; assignment is deterministic") {
    val sharded = TrainShards.withShard(packed, nShards = 8)
    val straddlers = sharded.groupBy(col("bin_id"))
      .agg(countDistinct(col("shard")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddlers === 0L, "a bin straddles shards")
    // pure arithmetic: same input, same shards, any evaluation
    val again = TrainShards.withShard(packed.repartition(7), nShards = 8)
    assert(sharded.select("doc_id", "shard").except(
      again.select("doc_id", "shard")).count() === 0L)
  }

  test("writeShards: partition layout, in-order shards, manifest agrees with data") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    TrainShards.writeShards(packed, dir, nShards = 4)
    // partition-pruned read of one shard: the shard predicate must be a
    // non-empty PartitionFilter ("PartitionFilters: [" alone matches
    // every scan, including an unpruned "[]")
    val s0 = TrainShards.readShard(spark, dir, 0)
    val scanLine = s0.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[.*shard.*"),
      s"shard read not partition-pruned: ${scanLine.take(200)}")
    // ON-DISK reading order (readShard's own orderBy would mask an
    // unsorted write): scan the shard directory raw, no sort — a
    // single-file partition scan preserves file order
    val rawRows = spark.read.parquet(s"$dir/shards/shard=0")
      .select("bin_id", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rawRows.nonEmpty)
    assert(rawRows.sameElements(rawRows.sortBy(identity)),
      "shard file not written in (bin, offset) reading order")
    // manifest totals equal the data's
    val m = spark.read.parquet(s"$dir/manifest")
    assert(m.agg(sum("n_docs")).head().getLong(0) === packed.count())
    assert(m.agg(sum("n_tokens")).head().getLong(0) ===
      packed.agg(sum("n_tokens")).head().getLong(0))
    val perShard = spark.read.parquet(s"$dir/shards")
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val manifestShard = m.select("shard", "n_docs")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perShard === manifestShard)
  }
}
