package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file hygiene for curated outputs: a 100 TB pipeline that
  * writes per-task files at high parallelism produces millions of tiny
  * parquet files; later scans then pay a footer read per file.
  * Compaction rewrites a directory into size-targeted files.
  *
  * File count = ceil(input bytes / target), derived from the actual
  * scan statistics (not row counts — row width varies wildly across
  * text/media tables). `repartition` (round-robin) balances bytes
  * evenly; use `repartitionByRange(keys)` instead when downstream
  * queries filter on those keys (range-clustered files give min/max
  * footer pruning).
  */
object Compaction {

  /** Bytes the current plan would scan (pre-execution estimate off the
    * file index — exact for parquet directories).
    */
  def scanBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong

  def targetFileCount(df: DataFrame, targetBytesPerFile: Long): Int =
    // BigInt: unknown stats surface as Long.MaxValue bytes, and the
    // ceil addition would wrap negative and answer "1 file"
    ((BigInt(scanBytes(df)) + targetBytesPerFile - 1) / targetBytesPerFile)
      .max(1).min(Int.MaxValue).toInt

  /** Rewrite `inPath` into ~targetBytesPerFile files at `outPath`;
    * returns the file count written. Content is unchanged (asserted by
    * CompactionSpec's fingerprint compare).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytesPerFile: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Int = {
    val df = spark.read.parquet(inPath)
    compactFrame(df, targetFileCount(df, targetBytesPerFile), outPath, clusterBy)
  }

  /** The write half of [[compact]], for callers that fold or filter the
    * frame first (e.g. dedup-index maintenance dropping replay
    * duplicates): shape into `n` files and overwrite `outPath`. The
    * file-count target should come from the RAW scan (an upper bound —
    * folding only shrinks bytes).
    */
  def compactFrame(df: DataFrame, n: Int, outPath: String,
      clusterBy: Seq[String] = Nil): Int = {
    // clusterBy also sorts WITHIN partitions: range partitioning alone
    // leaves rows task-unordered, so every row group's min/max spans
    // the task's whole range and stat-based pushdown pruning
    // (dedupAgainstIndex's candidate-bounded reads) loses its teeth
    // right after the compaction that was supposed to help the scan
    val shaped =
      if (clusterBy.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    shaped.write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
