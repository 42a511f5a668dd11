package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Materialized line-hash index — corpus-level exact line dedup for
  * the STREAMING ingest path. [[LineCuration.stripDuplicateLines]]'s
  * document-frequency aggregation needs the whole reference corpus, so
  * it cannot run as a stateless in-stream gate; this mirrors the
  * materialized doc-index pattern ([[TextDedup.writeDedupIndex]])
  * instead:
  *
  *  1. a BATCH job builds the index from the reference corpus — the
  *     df >= minDocFreq unit hashes, a model-sized artifact (chrome
  *     lines are the df tail's head: boilerplate repeats, so the
  *     flagged set is tiny relative to the corpus);
  *  2. the STREAM compiles the artifact once at start into a broadcast
  *     Bloom bitset (sized from the hash count like the domain
  *     blocklist, ~10 bits/key) and strips flagged lines with a pure
  *     per-row scan expression — zero joins, zero streaming state;
  *  3. periodic BATCH re-index over the accumulated corpus refreshes
  *     the artifact; a running stream holds the filter it compiled at
  *     start, so a re-index takes effect on the next (re)start —
  *     exactly the doc-index's screen-vs-append freshness contract.
  *
  * Bloom false positives OVER-strip at the standard rate (a clean
  * line is dropped, never a duplicate kept) — acceptable for chrome
  * removal, and the batch pipeline's exact form remains the
  * ground-truth twin.
  */
object LineIndex {

  private val Family = "line-hash-index"

  final case class LineFilter(words: Array[Long], kHashes: Int, sep: String)

  /** Batch (re-)build: writes `path/meta` (family, sep, minDocFreq)
    * and `path/hashes` (hash, doc_freq). Returns the flagged count.
    */
  def writeLineIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, minDocFreq: Int = 2, sep: String = "\n"): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val flagged = LineCuration.duplicateUnitHashes(
      docs, idCol, textCol, minDocFreq, sep)
    flagged.coalesce(1).write.mode("overwrite").parquet(s"$path/hashes")
    Seq((Family, sep, minDocFreq)).toDF("family", "sep", "min_doc_freq")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    spark.read.parquet(s"$path/hashes").count()
  }

  /** Compile the artifact to a broadcast-ready Bloom bitset. */
  def loadFilter(spark: SparkSession, path: String,
      kHashes: Int = 3): LineFilter = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1 && meta(0).getString(0) == Family,
      s"not a $Family artifact at $path " +
        s"(found ${meta.headOption.map(_.getString(0))})")
    val sep = meta(0).getString(1)
    val hashes = spark.read.parquet(s"$path/hashes")
    val bits = UrlOps.domainFilterBits(hashes.count())
    val words = BloomDecontaminate.buildFilterFromHashes(
      hashes.select(col("hash").as("__h")), bits, kHashes)
    LineFilter(words, kHashes, sep)
  }

  /** Rebuild `text` without the indexed duplicate lines — the same
    * keep-set as the batch twin (blank lines are never counted and
    * never removed; lines join back with the index's separator), as a
    * stateless per-row expression.
    */
  def stripLinesExpr(text: Column, f: LineFilter): Column = {
    val kept = filter(split(text, f.sep), l =>
      (length(trim(l)) === 0) ||
        !BloomDecontaminate.mightContain(f.words,
          TextAnalysis.polyHash(trim(l)), f.words.length * 64, f.kHashes))
    concat_ws(f.sep, kept)
  }
}
