package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftvec.TextHashExpr

import graft.functions.{CmsSketch, TextAnalysis}

/** Bloom-filter decontamination: the shuffle-free form of
  * [[Decontaminate]]. The eval suite's n-gram hashes are folded into a
  * fixed-size bit array on the driver (m bits — 8 KB at the default —
  * REGARDLESS of corpus size); the training corpus is then filtered by
  * a pure scan-time predicate that tests each document's shingles
  * against the broadcast bits inside whole-stage codegen. Zero
  * shuffles, zero joins on the 100 TB side — the classic reason every
  * production decontamination/URL-blocklist pass is a Bloom filter.
  *
  * The trade is a deterministic false-positive rate: a training doc
  * whose shingle's k probe positions happen to all be set is dropped
  * even if the n-gram never occurred in the eval set (fp/probe ≈
  * (1-e^(-kn/m))^k; size m ≈ 1.44·k·n for your target). "Deterministic"
  * is load-bearing: probe positions come from the engine-portable
  * polynomial shingle hash double-hashed with exact long arithmetic,
  * so Spark and the DuckDB oracle drop the IDENTICAL doc set,
  * false positives included.
  */
object BloomDecontaminate {

  /** Probe position i of shingle hash `h` — THE portable double hash,
    * shared with [[CmsSketch.position]] so the Spark expression and
    * every oracle mirror have one definition to stay in sync with.
    */
  def position(h: Column, i: Int, mBits: Int): Column =
    CmsSketch.position(h, lit(i.toLong), mBits)

  /** Driver-built bit words (m/64 longs) holding every probe position
    * of the eval corpus's distinct word n-gram hashes. Driver traffic
    * is bounded by m distinct positions, not by eval size.
    */
  def buildFilter(eval: DataFrame, textCol: String, n: Int,
      mBits: Int, kHashes: Int): Array[Long] = {
    val hs = TextDedup.withShingleHashes(
        eval.select(lit(0L).as("__id"), col(textCol)), "__id", textCol, n)
      .select(explode(col("__shh")).as("__h"))
    buildFilterFromHashes(hs, mBits, kHashes)
  }

  /** [[buildFilter]] over an arbitrary one-Long-column hash frame —
    * the generic membership-set compiler (domain blocklists, id sets):
    * any key family that can hash to a Long becomes a broadcast
    * bitset probed by a stateless scan predicate.
    */
  def buildFilterFromHashes(hashes: DataFrame, mBits: Int,
      kHashes: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    val h = col(hashes.columns.head)
    val positions = hashes.select(
        (0 until kHashes).map(i => position(h, i, mBits)): _*)
      .flatMap(r => (0 until kHashes).map(r.getLong))(
        org.apache.spark.sql.Encoders.scalaLong)
      .distinct().collect()
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words((p / 64).toInt) |= 1L << (p % 64).toInt)
    words
  }

  /** True when every probe position of `h` is set in the literal
    * `words` — a per-row scalar the scan evaluates in codegen.
    */
  def mightContain(words: Array[Long], h: Column, mBits: Int,
      kHashes: Int): Column = {
    val wordsLit = typedlit(words.toSeq)
    (0 until kHashes).map { i =>
      val pos = position(h, i, mBits)
      val word = element_at(wordsLit, (pos / 64).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Training docs minus those sharing (to Bloom precision) any word
    * n-gram with the eval corpus. Plan shape: eval → tiny driver
    * bitset; train → scan + codegen'd predicate. No shuffle anywhere.
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      mBits: Int = 1 << 16, kHashes: Int = 3): DataFrame = {
    val words = buildFilter(eval, textCol, n, mBits, kHashes)
    val contaminated = exists(
      array_distinct(TextHashExpr.shingleHashes(
        TextAnalysis.tokens(col(textCol)), n)),
      h => mightContain(words, h, mBits, kHashes))
    train.filter(!coalesce(contaminated, lit(false)))
  }
}
