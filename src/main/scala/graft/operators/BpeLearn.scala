package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, IntegerType, StructField, StructType}

import graft.functions.TextAnalysis

/** Distributed BPE tokenizer training — the missing piece between corpus
  * curation and model training: learn the merge table from the corpus the
  * model will actually see (reference counts tokens with a fixed external
  * tokenizer, e.g. core/utils/tools.py's tiktoken call; here the engine
  * LEARNS the tokenizer from the data, the Sennrich et al. 2016 algorithm
  * re-expressed relationally).
  *
  * Scale design — the corpus never participates in the iteration:
  *  - Corpus-scale work is ONE scan + one map-side-combinable
  *    `groupBy(word).count()` producing the word-frequency table. Its row
  *    count is the DISTINCT-word vocabulary (zipf: millions of rows at
  *    100 TB — 5-6 orders below the corpus), and every merge round runs
  *    on that compact table, exactly how single-node BPE trainers use a
  *    word-count dict.
  *  - A merge round is: adjacent-pair explode (≤ word-length rows per
  *    word) → `groupBy(pair).sum(freq)` (partial aggregation) → argmax
  *    via orderBy+limit(1), which Spark plans as TakeOrderedAndProject —
  *    per-partition top-1, no global sort shuffle.
  *  - Driver-side inventory: one 3-field row per round (bounded by
  *    `numMerges`, the same class as IVF's nlist centroid collect).
  *  - Merge application is a narrow codegen'd `replace()`; lineage is cut
  *    every `checkpointEvery` rounds so plan depth stays bounded at any
  *    merge count.
  *
  * Token strings use the WRAPPED encoding `" t "` per token (tokens are
  * whitespace-split so never contain a space): a word's state is the
  * concatenation of its wrapped tokens, e.g. ["a","b"] ⇒ " a  b ". A
  * merge (x, y) → xy is then EXACTLY `replace(state, " x  y ", " xy ")`:
  * each occurrence carries its own delimiters (no boundary sharing
  * between consecutive occurrences), so plain left-to-right
  * non-overlapping string replacement — identical semantics in Spark and
  * DuckDB — IS greedy BPE pair merging, cascades included
  * (" a  a  a  a " → " aa  aa "). That makes the whole learner, encode
  * included, replayable bit-for-bit by a SQL oracle.
  *
  * `byteLevel = true` switches the alphabet to UTF-8 bytes with an
  * end-of-word convention (the GPT-2/tiktoken-class setup): tokens are
  * 2-hex-digit byte values plus a terminal "_" marker, the wrapped
  * encoding and merge machinery otherwise unchanged. On any non-ASCII
  * corpus this learns different merges than char mode (multi-byte
  * chars merge from their bytes; word-final units exist), and the
  * fertility report is directly comparable across modes.
  */
object BpeLearn {

  /** Ordered merge table: rank ascending = application order. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  final case class LearnResult(merges: Seq[Merge], wordFreq: DataFrame)

  /** Wrapped-token state of a single-char-split word: "ab" ⇒ " a  b ". */
  private def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** Byte-level wrapped state (GPT-2/tiktoken-class alphabet): the
    * word's UTF-8 bytes as 2-hex-digit tokens plus a terminal
    * end-of-word marker "_" — "ab" ⇒ " 61  62  _ ". Hex pairs keep
    * merged tokens unambiguous (byte boundaries every 2 chars, no
    * separator needed), and the marker lets merges learn word-final
    * units, which changes the learned table on ANY corpus — the
    * whole point of the convention. Both engines emit uppercase hex.
    */
  private def wrapBytes(word: Column): Column =
    concat(regexp_replace(hex(encode(word, "UTF-8")), "(..)", " $1 "),
      lit(" _ "))

  private def wrap(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) wrapBytes(word) else wrapChars(word)

  /** Corpus → compact (toks, freq) word-frequency table; `toks` is the
    * wrapped-token state string. The ONLY corpus-scale stage.
    */
  def wordFreqTable(df: DataFrame, textCol: String,
      byteLevel: Boolean = false): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("freq"))
      .select(wrap(col("__w"), byteLevel).as("toks"), col("freq"))

  /** Adjacent-pair counts over a word-frequency table, weighted by word
    * frequency (multiplicity counted: "aaa" contributes (a,a) twice).
    */
  def pairCounts(wf: DataFrame): DataFrame =
    wf.select(split(trim(col("toks")), "  ").as("__t"), col("freq"))
      .filter(size(col("__t")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("left"),
          element_at(col("__t"), i + 1).as("right")))).as("__p"))
      .groupBy(col("__p.left").as("left"), col("__p.right").as("right"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Apply one merge to the wrapped-token state column. */
  def applyMerge(toks: Column, left: String, right: String): Column =
    call_function("replace", toks, lit(s" $left  $right "), lit(s" $left$right "))

  /** Learn `numMerges` merges (stops early when no adjacent pair is left).
    * Tie-break is total and deterministic: highest pair_count, then
    * lexicographic (left, right) — invariant under partitioning.
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 16, byteLevel: Boolean = false): LearnResult = {
    // checkpoints route through CacheBin so their blocks are released
    // at the pipeline boundary, not held for the session's lifetime
    var wf = graft.core.CacheBin.trackCheckpoint(
      wordFreqTable(df, textCol, byteLevel).localCheckpoint(true))
    val merges = ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(wf)
        .orderBy(desc("pair_count"), asc("left"), asc("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        merges += Merge(rank, l, r, top(0).getLong(2))
        wf = wf.select(applyMerge(col("toks"), l, r).as("toks"), col("freq"))
        rank += 1
        // bound plan depth: the replace chain is narrow codegen, but an
        // unbounded nest would eventually blow past the codegen/analyzer
        // budget — cut lineage periodically, releasing nothing external
        if (rank % checkpointEvery == 0)
          wf = graft.core.CacheBin.trackCheckpoint(wf.localCheckpoint(true))
      }
    }
    LearnResult(merges.toSeq, wf)
  }

  /** Merge table as a DataFrame (rank, left, right, pair_count). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val rows = merges.map(m => Row(m.rank, m.left, m.right, m.pairCount))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Encode text with a learned merge table: per word, wrap chars, apply
    * every merge in rank order, split back to tokens; tokens concatenate
    * across words in document order. Pure scan-time expressions (the
    * merge table rides along as literals — the model is the expression),
    * so the encoder drops into any scan, stream, or filter with zero
    * joins and zero shuffles. Merge counts in the thousands belong in a
    * trie-walking custom Expression; the literal chain is the honest
    * form at oracle-checkable sizes.
    */
  def encodeExpr(text: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column = {
    val sorted = merges.sortBy(_.rank)
    val perWord = transform(TextAnalysis.tokens(text), w => {
      val merged = sorted.foldLeft(wrap(w, byteLevel)) { (acc, m) =>
        applyMerge(acc, m.left, m.right)
      }
      split(trim(merged), "  ")
    })
    flatten(perWord)
  }

  /** [[encodeExpr]] with the merge table as ONE reference object
    * (codegen'd [[org.apache.spark.sql.graftvec.BpeEncode]]): plan size
    * is independent of the merge count — the production path for real
    * vocabularies (tens of thousands of merges), where the literal
    * replace chain would blow the analyzer/codegen budget. Pinned
    * value-identical to [[encodeExpr]] by BpeEquivalenceSpec.
    */
  def encodeExprFast(text: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column =
    org.apache.spark.sql.graftvec.BpeEncodeExpr.encodeCol(
      text, merges.sortBy(_.rank).map(m => (m.left, m.right)), byteLevel)

  /** Post-merge subword vocabulary with corpus frequencies, from the
    * learner's final word-frequency state: explode tokens weighted by
    * word freq — corpus never rescanned.
    */
  def vocabulary(finalWordFreq: DataFrame): DataFrame =
    finalWordFreq
      .select(explode(split(trim(col("toks")), "  ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("token_count"))
}
