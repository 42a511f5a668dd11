package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextAnalysis

/** Distributed unigram-LM (SentencePiece-class) tokenizer training —
  * the second production tokenizer family next to [[BpeLearn]]'s BPE
  * (the reference counts tokens with a fixed external tokenizer,
  * `core/utils/tools.py`'s tiktoken call; this engine learns its
  * tokenizers from the corpus):
  * instead of greedy pair merges, learn a piece probability table and
  * segment by highest-likelihood Viterbi decomposition (Kudo 2018,
  * "Subword Regularization"). Hard-EM on integer counts keeps every
  * step deterministic and DuckDB-replayable:
  *
  *  1. SEED: every word substring up to `maxPieceLen` code points,
  *     occurrence-counted and weighted by word frequency; single
  *     characters are always in the vocabulary (coverage), multi-char
  *     candidates keep the top `seedMultiCap` by (count desc, piece)
  *     at or above `minCount`.
  *  2. E-STEP: Viterbi-segment every DISTINCT word under
  *     p(piece) = cnt/total (the codegen'd
  *     [[org.apache.spark.sql.graftvec.UnigramSegment]] kernel — ties
  *     break to the longest final piece); count segmented piece usage
  *     weighted by word frequency.
  *  3. M-STEP: usage counts become the new table; unused multi-char
  *     pieces drop out, single characters get add-one smoothing so
  *     coverage never degenerates.
  *  4. PRUNE (after `emIters` rounds): keep single chars + the top
  *     `keepMulti` multi-char pieces by (count desc, piece) — the
  *     count IS the EM likelihood's sufficient statistic, so this is
  *     the deterministic-integer form of likelihood-loss pruning.
  *
  * Scale shape — identical posture to BPE: the corpus is scanned ONCE
  * (word-frequency table, map-side combinable groupBy); every EM round
  * runs on that compact table (distinct-word rows, zipf: orders of
  * magnitude below the corpus) with the vocabulary as a broadcast-size
  * reference object inside one codegen'd expression; the only
  * driver-side data is the piece table itself (bounded by
  * `seedMultiCap` + alphabet — the same class as BPE's merge rows and
  * IVF's centroids). Encoding is a pure scan expression: zero joins,
  * zero shuffles, streaming-safe.
  */
object UnigramLearn {

  /** Corpus -> (word, freq) — the only corpus-scale stage. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Occurrence-weighted substring counts, k = 1..maxPieceLen code
    * points (a piece occurring twice in one word counts twice).
    */
  def substringCounts(wf: DataFrame, maxPieceLen: Int): DataFrame =
    wf.select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("freq"), col("st"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("st") + 1))).as("k"))
      .select(col("word").substr(col("st"), col("k")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** One code point (not one UTF-16 unit). */
  private def isSingleChar(piece: String): Boolean =
    piece.codePointCount(0, piece.length) == 1

  final case class LearnResult(vocab: Seq[(String, Long)], wordFreq: DataFrame)

  /** Learn the piece table. Returns the final vocabulary sorted by
    * piece, plus the word-frequency table for fertility-style reports.
    */
  def learn(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2L, seedMultiCap: Int = 60, emIters: Int = 2,
      keepMulti: Int = 24): LearnResult = {
    require(maxPieceLen >= 1 && emIters >= 0 && keepMulti >= 0)
    // lazily persisted: every consumer below is a sequential driver
    // action (the singles collect computes and caches every wf
    // partition; multis and the EM rounds read it warm) — the eager
    // pin was one extra wordFreq pass
    val wf = graft.core.CacheBin.track(
      wordFreq(df, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = substringCounts(wf, maxPieceLen)
    // vocab-sized collects (seedMultiCap + alphabet rows) — the same
    // driver-side class as BPE's per-round argmax row
    val singles = counts
      .filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = counts
      .filter(length(col("piece")) > 1 && col("cnt") >= minCount)
      .orderBy(desc("cnt"), asc("piece")).limit(seedMultiCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Seq[(String, Long)] = (singles ++ multis).toSeq.sortBy(_._1)

    var iter = 0
    while (iter < emIters) {
      val seg = org.apache.spark.sql.graftvec.UnigramExpr
        .segmentCol(col("word"), vocab)
      val segCounts = wf
        .select(explode(seg).as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step: multi pieces keep their usage (unused drop out);
      // single chars get add-one smoothing and never drop
      val nextSingles = vocab.filter(v => isSingleChar(v._1)).map {
        case (p, _) => p -> (segCounts.getOrElse(p, 0L) + 1L)
      }
      val nextMultis = segCounts.toSeq
        .filter { case (p, c) => !isSingleChar(p) && c > 0L }
      vocab = (nextSingles ++ nextMultis).sortBy(_._1)
      iter += 1
    }
    val (sv, mv) = vocab.partition(v => isSingleChar(v._1))
    val pruned = sv ++ mv.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
    LearnResult(pruned.sortBy(_._1), wf)
  }

  /** Piece table as a DataFrame (piece, cnt). */
  def vocabDf(spark: SparkSession, vocab: Seq[(String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vocab.map(v => Row(v._1, v._2)), 1),
      StructType(Seq(
        StructField("piece", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))

  /** Scan-time Viterbi encoder under a learned table (zero joins). */
  def encodeExpr(text: Column, vocab: Seq[(String, Long)]): Column =
    org.apache.spark.sql.graftvec.UnigramExpr.segmentCol(text, vocab)
}
