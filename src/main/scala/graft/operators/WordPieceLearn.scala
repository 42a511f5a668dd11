package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.TextAnalysis

/** Distributed WordPiece tokenizer training (Schuster & Nakajima 2012;
  * the BERT-family tokenizer) — the third production family next to
  * [[BpeLearn]] (frequency-scored merges) and [[UnigramLearn]]
  * (likelihood segmentation); like both, it replaces the reference's
  * fixed external tokenizer (`core/utils/tools.py`) with one learned
  * from the corpus. WordPiece is BPE's merge machinery with
  * a LIKELIHOOD objective: each round merges the adjacent pair
  * maximizing `count(l, r) / (count(l) · count(r))` — the pair whose
  * fusion most improves a unigram LM of the token stream — rather than
  * the raw pair count. Non-initial subwords carry the `##`
  * continuation prefix (the BERT convention): the alphabet
  * distinguishes word-initial from word-internal units, so merges can
  * specialize (e.g. initial "un" vs internal "##un").
  *
  * Re-expressed relationally exactly like BPE: ONE corpus scan builds
  * the compact word-frequency table; each round is an adjacent-pair
  * explode + groupBy (map-side combinable) JOINED with the round's
  * token counts (another map-side-combinable groupBy on the same
  * compact table), argmax via orderBy+limit(1) (TakeOrderedAndProject
  * — per-partition top-1, no global sort). The score is ONE double
  * division over doubles built from exact integers — both engines
  * compute `pc / (lc · rc)` with the same two IEEE ops, so the argmax
  * is engine-portable; ties break lexicographic (left, right).
  * Merge application stays the wrapped-token `replace()`:
  * `" l  ##r " -> " lr "` (the merged token drops the continuation
  * marker of its right half — `" l  r " -> " lr "` for an unmarked
  * right, which only occurs in degenerate single-letter alphabets).
  *
  * Caveat (documented, not escaped): a corpus word containing a
  * literal `##` could collide with the continuation convention; real
  * trainers escape the marker, this one inherits whatever the
  * whitespace tokenizer emits — on natural-language corpora the
  * marker never occurs word-internally.
  */
object WordPieceLearn {

  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pairCount: Long)

  final case class LearnResult(merges: Seq[Merge], wordFreq: DataFrame)

  /** WordPiece wrapped state: first char plain, the rest `##`-marked —
    * "abc" ⇒ " a  ##b  ##c " (code-point `(.)` like the BPE wrap).
    */
  private[graft] def wrapWp(word: Column): Column =
    concat(lit(" "), word.substr(lit(1), lit(1)), lit(" "),
      regexp_replace(word.substr(lit(2), length(word)), "(.)", " ##$1 "))

  /** Corpus → compact (toks, freq) word-frequency table in the
    * WordPiece alphabet — the only corpus-scale stage.
    */
  def wordFreqTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("freq"))
      .select(wrapWp(col("__w")).as("toks"), col("freq"))

  /** Per-token corpus counts of the current wrapped state. */
  def tokenCounts(wf: DataFrame): DataFrame =
    wf.select(explode(split(trim(col("toks")), "  ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("c"))

  /** The merged token: the right half sheds its continuation marker. */
  def mergedToken(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Apply one merge to the wrapped-token state column. */
  def applyMerge(toks: Column, m: Merge): Column =
    call_function("replace", toks,
      lit(s" ${m.left}  ${m.right} "), lit(s" ${m.merged} "))

  /** Learn `numMerges` merges by the WordPiece likelihood score
    * (stops early when no adjacent pair is left). Deterministic total
    * order: score desc — `pc / (lc · rc)` in IEEE doubles from exact
    * integer counts — then lexicographic (left, right).
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 16): LearnResult = {
    var wf = graft.core.CacheBin.trackCheckpoint(
      wordFreqTable(df, textCol).localCheckpoint(true))
    val merges = ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val tc = tokenCounts(wf)
      val top = BpeLearn.pairCounts(wf)
        .join(tc.select(col("token").as("left"), col("c").as("__lc")), "left")
        .join(tc.select(col("token").as("right"), col("c").as("__rc")), "right")
        .withColumn("__score",
          col("pair_count").cast("double") /
            (col("__lc").cast("double") * col("__rc").cast("double")))
        .orderBy(desc("__score"), asc("left"), asc("right"))
        .limit(1).select("left", "right", "pair_count").collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        val m = Merge(rank, l, r, mergedToken(l, r), top(0).getLong(2))
        merges += m
        wf = wf.select(applyMerge(col("toks"), m).as("toks"), col("freq"))
        rank += 1
        if (rank % checkpointEvery == 0)
          wf = graft.core.CacheBin.trackCheckpoint(wf.localCheckpoint(true))
      }
    }
    LearnResult(merges.toSeq, wf)
  }

  /** Merge table as a DataFrame (rank, left, right, merged, pair_count). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val rows = merges.map(m => Row(m.rank, m.left, m.right, m.merged, m.pairCount))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Encode by merge replay (the training-state semantics, like
    * [[BpeLearn.encodeExpr]]): per word, wrap in the WordPiece
    * alphabet, apply every merge in rank order, split back. Scan-time
    * expressions only — the merge table rides as literals.
    */
  def encodeExpr(text: Column, merges: Seq[Merge]): Column = {
    val sorted = merges.sortBy(_.rank)
    val perWord = transform(TextAnalysis.tokens(text), w => {
      val merged = sorted.foldLeft(wrapWp(w))((acc, m) => applyMerge(acc, m))
      split(trim(merged), "  ")
    })
    flatten(perWord)
  }

  /** Post-merge subword vocabulary with corpus frequencies. */
  def vocabulary(finalWordFreq: DataFrame): DataFrame =
    BpeLearn.vocabulary(finalWordFreq)

  /** BERT's INFERENCE tokenization — greedy longest-match against the
    * learned vocabulary (codegen'd
    * [[org.apache.spark.sql.graftvec.WordPieceMaxMatch]]; the
    * vocabulary is one reference object, so this is a scan expression:
    * no join, no shuffle, streaming-safe). A word with an unmatchable
    * cursor maps WHOLE to `unk` — including words whose single chars
    * were fully merged away during training, faithful BERT behavior.
    */
  def maxMatchExpr(text: Column, vocabTokens: Seq[String],
      unk: String = "[UNK]"): Column =
    org.apache.spark.sql.graftvec.WordPieceExpr
      .maxMatchCol(text, vocabTokens, unk)
}
