package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-statistics quality scoring (the CCNet-family signal): a
  * document built from words the corpus itself uses often reads as
  * in-distribution; gibberish, boilerplate and OCR noise score low.
  *
  * `wordFreqScore` = sum over the doc's tokens of that token's CORPUS
  * count, normalized by (doc tokens × corpus tokens). All-integer
  * until one final double division, so scores are bit-identical on any
  * engine and partitioning — no log-of-double drift.
  *
  * Scale shape: the frequency table is DATA-DERIVED (groupBy over the
  * exploded corpus — at 100 TB it is far too large to broadcast), so
  * scoring is a shuffle join on the token, then a per-doc
  * re-aggregation. Shuffles: explode feeds one groupBy(token) + one
  * join(token) + one groupBy(doc) — all full-width on high-cardinality
  * keys; AQE handles hot stopword tokens (or pre-salt with
  * `Salting.saltedSum` if a single token dominates a corpus shard).
  */
object TextScore {

  /** One row per document: `(idCol, n_tokens, freq_score)` where
    * freq_score = Σ corpus_count(token) / (n_tokens × corpus_total).
    * Empty documents keep score 0.
    */
  def wordFreqScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("__w"))
    val freq = words.groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
    val scored = words
      .join(freq, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wc")).as("__sum_wc"))
    val total = freq.agg(sum(col("__wc"))).head().getLong(0)
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(
          col("__sum_wc").cast("double") /
            (col("n_tokens").cast("double") * lit(total.toDouble)),
          lit(0.0)).as("freq_score"))
  }
}
