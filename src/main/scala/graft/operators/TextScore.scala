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
  * exploded corpus — at 100 TB it is far too large to broadcast *in
  * full*), so scoring is a join on the token. Token counts are zipf
  * distributed: the top few thousand tokens ("the", "of", …) carry
  * most of the ROW VOLUME while the tail carries the CARDINALITY. A
  * plain shuffle join on the token therefore funnels a huge fraction
  * of the corpus through a handful of reducers. Split instead: the
  * top-`hotTokens` counts broadcast and join map-side (no shuffle for
  * the bulk of the rows); only the de-skewed cold tail shuffle-joins.
  * The tokenized corpus and the frequency table are each computed ONCE
  * (persisted — registered with [[graft.core.CacheBin]]; the runner
  * drains after materializing).
  */
object TextScore {

  /** One row per document: `(idCol, n_tokens, freq_score)` where
    * freq_score = Σ corpus_count(token) / (n_tokens × corpus_total).
    * Empty documents keep score 0.
    *
    * `hotTokens`: how many of the most frequent tokens to broadcast
    * for the map-side join (a few thousand rows of (token, count) —
    * KBs on the wire, covers the zipf head at any corpus size).
    */
  def wordFreqScore(docs: DataFrame, idCol: String, textCol: String,
      hotTokens: Int = 1024): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val words = graft.core.CacheBin.track(
      docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val freq = graft.core.CacheBin.track(
      words.groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // one action: materializes freq (and words beneath it) and yields
    // the corpus total — no separate third pass over the corpus
    val total = freq.agg(sum(col("__wc"))).head().getLong(0)
    // deterministic head: count desc, token as tie-break
    val hot = broadcast(
      freq.orderBy(col("__wc").desc, col("__w")).limit(hotTokens)
        .withColumnRenamed("__wc", "__wc_hot"))
    val tagged = words.join(hot, Seq("__w"), "left_outer")
    val contrib = tagged.filter(col("__wc_hot").isNotNull)
      .select(col(idCol), col("__wc_hot").as("__wc"))
      .unionByName(
        tagged.filter(col("__wc_hot").isNull)
          .select(col(idCol), col("__w"))
          .join(freq, "__w")
          .select(col(idCol), col("__wc")))
    val scored = contrib
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wc")).as("__sum_wc"))
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
