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
  /** Bigram language-model score (the CCNet perplexity filter analog,
    * deterministic): per document, the add-one-smoothed conditional
    * log-probability of its bigrams under the CORPUS bigram model,
    *
    *   score = Σ ln( (C(w1 w2)+1) / (C(w1·)+V) )
    *
    * with C(w1·) the context count and V the context vocabulary size.
    * Fluent in-distribution text scores high (close to 0); gibberish
    * and shuffled text score low. Weights are floored to integer
    * micro-log-prob units, so per-doc sums are exact integer
    * arithmetic; the one final double division yields the per-bigram
    * average.
    *
    * Scale shape mirrors `wordFreqScore`: the bigram weight table is
    * vocabulary-sized (too big to broadcast in full at corpus scale),
    * and bigram OCCURRENCES are zipf distributed — the top
    * `hotBigrams` weights broadcast and join map-side, only the
    * de-skewed cold tail shuffle-joins. Hashing is the codegen'd
    * rolling shingle hash at n=1/2 (no bigram strings materialized).
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      hotBigrams: Int = 2048): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.graftvec.TextHashExpr
    val toks = TextAnalysis.tokens(col(textCol))
    // one row per bigram occurrence: (id, bigram hash, context hash)
    val rows = graft.core.CacheBin.track(
      docs.select(col(idCol),
        TextHashExpr.shingleHashes(toks, 2).as("__bg"),
        TextHashExpr.shingleHashes(toks, 1).as("__ug"))
        .select(col(idCol), explode(arrays_zip(
          col("__bg"),
          slice(col("__ug"), lit(1), size(col("__bg"))).as("__cx"))).as("__z"))
        .select(col(idCol), col("__z.__bg").as("__b"), col("__z.__cx").as("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // bigram hash determines its context, so (b, c) grouping is the
    // distinct-bigram table with the context carried
    val cb = rows.groupBy(col("__b"), col("__c")).agg(count(lit(1)).as("__cb"))
    // lazily persisted: the weights pin below computes cu once (and
    // caches it); the vocabulary count then reads it warm instead of
    // re-running the context groupBy over the occurrence table
    val cu = graft.core.CacheBin.track(
      rows.groupBy(col("__c").as("__c2")).agg(count(lit(1)).as("__cu"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val weights = graft.core.CacheBin.trackEager(
      cb.join(cu, col("__c") === col("__c2"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val v = cu.count() // context-vocabulary size (distinct contexts)
    val w = weights.select(col("__b"), col("__cb"),
      floor(lit(1e6) * log((col("__cb") + 1).cast("double") /
        (col("__cu") + lit(v)).cast("double"))).as("__wm"))
    val hot = broadcast(
      w.orderBy(col("__cb").desc, col("__b")).limit(hotBigrams)
        .select(col("__b"), col("__wm").as("__wm_hot")))
    val tagged = rows.join(hot, Seq("__b"), "left_outer")
    val contrib = tagged.filter(col("__wm_hot").isNotNull)
      .select(col(idCol), col("__wm_hot").as("__wm"))
      .unionByName(
        tagged.filter(col("__wm_hot").isNull)
          .select(col(idCol), col("__b"))
          .join(w.select(col("__b"), col("__wm")), "__b")
          .select(col(idCol), col("__wm")))
    val scored = contrib.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__wm")).as("__s"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("__s"), lit(0L)).as("logprob_micro"),
        coalesce(col("__s").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e6)), lit(0.0))
          .as("avg_logprob"))
  }

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
