package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity partitioning (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * within each language, rank documents by their language-model score
  * and split the corpus into head / middle / tail buckets holding
  * fixed FRACTIONS OF THE TOKEN MASS (not of the document count) —
  * the head third is the cleanest text by volume, the tail third is
  * what a curation pipeline drops or down-samples.
  *
  * The LM is the engine's deterministic corpus bigram model
  * ([[TextScore.bigramLogProb]] — exact integer micro-log-prob sums,
  * one final double average), so the ranking, the cut points, and
  * therefore the bucket labels are bit-reproducible and fully
  * mirrorable in the DuckDB oracle.
  *
  * Scale shape: the per-language cumulative token total is
  * [[SeqPack.withRunningTotalBy]]'s two-pass range-partitioned prefix
  * sum — no per-language single-partition window, so a 100 TB English
  * shard never funnels through one task. Per-language token totals
  * are a broadcast-joined #languages-row aggregate. Documents with no
  * bigram evidence (too short to score) go straight to the tail: a
  * zero-evidence doc must not outrank scored text just because its
  * average defaults to 0.
  */
object PerplexityBuckets {

  /** One row per document: `(idCol, langCol, n_bigrams, avg_logprob,
    * bucket)` with bucket in {'head','middle','tail'}. A document is
    * in the head while the cumulative token mass UP TO AND INCLUDING
    * it stays within `headFrac` of its language's total (then middle
    * up to `headFrac + midFrac`, else tail) — the doc straddling a
    * cut point falls into the later bucket.
    */
  def bucketize(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, headFrac: Double = 1.0 / 3,
      midFrac: Double = 1.0 / 3): DataFrame = {
    require(headFrac > 0 && midFrac > 0 && headFrac + midFrac < 1.0,
      s"fractions must be positive with head+mid < 1: $headFrac, $midFrac")
    // persisted: both branches below (ranked and zero-evidence) and the
    // language-totals aggregate consume `scored` — unpersisted, the
    // whole bigram LM (hot/cold score join + per-doc aggregation)
    // re-executes once per consumer
    val scored = graft.core.CacheBin.track(
      TextScore.bigramLogProb(docs, idCol, textCol)
        .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ranked = scored.filter(col("n_bigrams") > 0)
    val withCum = SeqPack.withRunningTotalBy(
      ranked, langCol,
      Seq(col("avg_logprob").desc, col(idCol)),
      "n_bigrams", out = "__before")
      .withColumn("__cum", col("__before") + col("n_bigrams"))
    // the totals join keys on the same null-safe sentinel as the
    // running total: a null language is its own group, and a plain
    // equi-join on langCol would silently drop its documents
    val langKey = coalesce(col(langCol).cast("string"),
      lit(SeqPack.NullGroupKey))
    val langTotals = ranked.groupBy(langKey.as("__lk"))
      .agg(sum(col("n_bigrams")).as("__total"))
    val labeled = withCum
      .withColumn("__lk", langKey)
      .join(broadcast(langTotals), Seq("__lk"))
      .withColumn("bucket",
        when(col("__cum").cast("double") <=
            col("__total").cast("double") * lit(headFrac), lit("head"))
          .when(col("__cum").cast("double") <=
            col("__total").cast("double") * lit(headFrac + midFrac),
            lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol), col("n_bigrams"),
        col("avg_logprob"), col("bucket"))
    val unscored = scored.filter(col("n_bigrams") === 0)
      .select(col(idCol), col(langCol), col("n_bigrams"),
        col("avg_logprob"), lit("tail").as("bucket"))
    labeled.unionByName(unscored)
  }

  /** The curation filter built on the partition: keep only documents
    * whose bucket is in `keep` (CCNet keeps head+middle for training).
    * Returns the original document rows.
    */
  def filterByBucket(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, keep: Seq[String],
      headFrac: Double = 1.0 / 3, midFrac: Double = 1.0 / 3): DataFrame = {
    require(keep.nonEmpty && keep.forall(Set("head", "middle", "tail")),
      s"keep must name buckets: $keep")
    val ids = bucketize(docs, idCol, textCol, langCol, headFrac, midFrac)
      .filter(col("bucket").isin(keep: _*))
      .select(col(idCol))
    docs.join(ids, Seq(idCol), "left_semi")
  }
}
