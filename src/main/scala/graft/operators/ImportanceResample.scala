package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextHashExpr
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** DSIR-style data selection (Data Selection via Importance Resampling,
  * Xie et al. 2023): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus. The published recipe, made
  * deterministic end to end:
  *
  *  1. featurize: word unigrams + bigrams, polyhashed into `buckets`
  *     (the same rolling hash `TextAnalysis.fingerprint` the dedup
  *     family mirrors in DuckDB);
  *  2. fit: per-bucket add-one-smoothed log-likelihood ratio of target
  *     vs raw bucket frequencies, floored to integer MICRO-LLR units so
  *     downstream sums are exact integer arithmetic;
  *  3. score: per-document sum of its n-grams' bucket weights;
  *  4. resample: Gumbel-top-k — the Gumbel noise comes from the
  *     document id through the corpus-standard multiplicative hash, so
  *     "sampling" is reproducible on any engine or partitioning.
  *
  * Scale shape: the weight table is `buckets` rows BY CONSTRUCTION
  * (DSIR's point — a fixed-size sketch of both distributions), so the
  * scoring join broadcasts regardless of corpus size; featurize/score
  * is scan + explode + map-side join + one groupBy(doc); fit is two
  * B-bounded aggregations. Selection is a top-k
  * (TakeOrderedAndProject), never a full sort.
  */
object ImportanceResample {

  private val P = 1000000007L

  /** One row per n-gram OCCURRENCE: `(idCol, bucket)` — multiplicity
    * counts, as in the paper's bag-of-hashed-n-grams features. The
    * hash IS the dedup family's rolling shingle hash (`ShingleHashes`
    * at n=1 and n=2 equals `fingerprint` of the space-joined n-gram —
    * the identity the q_repetition oracle pins), evaluated by the
    * codegen'd expression so no n-gram string is ever materialized.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs.select(col(idCol), explode(concat(
        TextHashExpr.shingleHashes(toks, 1),
        TextHashExpr.shingleHashes(toks, 2))).as("__h"))
      .select(col(idCol), pmod(col("__h"), lit(buckets.toLong)).as("bucket"))
  }

  /** Importance-weight table: `(bucket, w_micro)` where
    * `w_micro = floor(1e6 · ln( ((t_b+1)·(R+B)) / ((r_b+1)·(T+B)) ))`
    * — add-one-smoothed LLR of target vs raw, in integer micro-LLR
    * units (floor on both engines; sums over integers stay exact).
    * At most `buckets` rows, whatever the corpus size.
    */
  def fitWeights(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    weightTable(
      bucketCounts(features(target, idCol, textCol, buckets), "__tn"),
      bucketCounts(features(raw, idCol, textCol, buckets), "__rn"),
      buckets)

  private def bucketCounts(feats: DataFrame, as: String): DataFrame =
    feats.groupBy(col("bucket")).agg(count(lit(1)).as(as))

  private def weightTable(tc: DataFrame, rc: DataFrame,
      buckets: Int, joinType: String = "full_outer"): DataFrame = {
    val tTot = tc.agg(coalesce(sum(col("__tn")), lit(0L))).head().getLong(0)
    val rTot = rc.agg(coalesce(sum(col("__rn")), lit(0L))).head().getLong(0)
    val b = buckets.toLong
    rc.join(tc, Seq("bucket"), joinType)
      .select(col("bucket"),
        floor(lit(1e6) * log(
          ((coalesce(col("__tn"), lit(0L)) + 1).cast("double") *
            lit((rTot + b).toDouble)) /
            ((coalesce(col("__rn"), lit(0L)) + 1).cast("double") *
              lit((tTot + b).toDouble))))
          .as("w_micro"))
  }

  /** Per-document importance score in micro-LLR units: `(idCol,
    * dsir_score_micro)`; documents with no n-grams score 0. The weight
    * join is a broadcast (B-bounded build side).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame = {
    val scored = features(docs, idCol, textCol, buckets)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("w_micro")).as("__s"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__s"), lit(0L)).as("dsir_score_micro"))
  }

  /** Gumbel-top-k resampling: fit on (target, raw), score raw, add
    * deterministic Gumbel noise `-ln(-ln(u))` with
    * `u = (hash(id)+1)/(P+1)` (the corpus-standard multiplicative
    * hash), take the k largest keys. Output `(idCol,
    * dsir_score_micro)` for the selected documents.
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, k: Int): DataFrame = {
    // the raw feature stream feeds BOTH the raw bucket counts and the
    // scoring join: persisted so the corpus is tokenized+hashed once
    // (CacheBin contract — runner drains after materializing)
    val rawFeats = graft.core.CacheBin.track(
      features(raw, idCol, textCol, buckets)
        .persist(StorageLevel.MEMORY_AND_DISK))
    // left join from the raw counts: every bucket the scoring join can
    // ever see appears in rawFeats by construction, so target-only
    // buckets are dead weight — identical output, cheaper plan (and
    // the DuckDB oracle mirrors the same LEFT JOIN)
    val weights = weightTable(
      bucketCounts(features(target, idCol, textCol, buckets), "__tn"),
      bucketCounts(rawFeats, "__rn"), buckets, joinType = "left_outer")
    val scored = rawFeats
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("w_micro")).as("__s"))
    val u = (pmod(pmod(col(idCol).cast("long"), lit(P)) * lit(2654435761L),
      lit(P)) + 1).cast("double") / lit((P + 1).toDouble)
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("__s"), lit(0L)).as("dsir_score_micro"))
      .withColumn("__key",
        col("dsir_score_micro").cast("double") / lit(1e6) - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dsir_score_micro"))
  }
}
