package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextHashExpr
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** Cross-document repeated-substring removal — the boilerplate scrub
  * of the exact-substring-dedup family (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"), at token-window
  * granularity: a window of `windowTokens` consecutive tokens that
  * appears in at least `minDocFreq` DISTINCT documents (headers,
  * footers, license blurbs, navigation chrome) is boilerplate; every
  * occurrence is stripped from every document.
  *
  * Scale shape: windows are the codegen'd rolling shingle hashes the
  * dedup family already uses (one scan, no UDF); the document-frequency
  * aggregation is a map-side-combinable groupBy on the window hash; the
  * flag join is a hash equi-join on the same key; coverage positions
  * re-aggregate per document (bounded by document length). No pairwise
  * comparison anywhere — cost is O(total tokens), independent of how
  * often the boilerplate repeats.
  */
object Boilerplate {

  /** One row per input document: `(idCol, n_tokens, n_removed,
    * clean_text)` — `clean_text` is the token stream with every
    * boilerplate-covered position dropped, space-joined.
    */
  def strip(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 5, minDocFreq: Int = 3): DataFrame = {
    val L = windowTokens
    // tokenized + window-hashed once; consumed by the window rows and
    // the final reconstruction (CacheBin contract — runner drains)
    val base = graft.core.CacheBin.trackEager(
      docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
        .withColumn("__sh", TextHashExpr.shingleHashes(col("__tk"), L))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val wins = base.select(col(idCol),
      posexplode(col("__sh")).as(Seq("__pos", "__h")))
    val flagged = wins.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__h"))
    val covered = wins.join(flagged, "__h")
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(L - 1))).as("__p"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__p")).as("__cov"))
    base.join(covered, Seq(idCol), "left_outer")
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ", filter(col("__tk"),
          (t, i) => !coalesce(array_contains(col("__cov"), i), lit(false))))
          .as("clean_text"))
  }

  /** Positions-per-document bound used to linearize (doc, pos) into one
    * orderable long: supports documents up to ~1M tokens. (At 2^20 a
    * doc_id up to 2^43 still fits the encoded key in a long.)
    */
  val OrdBase: Long = 1L << 20

  /** Keep-first exact-span dedup — the other half of Lee et al. 2022:
    * where [[strip]] removes EVERY occurrence of high-doc-freq
    * boilerplate, this keeps the globally FIRST occurrence (minimal
    * `(doc, pos)` in corpus order) of each token window seen at least
    * `minCount` times — including repeats inside a single document —
    * and strips all later occurrences. A position covered by both a
    * kept-first window and some later duplicate window is stripped
    * (coverage is a union over stripped windows).
    *
    * Same O(total tokens) shape as [[strip]]: the only additions are a
    * `min(ord)` alongside the count in the same map-side-combinable
    * aggregation, and an `ord <> keep_ord` predicate on the flag join.
    * Output contract matches [[strip]]: `(idCol, n_tokens, n_removed,
    * clean_text)`.
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 5, minCount: Int = 2): DataFrame = {
    val L = windowTokens
    val base = graft.core.CacheBin.trackEager(
      docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
        .withColumn("__sh", TextHashExpr.shingleHashes(col("__tk"), L))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val wins = base.select(col(idCol),
      posexplode(col("__sh")).as(Seq("__pos", "__h")))
      // the linearized key is only injective while pos < OrdBase: a
      // longer document would silently collide into its neighbor's key
      // space and corrupt keep-first decisions — fail loudly instead
      .withColumn("__ord",
        when(col("__pos") >= OrdBase, raise_error(concat(
          lit(s"dedupSpans: document exceeds $OrdBase tokens (id="),
          col(idCol).cast("string"), lit(")"))))
          .otherwise(col(idCol) * OrdBase + col("__pos")))
    val firsts = wins.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"), min(col("__ord")).as("__keep"))
      .filter(col("__cnt") >= minCount)
      .select(col("__h"), col("__keep"))
    val covered = wins.join(firsts, "__h")
      .filter(col("__ord") =!= col("__keep"))
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(L - 1))).as("__p"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__p")).as("__cov"))
    base.join(covered, Seq(idCol), "left_outer")
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ", filter(col("__tk"),
          (t, i) => !coalesce(array_contains(col("__cov"), i), lit(false))))
          .as("clean_text"))
  }
}
