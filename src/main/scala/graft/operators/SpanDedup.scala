package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextHashExpr
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** Exact-substring span dedup via suffix-window EXTENSION — the
  * strongest member of the Lee et al. 2022 family: where
  * [[WindowDedup]] drops whole documents and [[Boilerplate.dedupSpans]]
  * strips every duplicated window, this removes only MAXIMAL duplicated
  * spans at least `minSpanTokens` long. Duplicated windows (keep-first:
  * the globally earliest `(doc, pos)` occurrence survives) are merged
  * into islands of consecutive covered positions per document; an
  * island shorter than the floor is incidental repetition (a shared
  * idiom, a quoted phrase) and stays — the paper's "duplicated
  * substring of at least 50 tokens" notion, with the window length
  * decoupled from the substring floor.
  *
  * Scale shape: identical to [[Boilerplate.dedupSpans]] up to coverage
  * (codegen'd rolling window hashes, map-side-combinable
  * count+min(ord) per hash, one equi-join back), then island merging
  * is a per-document gaps-and-islands pass — `pos - row_number()` over
  * a window PARTITIONED BY the doc id (bounded groups, no skew
  * funnel), a doc-keyed aggregate per island, and one more doc-keyed
  * coverage aggregate. O(total tokens) end to end; no pairwise stage.
  */
object SpanDedup {

  /** One row per input document: `(idCol, n_tokens, n_removed,
    * n_spans, clean_text)` — `n_spans` counts the maximal duplicated
    * spans at or above the floor; only their positions are removed.
    */
  def removeLongDupSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 5, minCount: Int = 2,
      minSpanTokens: Int = 10): DataFrame = {
    val L = windowTokens
    val base = graft.core.CacheBin.trackEager(
      docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
        .withColumn("__sh", TextHashExpr.shingleHashes(col("__tk"), L))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val wins = base.select(col(idCol),
      posexplode(col("__sh")).as(Seq("__pos", "__h")))
      .withColumn("__ord",
        when(col("__pos") >= Boilerplate.OrdBase, raise_error(concat(
          lit(s"span dedup: document exceeds ${Boilerplate.OrdBase} tokens (id="),
          col(idCol).cast("string"), lit(")"))))
          .otherwise(col(idCol) * Boilerplate.OrdBase + col("__pos")))
    val firsts = wins.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"), min(col("__ord")).as("__keep"))
      .filter(col("__cnt") >= minCount)
      .select(col("__h"), col("__keep"))
    // distinct covered positions of NON-first duplicated windows.
    // ONE exchange for the whole island chain: repartition on the doc
    // id up front — HashPartitioning(id) satisfies the clustering
    // requirements of the (id, p) distinct, the per-doc window, the
    // (id, grp) island aggregate, AND the final per-doc fold, so
    // nothing downstream re-shuffles (covered mass moves once).
    val covered = wins.join(firsts, "__h")
      .filter(col("__ord") =!= col("__keep"))
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(L - 1))).as("__p"))
      .repartition(col(idCol))
      .distinct()
    // gaps-and-islands: consecutive covered positions share
    // __p - row_number(); islands below the floor survive
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val spans = covered
      .withColumn("__grp", col("__p") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__p")).as("__start"), count(lit(1)).as("__len"))
      .filter(col("__len") >= minSpanTokens)
    // one doc-keyed fold carries both outputs: islands are disjoint by
    // construction, so removal positions expand per span with no
    // dedup, and n_spans is the list size — no second aggregation, no
    // second join
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__start"), col("__len"))).as("__spans"))
      .select(col(idCol),
        size(col("__spans")).cast("long").as("__nspans"),
        flatten(transform(col("__spans"), s =>
          sequence(s("__start"), s("__start") + s("__len") - 1))).as("__rm"))
    base
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(size(col("__rm")), lit(0)).cast("long").as("n_removed"),
        coalesce(col("__nspans"), lit(0L)).as("n_spans"),
        concat_ws(" ", filter(col("__tk"),
          (t, i) => !coalesce(array_contains(col("__rm"), i), lit(false))))
          .as("clean_text"))
  }
}
