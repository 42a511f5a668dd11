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
    // construction, so the removed-token count is the plain span-length
    // sum and n_spans is the list size — no second aggregation, no
    // second join. The spans are kept as SORTED (start, len) intervals;
    // the clean text is rebuilt from their COMPLEMENT via array slices,
    // O(tokens + spans) per document — a per-token membership test
    // against an expanded removal-position array would cost
    // O(tokens × removed) and straggle on a heavily-duplicated long
    // document (50k tokens, 40% removed ≈ 10⁹ comparisons in one task).
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("__start").cast("long").as("__start"),
        col("__len").cast("long").as("__len")))).as("__spans"))
    val sp = col("__sp")
    // keep-segment i of n+1: [prev span's end, next span's start), with
    // the corpus edges 0 and n_tokens closing the ends
    val segments = transform(sequence(lit(0), size(sp)), i => {
      val segStart = when(i === 0, lit(0L))
        .otherwise(element_at(sp, i)("__start") + element_at(sp, i)("__len"))
      val segStop = when(i === size(sp), size(col("__tk")).cast("long"))
        .otherwise(element_at(sp, i + 1)("__start"))
      slice(col("__tk"), (segStart + 1).cast("int"),
        (segStop - segStart).cast("int"))
    })
    base
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("__sp", coalesce(col("__spans"),
        array().cast("array<struct<__start:bigint,__len:bigint>>")))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(aggregate(sp, lit(0L), (acc, s) => acc + s("__len")), lit(0L))
          .as("n_removed"),
        size(sp).cast("long").as("n_spans"),
        concat_ws(" ", flatten(segments)).as("clean_text"))
  }
}
