package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** TF-IDF keyword extraction: the top-k terms of every document by
  * `tf · idf`, with the corpus-frequency statistics computed
  * distributed (the keyword-profile stage of a curation pipeline —
  * topic tagging, index keys, near-dup explainability; reference
  * corpus analytics: Squrve `dataset/llm_filter.py` scores documents
  * against corpus statistics the same two-pass way).
  *
  * Determinism contract: `idf_micro = floor(1e6·ln((N+1)/(df+1)))` is
  * the only floating step — a per-TERM scalar on an integer ratio,
  * never accumulated — and `score_micro = tf · idf_micro` is exact
  * integer arithmetic, so ranking (score desc, term asc) is
  * reproducible on any engine and any partitioning.
  *
  * Scale shape: one tokenize pass feeds both the per-(doc,term)
  * counts and the document-frequency table (persisted, pinned before
  * its two consumers). The df join back onto (doc,term) rows is
  * zipf-skewed on the term key, so the `hotTerms` highest-df terms
  * ride a broadcast and only the de-skewed cold tail shuffle-joins —
  * the same hot/cold split as [[TextScore.wordFreqScore]]. The final
  * top-k is a per-document window over ≤ distinct-terms-per-doc rows:
  * partitioned by doc id, no global sort.
  */
object TfIdf {

  /** `(idCol, rnk, term, tf, score_micro)` — top `k` terms per doc. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, hotTerms: Int = 1024): DataFrame = {
    // one row per distinct (doc, term) with its in-doc count. Lazily
    // persisted: its first consumer is the document-frequency pin right
    // below, whose eager count computes (and caches) every tf partition
    // before the final job's joins read it — a dedicated tf pin was one
    // extra explode+groupBy pass
    val tf = graft.core.CacheBin.track(
      docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__t"))
        .groupBy(col(idCol), col("__t"))
        .agg(count(lit(1)).as("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val nDocs = docs.count()
    val df = graft.core.CacheBin.trackEager(
      tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val idf = floor(lit(1e6) * log(
      lit(nDocs + 1.0) / (col("__df") + lit(1)).cast("double"))).cast("long")
    // hot/cold split on document frequency: the head of the zipf curve
    // broadcasts, the cold tail shuffle-joins without its skew driver
    val hot = broadcast(
      df.orderBy(col("__df").desc, col("__t")).limit(hotTerms)
        .select(col("__t"), idf.as("__idf_hot")))
    val tagged = tf.join(hot, Seq("__t"), "left_outer")
    val scored = tagged.filter(col("__idf_hot").isNotNull)
      .select(col(idCol), col("__t"), col("tf"), col("__idf_hot").as("__idf"))
      .unionByName(
        tagged.filter(col("__idf_hot").isNull)
          .select(col(idCol), col("__t"), col("tf"))
          .join(df.select(col("__t"), idf.as("__idf")), "__t")
          .select(col(idCol), col("__t"), col("tf"), col("__idf")))
      .withColumn("score_micro", col("tf") * col("__idf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("__t"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk").cast("long").as("rnk"),
        col("__t").as("term"), col("tf"), col("score_micro"))
  }
}
