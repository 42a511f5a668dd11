package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** End-to-end training-corpus curation — the composed pipeline a
  * 100 TB pretraining-data job runs, built entirely from the engine's
  * verified primitives:
  *
  *   language allowlist → length floor → exact dedup (fingerprint
  *   groupBy, min-id survivor) → near-duplicate removal (exact n-gram
  *   Jaccard pairs; the larger id of every qualifying pair is dropped).
  *
  * Scale shape: the filters are scan predicates; exact dedup shuffles
  * once on the 8-byte fingerprint; near-dup pairing shuffles on shingle
  * hash (co-shingled pairs only — never a cross product). Swap
  * `TextDedup.jaccardPairsExact` for `minhashNearDupPairs` at corpus
  * sizes where even co-shingled pairing is too wide; the drop policy is
  * unchanged.
  */
object CorpusClean {

  def clean(docs: DataFrame, langs: Seq[String], minChars: Int,
      jaccardThreshold: Double, shingleN: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val filtered = docs.filter(
      col(langCol).isin(langs: _*) && length(col(textCol)) >= minChars)
    val exact = RowOps.dedupBy(
      filtered.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")
    val nearDupLosers = TextDedup.jaccardPairsExact(
      exact, idCol, textCol, jaccardThreshold, shingleN)
      .select(col("id2").as(idCol)).distinct()
    exact.join(nearDupLosers, Seq(idCol), "left_anti")
  }
}
