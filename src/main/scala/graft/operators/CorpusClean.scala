package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** End-to-end training-corpus curation — the composed pipeline a
  * 100 TB pretraining-data job runs, built entirely from the engine's
  * verified primitives:
  *
  *   language allowlist → length floor → exact dedup (fingerprint
  *   groupBy, min-id survivor) → near-duplicate removal (MinHash +
  *   banded LSH candidates, exact-Jaccard verified; the larger id of
  *   every qualifying pair is dropped).
  *
  * Scale shape: the filters are scan predicates; exact dedup shuffles
  * once on the 8-byte fingerprint; near-dup candidate generation
  * shuffles on (band, bandValue) — the banded path is the DEFAULT
  * because the exact co-shingled self-join (`jaccardPairsExact`) keys
  * a full shuffle on raw shingle hash, and at corpus scale a frequent
  * 3-gram co-shingles millions of documents, making one hot hash group
  * quadratic. Banding bounds every bucket by signature agreement
  * instead; pass `bandedLsh = false` only for small-corpus exact
  * baselines. The drop policy is identical on either path.
  *
  * Band tuning: the LSH S-curve threshold sits near (1/b)^(1/r), so
  * the default h=16, bands=8 (rows r=2) centers at ~0.35 — giving
  * ~90% candidate recall at the advertised 0.5 Jaccard cut (b=4/r=4
  * would center at ~0.71 and silently miss ~3/4 of threshold pairs).
  * Extra candidates below the cut only cost verification — they are
  * exact-Jaccard-filtered, never dropped.
  */
object CorpusClean {

  def clean(docs: DataFrame, langs: Seq[String], minChars: Int,
      jaccardThreshold: Double, shingleN: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", bandedLsh: Boolean = true,
      minhashH: Int = 16, minhashBands: Int = 8): DataFrame = {
    val filtered = docs.filter(
      col(langCol).isin(langs: _*) && length(col(textCol)) >= minChars)
    val exact = RowOps.dedupBy(
      filtered.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")
    val pairs =
      if (bandedLsh)
        TextDedup.minhashNearDupPairs(exact, idCol, textCol,
          jaccardThreshold, shingleN, minhashH, minhashBands)
      else
        TextDedup.jaccardPairsExact(exact, idCol, textCol,
          jaccardThreshold, shingleN)
    val nearDupLosers = pairs.select(col("id2").as(idCol)).distinct()
    exact.join(nearDupLosers, Seq(idCol), "left_anti")
  }
}
