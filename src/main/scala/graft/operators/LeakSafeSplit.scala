package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/valid/test splitting: near-duplicate documents
  * must land in the SAME split, or held-out evaluation partly measures
  * memorization of training near-copies. The standard fix (used by
  * every careful pretraining pipeline): split by duplicate CLUSTER,
  * not by document.
  *
  *  1. near-dup pairs from the banded MinHash dedup (the engine's
  *     existing candidate + exact-Jaccard verify pipeline);
  *  2. connected duplicate clusters via the deterministic two-phase
  *     star contraction (`ConnectedComponents` — min-id labels);
  *  3. one split key per cluster (the component minimum; singletons
  *     key on their own id), drawn through the deterministic
  *     multiplicative-hash split of `RowOps.hashSplit`.
  *
  * Scale shape: everything here is the composed operators' own scale
  * story — banded join for pairs, O(log n) star rounds for clusters,
  * a hash draw for the split. Nothing new shuffles.
  */
object LeakSafeSplit {

  /** One row per document: `(idCol, split_key, split)` where
    * `split_key` is the duplicate-cluster label (component minimum, or
    * the document's own id when it has no near-duplicate) and `split`
    * is the deterministic draw over `splits` (name → fraction,
    * fractions summing to 1).
    *
    * `bands = 0` (the default) picks the LSH banding from the
    * threshold so candidate RECALL stays high — for leak safety a
    * missed pair is a leak, while a false candidate only costs the
    * exact-Jaccard verify (rows/band r: the band S-curve threshold is
    * (1/b)^(1/r), so low thresholds need narrow bands). With h=16:
    * threshold ≥ 0.65 → 4 bands (r=4), ≥ 0.35 → 8 (r=2), else 16
    * (r=1 — every shared minhash is a candidate).
    */
  def split(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], threshold: Double = 0.5,
      n: Int = 3, h: Int = 16, bands: Int = 0): DataFrame = {
    val b = if (bands > 0) bands else TextDedup.bandsFor(threshold)
    val pairs = TextDedup.minhashNearDupPairs(docs, idCol, textCol,
      threshold, n, h, b)
    val comp = ConnectedComponents.components(
      pairs.select(col("id1").as("src"), col("id2").as("dst")))
    val keyed = docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
    RowOps.hashSplit(keyed, "split_key", splits)
      .select(col(idCol), col("split_key"), col("split"))
  }
}
