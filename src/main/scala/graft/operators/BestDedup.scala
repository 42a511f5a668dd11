package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate dedup that keeps the BEST member of each duplicate
  * cluster, not the lowest id — the policy curation pipelines actually
  * want: among k near-copies of a page, keep the longest / highest
  * quality-score one and drop the k-1 worse ones.
  *
  * Composition of the engine's own verified parts: banded MinHash +
  * exact-Jaccard near-dup pairs ([[TextDedup.minhashNearDupPairs]]),
  * transitive clusters via star-contraction connected components
  * ([[ConnectedComponents]] — pairwise keep-the-better under-merges
  * transitive clusters), then one per-cluster argmax. Deterministic:
  * score ties break to the SMALLER id via a lexicographic
  * `(score, -id)` struct max.
  *
  * Scale shape: the pair/CC stages are the leak-safe-split machinery
  * (hash shuffles only, no all-pairs); the argmax is a
  * map-side-combinable groupBy on the component key; the final drops
  * are an id anti-join. Nothing new materializes beyond the cluster
  * membership table. `scoreCol` must be non-null on clustered rows
  * (null structs lose the max; score null-safety is the caller's
  * contract, same as every groupBy-max).
  */
object BestDedup {

  /** Return the surviving rows of `docs` unchanged: every near-dup
    * cluster (Jaccard >= threshold, transitively closed) contributes
    * exactly its best-scoring member; singletons pass through.
    */
  def dedupKeepBest(docs: DataFrame, idCol: String, textCol: String,
      scoreCol: String, threshold: Double, n: Int = 3, h: Int = 16,
      bands: Int = 0): DataFrame = {
    val pairs = TextDedup.minhashNearDupPairs(docs, idCol, textCol,
      threshold, n, h, bands)
    val comp = ConnectedComponents.components(
      pairs.select(col("id1").as("src"), col("id2").as("dst")))
    val members = docs.select(col(idCol), col(scoreCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol))
    val winners = members.groupBy(col("component"))
      .agg(max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni"))).as("w"))
      .select((-col("w.ni")).as(idCol))
    val drops = members.select(col(idCol))
      .join(winners, Seq(idCol), "left_anti")
    docs.join(drops, Seq(idCol), "left_anti")
  }
}
