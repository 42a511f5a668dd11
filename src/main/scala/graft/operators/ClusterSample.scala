package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced subsampling: quantize the embedding space with the
  * spherical-k-means IVF quantizer, then keep a fixed quota per cell
  * chosen by a deterministic multiplicative-hash draw. Uniform random
  * subsampling reproduces the corpus's topic imbalance; a per-cell
  * quota keeps the long tail of the embedding space represented (the
  * cluster-balanced selection step of SemDeDup-style pipelines —
  * Abbas et al. 2023 — and of DoReMi-ish diversity mixes).
  *
  * Determinism contract: cell assignment is [[IvfIndex]]'s
  * oracle-mirrored quantizer (decimal centroid sums, struct-max
  * tie-break); the in-cell draw `((id % 1000003) · 2654435761) % 1e6`
  * is the same integer hash the leak-safe splitter uses, ranked with
  * id as the tie-break — no RNG, identical on any engine/partitioning.
  *
  * Scale shape: one pass to assign cells (nlist centroids broadcast as
  * a literal-free fold expression), one hash-partitioned window over
  * the cell key for the quota rank. `nlist` bounds the output at
  * `nlist · perCell` rows regardless of corpus size; cells are
  * near-balanced by construction so the window never sees the
  * full-corpus skew a `partitionBy(constant)` would.
  */
object ClusterSample {

  /** `(idCol, cell, draw)` — `perCell` rows per k-means cell. */
  def balanced(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 8, iters: Int = 2, perCell: Int = 10): DataFrame = {
    val cents = IvfIndex.kmeansCentroids(vectors, idCol, vecCol, nlist, iters)
    val assigned = IvfIndex.assignCells(vectors, idCol, vecCol, cents)
      .select(col(idCol), col("__cell").cast("long").as("cell"))
    // the ONE shared draw definition (pmod-based — sign-safe where the
    // inline `%` form went negative for negative ids), same constants
    // as every other sampler/splitter and their DuckDB mirrors
    val draw = RowOps.multiplicativeDraw(col(idCol))
    val w = Window.partitionBy(col("cell")).orderBy(col("draw"), col(idCol))
    assigned.withColumn("draw", draw)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perCell)
      .select(col(idCol), col("cell"), col("draw"))
  }
}
