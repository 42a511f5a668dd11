package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FloatVec

/** SemDeDup-style semantic deduplication over an embedding column: the
  * pretraining-corpus dedup that catches paraphrases exact and MinHash
  * dedup miss. The quadratic pairwise-cosine comparison is bounded by
  * clustering — spherical k-means cells (the same quantizer the IVF
  * index uses, `IvfIndex.kmeansCentroids`) partition the corpus, and
  * only WITHIN-CELL pairs are compared; a row is dropped when a
  * smaller-id row in its cell sits within `threshold` cosine.
  *
  * Determinism: the centroid refinement is partitioning-invariant
  * (decimal sums), assignment ties break to the larger cell on both
  * engines, pair cosine is the fold-pinned double used across the
  * similarity family — the survivor set is byte-stable anywhere.
  *
  * Scale shape (the SemDeDup recipe): nlist scales with corpus size
  * (~N / target-cell-rows), so each cell's quadratic comparison stays
  * executor-sized; the pair join shuffles on cell id only. Norm-zero
  * rows can have no cosine neighbor — they survive and never join the
  * pair comparison (guarding the division).
  */
object SemanticDedup {

  /** Survivors with their cell assignment: one row per kept id,
    * `(idCol, cell)`. Drop rule: id2 is dropped when some id1 < id2 in
    * the SAME cell has cosine(id1, id2) >= threshold (keep-smallest).
    */
  def dedup(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, threshold: Double): DataFrame = {
    val cents = IvfIndex.kmeansCentroids(corpus, idCol, vecCol, nlist, iters)
    val assigned = IvfIndex.assignCells(corpus, idCol, vecCol, cents)
      .select(col(idCol), col(vecCol),
        col("__cell").cast("long").as("cell"),
        FloatVec.normF(col(vecCol)).as("__n"))
    val comparable = assigned.filter(col("__n") > 0)
    val a = comparable.select(col("cell"), col(idCol).as("__id1"),
      col(vecCol).as("__v1"), col("__n").as("__n1"))
    val b = comparable.select(col("cell"), col(idCol).as("__id2"),
      col(vecCol).as("__v2"), col("__n").as("__n2"))
    val drops = a.join(b, "cell")
      .filter(col("__id1") < col("__id2"))
      .filter(FloatVec.dotF(col("__v1"), col("__v2")) /
        (col("__n1") * col("__n2")) >= threshold)
      .select(col("__id2").as(idCol))
      .distinct()
    assigned.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }
}
