package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Embedding-space outlier pruning — the prototypicality metric of the
  * self-supervised data-pruning literature (Sorscher et al. 2022,
  * SemDeDup's sibling): score every vector by cosine to its k-means
  * cell centroid; low scorers are far from every dense region of the
  * embedding space — mislabeled, off-distribution, or noise — and are
  * pruned either by a hard floor or per-cell bottom-fraction.
  *
  * Scale design: the quantizer is [[IvfIndex.kmeansCentroids]] (nlist
  * centroids broadcast as plan literals), so scoring is one scan with
  * zero joins; the fraction rule adds one window partitioned by CELL —
  * bounded groups (cells are capacity-planned, see SemanticDedup), not
  * a global sort. The keep decision is exact integer cross-
  * multiplication, so the same rows survive on every engine and
  * partitioning.
  */
object EmbedOutliers {

  /** (id, cell, proto_score): cosine of each vector to its assigned
    * cell centroid (unit centroids ⇒ dot/norm). Zero-norm vectors are
    * excluded (no angle to score).
    */
  def prototypicality(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): DataFrame = {
    val cents = IvfIndex.kmeansCentroids(corpus, idCol, vecCol, nlist, iters)
    // the assignment's argmax already computed dot(vec, winning
    // centroid) — read it off the struct instead of recomputing against
    // a second copy of the centroid constants
    IvfIndex.assignCellsWithScore(corpus, idCol, vecCol, cents)
      .withColumn("__nrm", VectorOps.norm(col(vecCol)))
      .filter(col("__nrm") > 0)
      .select(col(idCol), col("__cell").cast("long").as("cell"),
        (col("__cellDot") / col("__nrm")).as("proto_score"))
  }

  /** Keep the per-cell top `keepNum/keepDen` fraction by prototype
    * score (floor semantics: keep iff rank·den ≤ members·num; ties
    * rank by smaller id first). Returns (id, cell, proto_score) of the
    * survivors.
    */
  def pruneOutliers(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, keepNum: Int, keepDen: Int, iters: Int = 2): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum, s"bad fraction $keepNum/$keepDen")
    val scored = prototypicality(corpus, idCol, vecCol, nlist, iters)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("proto_score").desc, col(idCol))
    scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("__members", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("__rn") * keepDen <= col("__members") * keepNum)
      .select(col(idCol), col("cell"), col("proto_score"))
  }
}
