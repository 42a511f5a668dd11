package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * executor-sized; the pair join shuffles on cell id only. Two guards
  * make the bound hold on the corpora semantic dedup exists for:
  *
  *  1. **Exact-twin collapse (linear).** Identical vectors always share
  *     a cell, and their pair cosine equals `dot(v,v)/(n·n)` — so that
  *     expression is evaluated ONCE per distinct vector and all but the
  *     smallest id drop when it clears the threshold. A corpus that is
  *     90 % byte-identical duplicates collapses to its distinct vectors
  *     BEFORE the quadratic stage, with bit-identical drop decisions
  *     (the collapse reuses the exact arithmetic the pair filter would
  *     have applied to the identical pair).
  *  2. **`maxCellRows` re-quantization.** Cells still larger than the
  *     cap after collapse re-quantize recursively (k-means on the cell
  *     subset, `ceil(2·rows/cap)` sub-cells, depth-capped), so the
  *     per-cell pair count is bounded without trusting the global
  *     nlist choice. Splitting compares strictly fewer pairs — the
  *     standard SemDeDup trade (pairs never cross cells by
  *     construction). Distinct-but-coincident vectors that k-means
  *     cannot separate stop splitting at `maxSplitDepth`.
  *
  * Norm-zero rows can have no cosine neighbor — they survive and never
  * join the pair comparison (guarding the division).
  */
object SemanticDedup {

  /** Survivors with their cell assignment: one row per kept id,
    * `(idCol, cell)` — `cell` is the TOP-LEVEL assignment (refinement
    * sub-cells are internal to the pair bound). Drop rule: id2 is
    * dropped when some id1 < id2 in the same cell has
    * cosine(id1, id2) >= threshold (keep-smallest).
    */
  def dedup(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, threshold: Double,
      maxCellRows: Long = Long.MaxValue, maxSplitDepth: Int = 4): DataFrame = {
    val st = stages(corpus, idCol, vecCol, nlist, iters, threshold,
      maxCellRows, maxSplitDepth)
    val a = st.refined.select(col("__rcell"), col(idCol).as("__id1"),
      col(vecCol).as("__v1"), col("__n").as("__n1"))
    val b = st.refined.select(col("__rcell"), col(idCol).as("__id2"),
      col(vecCol).as("__v2"), col("__n").as("__n2"))
    val pairDrops = a.join(b, "__rcell")
      .filter(col("__id1") < col("__id2"))
      .filter(FloatVec.dotF(col("__v1"), col("__v2")) /
        (col("__n1") * col("__n2")) >= threshold)
      .select(col("__id2").as(idCol))
    val drops = pairDrops.unionByName(st.exactDrops).distinct()
    st.assigned.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** Pair-stage cell sizes AFTER collapse + refinement — the bound the
    * cap enforces, surfaced for specs and capacity planning: one row
    * per refined cell, `(rcell, rows)`.
    */
  def refinedCellSizes(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, threshold: Double,
      maxCellRows: Long, maxSplitDepth: Int = 4): DataFrame =
    stages(corpus, idCol, vecCol, nlist, iters, threshold,
      maxCellRows, maxSplitDepth)
      .refined.groupBy(col("__rcell").as("rcell")).agg(count(lit(1)).as("rows"))

  private final case class Stages(
      assigned: DataFrame, exactDrops: DataFrame, refined: DataFrame)

  /** Shared pipeline head: assignment, exact-twin collapse, and the
    * depth-capped re-quantization of oversized cells.
    */
  private def stages(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, threshold: Double,
      maxCellRows: Long, maxSplitDepth: Int): Stages = {
    val cents = IvfIndex.kmeansCentroids(corpus, idCol, vecCol, nlist, iters)
    val assigned = IvfIndex.assignCells(corpus, idCol, vecCol, cents)
      .select(col(idCol), col(vecCol),
        col("__cell").cast("long").as("cell"),
        FloatVec.normF(col(vecCol)).as("__n"))
    val comparable = assigned.filter(col("__n") > 0)

    // -- exact-twin collapse ------------------------------------------
    // same expression the pair filter evaluates for an identical pair
    val selfCos =
      FloatVec.dotF(col(vecCol), col(vecCol)) / (col("__n") * col("__n"))
    val reps = comparable.groupBy(col("cell"), col(vecCol))
      .agg(min(col(idCol)).as("__repId"))
    // two consumers of the tag join (exact drops + pair input)
    val tagged = graft.core.CacheBin.trackEager(
      comparable.join(reps, Seq("cell", vecCol))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val exactDrops = tagged
      .filter(col(idCol) =!= col("__repId") && selfCos >= threshold)
      .select(col(idCol))
    // groups whose self-cosine misses the threshold keep every row:
    // their internal pairs must still be (vacuously) compared
    val pairInput = tagged
      .filter(col(idCol) === col("__repId") || selfCos < threshold)
      .select(col("cell"), col(idCol), col(vecCol), col("__n"))

    // -- maxCellRows refinement ---------------------------------------
    // Generation lifetimes are bounded inside this loop, so older
    // generations are released LOCALLY: each iteration's counts collect
    // fully materializes the current generation, after which the one it
    // was derived from is unpersisted. Only the final surviving
    // generation (consumed by the returned lazy plan) goes to CacheBin.
    var cur = pairInput.withColumn("__rcell", col("cell"))
    if (maxCellRows < Long.MaxValue) {
      cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
      var prev: org.apache.spark.sql.DataFrame = null
      var nextId = nlist.toLong // sub-cell ids allocated past the top level
      var depth = 0
      var done = false
      while (!done && depth < maxSplitDepth) {
        val big = cur.groupBy(col("__rcell")).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > maxCellRows)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        // the collect above scanned every partition of cur — the
        // generation cur was derived from can go now
        if (prev != null) { prev.unpersist(); prev = null }
        if (big.isEmpty) done = true
        else {
          val relabeled = big.toSeq.map { case (cellId, cnt) =>
            val sub = cur.filter(col("__rcell") === cellId)
            val k = math.max(2,
              math.min(1024, math.ceil(2.0 * cnt / maxCellRows).toInt))
            val subCents = IvfIndex.kmeansCentroids(sub, idCol, vecCol, k, iters)
            val base = nextId
            nextId += k
            IvfIndex.assignCells(sub, idCol, vecCol, subCents)
              .withColumn("__rcell", col("__cell").cast("long") + lit(base))
              .drop("__cell")
          }
          val untouched =
            cur.filter(!col("__rcell").isin(big.map(_._1).toIndexedSeq: _*))
          prev = cur
          cur = (untouched +: relabeled).reduce(_ unionByName _)
            .persist(StorageLevel.MEMORY_AND_DISK)
          depth += 1
        }
      }
      // depth-limit exit: the last generation never went through a
      // counts collect — materialize it before dropping its input
      if (prev != null) { cur.count(); prev.unpersist() }
      cur = graft.core.CacheBin.track(cur)
    }
    Stages(assigned, exactDrops, cur)
  }
}
