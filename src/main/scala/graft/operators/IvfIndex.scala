package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, VectorOps}

/** IVF-style approximate nearest neighbor: a coarse quantizer assigns
  * every corpus vector to one of `nlist` cells; a query probes only its
  * `nprobe` closest cells and runs exact search inside them —
  * corpus-scan cost drops to ~nprobe/nlist of brute force.
  *
  * Centroids are picked deterministically (systematic id sampling), so
  * the index is reproducible anywhere with no training step; swap in a
  * KMeans refinement without touching the search path if the corpus is
  * badly skewed.
  *
  * Scale shape: cell assignment is one scan (nlist dot products per
  * row, codegen'd); the probe side is EXPLODED to one (query, cell) row
  * per probed cell and equi-joined on cell id — a BroadcastHashJoin, so
  * each corpus row is tested only against the queries probing ITS cell
  * (an `array_contains` membership join would be a nested loop over
  * every query per corpus row); per-query top-k is a rank-filtered
  * window (WindowGroupLimit).
  */
object IvfIndex {

  /** Deterministic centroid pick: every (n/nlist)-th vector by id.
    * Degenerate id sets (no id divisible by the stride — possible on
    * arbitrary subsets, e.g. a cell being re-quantized) fall back to
    * the lowest-id vectors so the pick is never empty or singular.
    */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Seq[(Int, Seq[Double])] = {
    val n = corpus.count()
    val every = math.max(n / nlist, 1L)
    val sampled = corpus
      .withColumn("__rk", col(idCol).cast("long"))
      .filter(pmod(col("__rk"), lit(every)) === 0)
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(vecCol)).collect()
    val rows =
      if (sampled.length >= math.min(nlist.toLong, n).toInt) sampled
      else corpus.orderBy(col(idCol)).limit(nlist).select(col(vecCol)).collect()
    rows.zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](0).map(_.toDouble).toSeq }
      .toSeq
  }

  // each centroid is ONE typedlit array literal — a per-element lit()
  // tree (nlist·dim CreateArray nodes) bloats the generated code until
  // Janino compile time shows up in every assignment pass
  private def cellScores(vec: Column, cents: Seq[(Int, Seq[Double])]): Column =
    array(cents.map { case (cid, c) =>
      struct(VectorOps.dot(vec, typedlit(c)).as("score"),
        lit(cid).as("cell"))
    }: _*)

  /** Spherical k-means refinement of the systematic-sample centroids —
    * the quantizer upgrade for a skewed corpus, without touching the
    * search path: centroids stay (cell, vector) pairs consumed by the
    * same `cellScores` argmax.
    *
    * Spherical (unit-normalized centroids over unit-normalized points)
    * because cell assignment is argmax-dot everywhere in this file:
    * with unit centroids, argmax dot(x, c) IS argmax cosine(x, c), so
    * build-time and probe-time assignment agree with the cosine
    * ranking the final search performs.
    *
    * Determinism (cluster-size/partitioning invariant): per-dimension
    * sums go through decimal(28,10) (commutative, exact), and the
    * unit-normalize runs on the driver — byte-identical centroids on
    * any partitioning, so a rebuilt index never silently reshuffles
    * cells. Empty cells keep their previous centroid.
    *
    * Per iteration: one scan of the PERSISTED base (scan + norm are
    * computed once, not once per Lloyd iteration) and one groupBy(cell)
    * with dim aggregate columns — nlist rows × dim columns to the
    * driver, no row explosion: the earlier posexplode shape shuffled
    * rows×dim rows per iteration, this shuffles nlist×partitions
    * partial-agg rows.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5): Seq[(Int, Seq[Double])] = {
    def unit(v: IndexedSeq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v.toSeq else v.map(_ / n).toSeq
    }
    var cents = centroids(corpus, idCol, vecCol, nlist)
      .map { case (cid, c) => cid -> unit(c.toIndexedSeq) }
    if (cents.isEmpty) return cents
    val dim = cents.head._2.length
    val base = corpus
      .select(col(vecCol).as("__vec"), FloatVec.normF(col(vecCol)).as("__nrm"))
      .filter(col("__nrm") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // element_at(vec,i+1)/nrm is float/double → double, identical to
      // the posexplode'd v/nrm it replaces; decimal sums are exact and
      // commutative, so values are bit-equal on any partitioning.
      val sumCols = (0 until dim).map(i =>
        sum((element_at(col("__vec"), i + 1) / col("__nrm"))
          .cast("decimal(28,10)")).as(s"__s$i"))
      for (_ <- 0 until iters) {
        val rows = base
          .withColumn("__cell",
            array_max(cellScores(col("__vec"), cents)).getField("cell"))
          .groupBy(col("__cell"))
          .agg(sumCols.head, sumCols.tail: _*)
          .collect()
        val byCell = rows.map(r => r.getInt(0) ->
          (0 until dim).map(i => r.getDecimal(i + 1).doubleValue()).toIndexedSeq).toMap
        cents = cents.map { case (cid, old) =>
          byCell.get(cid) match {
            case Some(vec) => cid -> unit(vec)
            case None      => cid -> old
          }
        }
      }
    } finally base.unpersist(blocking = false)
    cents
  }

  /** Probe rows (`__qid`, `__qvec`, `__cells` = the nprobe best cells
    * by centroid dot) — the query-side primitive shared by the IVF
    * searches and the IVF-PQ composition.
    */
  def probeCells(queries: DataFrame, queryIdCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], nprobe: Int): DataFrame =
    queries.select(col(queryIdCol).as("__qid"), col(vecCol).as("__qvec"),
      transform(
        slice(reverse(array_sort(cellScores(col(vecCol), cents))), 1, nprobe),
        s => s.getField("cell")).as("__cells"))

  /** Corpus with its assigned cell (argmax centroid dot). */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame =
    corpus.withColumn("__cell",
      array_max(cellScores(col(vecCol), cents)).getField("cell"))

  /** [[assignCells]] plus the winning centroid DOT (`__cellDot`, the
    * argmax struct's score field) — callers needing the prototype
    * score read it off the assignment instead of recomputing the dot
    * against a second copy of the centroids.
    */
  def assignCellsWithScore(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Seq[(Int, Seq[Double])]): DataFrame =
    corpus
      .withColumn("__assign", array_max(cellScores(col(vecCol), cents)))
      .withColumn("__cell", col("__assign.cell"))
      .withColumn("__cellDot", col("__assign.score"))
      .drop("__assign")

  /** Materialize the index for build-once/search-many reuse: cell
    * assignments written `partitionBy(cell)` — a probe then resolves to
    * reading only its nprobe partition DIRECTORIES (static partition
    * pruning, `PartitionFilters` in the scan) — plus the centroid
    * table. At 100 TB this is the difference between scanning the
    * corpus per query batch and reading nprobe/nlist of it.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, path: String,
      centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroidsOpt.getOrElse(centroids(corpus, idCol, vecCol, nlist))
    assignCells(corpus, idCol, vecCol, cents)
      .withColumnRenamed("__cell", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
    cents.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Append new vectors to an EXISTING materialized index without a
    * rebuild (continuous-ingestion serving: build once, append every
    * batch): the stored centroids assign the incoming vectors, and
    * their rows land as new files inside the existing `cell=`
    * partition directories (`Append` + `partitionBy` writes only the
    * touched partitions). Quantization drifts as the corpus grows away
    * from the frozen centroids — rebuild (or re-run `kmeansCentroids`)
    * on a schedule; searches see appended vectors immediately.
    */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      incoming: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq
    assignCells(incoming, idCol, vecCol, cents)
      .withColumnRenamed("__cell", "cell")
      .write.mode("append").partitionBy("cell").parquet(s"$path/assigned")
  }

  /** Search a materialized index: the union of all probed cells is
    * collected (queries × nprobe ints — driver-bounded by construction)
    * and pushed as an `isin` partition filter, so the scan touches only
    * probed directories; per-query cell membership then restricts the
    * join as in `searchIvf`.
    */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, queryIdCol: String, vecCol: String,
      k: Int, nprobe: Int = 5): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq

    // persisted: the plan feeds both the allCells collect and the
    // broadcast join — without it the nlist dot products per query run
    // twice (and the queries source is re-read)
    val probed = graft.core.CacheBin.track(queries.select(
      col(queryIdCol).as("__qid"), col(vecCol).as("__qvec"),
      FloatVec.normF(col(vecCol)).as("__qnorm"),
      transform(
        slice(reverse(array_sort(cellScores(col(vecCol), cents))), 1, nprobe),
        s => s.getField("cell")).as("__cells"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val allCells = probed.select(explode(col("__cells")).as("c"))
      .distinct().collect().map(_.getInt(0)).toSeq

    val assigned = spark.read.parquet(s"$path/assigned")
      .filter(col("cell").isin(allCells: _*))
      .withColumn("__cnorm", FloatVec.normF(col(vecCol)))

    // one (query, cell) row per probed cell: cells are distinct per
    // query and a corpus row lives in exactly one cell, so the hash
    // join produces each (corpus, query) pair at most once
    val probeRows = probed.select(col("__qid"), col("__qvec"), col("__qnorm"),
      explode(col("__cells")).as("__pcell"))

    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col(idCol))
    assigned
      .join(broadcast(probeRows),
        col("cell") === col("__pcell") && col(idCol) =!= col("__qid"))
      .withColumn("score",
        FloatVec.dotF(col(vecCol), col("__qvec")) / (col("__cnorm") * col("__qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), col("score"))
  }

  /** IVF search: per query, probe the `nprobe` best cells and rank
    * exact cosine inside them.
    *
    * Default nprobe = 5 (of the default 16 cells): on a corpus without
    * strong cluster structure recall@k is governed by the probe
    * FRACTION, not the quantizer — 4/16 measured recall@5 = 0.76 on
    * the synthetic embeddings vs 0.84 at 5/16 (either quantizer), and
    * the recall floor the bench pins is only cleared with margin at 5.
    */
  def searchIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      queryIdCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 5,
      centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val cents = centroidsOpt.getOrElse(centroids(corpus, idCol, vecCol, nlist))
    val assigned = assignCells(corpus, idCol, vecCol, cents)
      .withColumn("__cnorm", FloatVec.normF(col(vecCol)))

    val probed = queries.select(
      col(queryIdCol).as("__qid"), col(vecCol).as("__qvec"),
      FloatVec.normF(col(vecCol)).as("__qnorm"),
      transform(
        slice(reverse(array_sort(cellScores(col(vecCol), cents))), 1, nprobe),
        s => s.getField("cell")).as("__cells"))

    val probeRows = probed.select(col("__qid"), col("__qvec"), col("__qnorm"),
      explode(col("__cells")).as("__pcell"))

    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col(idCol))
    assigned
      .join(broadcast(probeRows),
        col("__cell") === col("__pcell") && col(idCol) =!= col("__qid"))
      .withColumn("score",
        FloatVec.dotF(col(vecCol), col("__qvec")) / (col("__cnorm") * col("__qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), col("score"))
  }
}
