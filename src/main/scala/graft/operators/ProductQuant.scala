package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorOps

/** Product quantization (Jégou et al. 2011) — the embedding-compression
  * path for 100 TB-scale similarity search: a D-dim float vector becomes
  * `m` small integer codes (one per D/m-dim subspace, each quantized by
  * its own `ksub`-centroid codebook), shrinking a vector table by
  * ~(32·D)/(m·log2 ksub)× while asymmetric-distance (ADC) search ranks
  * against the ORIGINAL query vector with only codebook lookups per
  * corpus row.
  *
  * Scale design:
  *  - Training never explodes per element: each Lloyd iteration is ONE
  *    scan of the persisted vector base, exploded only per SUBSPACE
  *    (m rows/vector, each carrying a D/m-slice), then a
  *    partial-aggregating `groupBy(m, cell)` with per-dimension exact
  *    decimal(38,0) sums of 1e-10 fixed-point members + counts —
  *    m·ksub rows to the driver, the IVF quantizer's shape
  *    ([[IvfIndex.kmeansCentroids]]).
  *  - Codebooks are m·ksub·(D/m) = ksub·D doubles — they travel as plan
  *    literals (the model IS the expression), so encoding and ADC are
  *    join-free scan-time codegen usable in streams and filters.
  *  - ADC search streams the CODES table once per query batch (queries
  *    broadcast, same plan as [[Similarity.knnExact]]); per-query top-k
  *    is the rank-filtered window Spark executes as WindowGroupLimit.
  *    Compose with [[IvfIndex]] cells for the IVF-PQ shape when even
  *    one pass over the codes is too much.
  *
  * Determinism (bit-equal on any partitioning, mirrored by the DuckDB
  * oracle): systematic-id seeds, argmin assignment with the
  * (dist, cell) struct-min tie-break, exact integer member sums in
  * explicit fixed point (floor(v·1e10 + 0.5) — a double→decimal CAST
  * is engine-defined rounding and measurably drifts), driver-side
  * mean division in pinned order, empty cells keep their previous
  * centroid, and every distance is the same left-fold double chain on
  * both engines.
  */
object ProductQuant {

  /** Per-subspace codebooks: `books(m)` = (cell id, centroid) pairs. */
  type Codebooks = IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]]

  /** Subspace slice of a vector column (m 0-based, 1-based positions). */
  private def subVec(vec: Column, mi: Int, dsub: Int): Column =
    slice(vec, mi * dsub + 1, dsub)

  /** Argmin-cell assignment against one codebook: smallest L2 distance,
    * ties to the smaller cell id (struct-min over (dist, cell)).
    */
  // centroid constants enter as ONE array literal each (typedlit), not
  // per-element lit() trees: ksub·dsub CreateArray nodes per subspace
  // made the generated code large enough that Janino compile time
  // dominated the bench entries
  private def assignExpr(sv: Column, book: Seq[(Int, Seq[Double])]): Column =
    array_min(array(book.map { case (cid, c) =>
      struct(VectorOps.distSq(sv, typedlit(c)).as("dist"),
        lit(cid).as("cell"))
    }: _*)).getField("cell")

  /** Train `m` codebooks of `ksub` centroids by plain (non-spherical)
    * Lloyd iterations over subvector slices. Seeds are the systematic
    * id sample shared with the IVF quantizer, sliced per subspace.
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2): Codebooks = {
    val seeds = IvfIndex.centroids(corpus, idCol, vecCol, ksub)
    require(seeds.nonEmpty, "empty corpus")
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    var books: Codebooks = (0 until m).map { mi =>
      seeds.map { case (cid, v) =>
        cid -> v.slice(mi * dsub, (mi + 1) * dsub).toIndexedSeq
      }.toIndexedSeq
    }.toIndexedSeq
    val base = corpus.select(col(vecCol).as("__vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // member sums in EXPLICIT 1e-10 fixed point: floor(v·1e10 + 0.5)
      // is the same integer on every engine (a double→decimal cast is
      // NOT — Spark and DuckDB round the 10th fractional digit of some
      // float values differently, measured as a 1-ULP distance drift),
      // summed exactly as decimal(38,0)
      val sumCols = count(lit(1)).as("__n") +:
        (0 until dsub).map(i => sum(
          floor(element_at(col("__sv"), i + 1).cast("double") * lit(1e10)
            + lit(0.5)).cast("decimal(38,0)")).as(s"__s$i"))
      for (_ <- 0 until iters) {
        // assignment via the codegen'd kernel (all m cells in one eval),
        // computed once per row before the subspace explode
        val exploded = base
          .select(col("__vec"), pqCodes(col("__vec"), books).as("__codes"))
          .select(explode(array((0 until m).map { mi =>
            struct(lit(mi).as("m"),
              element_at(col("__codes"), mi + 1).as("cell"),
              subVec(col("__vec"), mi, dsub).as("sv"))
          }: _*)).as("e"))
          .select(col("e.m").as("__m"), col("e.cell").as("__cell"),
            col("e.sv").as("__sv"))
        val rows = exploded.groupBy(col("__m"), col("__cell"))
          .agg(sumCols.head, sumCols.tail: _*)
          .collect()
        val byKey = rows.map { r =>
          (r.getInt(0), r.getInt(1)) -> {
            val n = r.getLong(2).toDouble
            (0 until dsub).map(i =>
              r.getDecimal(i + 3).doubleValue() / 1e10 / n)
          }
        }.toMap
        books = books.zipWithIndex.map { case (book, mi) =>
          book.map { case (cid, old) =>
            cid -> byKey.get((mi, cid)).map(_.toIndexedSeq).getOrElse(old)
          }
        }
      }
    } finally { base.unpersist(blocking = false); () }
    books
  }

  /** Codebooks flattened for the codegen'd kernels: cid-ordered, one
    * double[] — (mi·ksub + cid)·dsub + p indexing.
    */
  private def flatten(books: Codebooks): (Seq[Double], Int, Int, Int) = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head._2.length
    val flat = books.flatMap { b =>
      val sorted = b.sortBy(_._1)
      require(sorted.map(_._1) == (0 until ksub), "cids must be dense 0..ksub-1")
      sorted.flatMap(_._2)
    }
    (flat, m, ksub, dsub)
  }

  /** PQ code array (one small int per subspace) — a single codegen'd
    * kernel ([[org.apache.spark.sql.graftvec.PqCells]]); the HOF
    * definition below stays as the pinned semantic reference.
    */
  def pqCodes(vec: Column, books: Codebooks): Column = {
    val (flat, m, ksub, dsub) = flatten(books)
    org.apache.spark.sql.graftvec.PqExpr.cells(vec, flat, m, ksub, dsub)
  }

  /** The composable HOF definition of [[pqCodes]] (PqEquivalenceSpec
    * pins the kernel to it; the DuckDB oracle mirrors this shape).
    */
  def pqCodesHof(vec: Column, books: Codebooks): Column = {
    val dsub = books.head.head._2.length
    array(books.indices.map { mi =>
      assignExpr(subVec(vec, mi, dsub), books(mi))
    }: _*)
  }

  /** Codes packed radix-ksub into one BIGINT (engine-comparable and
    * 8 bytes on disk): Σ code_m · ksub^m.
    */
  def packedCode(codes: Column, m: Int, ksub: Int): Column = {
    // Exact integer radix weights: math.pow rounds above 2^53 for
    // non-power-of-two ksub, silently corrupting the packed code. The
    // whole pack must also fit a signed 64-bit long.
    require(m * (math.log(ksub) / math.log(2)) <= 63.0,
      s"packed code overflows long: m=$m ksub=$ksub")
    val weights = Iterator.iterate(1L)(w => Math.multiplyExact(w, ksub.toLong))
      .take(m).toSeq
    (0 until m).map { mi =>
      element_at(codes, mi + 1).cast("long") * lit(weights(mi))
    }.reduce(_ + _)
  }

  /** ADC distance: Σ_m L2²(query subvector, centroid the code names) —
    * a single codegen'd kernel; no join, no decode of the corpus
    * vector.
    */
  def adcDist(qvec: Column, codes: Column, books: Codebooks): Column = {
    val (flat, m, ksub, dsub) = flatten(books)
    org.apache.spark.sql.graftvec.PqExpr.adcDist(qvec, codes, flat, m, ksub, dsub)
  }

  /** The composable HOF definition of [[adcDist]] (the pinned semantic
    * reference): per-subspace lookup tables as `element_at` into
    * literal distance arrays.
    */
  def adcDistHof(qvec: Column, codes: Column, books: Codebooks): Column = {
    val dsub = books.head.head._2.length
    books.indices.map { mi =>
      val sv = subVec(qvec, mi, dsub)
      val lut = array(books(mi).map { case (_, c) =>
        VectorOps.distSq(sv, typedlit(c))
      }: _*)
      // cell ids are 0-based and dense by construction (seeds number
      // them 0..ksub-1), so code directly indexes the lookup array
      element_at(lut, element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)
  }

  /** Brute-force ADC top-k: corpus CODES stream once, queries broadcast
    * with their full vectors (asymmetric: only the corpus side is
    * quantized). Returns (query_id, rank, neighbor_id, adc_dist) with
    * rank by ascending distance, ties to the smaller neighbor id.
    */
  def searchAdc(corpus: DataFrame, queries: DataFrame, idCol: String,
      queryIdCol: String, vecCol: String, k: Int, books: Codebooks,
      excludeSelf: Boolean = true): DataFrame = {
    val codes = corpus.select(col(idCol),
      pqCodes(col(vecCol), books).as("__codes"))
    val q = queries.select(col(queryIdCol).as("__qid"),
      col(vecCol).as("__qvec"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("adc_dist").asc, col(idCol))
    codes
      .join(broadcast(q),
        if (excludeSelf) col(idCol) =!= col("__qid") else lit(true))
      .withColumn("adc_dist", adcDist(col("__qvec"), col("__codes"), books))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"),
        col(idCol).as("neighbor_id"), col("adc_dist"))
  }

  /** ADC shortlist + exact re-rank — how PQ is actually deployed: the
    * compressed scan proposes `shortlistFactor·k` candidates per query,
    * then ONLY those rows' original vectors are fetched (hash equi-join
    * on id — at 100 TB this reads queries·shortlist rows, not the
    * corpus) and exact L2 re-ranks the final top-k. On unstructured
    * (near-uniform) vectors ADC alone is bounded by code resolution —
    * measured recall@10 0.23 at 32-bit codes on the synthetic
    * embeddings, rising to 0.74 with an 8× shortlist — the PQ analog
    * of the IVF probe-fraction note.
    */
  def searchAdcRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      queryIdCol: String, vecCol: String, k: Int, books: Codebooks,
      shortlistFactor: Int = 8, excludeSelf: Boolean = true): DataFrame =
    rerankExact(
      searchAdc(corpus, queries, idCol, queryIdCol, vecCol,
        k * shortlistFactor, books, excludeSelf)
        .select(col("query_id"), col("neighbor_id")),
      corpus, queries, idCol, queryIdCol, vecCol, k)

  /** The shared exact-re-rank tail: fetch ONLY the shortlisted ids'
    * vectors (hash equi-join), re-rank by exact L2, ties to the
    * smaller neighbor id.
    */
  private def rerankExact(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, queryIdCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("__qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    short
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__nvec")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("dist", VectorOps.distSq(col("__nvec"), col("__qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("neighbor_id"), col("dist"))
  }

  /** IVF-PQ — the full 100 TB ANN shape: a coarse quantizer
    * ([[IvfIndex]] cells) bounds WHICH rows are touched, PQ codes bound
    * WHAT each touched row costs. The corpus side of the probe join
    * carries only (id, cell, codes) — the vectors themselves are
    * fetched solely for the shortlist re-rank (equi-join on id). Per
    * query: nprobe/nlist of the code table is ADC-scanned, then
    * k·shortlistFactor exact distances.
    */
  def searchIvfAdcRerank(corpus: DataFrame, queries: DataFrame,
      idCol: String, queryIdCol: String, vecCol: String, k: Int,
      books: Codebooks, nlist: Int = 16, nprobe: Int = 4,
      shortlistFactor: Int = 8, excludeSelf: Boolean = true): DataFrame = {
    val cents = IvfIndex.centroids(corpus, idCol, vecCol, nlist)
    val codeTable = IvfIndex.assignCells(corpus, idCol, vecCol, cents)
      .select(col(idCol), col("__cell"),
        pqCodes(col(vecCol), books).as("__codes"))
    val probeRows = IvfIndex
      .probeCells(queries, queryIdCol, vecCol, cents, nprobe)
      .select(col("__qid"), col("__qvec"), explode(col("__cells")).as("__pcell"))
    val wAdc = Window.partitionBy(col("__qid"))
      .orderBy(col("__adc").asc, col(idCol))
    val short = codeTable
      .join(broadcast(probeRows),
        col("__cell") === col("__pcell") &&
          (if (excludeSelf) col(idCol) =!= col("__qid") else lit(true)))
      .withColumn("__adc", adcDist(col("__qvec"), col("__codes"), books))
      .withColumn("__srn", row_number().over(wAdc))
      .filter(col("__srn") <= k * shortlistFactor)
      .select(col("__qid").as("query_id"), col(idCol).as("neighbor_id"))
    rerankExact(short, corpus, queries, idCol, queryIdCol, vecCol, k)
  }
}
