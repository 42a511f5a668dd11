package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * operator: a depth×width grid of counters where every occurrence
  * increments one counter per row (double-hashed position), and a
  * point estimate is the minimum over its depth cells — always an
  * overestimate, never under.
  *
  * Why relational instead of Spark's driver-side
  * `DataFrameStatFunctions.countMinSketch`: the grid is built by a
  * partial-aggregating `groupBy(row, position).count()` — each task
  * ships at most depth·width cells no matter how many occurrences it
  * scanned, the update is commutative (counts are sums, so the grid
  * is identical on any partitioning), and the table form makes the
  * sketch PERSISTABLE and JOINABLE: store the d·w-row grid next to
  * the corpus and answer frequency queries later without a rescan.
  * Positions come from the engine-portable polynomial fingerprint
  * double-hashed with exact long arithmetic, so the grid and every
  * estimate replay bit-identically in the DuckDB oracle.
  */
object CmsSketch {

  private val P = TextAnalysis.FingerprintMod // 1e9+7; inputs are fingerprints < P
  private val A = 2654435761L // Knuth multiplicative
  private val B = 2246822519L // xxhash PRIME32_2

  /** Counter position of value `x` in sketch row `j` (double hashing,
    * all intermediates < 2^63).
    */
  def position(x: Column, j: Column, width: Int): Column =
    pmod(pmod(x * lit(A), lit(P)) + j * pmod(x * lit(B), lit(P)),
      lit(P)) % lit(width.toLong)

  /** Build the grid from one row per OCCURRENCE: output is
    * `(__j, __pos, __cnt)` with at most depth·width rows total.
    */
  def build(occurrences: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame =
    occurrences
      .select(col(valueCol).as("__x"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("__j"))
      .select(col("__j"), position(col("__x"), col("__j"), width).as("__pos"))
      .groupBy(col("__j"), col("__pos"))
      .agg(count(lit(1)).as("__cnt"))

  /** Point estimates for `candidates` (any frame carrying `valueCol`):
    * every candidate row gains `cms_est` = min over its depth cells.
    * The grid side is at most depth·width rows — always broadcastable.
    * Candidates are grouped by their full column set, so duplicate
    * candidate rows collapse to one output row.
    */
  def estimate(cms: DataFrame, candidates: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    val keyCols = candidates.columns.toSeq
    candidates
      .select(keyCols.map(col) :+
        explode(sequence(lit(0L), lit(depth - 1L))).as("__j"): _*)
      .withColumn("__pos", position(col(valueCol), col("__j"), width))
      .join(broadcast(cms), Seq("__j", "__pos"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("cms_est"))
  }
}
