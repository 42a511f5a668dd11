package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007): hash every value into a large integer range,
  * keep only the k smallest DISTINCT hashes per group. If the k-th
  * smallest hash is `h_k`, the hashes are ~uniform in [0, M), so
  * distinct-count ≈ (k-1)·M / h_k; with fewer than k distinct hashes
  * the sketch IS the distinct set and the count is exact.
  *
  * Why this shape at 100 TB: the buffer is a bounded sorted array of
  * ≤ k longs, partial-aggregated map-side — every task ships at most
  * k·8 bytes per group regardless of row count, versus
  * `COUNT(DISTINCT)`'s full shuffle of every distinct value. Sketches
  * are mergeable (sorted-merge + truncate), so they compose across
  * partitions, days, or corpus shards; persisting the sketch column
  * gives incremental distinct counts with no re-scan.
  *
  * Determinism: the draw is the engine-portable multiplicative hash
  * (exact long arithmetic, no overflow), so sketch contents, h_k, and
  * the integer estimate are bit-identical on any engine and any
  * partitioning — the DuckDB oracle replays them exactly. The sketch
  * estimates distinct DRAWS; with M = 2^40, hash collisions at test
  * scales are negligible and, crucially, identical in both engines.
  */
final case class KmvSketch(k: Int)
    extends Aggregator[Long, KmvSketch.Buf, Array[Long]] {
  require(k >= 2, "KMV needs k >= 2")

  import KmvSketch.Buf

  /** Sorted-ascending merge of two sorted distinct arrays, truncated
    * to k. */
  private def merged(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var ai = 0; var bi = 0; var o = 0
    var last = -1L // draws are non-negative
    while (o < out.length && (ai < a.length || bi < b.length)) {
      val takeA = bi >= b.length || (ai < a.length && a(ai) <= b(bi))
      val v = if (takeA) { val x = a(ai); ai += 1; x }
              else { val x = b(bi); bi += 1; x }
      if (v != last) { out(o) = v; last = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def zero: Buf = Buf(Array.empty)

  def reduce(buf: Buf, h: Long): Buf =
    // fast path: full sketch whose threshold beats the draw — the
    // overwhelmingly common case on huge groups — allocates nothing
    if (buf.hs.length >= k && h >= buf.hs(k - 1)) buf
    else Buf(merged(buf.hs, Array(h)))

  def merge(a: Buf, b: Buf): Buf = Buf(merged(a.hs, b.hs))

  def finish(buf: Buf): Array[Long] = buf.hs

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Sorted (ascending) distinct draws, at most k of them. */
  final case class Buf(hs: Array[Long])

  /** Draw range: 2^40 — large enough that collisions are negligible at
    * any realistic group cardinality, small enough that (k-1)·M stays
    * comfortably inside a long.
    */
  val M: Long = 1L << 40

  private val P = 999999937L     // prime < 2^30, keeps the product < 2^63
  private val A = 2654435761L    // Knuth's multiplicative constant

  /** Engine-portable uniform draw in [0, M) from a long column:
    * `((x mod P) * A) mod M` — exact long arithmetic both here and in
    * the DuckDB oracle. Null inputs draw null — filter them before the
    * typed aggregation (a null cannot be a distinct value of anything).
    */
  def draw(x: Column): Column = pmod(pmod(x, lit(P)) * lit(A), lit(M))

  /** Distinct-count estimate from a sketch column: `(k-1)·M / h_k`
    * (integer floor) when the sketch is full, the exact sketch size
    * otherwise.
    */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) >= k,
      (lit((k - 1) * M).cast("decimal(38,0)") / element_at(sketch, k)).cast("long"))
      .otherwise(size(sketch).cast("long"))

  /** The sketch threshold h_k (null while the sketch is not full). */
  def threshold(sketch: Column, k: Int): Column =
    when(size(sketch) >= k, element_at(sketch, k))

  // ---- sketch algebra (Beyer et al. 2007: synopses under multiset
  // ops). Sketches compose WITHOUT touching the data again: the union
  // sketch of A and B is the k smallest of their merged sketches, and
  // the intersection estimate needs only set operations on the two
  // k-long arrays — pure codegen'd builtins, no shuffle, no rescan.
  // This is what makes persisted per-shard/per-day sketches a queryable
  // overlap index at 100 TB.

  /** K(A∪B): k smallest distinct draws across both sketches. */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Members of the union sketch drawn from BOTH inputs — the overlap
    * count ρ the intersection estimator scales.
    */
  def overlapCount(a: Column, b: Column, k: Int): Column =
    size(array_intersect(array_intersect(unionSketch(a, b, k), a), b))

  /** |A∩B| estimate: `ρ/k · D̂(A∪B)` when the union sketch is full
    * (integer floor, matching the oracle's replay); when it is not,
    * the sketches hold EVERY draw and ρ is the exact distinct-draw
    * intersection.
    */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionSketch(a, b, k)
    val rho = overlapCount(a, b, k).cast("long")
    when(size(u) >= k,
      ((rho * estimate(u, k)).cast("decimal(38,0)") / lit(k.toLong)).cast("long"))
      .otherwise(rho)
  }
}
