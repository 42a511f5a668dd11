package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins without a cartesian product: point-in-interval and
  * interval-overlap joins rewritten as bucket equi-joins. Spark's
  * planner executes a pure inequality join as BroadcastNestedLoopJoin
  * (or a full cartesian when neither side broadcasts) — O(N·M)
  * comparisons that no cluster survives at 100 TB. Binning the range
  * axis into fixed-width buckets turns the predicate into an equi-join
  * on the bucket id: each interval explodes into the buckets it covers
  * (⌈len/width⌉+1 rows), each point lands in exactly one, and the
  * exact range predicate re-filters after the hash join. Cost is
  * output-bound plus the bounded explosion factor — pick `bucketWidth`
  * near the typical interval length so intervals replicate ~2×.
  *
  * The axis is a signed long the caller projects (epoch micros for
  * timestamps, raw longs for numeric ranges); floor-division is exact
  * long arithmetic, correct for negative values too. Skew note: one
  * giant interval fans out to many bucket rows (they distribute —
  * harmless); a bucket holding many intervals AND many points is
  * genuinely output-bound, which AQE's skew-join split handles because
  * this IS an equi-join after the rewrite.
  */
object RangeJoin {

  /** Floor division on longs: `x - pmod(x, w)` is an exact multiple of
    * `w`, divided in decimal so no double rounding can misplace a
    * bucket edge (Spark's `/` on longs returns double). Correct for
    * negative axis values, unlike truncating division.
    */
  private[operators] def fdiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Inner point-in-interval join: rows of `points` × rows of
    * `intervals` where `lo <= point < hi`. Column sets must be
    * disjoint; each qualifying pair appears exactly once (a point
    * lives in one bucket).
    *
    * @param point long axis value of each probe row
    * @param lo,hi long interval bounds, `hi` exclusive; empty
    *              (`hi <= lo`) intervals match nothing
    */
  /** Loud guard: an interval covering more than `maxBuckets` buckets
    * (a mis-sized width against an outlier interval) would explode the
    * sequence toward Spark's array ceiling and take the job down with
    * an opaque error — fail with an actionable one instead. The guard
    * column is consumed by a filter so the optimizer cannot prune the
    * check away.
    */
  private def guarded(df: DataFrame, l: String, h: String, w: Long,
      maxBuckets: Int): DataFrame =
    df.withColumn("__nbkt", fdiv(col(h) - 1, w) - fdiv(col(l), w) + 1)
      .withColumn("__guard", when(col("__nbkt") > maxBuckets,
        raise_error(format_string(
          s"range-join interval spans %s buckets (max $maxBuckets): " +
            "raise bucketWidth or split the interval", col("__nbkt"))))
        .otherwise(lit(0)))
      .filter(col("__guard").isNull || col("__guard") === 0)
      .drop("__nbkt", "__guard")

  private val Reserved = Set("__p", "__lo", "__hi", "__bkt", "__nbkt",
    "__guard", "__loa", "__hia", "__lob", "__hib")

  private def requireNoReserved(frames: DataFrame*): Unit = {
    val clash = frames.flatMap(_.columns).filter(Reserved)
    require(clash.isEmpty,
      s"input columns collide with range-join working names: ${clash.mkString(", ")}")
  }

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column,
      bucketWidth: Long, maxBucketsPerInterval: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireNoReserved(points, intervals)
    val p = points.withColumn("__p", point)
      .withColumn("__bkt", fdiv(col("__p"), bucketWidth))
    val iv = guarded(
        intervals.withColumn("__lo", lo).withColumn("__hi", hi)
          .filter(col("__hi") > col("__lo")),
        "__lo", "__hi", bucketWidth, maxBucketsPerInterval)
      .withColumn("__bkt", explode(sequence(
        fdiv(col("__lo"), bucketWidth), fdiv(col("__hi") - 1, bucketWidth))))
    p.join(iv, "__bkt")
      .filter(col("__p") >= col("__lo") && col("__p") < col("__hi"))
      .drop("__bkt", "__p", "__lo", "__hi")
  }

  /** Inner interval-overlap join: rows of `a` × rows of `b` whose
    * half-open intervals intersect (`loA < hiB && loB < hiA`). Both
    * sides explode into covered buckets; a qualifying pair is emitted
    * only from the bucket containing `max(loA, loB)` — a bucket both
    * sides cover by construction — so each pair appears exactly once
    * with no distinct pass.
    */
  def intervalOverlap(
      a: DataFrame, b: DataFrame,
      loA: Column, hiA: Column, loB: Column, hiB: Column,
      bucketWidth: Long, maxBucketsPerInterval: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireNoReserved(a, b)
    def side(df: DataFrame, lo: Column, hi: Column, l: String, h: String) =
      guarded(
        df.withColumn(l, lo).withColumn(h, hi).filter(col(h) > col(l)),
        l, h, bucketWidth, maxBucketsPerInterval)
        .withColumn("__bkt", explode(sequence(
          fdiv(col(l), bucketWidth), fdiv(col(h) - 1, bucketWidth))))
    val ea = side(a, loA, hiA, "__loa", "__hia")
    val eb = side(b, loB, hiB, "__lob", "__hib")
    ea.join(eb, "__bkt")
      .filter(col("__loa") < col("__hib") && col("__lob") < col("__hia") &&
        col("__bkt") === fdiv(greatest(col("__loa"), col("__lob")), bucketWidth))
      .drop("__bkt", "__loa", "__hia", "__lob", "__hib")
  }
}
