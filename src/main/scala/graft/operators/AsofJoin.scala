package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: every probe row is matched to the single
  * nearest build row sharing its key — the most recent at-or-before
  * (`backward`, the default), the earliest at-or-after (`forward`), or
  * whichever of the two is closer (`nearest`) — optionally strict
  * (exact-time matches excluded) and optionally only within a
  * tolerance window. This is pandas `merge_asof` re-expressed for a
  * cluster, the feature-attribution join every event pipeline needs
  * ("the last purchase before this click", "the next error after this
  * deploy") that a plain equi-join cannot express and a naive range
  * join turns into a top-1-per-pair blowup.
  *
  * Implementation is the union-and-ordered-window form rather than a
  * join: build and probe rows are tagged and unioned, shuffled ONCE on
  * the key, and sorted so a running `last(match-struct, ignoreNulls)`
  * carries the nearest build row onto each probe row (ascending time
  * for backward, descending for forward; `nearest` evaluates both
  * orderings over the SAME exchange and picks the closer). The whole
  * build row travels as ONE struct, so every carried field comes from
  * the same matched row even when individual payload values are null.
  * No build-probe pair is ever materialized — cost is one shuffle plus
  * a linear merge per key timeline, the shape a 1000-executor cluster
  * wants, with no equality-key fallback to a broadcast-nested-loop.
  * Probe rows matched to nothing survive with null payload —
  * left-outer semantics, output row count always equals the probe side.
  *
  * Contract: the build side must be unique per (key, time) — ties at
  * identical (key, time) have no deterministic "nearest" on any engine
  * (DuckDB's ASOF JOIN documents the same caveat); pre-aggregate the
  * build side when the source can collide. `nearest` ties at equal
  * distance resolve backward (the earlier build row), and requires
  * timestamp-typed time columns. Null build keys/times never match
  * anything and are dropped from the build side up front.
  */
object AsofJoin {

  /** As-of join `probe` to `build`.
    *
    * @param keyCols      equality key columns present on both sides
    * @param probeTsCol   probe-side event-time column
    * @param buildTsCol   build-side event-time column
    * @param payloadCols  build-side columns carried onto matches (must
    *                     not collide with probe column names)
    * @param matchedTsCol output column holding the matched build time
    *                     (null when unmatched)
    * @param strict       exclude equal-time build rows
    * @param tolerance    when set, a match further than this interval
    *                     from the probe time is discarded (nulls out,
    *                     probe row kept) — e.g. `expr("INTERVAL 1 HOUR")`
    * @param direction    "backward" (default), "forward", or "nearest"
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      strict: Boolean = false,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction '$direction'")
    val probeCols = probe.columns.toSeq
    require(!(payloadCols :+ matchedTsCol).exists(probeCols.contains),
      "build payload / matched-time names must not collide with probe columns")

    // At equal times the sort tag decides visibility: non-strict sorts
    // the build row toward the probe (probe sees it), strict sorts it
    // away. The same tag works for both time orderings.
    val buildTag = if (strict) 1 else 0
    val probeTag = 1 - buildTag
    // probe columns other than the key and the time, carried untouched
    val passCols = probeCols.filterNot(c => keyCols.contains(c) || c == probeTsCol)

    val buildSide = build
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          col(buildTsCol).as("__t"),
          lit(buildTag).as("__tag"),
          struct((col(buildTsCol).as(matchedTsCol) +:
            payloadCols.map(col)): _*).as("__b")) ++
          passCols.map(c => lit(null).as(c)): _*)
    val probeSide = probe
      .select(
        keyCols.map(col) ++ Seq(
          col(probeTsCol).as("__t"),
          lit(probeTag).as("__tag"),
          lit(null).cast(buildSide.schema("__b").dataType).as("__b")) ++
          passCols.map(col): _*)

    def carryWindow(asc: Boolean) = {
      val order =
        if (asc) Seq(col("__t").asc, col("__tag").asc)
        else Seq(col("__t").desc, col("__tag").asc)
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def within(m: Column, tol: Column): Column = direction match {
      // nearest checks both sides; backward/forward each one
      case _ => (m(matchedTsCol) >= col("__t") - tol) &&
        (m(matchedTsCol) <= col("__t") + tol)
    }
    def bound(m: Column): Column = tolerance match {
      case None      => m
      case Some(tol) => when(within(m, tol), m)
    }

    val unioned = buildSide.unionByName(probeSide)
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__b",
          bound(last(col("__b"), ignoreNulls = true).over(carryWindow(asc = true))))
      case "forward" =>
        unioned.withColumn("__b",
          bound(last(col("__b"), ignoreNulls = true).over(carryWindow(asc = false))))
      case "nearest" =>
        // both carries share the partitioning: ONE exchange, two sorts
        val bb = bound(last(col("__b"), ignoreNulls = true).over(carryWindow(asc = true)))
        val fb = bound(last(col("__b"), ignoreNulls = true).over(carryWindow(asc = false)))
        val dist = (m: Column) =>
          abs(unix_micros(m(matchedTsCol)) - unix_micros(col("__t")))
        unioned
          .withColumn("__bb", bb).withColumn("__fb", fb)
          .withColumn("__b",
            when(col("__bb").isNull, col("__fb"))
              .when(col("__fb").isNull, col("__bb"))
              // ties at equal distance resolve backward
              .when(dist(col("__bb")) <= dist(col("__fb")), col("__bb"))
              .otherwise(col("__fb")))
          .drop("__bb", "__fb")
    }

    carried.filter(col("__tag") === probeTag)
      .select(
        (probeCols.map(c =>
          if (c == probeTsCol) col("__t").as(probeTsCol) else col(c)) ++
          (matchedTsCol +: payloadCols).map(c => col("__b")(c).as(c))): _*)
  }

  /** [[asofJoin]] for HOT keys: identical semantics, but each key's
    * timeline is split into fixed time buckets so the sort-and-carry
    * parallelizes WITHIN a key. The plain form puts one key's whole
    * timeline on one task — correct, but a key with billions of events
    * (a monitoring firehose, a bot user) becomes a straggler no
    * cluster size fixes. Here the window partitions on (key, bucket);
    * the cross-bucket carry-in is recovered from a per-(key, bucket)
    * LAST-BUILD table — one row per bucket regardless of how many
    * events the bucket holds, so the per-key serial work collapses
    * from #events to #buckets and the carry-in window over that table
    * is over a frame thousands of times smaller than the data.
    *
    * Choose `bucketMicros` ≈ the horizon you'd tolerate one task
    * sorting: a day for a month-scale stream, an hour for a firehose.
    * Directions: backward/forward (compose both for nearest). Payload
    * types must be orderable (the per-bucket edge rides a struct
    * min/max) — no maps; the plain form has no such constraint.
    */
  def asofJoinBucketed(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      payloadCols: Seq[String],
      bucketMicros: Long,
      matchedTsCol: String = "matched_ts",
      strict: Boolean = false,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(Seq("backward", "forward").contains(direction),
      s"bucketed as-of supports backward/forward, got '$direction'")
    val probeCols = probe.columns.toSeq
    require(!(payloadCols :+ matchedTsCol).exists(probeCols.contains),
      "build payload / matched-time names must not collide with probe columns")

    val backward = direction == "backward"
    val buildTag = if (strict) 1 else 0
    val probeTag = 1 - buildTag
    val passCols = probeCols.filterNot(c => keyCols.contains(c) || c == probeTsCol)
    def bucketOf(ts: Column): Column =
      RangeJoin.fdiv(unix_micros(ts), bucketMicros)

    val buildSide = build
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          col(buildTsCol).as("__t"),
          bucketOf(col(buildTsCol)).as("__bkt"),
          lit(buildTag).as("__tag"),
          struct((col(buildTsCol).as(matchedTsCol) +:
            payloadCols.map(col)): _*).as("__b")) ++
          passCols.map(c => lit(null).as(c)): _*)
    val probeSide = probe
      .select(
        keyCols.map(col) ++ Seq(
          col(probeTsCol).as("__t"),
          bucketOf(col(probeTsCol)).as("__bkt"),
          lit(probeTag).as("__tag"),
          lit(null).cast(buildSide.schema("__b").dataType).as("__b")) ++
          passCols.map(col): _*)

    // one row per (key, bucket): the bucket's nearest-to-the-boundary
    // build row — a map-side-combinable aggregate, never a sort
    val perBucket = buildSide
      .groupBy((keyCols :+ "__bkt").map(col): _*)
      .agg((if (backward) max(struct(col("__t"), col("__b")))
            else min(struct(col("__t"), col("__b")))).as("__edge"))
    // cumulative carry across buckets per key, over the SPINE of every
    // (key, bucket) either side touches — a probe-only bucket (quiet
    // period) still needs the carry from earlier builds. The frame has
    // ONE row per (key, touched bucket): the hot key that motivated
    // the bucketing contributes #buckets rows here, not #events
    val spine = buildSide.select((keyCols :+ "__bkt").map(col): _*)
      .unionByName(probeSide.select((keyCols :+ "__bkt").map(col): _*))
      .distinct()
    val carryW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(if (backward) col("__bkt").asc else col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = spine
      .join(perBucket, (keyCols :+ "__bkt").toSeq, "left")
      .select(
        (keyCols.map(col) :+ col("__bkt") :+
          last(col("__edge")("__b"), ignoreNulls = true).over(carryW).as("__cin")): _*)

    val w = Window.partitionBy((keyCols :+ "__bkt").map(col): _*)
      .orderBy(
        (if (backward) Seq(col("__t").asc, col("__tag").asc)
         else Seq(col("__t").desc, col("__tag").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildSide.unionByName(probeSide)
      .withColumn("__local", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__tag") === probeTag)
      .join(carryIn, (keyCols :+ "__bkt").toSeq, "left")
      .withColumn("__b", coalesce(col("__local"), col("__cin")))

    val bounded = tolerance match {
      case None => carried
      case Some(tol) => carried.withColumn("__b",
        when(col("__b")(matchedTsCol) >= col("__t") - tol &&
          col("__b")(matchedTsCol) <= col("__t") + tol, col("__b")))
    }

    bounded.select(
      (probeCols.map(c =>
        if (c == probeTsCol) col("__t").as(probeTsCol) else col(c)) ++
        (matchedTsCol +: payloadCols).map(c => col("__b")(c).as(c))): _*)
  }
}
