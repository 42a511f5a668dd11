package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: every probe row is matched to the single
  * most recent build row sharing its key whose time is at-or-before
  * (`strict = false`) or strictly-before (`strict = true`) the probe
  * time, optionally only when the match lies within a tolerance window.
  * This is the feature-attribution join every event pipeline needs
  * ("the last purchase before this click", "the model version live
  * when this request arrived") that a plain equi-join cannot express
  * and a naive range join turns into a top-1-per-pair blowup.
  *
  * Implementation is the union-and-ordered-window form rather than a
  * join: build and probe rows are tagged and unioned, shuffled ONCE on
  * the key, and sorted by (time, tag) so a running `last(match-struct,
  * ignoreNulls)` carries the latest build row forward onto each probe
  * row. The whole build row travels as ONE struct, so every carried
  * field comes from the same matched row even when individual payload
  * values are null. No build-probe pair is ever materialized — cost is
  * one shuffle plus a linear merge per key timeline, the shape a
  * 1000-executor cluster wants, with no equality-key fallback to a
  * broadcast-nested-loop. Probe rows matched to nothing (no earlier
  * build row, or outside tolerance) survive with null payload —
  * left-outer semantics, output row count always equals the probe side.
  *
  * Contract: the build side must be unique per (key, time) — ties at
  * identical (key, time) have no deterministic "latest" on any engine
  * (DuckDB's ASOF JOIN documents the same caveat); pre-aggregate the
  * build side when the source can collide. Null build keys/times never
  * match anything and are dropped from the build side up front.
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
    * @param strict       require build time strictly before probe time
    * @param tolerance    when set, a match further than this interval
    *                     before the probe time is discarded (nulls out,
    *                     probe row kept) — e.g. `expr("INTERVAL 1 HOUR")`
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
      tolerance: Option[Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val probeCols = probe.columns.toSeq
    require(!(payloadCols :+ matchedTsCol).exists(probeCols.contains),
      "build payload / matched-time names must not collide with probe columns")

    // At equal times the sort tag decides visibility: non-strict puts the
    // build row first (probe sees it), strict puts it after every probe.
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

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildSide.unionByName(probeSide)
      .withColumn("__b", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__tag") === probeTag)

    // Tolerance: the carried match may be too old — null the whole match
    // struct but keep the probe row (left-outer semantics preserved).
    val bounded = tolerance match {
      case None => carried
      case Some(tol) => carried.withColumn("__b",
        when(col("__b")(matchedTsCol) >= col("__t") - tol, col("__b")))
    }

    bounded.select(
      (probeCols.map(c =>
        if (c == probeTsCol) col("__t").as(probeTsCol) else col(c)) ++
        (matchedTsCol +: payloadCols).map(c => col("__b")(c).as(c))): _*)
  }
}
