package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group discrete-quantile gating: compute `percentile_disc`
  * bounds of a value column within each group and keep only rows
  * inside [lo, hi] — the distribution-aware outlier trim curation
  * pipelines use where a fixed threshold would mis-fit heterogeneous
  * sources (a p95 length cap means something different for tweets vs
  * books).
  *
  * `percentile_disc` (ANSI: smallest element with cume_dist >= p)
  * returns an actual element of the group, so the bounds — and hence
  * the kept row set — are exact and engine-portable; no interpolated
  * double ever crosses an engine boundary. Scale shape: the bounds
  * frame is one row per group (broadcast join back); the quantile
  * itself is Spark's sort-based aggregate over each group — the
  * unavoidable cost of an EXACT quantile, paid on the small per-group
  * bounds pass, not on the filter.
  */
object QuantileGate {

  /** Rows of `df` whose `valueCol` lies within the group's
    * [pLo, pHi] discrete quantiles (bounds inclusive — they are real
    * group elements). The bounds join back null-safely: rows whose
    * group key is null form their own group and are gated like any
    * other — a plain equi-join would silently DROP them, which a
    * filter operator must never do.
    */
  def gate(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0, "need 0 <= pLo <= pHi <= 1")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(
        expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY $valueCol)").as("__lo"),
        expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY $valueCol)").as("__hi"))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("__lo"), col("__hi")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(bounds), cond)
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .drop(groupCols.map(c => s"__g_$c") ++ Seq("__lo", "__hi"): _*)
  }
}
