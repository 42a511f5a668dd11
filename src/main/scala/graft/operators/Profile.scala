package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling at two fidelities (the OpenSearch DB_AGENT
  * full-table profile, `OpenSearchSQLGenerate.py:284-332`, re-done as
  * single-pass aggregations):
  *
  *  - `exactProfile`: null/distinct/row counts (oracle `q_profile_scan`
  *    semantics) — COUNT(DISTINCT) shuffles per column; right for
  *    dimension tables.
  *  - `approxProfile`: HyperLogLog++ distinct estimates and t-digest
  *    quantiles in ONE pass with NO distinct shuffle — the 100 TB
  *    profile: accuracy is configurable (rsd / quantile error), cost
  *    stays a single scan regardless of cardinality. Spec-verified
  *    against exact values within the declared error bounds (approx
  *    sketches are engine-specific, so no cross-engine oracle).
  */
object Profile {

  def exactProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"distinct_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def approxProfile(df: DataFrame, cols: Seq[String],
      numericCols: Seq[String] = Nil, rsd: Double = 0.02,
      quantileAccuracy: Int = 1000): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap { c =>
        Seq(
          sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
          approx_count_distinct(col(c), rsd).as(s"distinct_$c"))
      } ++
      numericCols.map { c =>
        // cast first: percentile_approx preserves the input type, and a
        // stable array<double> output shape beats int-vs-long surprises
        percentile_approx(col(c).cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(quantileAccuracy))
          .as(s"quartiles_$c")
      }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
