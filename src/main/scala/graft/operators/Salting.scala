package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's
  * skew-join splitting isn't available (first-stage aggregations,
  * deliberate pre-partitioning). Salt derivation is hash-based
  * (xxhash64 of the whole row's key + a disambiguator column), so
  * results are deterministic and repartition-invariant like every other
  * operator here.
  */
object Salting {

  /** Two-stage aggregation for skewed group keys: stage 1 aggregates
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * stage 2 combines the partials per key. `aggs` must be an algebraic
    * (re-aggregable) set: sums/counts/mins/maxes.
    */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int, disambiguator: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(disambiguator)), lit(saltBuckets.toLong)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("__s"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }

  /** Salted equi-join for a skewed fact side: the fact key gains a
    * hash-derived salt in [0, saltBuckets); the (small) dimension side
    * is replicated across every salt value, so each hot fact key spreads
    * over `saltBuckets` tasks instead of one straggler.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, disambiguator: String): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(disambiguator)), lit(saltBuckets.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
