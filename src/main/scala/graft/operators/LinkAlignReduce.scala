package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LinkAlign schema-reduction loop
  * (`core/actor/reducer/LinkAlignReduce.py:23-367`) composed from the
  * engine's distributed primitives:
  *
  *   multi-round embedding retrieval (top-k & rounds scheduled by
  *   db_size, seen-key exclusion between rounds)
  *     → per-turn exponential retention decay (turns whose rate falls
  *       ≤ 0.1 are dropped entirely, as the reference does)
  *     → dedup by (table, column) with deterministic survivor
  *     → anti-filter of flagged-irrelevant pairs (the LLM "response
  *       filtering" hook — flags come from the caller/LlmClient)
  *
  * Small databases (≤ `bypassSize` columns) bypass reduction untouched
  * (`LinkAlignReduce.py:257-269`).
  */
object LinkAlignReduce {

  /** Retrieval budget auto-schedule (`load_retrieval_top_k`). */
  def topKFor(dbSize: Int): Int =
    if (dbSize <= 200) 40
    else if (dbSize <= 400) 50
    else if (dbSize <= 1000) 60
    else if (dbSize <= 2500) 70
    else 80

  /** Round auto-schedule (`load_retrieval_turn_n`). */
  def turnsFor(dbSize: Int): Int =
    if (dbSize <= 200) 2
    else if (dbSize <= 350) 3
    else if (dbSize <= 1000) 6
    else if (dbSize <= 2500) 8
    else 10

  /** Full reduction. `schema` carries one row per column:
    * (idCol long, table_name, column_name, vecCol array<float>).
    * Returns the retained schema rows tagged with `turn_n`.
    */
  def reduce(schema: DataFrame, queryVec: Seq[Double], dbSize: Int,
      idCol: String = "col_id", vecCol: String = "embedding",
      initRetainRate: Double = 1.0, decayRate: Double = 0.8,
      flagged: Option[DataFrame] = None, bypassSize: Int = 80,
      seed: Long = 42L): DataFrame = {

    if (dbSize <= bypassSize)
      return schema.withColumn("turn_n", lit(0))

    val k = topKFor(dbSize)
    val turns = turnsFor(dbSize)
    val retrieved = Similarity.iterativeRetrieve(
      schema.select(col(idCol), col(vecCol)), queryVec, idCol, vecCol, k, turns)
      .select(col(idCol), (col("round_n") - 1).as("turn_n"))

    val tagged = schema.join(retrieved, idCol)

    // retention decay with the reference's hard floor: a turn whose
    // rate ≤ 0.1 is removed wholesale, others sample deterministically
    val rateFloorOk = lit(initRetainRate) *
      pow(lit(decayRate), col("turn_n").cast("double")) > 0.1
    val decayed = RowOps.retainDecay(
      tagged.filter(rateFloorOk), "turn_n", initRetainRate, decayRate,
      keyCols = Seq(idCol), seed = seed)

    val deduped = RowOps.dedupBy(decayed,
      Seq("table_name", "column_name"), idCol)

    flagged match {
      case Some(f) => RowOps.antiFilter(deduped, f, Seq("table_name", "column_name"))
      case None => deduped
    }
  }
}
