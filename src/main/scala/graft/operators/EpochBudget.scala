package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-constrained epoch budgeting (Muennighoff et al. 2023: repeating
  * data beats nothing up to ~4 epochs): when a source's token budget
  * EXCEEDS its corpus, the mixer must repeat it — this operator plans
  * and emits the repetition. Per source:
  *
  *  - `full_epochs = min(budget div corpus_tokens, maxEpochs)` complete
  *    passes — every document repeats that many times;
  *  - one PARTIAL epoch consumes the remaining budget in the
  *    deterministic hash order shared with [[RowOps.tokenBudgetSample]]
  *    (admission while the per-source running total fits), unless the
  *    epoch cap already absorbed the budget.
  *
  * Scale shape: the plan is one map-side-combinable groupBy (one row
  * per source — broadcast-joined back); the emitted corpus is a
  * broadcast join + `explode(sequence(...))` (no shuffle beyond the
  * plan aggregate) plus the partial epoch's two-pass range-partitioned
  * cumsum — no windows over a whole source on one reducer anywhere.
  */
object EpochBudget {

  /** Per-source plan: (srcCol, corpus_tokens, budget, full_epochs,
    * remainder).
    */
  def plan(docs: DataFrame, srcCol: String, tokCol: String,
      defaultBudget: Long, overrides: Map[String, Long],
      maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs $maxEpochs")
    val budget = overrides.foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col(srcCol) === src, lit(b)).otherwise(acc)
    }
    docs
      .groupBy(col(srcCol))
      .agg(sum(coalesce(col(tokCol).cast("long"), lit(0L))).as("corpus_tokens"))
      .withColumn("budget", budget)
      // Guard the division: an empty source (corpus_tokens = 0) must get
      // 0 full epochs deterministically — unguarded `DIV` yields NULL in
      // non-ANSI mode (and least() would skip it, silently promoting the
      // source to maxEpochs) and throws under ANSI mode.
      .withColumn("full_epochs",
        least(
          when(col("corpus_tokens") > 0, expr("budget DIV corpus_tokens"))
            .otherwise(lit(0L)),
          lit(maxEpochs.toLong)))
      .withColumn("remainder",
        when(col("full_epochs") < maxEpochs,
          col("budget") - col("full_epochs") * col("corpus_tokens"))
          .otherwise(lit(0L)))
  }

  /** The repeated corpus: one row per (document, epoch) — epochs
    * 0..full_epochs-1 complete, epoch = full_epochs partial
    * (hash-order admission against the remainder). Input columns are
    * preserved; `epoch` is appended.
    */
  def epochedCorpus(docs: DataFrame, srcCol: String, tokCol: String,
      defaultBudget: Long, overrides: Map[String, Long] = Map.empty,
      maxEpochs: Int = 4, idCol: String = "doc_id"): DataFrame = {
    val p = plan(docs, srcCol, tokCol, defaultBudget, overrides, maxEpochs)
    // one row per source — driver-bounded by construction
    val rows = p.select(col(srcCol).cast("string"), col("full_epochs"),
      col("remainder")).collect()
    val fullMap = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val remMap = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val pFull = p.select(col(srcCol), col("full_epochs"))
    val full = docs
      .join(broadcast(pFull), srcCol)
      .filter(col("full_epochs") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("full_epochs") - 1)))
      .drop("full_epochs")
    val partial = RowOps
      .tokenBudgetSample(docs, srcCol, tokCol, defaultBudget = 0L,
        overrides = remMap, idCol = idCol)
      .withColumn("epoch", fullMap.foldLeft(lit(0L)) {
        case (acc, (src, fe)) =>
          when(col(srcCol) === src, lit(fe)).otherwise(acc)
      })
    full.unionByName(partial)
  }
}
