package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus snapshot diff — the change audit run between two pipeline
  * generations before shipping a refreshed training set: every
  * document is classified `added` / `removed` / `changed` /
  * `unchanged` by id presence and content fingerprint. One full-outer
  * equi-join on the id plus per-row codegen'd fingerprints — no text
  * ever shuffles (only 8-byte fingerprints), so diffing two 100 TB
  * snapshots moves two id+hash columns, not the corpora.
  */
object CorpusDiff {

  /** Per-document status: `(idCol, status)` over the union of ids.
    * Presence is tracked with explicit per-side flags — a null-text
    * document has a null fingerprint, and inferring presence from
    * fingerprint nullness would misclassify it; null fingerprints
    * compare null-safely, so two null-text snapshots are `unchanged`.
    */
  def diff(before: DataFrame, after: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, out: String, here: String) = df.select(
      col(idCol), TextAnalysis.fingerprint(col(textCol)).as(out),
      lit(true).as(here))
    fp(before, "__fa", "__inA")
      .join(fp(after, "__fb", "__inB"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__inA").isNull, lit("added"))
          .when(col("__inB").isNull, lit("removed"))
          .when(col("__fa") <=> col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Aggregate form: one row per status with counts and id extrema —
    * the four numbers a pipeline dashboard actually plots.
    */
  def diffSummary(before: DataFrame, after: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diff(before, after, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
}
