package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-token-window duplicate removal at document granularity (the
  * corpus-internal counterpart of [[Decontaminate]], after Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better"):
  * a document is dropped when it shares ANY exact n-token window with
  * a lower-id document. First-writer-wins is the streaming-friendly
  * greedy policy — transitive chains (A~B on one window, B~C on
  * another) collapse toward the earliest id without an iterative
  * connected-components pass, and the rule is deterministic on any
  * engine.
  *
  * Scale shape: everything is linear in the shingle count. Windows
  * reduce to distinct 8-byte hashes at scan time (codegen'd rolling
  * hash, no window string materialized); the per-window minimum id is
  * a partial-aggregating groupBy on the hash; duplicate detection is
  * an equi-join back on the hash (skew-safe: a boilerplate window
  * shared by millions of docs contributes ONE row on the build side —
  * the min — not a pairwise blowup); survivors are a left-anti join on
  * the id. No document pair is ever joined.
  */
object WindowDedup {

  /** Distinct `(idCol, __h)` window hashes per document. */
  private def windowHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    TextDedup.withShingleHashes(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
      .distinct()

  /** Ids of documents sharing at least one n-token window with a
    * lower-id document.
    */
  def duplicateIds(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val hashes = windowHashes(docs, idCol, textCol, n)
    val firstPerWindow = hashes.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__first"))
    hashes.join(firstPerWindow, "__h")
      .filter(col("__first") < col(idCol))
      .select(col(idCol)).distinct()
  }

  /** The corpus minus window-duplicates (keeps each window's earliest
    * document). `n` = 50 is the published exact-substring scale; pass
    * a smaller n for short-document corpora.
    */
  def dropWindowDuplicates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 50): DataFrame =
    docs.join(duplicateIds(docs, idCol, textCol, n), Seq(idCol), "left_anti")
}
