package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: drop every training
  * document sharing at least one word n-gram with a held-out
  * evaluation set — the standard n-gram-overlap decontamination step
  * between corpus curation and training.
  *
  * Shape: both sides reduce to distinct shingle hashes (scan-time,
  * codegen'd); contaminated ids come from an equi-join on the 8-byte
  * hash (shuffle keyed on hash, never on documents); survivors are a
  * left-anti join. Eval sets are small, so their shingle table
  * broadcasts; corpus cost is one scan + one anti-join.
  */
object Decontaminate {

  /** Training docs that share an n-gram with the eval set. */
  def contaminatedIds(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = TextDedup.withShingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
    val evalShingles = TextDedup.withShingleHashes(evalSet, idCol, textCol, n)
      .select(explode(col("__shh")).as("__h")).distinct()
    corpusShingles
      .join(broadcast(evalShingles), "__h")
      .select(col(idCol)).distinct()
  }

  /** Contamination audit: per EVAL item, how many corpus documents
    * share at least one n-gram and how many distinct n-grams leak —
    * the report a benchmark owner reads before trusting scores. One
    * row per contaminated eval id: `(idCol, n_corpus_docs,
    * n_shared_ngrams)`. Same join shape as [[contaminatedIds]] with
    * the eval id carried through.
    */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = TextDedup.withShingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("__cid"), explode(col("__shh")).as("__h"))
    val evalShingles = TextDedup.withShingleHashes(evalSet, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
    evalShingles
      .join(corpusShingles, "__h")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__cid")).as("n_corpus_docs"),
        countDistinct(col("__h")).as("n_shared_ngrams"))
  }

  /** The corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    corpus.join(
      contaminatedIds(corpus, evalSet, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
