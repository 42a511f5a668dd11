package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Fixed-token document chunking with overlap — the preprocessing step
  * embedding/retrieval corpora need BEFORE packing: long documents
  * split into `chunkTokens`-token windows advancing by
  * `chunkTokens - overlap`, so consecutive chunks share `overlap`
  * tokens and no boundary sentence is ever seen by zero chunks.
  * (Sequence packing — [[SeqPack]] — solves the opposite problem:
  * concatenating SHORT documents up to a budget.)
  *
  * Pure codegen'd array expressions: tokenize once, slice per chunk,
  * rejoin — one scan, no shuffle, no UDF; chunk fan-out is
  * ⌈(n-overlap)/step⌉ rows per doc. Chunk text is reconstructed from
  * tokens (single-space joined), which is exactly what a tokenizer
  * downstream consumes; the original byte-level whitespace is not
  * preserved.
  */
object ChunkSplit {

  /** One row per chunk: `(idCol, chunk_idx, chunk_text,
    * n_chunk_tokens)` — exactly `max(1, ceil((n-overlap)/step))`
    * chunks per document with n tokens. Token-less documents yield no
    * rows. The final chunk may be shorter than `chunkTokens`; a chunk
    * whose tokens are all inside its predecessor's overlap (zero NEW
    * tokens) is never emitted.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > overlap >= 0")
    val step = chunkTokens - overlap
    // chunks start at 0, step, 2*step, ...; the last chunk must bring
    // at least one token past the previous chunk's overlap
    val nChunks = greatest(
      ceil((col("__n") - overlap).cast("double") / step).cast("int"), lit(1))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0), greatest(nChunks - 1, lit(0)))).as("chunk_idx"))
      .filter(col("chunk_idx") * step < col("__n"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__tk"), col("chunk_idx") * step + 1, lit(chunkTokens)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__c"), " ").as("chunk_text"),
        size(col("__c")).cast("long").as("n_chunk_tokens"))
  }
}
