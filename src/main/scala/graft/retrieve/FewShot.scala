package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.LlmClient
import graft.operators.Similarity

/** Few-shot exemplar retrieval + LLM-assisted retrieval modes
  * (reference `core/data_manage.py:1209-1298`,
  * `core/LinkAlign/SchemaLinkingTool.py:118-137, 225+, 524-548`).
  * Exemplar ranking is pure Spark (cosine top-k); the LLM only rewrites
  * query text or adjudicates debates, always driver-side.
  */
object FewShot {

  /** Top-k exemplars per query by embedding cosine, concatenated in rank
    * order into one few-shot context string per query (the reference's
    * per-question `reasoning_examples` file).
    *
    * `excludeSelf` (default true, the pinned oracle semantics) drops an
    * exemplar whose id equals the query id — correct when questions ARE
    * exemplars (leave-one-out retrieval); pass false when the exemplar
    * store and the question set use unrelated id spaces, or an id
    * collision silently loses the best exemplar.
    */
  def retrieve(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", queryIdCol: String = "qid",
      vecCol: String = "embedding", textCol: String = "text",
      excludeSelf: Boolean = true): DataFrame = {
    val ranked = Similarity.knnExact(
      corpus.select(col(idCol), col(vecCol)), queries, idCol, queryIdCol,
      vecCol, k, excludeSelf)
      .join(corpus.select(col(idCol).as("neighbor_id"), col(textCol).as("__t")),
        "neighbor_id")
    ranked
      .groupBy(col("query_id"))
      .agg(concat_ws("\n\n",
        transform(array_sort(collect_list(struct(col("rank"), col("__t")))),
          s => s.getField("__t"))).as("few_shot_context"))
  }

  /** LLM query rewriting with retrieved context
    * (`SchemaLinkingTool.query_rewriting`): driver-side, pluggable.
    */
  def rewriteQuery(llm: LlmClient, question: String, context: Seq[String]): String = {
    val out = llm.complete(
      s"Rewrite this retrieval query given the context.\n" +
        s"Context:\n${context.mkString("\n")}\nQuery: $question")
    if (out.trim.isEmpty) question else out.trim
  }

  /** Multi-agent debate retrieval adjudication
    * (`SchemaLinkingTool` debate variant): N proposer replies, one
    * judge pick; falls back to the first proposal.
    */
  def debatePick(llm: LlmClient, question: String, proposals: Seq[String]): String = {
    if (proposals.isEmpty) return ""
    val verdict = llm.complete(
      s"Question: $question\nProposals:\n" +
        proposals.zipWithIndex.map { case (p, i) => s"$i: $p" }.mkString("\n") +
        "\nReply with the index of the best proposal.")
    verdict.trim.takeWhile(_.isDigit).toIntOption match {
      case Some(d) if d < proposals.length => proposals(d)
      case _ => proposals.head
    }
  }

  /** External-knowledge summarization (`core/LinkAlign/tools/external.py`
    * wiring): driver-side LLM summary of per-instance documents.
    */
  def summarizeExternal(llm: LlmClient, doc: String, maxChars: Int = 4000): String =
    llm.complete(s"Summarize for SQL generation:\n${doc.take(maxChars)}").trim

  /** Mode dispatch (`retrieve_complete_selector` / `locate_selector` /
    * `generate_selector`, `SchemaLinkingTool.py:524-548`).
    */
  def modeSelector[A](mode: String, pipeline: => A, agent: => A): A =
    mode.toLowerCase match {
      case "agent" => agent
      case _ => pipeline
    }
}
