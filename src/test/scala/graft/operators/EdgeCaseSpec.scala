package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Degenerate-input contracts: operators must return empty/identity
  * results, not throw, when fed empty frames, out-of-range k, or
  * filters that match nothing.
  */
class EdgeCaseSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("CorpusClean with a language nothing matches returns empty, not an error") {
    assert(CorpusClean.clean(docs, Seq("xx"), 100, 0.5).count() == 0)
  }

  test("knnExact with k larger than the corpus returns everything ranked") {
    val tiny = emb.filter(col("vec_id") < 4)
    val out = Similarity.knnExact(
      tiny, tiny.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding")),
      "vec_id", "qid", "embedding", k = 100)
    assert(out.count() == 3) // corpus minus the self-match
    assert(out.select(max(col("rank"))).head().getInt(0) == 3)
  }

  test("SeqPack on an empty frame yields an empty result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(SeqPack.packByBudget(empty, "id", "w", 512L).count() == 0)
  }

  test("stratifiedSample with empty fractions drops every row") {
    assert(RowOps.stratifiedSample(docs, "lang", Map.empty, "doc_id").count() == 0)
  }

  test("jaccardPairsExact above any achievable threshold returns no pairs") {
    assert(TextDedup.jaccardPairsExact(
      docs.filter(col("doc_id") < 30), "doc_id", "text", threshold = 1.01).count() == 0)
  }
}
