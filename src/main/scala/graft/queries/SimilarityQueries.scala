package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.VectorOps
import graft.operators.Similarity

/** Similarity-search operators over the embeddings table, oracle-checked.
  *
  * Bit-exactness strategy: both engines compute cosine with the
  * identical left-fold association (see VectorOps), so scores are
  * compared as raw doubles — no rounding tolerance anywhere.
  */
object SimilarityQueries extends QueryPack {

  private def oCos(a: String, b: String) = VectorOps.oCosine(a, b)

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_knn_exact",
      "Exact cosine top-5 neighbors for 5 query vectors: broadcast query " +
        "side, rank-filtered window (WindowGroupLimit keeps shuffled bytes " +
        "at O(queries*k)). Retrieval spine of LinkAlign reduction.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.knnExact(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("qid"), col("embedding")),
          "vec_id", "qid", "embedding", 5)
          .select(col("query_id"), col("rank").cast("long").as("rnk"),
            col("neighbor_id"), col("score"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
              |s AS (
              |  SELECT q.qid, e.vec_id AS nid,
              |         ${oCos("e.embedding", "q.qv")} AS score
              |  FROM embeddings e JOIN q ON e.vec_id <> q.qid),
              |r AS (
              |  SELECT qid, nid, score,
              |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
              |  FROM s)
              |SELECT qid AS query_id, rk AS rnk, nid AS neighbor_id, score
              |FROM r WHERE rk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    GQuery(
      "q_hard_negatives",
      "Hard-negative mining for contrastive/embedding training: per " +
        "query, the top-5 most similar corpus vectors whose cosine " +
        "stays BELOW the duplicate threshold (0.8) — the " +
        "near-but-not-duplicate band. Broadcast query side, band " +
        "filter before the rank window.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.hardNegatives(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("qid"), col("embedding")),
          "vec_id", "qid", "embedding", k = 5, dupThreshold = 0.8)
          .select(col("query_id"), col("rank").cast("long").as("rnk"),
            col("neighbor_id"), col("score"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
              |s AS (
              |  SELECT q.qid, e.vec_id AS nid,
              |         ${oCos("e.embedding", "q.qv")} AS score
              |  FROM embeddings e JOIN q ON e.vec_id <> q.qid),
              |b AS (SELECT * FROM s WHERE score < 0.8),
              |r AS (
              |  SELECT qid, nid, score,
              |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
              |  FROM b)
              |SELECT qid AS query_id, rk AS rnk, nid AS neighbor_id, score
              |FROM r WHERE rk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    GQuery(
      "q_knn_label_vote",
      "Few-shot retrieval analog: majority label vote among the top-10 " +
        "cosine neighbors of each of 20 query vectors (deterministic " +
        "tie-break: votes desc, label asc).",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.knnLabelVote(
          emb,
          emb.filter(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("embedding")),
          "vec_id", "qid", "embedding", "label", 10)
          .orderBy(col("query_id"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
              |s AS (
              |  SELECT q.qid, e.vec_id AS nid,
              |         ${oCos("e.embedding", "q.qv")} AS score
              |  FROM embeddings e JOIN q ON e.vec_id <> q.qid),
              |r AS (
              |  SELECT qid, nid, score,
              |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
              |  FROM s),
              |j AS (
              |  SELECT r.qid, e2.label FROM r JOIN embeddings e2 ON r.nid = e2.vec_id
              |  WHERE r.rk <= 10),
              |v AS (
              |  SELECT qid, label, COUNT(*) AS votes FROM j GROUP BY qid, label),
              |p AS (
              |  SELECT qid, label, votes,
              |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rr
              |  FROM v)
              |SELECT qid AS query_id, label AS pred_label, votes
              |FROM p WHERE rr = 1 ORDER BY query_id""".stripMargin)),

    GQuery(
      "q_embed_neardup",
      "Embedding-cosine near-duplicate pairs (threshold 0.35): the exact " +
        "O(n^2) baseline whose output contract the banded-LSH scale path " +
        "reproduces (LshSpec checks recall).",
      (s, dir) =>
        Similarity.nearDupPairsExact(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 0.35)
          .orderBy(col("id1"), col("id2")),
      Some(s"""WITH p AS (
              |  SELECT a.vec_id AS id1, b.vec_id AS id2,
              |         ${oCos("a.embedding", "b.embedding")} AS score
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
              |SELECT id1, id2, score FROM p
              |WHERE score >= 0.35 ORDER BY id1, id2""".stripMargin)),

    GQuery(
      "q_semantic_decontaminate",
      "Embedding-space decontamination (threshold 0.8): corpus rows " +
        "whose cosine to ANY eval vector reaches the threshold are " +
        "dropped — the semantic complement to the 13-gram passes for " +
        "paraphrased benchmark leakage. One broadcast anti-join: the " +
        "corpus never shuffles and each row short-circuits on its " +
        "first hit.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.Decontaminate.semanticDecontaminate(
          emb, emb.filter(col("vec_id") < 10).select(col("embedding")),
          "vec_id", "embedding", 0.8)
          .select(col("vec_id"), col("label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""SELECT e.vec_id, e.label FROM embeddings e
              |WHERE NOT EXISTS (
              |  SELECT 1 FROM embeddings q
              |  WHERE q.vec_id < 10
              |    AND ${oCos("e.embedding", "q.embedding")} >= 0.8)
              |ORDER BY e.vec_id""".stripMargin)),

    GQuery(
      "q_vec_quant",
      "Symmetric int8 vector quantization (the 4x storage cut for " +
        "embedding tables): per-vector scale = max|x|/127, codes = " +
        "floor(x/scale + 0.5) — engine-exact arithmetic, verified via " +
        "an order-weighted code checksum instead of array output.",
      (s, dir) => {
        import graft.functions.VectorQuant._
        Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") < 50)
          .withColumn("scale", quantScale(col("embedding")))
          .select(col("vec_id"), col("scale"),
            codeChecksum(quantize(col("embedding"), col("scale"))).as("code_checksum"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id, embedding,
             |         list_max(list_transform(embedding,
             |           x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
             |  FROM embeddings WHERE vec_id < 50),
             |c AS (
             |  SELECT vec_id, scale,
             |         list_transform(generate_series(1, len(embedding)),
             |           i -> CASE WHEN scale = 0.0 THEN CAST(0 AS BIGINT)
             |                ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5) AS BIGINT)
             |                END * i) AS weighted
             |  FROM q)
             |SELECT vec_id, scale,
             |       list_reduce(list_prepend(CAST(0 AS BIGINT), weighted),
             |                   (a, x) -> a + x) AS code_checksum
             |FROM c ORDER BY vec_id""".stripMargin))
  )
}
