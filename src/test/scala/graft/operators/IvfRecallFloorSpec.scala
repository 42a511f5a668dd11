package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Recall floor for the IVF ANN defaults: a quantizer or probe-config
  * change that lands bench recall@5 below 0.80 must fail HERE, not
  * surface as a silently smaller recall_at_k in the bench JSON.
  * (Round 15: floor raised 0.75 → 0.80 now that all five paths
  * measure >= 0.84 at the nprobe=5 defaults, and the PQ re-rank path
  * pinned separately at 0.90 — it measures 0.92 and a regression in
  * the exact re-scoring stage should not hide under the looser
  * shortlist floor.)
  *
  * Runs at sf0.1 — the scale the bench reports recall_at_k at — with
  * the bench's own sets (queries = the q_ivf_* probe set, truth =
  * q_knn_exact's query ids): measured recall is 0.84 for BOTH
  * quantizers at the nprobe=5 default (q_ivf_ann, the materialized
  * q_ivf_indexed and q_ivf_kmeans_ann all share the 5-of-16 probe
  * fraction — on these near-uniform synthetic embeddings recall is
  * governed by probe fraction alone, 4/16 measured 0.76/0.68
  * systematic/k-means; at sf0.01 the same configs measure ~0.64,
  * which is why the floor is pinned at the bench's scale, not the
  * unit-test fixture's).
  */
class IvfRecallFloorSpec extends SparkSpec {

  private val Floor = 0.80
  // exact re-rank re-scores the shortlist with true cosines — it must
  // hold a tighter floor than the ADC-ranked paths
  private val RerankFloor = 0.90
  private lazy val dir = "/root/testdata/sf0.1"

  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val corpus = emb.select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding"))

  private lazy val exactTop: Map[Long, Set[Long]] =
    Similarity.knnExact(corpus,
      emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding")),
      "vec_id", "qid", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
    val top = ann.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val qs = exactTop.keySet.toSeq
    qs.map(q => (exactTop(q) & top.getOrElse(q, Set.empty)).size.toDouble /
      exactTop(q).size).sum / qs.size
  }

  test(s"systematic quantizer (q_ivf_ann / q_ivf_indexed config) holds recall >= $Floor") {
    val cents = IvfIndex.centroids(corpus, "vec_id", "embedding", 16)
    val r = recallOf(IvfIndex.searchIvf(corpus, queries, "vec_id", "qid",
      "embedding", k = 5, nlist = 16, nprobe = 5, centroidsOpt = Some(cents)))
    assert(r >= Floor, f"systematic IVF recall@5 $r%.3f fell below the $Floor floor")
  }

  test(s"k-means quantizer (q_ivf_kmeans_ann config) holds recall >= $Floor") {
    val cents = IvfIndex.kmeansCentroids(corpus, "vec_id", "embedding",
      nlist = 16, iters = 2)
    val r = recallOf(IvfIndex.searchIvf(corpus, queries, "vec_id", "qid",
      "embedding", k = 5, nlist = 16, nprobe = 5, centroidsOpt = Some(cents)))
    assert(r >= Floor, f"k-means IVF recall@5 $r%.3f fell below the $Floor floor")
  }

  // PQ training config shared with PqQueries (m=8 subspaces over the
  // 64-dim embeddings, ksub=16, 2 Lloyd iterations). The shortlist
  // factors are the tuned query defaults: on these near-uniform
  // synthetic embeddings ADC rank quality is bounded by the 32-bit
  // code resolution, so 8x measured 0.48 (rerank) / 0.68 (ivf-pq);
  // 32x / nprobe=5+48x measure 0.92 / 0.84.
  private lazy val books =
    ProductQuant.trainCodebooks(corpus, "vec_id", "embedding", 8, 16, 2)

  test(s"PQ shortlist + re-rank (q_pq_rerank config) holds recall >= $RerankFloor") {
    val r = recallOf(ProductQuant.searchAdcRerank(corpus, queries,
      "vec_id", "qid", "embedding", k = 5, books, shortlistFactor = 32))
    assert(r >= RerankFloor,
      f"PQ re-rank recall@5 $r%.3f fell below the $RerankFloor floor")
  }

  test(s"IVF-PQ (q_ivf_pq config) holds recall >= $Floor") {
    val r = recallOf(ProductQuant.searchIvfAdcRerank(corpus, queries,
      "vec_id", "qid", "embedding", k = 5, books, nlist = 16, nprobe = 5,
      shortlistFactor = 48))
    assert(r >= Floor, f"IVF-PQ recall@5 $r%.3f fell below the $Floor floor")
  }
}
