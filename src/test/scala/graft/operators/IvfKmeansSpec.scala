package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.functions.{FloatVec, VectorOps}

/** Spherical k-means quantizer refinement: deterministic across
  * partitionings (decimal sums + driver normalize), monotone on the
  * cosine objective, and drop-in for the IVF search path.
  */
class IvfKmeansSpec extends SparkSpec {

  private lazy val emb =
    Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))

  private def unit(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Mean best cosine to any centroid — the spherical k-means objective. */
  private def objective(df: DataFrame, cents: Seq[(Int, Seq[Double])]): Double =
    df.select((greatest(cents.map { case (_, c) =>
      VectorOps.dot(col("embedding"), array(c.map(lit): _*))
    }: _*) / FloatVec.normF(col("embedding"))).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)

  test("refined centroids are identical under repartitioning") {
    val a = IvfIndex.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val b = IvfIndex.kmeansCentroids(
      emb.repartition(7), "vec_id", "embedding", nlist = 8, iters = 3)
    assert(a == b, "k-means centroids depend on partitioning")
  }

  test("refinement does not decrease the cosine objective") {
    val init = IvfIndex.centroids(emb, "vec_id", "embedding", nlist = 8)
      .map { case (cid, c) => cid -> unit(c) }
    val refined = IvfIndex.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 4)
    val j0 = objective(emb, init)
    val j1 = objective(emb, refined)
    assert(j1 >= j0 - 1e-9, s"objective decreased: $j0 -> $j1")
    assert(j1 > j0, s"objective did not improve on the synthetic corpus: $j0 -> $j1")
  }

  test("searchIvf accepts refined centroids unchanged") {
    val refined = IvfIndex.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    val out = IvfIndex.searchIvf(
      emb, emb.filter(col("vec_id") < 4).select(col("vec_id").as("qid"), col("embedding")),
      "vec_id", "qid", "embedding", k = 3, nlist = 8, nprobe = 2,
      centroidsOpt = Some(refined)).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    assert(byQuery.values.forall(_.length == 3), "k rows per query")
    assert(out.forall(r => r.getLong(0) != r.getLong(2)), "self excluded")
  }

  test("appendToIndex: appended vectors are searchable without a rebuild") {
    val path = "target/tmp/ivf_append_spec"
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    IvfIndex.buildIndex(first, "vec_id", "embedding", nlist = 8, path = path)
    IvfIndex.appendToIndex(spark, path, second, "vec_id", "embedding")
    // every vector (original + appended) is in the index exactly once
    val assigned = spark.read.parquet(s"$path/assigned")
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // an appended-half query finds appended-half neighbors: results
    // match a from-scratch search with the SAME (frozen) centroids
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1).toSeq
    val queries = emb.filter(col("vec_id") < 7 && col("vec_id") % 2 === 1)
      .select(col("vec_id").as("qid"), col("embedding"))
    val viaIndex = IvfIndex.searchIndexed(spark, path, queries,
      "vec_id", "qid", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val direct = IvfIndex.searchIvf(emb, queries,
      "vec_id", "qid", "embedding", k = 3, nlist = 8, nprobe = 2,
      centroidsOpt = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == direct, "appended index must search like a full build")
  }
}
