package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** SemDeDup semantics: keep-smallest drop rule, partitioning
  * invariance, and cell-bounded comparison.
  */
class SemanticDedupSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("survivors are a subset with the smallest id of every near-dup pair kept") {
    import spark.implicits._
    val survivors = SemanticDedup.dedup(emb, "vec_id", "embedding",
      nlist = 4, iters = 1, threshold = 0.35).collect()
    val ids = survivors.map(_.getLong(0)).toSet
    val total = emb.count()
    assert(ids.nonEmpty && ids.size < total, "dedup must drop something on clustered data")
    // every near-dup pair among survivors within one cell would violate
    // the drop rule — check directly on the survivor set
    val kept = emb.join(
      survivors.map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("vec_id", "cell"),
      Seq("vec_id"))
    val a = kept.select(col("cell"), col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = kept.select(col("cell"), col("vec_id").as("id2"), col("embedding").as("v2"))
    val residual = a.join(b, "cell").filter(col("id1") < col("id2"))
      .filter(graft.functions.FloatVec.dotF(col("v1"), col("v2")) /
        (graft.functions.FloatVec.normF(col("v1")) * graft.functions.FloatVec.normF(col("v2"))) >= 0.35)
      .count()
    assert(residual == 0, s"$residual surviving near-dup pairs inside a cell")
  }

  test("survivor set is invariant under repartitioning") {
    def run(parts: Int) = SemanticDedup.dedup(emb.repartition(parts),
      "vec_id", "embedding", nlist = 4, iters = 1, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(7))
  }

  // 100 rows, 90 % exact duplicates: 40 distinct unit vectors spread
  // around the circle, plus 60 byte-identical copies of the first 10
  private lazy val saturated = {
    import spark.implicits._
    val distinct = (0 until 40).map { i =>
      val th = i * 2.0 * math.Pi / 40
      (i.toLong, Seq(math.cos(th).toFloat, math.sin(th).toFloat))
    }
    val dups = (0 until 60).map { j =>
      (100L + j, distinct(j % 10)._2)
    }
    (distinct ++ dups).toDF("vec_id", "embedding")
  }

  test("maxCellRows bounds every pair-stage cell on a 90%-duplicate corpus") {
    val sizes = SemanticDedup.refinedCellSizes(saturated, "vec_id", "embedding",
      nlist = 1, iters = 1, threshold = 0.95, maxCellRows = 10L)
      .collect().map(r => r.getLong(1))
    // exact-twin collapse removes the 60 copies before the quadratic
    // stage; re-quantization then splits the 40 distinct vectors (all
    // in the single top-level cell) under the cap
    assert(sizes.sum == 40, s"collapse should leave the distinct vectors: ${sizes.sum}")
    assert(sizes.max <= 10, s"a refined cell exceeds the cap: ${sizes.mkString(",")}")
  }

  test("capped dedup keeps the drop rule sound and stays deterministic") {
    def run(parts: Int) =
      try SemanticDedup.dedup(saturated.repartition(parts),
        "vec_id", "embedding", nlist = 1, iters = 1, threshold = 0.95,
        maxCellRows = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.core.CacheBin.drain()
    val s1 = run(1)
    assert(s1 == run(5), "capped survivor set must be partitioning-invariant")
    // every exact twin of a smaller id must be gone (collapse is exact)
    val ids = s1.map(_._1)
    assert((0 until 60).forall(j => !ids.contains(100L + j)),
      "an exact duplicate of a smaller id survived")
    // the smallest id of every identical group survives only if no
    // smaller near-neighbor dropped it — id 0 always survives
    assert(ids.contains(0L))
  }

  test("exact-twin collapse does not change the uncapped survivor set") {
    def run(maxCellRows: Long) =
      try SemanticDedup.dedup(saturated,
        "vec_id", "embedding", nlist = 2, iters = 1, threshold = 0.95,
        maxCellRows = maxCellRows)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.core.CacheBin.drain() // the two runs share persisted subtrees
    // a cap far above every cell size must be a no-op vs the default
    assert(run(Long.MaxValue) == run(1000L))
  }
}
