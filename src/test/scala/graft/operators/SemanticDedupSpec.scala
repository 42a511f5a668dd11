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
}
