package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class EmbedOutliersSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("each cell keeps exactly floor(4n/5) members, the top scorers") {
    val scored = EmbedOutliers.prototypicality(emb, "vec_id", "embedding", nlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val kept = EmbedOutliers.pruneOutliers(
      emb, "vec_id", "embedding", nlist = 8, keepNum = 4, keepDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    scored.groupBy(_._2).foreach { case (cell, members) =>
      val n = members.length
      val expectKeep = members.sortBy(m => (-m._3, m._1)).take(4 * n / 5)
        .map(m => (m._1, cell)).toSet
      val gotKeep = kept.filter(_._2 == cell)
      assert(gotKeep === expectKeep, s"cell $cell n=$n")
    }
  }

  test("scores are cosines to the assigned centroid and within [-1, 1]") {
    val scored = EmbedOutliers.prototypicality(emb, "vec_id", "embedding", nlist = 8)
      .collect()
    assert(scored.nonEmpty)
    scored.foreach(r =>
      assert(r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
  }

  test("survivor set is invariant under repartitioning") {
    val a = EmbedOutliers.pruneOutliers(
      emb, "vec_id", "embedding", 8, 4, 5).collect().map(_.getLong(0)).toSet
    val b = EmbedOutliers.pruneOutliers(
      emb.repartition(11), "vec_id", "embedding", 8, 4, 5)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("zero-norm vectors are excluded, not scored") {
    import spark.implicits._
    val withZero = emb.unionByName(
      Seq((99999L, Array.fill(64)(0f))).toDF("vec_id", "embedding"))
    val scored = EmbedOutliers.prototypicality(withZero, "vec_id", "embedding", 8)
    assert(scored.filter(col("vec_id") === 99999L).count() === 0)
  }
}
