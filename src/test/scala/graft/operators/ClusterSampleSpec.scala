package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("every cell's quota holds and rows come from that cell") {
    val out = ClusterSample.balanced(emb, "vec_id", "embedding",
      nlist = 8, iters = 2, perCell = 5)
    val perCell = out.groupBy($"cell").count().collect()
    assert(perCell.forall(_.getLong(1) <= 5L))
    // sampled rows carry their true assignment: re-assigning the
    // sampled ids reproduces the cell column
    val cents = IvfIndex.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val truth = IvfIndex.assignCells(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"__cell".cast("long").as("cell_true"))
    assert(out.join(truth, "vec_id")
      .filter($"cell" =!= $"cell_true").count() === 0L)
  }

  test("draw is the documented multiplicative hash and selection is its per-cell minimum") {
    val out = ClusterSample.balanced(emb, "vec_id", "embedding",
      nlist = 8, iters = 2, perCell = 1).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === ((id % 1000003L) * 2654435761L) % 1000000L)
    }
    // perCell=1 keeps exactly the (draw, id)-minimum of each cell
    val cents = IvfIndex.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val all = IvfIndex.assignCells(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"__cell".cast("long").as("cell"))
      .withColumn("draw", (($"vec_id" % 1000003L) * 2654435761L) % 1000000L)
      .collect().groupBy(_.getLong(1))
    val expect = all.map { case (cell, rows) =>
      cell -> rows.map(r => (r.getLong(2), r.getLong(0))).min._2
    }
    assert(out.map(r => r.getLong(1) -> r.getLong(0)).toMap === expect)
  }

  test("deterministic across repartitionings") {
    val a = ClusterSample.balanced(emb, "vec_id", "embedding", 8, 2, 3)
      .orderBy($"cell", $"vec_id").collect().toSeq
    val b = ClusterSample.balanced(emb.repartition(13), "vec_id", "embedding", 8, 2, 3)
      .orderBy($"cell", $"vec_id").collect().toSeq
    assert(a === b)
  }
}
