package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  // zipfy occurrence stream: value v appears (50 - v) times
  private def occ = (1L to 49L).flatMap(v => Seq.fill((50 - v).toInt)(v))
    .toDF("x")

  test("grid is bounded at depth*width cells and counts all occurrences") {
    val cms = CmsSketch.build(occ, "x", depth = 4, width = 16)
    assert(cms.count() <= 4L * 16L)
    // every sketch row counts every occurrence exactly once
    val perRow = cms.groupBy($"__j").agg(sum($"__cnt").as("t"))
      .select($"t").as[Long].collect().toSet
    assert(perRow === Set(occ.count()))
  }

  test("estimates never underestimate, exact at ample width") {
    val exact = occ.groupBy($"x").agg(count(lit(1)).as("n"))
    def run(width: Int) = {
      val cms = CmsSketch.build(occ, "x", 4, width)
      CmsSketch.estimate(cms, exact, "x", 4, width)
        .select($"n", $"cms_est").as[(Long, Long)].collect()
    }
    // tight width: collisions overestimate but never under
    assert(run(8).forall { case (n, est) => est >= n })
    // ample width: double-hashed rows make a same-cell collision in
    // EVERY row vanishingly unlikely — estimates collapse to exact
    assert(run(4096).forall { case (n, est) => est === n })
  }

  test("grid is partitioning-invariant (counts are sums)") {
    def grid(parts: Int) =
      CmsSketch.build(occ.repartition(parts), "x", 4, 32)
        .select($"__j", $"__pos", $"__cnt").as[(Long, Long, Long)]
        .collect().toSet
    assert(grid(1) === grid(13))
  }

  test("grids merge by cell-wise addition (sketch of a union)") {
    val a = occ.filter($"x" <= 20); val b = occ.filter($"x" > 20)
    val merged = CmsSketch.build(a, "x", 4, 32)
      .unionByName(CmsSketch.build(b, "x", 4, 32))
      .groupBy($"__j", $"__pos").agg(sum($"__cnt").as("__cnt"))
      .select($"__j", $"__pos", $"__cnt").as[(Long, Long, Long)].collect().toSet
    val direct = CmsSketch.build(occ, "x", 4, 32)
      .select($"__j", $"__pos", $"__cnt").as[(Long, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("absent values estimate zero (or a collision's count, never negative)") {
    val cms = CmsSketch.build(occ, "x", 4, 4096)
    val ghost = Seq(999999L).toDF("x")
    val est = CmsSketch.estimate(cms, ghost, "x", 4, 4096)
      .select($"cms_est").as[Long].collect()(0)
    assert(est >= 0L && est <= 5L)
  }
}
