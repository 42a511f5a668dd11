package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zValue expression matches the bit-by-bit reference on a grid") {
    import spark.implicits._
    val pts = for (a <- 0L until 64L; b <- 0L until 64L) yield (a * 31 + 7, b * 131 + 3)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == ZOrder.zValueRef(a, b), s"mismatch at ($a,$b)")
    }
  }

  test("zValueRef is injective and interleaves locality") {
    val grid = for (a <- 0L until 128L; b <- 0L until 128L) yield ZOrder.zValueRef(a, b)
    assert(grid.distinct.length == grid.length, "z-values collide")
    // adjacent cells differ in few z-bits: the 2x2 block (0,0)..(1,1)
    // occupies z 0..3 — the defining property of the curve
    assert(Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L))
      .map((ZOrder.zValueRef _).tupled).sorted == Seq(0L, 1L, 2L, 3L))
  }
}
