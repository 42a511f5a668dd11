package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L),
    (5L, -3L), (6L, 107L)).toDF("pid", "x")

  // half-open intervals, incl. one spanning many buckets, one empty,
  // one negative, one adjacent (touching) pair
  private def intervals = Seq(
    (100L, 0L, 10L),    // catches 5, -? no: [0,10) -> 5
    (101L, 10L, 20L),   // catches 10, 19 (20 excluded)
    (102L, 0L, 100L),   // wide: catches 5, 10, 19, 20
    (103L, 7L, 7L),     // empty
    (104L, -10L, 0L),   // negative: catches -3
    (105L, 100L, 110L)) // catches 107
    .toDF("iid", "lo", "hi")

  private def bruteForce(width: Long): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("point-in-interval matches brute force, each pair exactly once") {
    for (width <- Seq(1L, 3L, 8L, 64L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          $"x", $"lo", $"hi", width)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width=$width emitted dup pairs")
      assert(got.toSet === bruteForce(width), s"width=$width")
    }
  }

  test("interval overlap matches brute force across bucket widths") {
    val a = intervals.select($"iid".as("a_id"), $"lo".as("a_lo"), $"hi".as("a_hi"))
    val b = intervals.select($"iid".as("b_id"), $"lo".as("b_lo"), $"hi".as("b_hi"))
    // the textbook predicate plus non-emptiness: an empty interval has
    // no points, so it intersects nothing (operator semantics)
    val want = a.crossJoin(b)
      .filter($"a_lo" < $"b_hi" && $"b_lo" < $"a_hi" &&
        $"a_lo" < $"a_hi" && $"b_lo" < $"b_hi")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    for (width <- Seq(1L, 5L, 50L)) {
      val got = RangeJoin.intervalOverlap(a, b,
          $"a_lo", $"a_hi", $"b_lo", $"b_hi", width)
        .select($"a_id", $"b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width=$width emitted dup pairs")
      assert(got.toSet === want, s"width=$width")
    }
  }

  test("adjacent (touching) intervals do not overlap; empty match nothing") {
    val a = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 5L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = a.select($"a_id".as("b_id"), $"a_lo".as("b_lo"), $"a_hi".as("b_hi"))
    val got = RangeJoin.intervalOverlap(a, b,
        $"a_lo", $"a_hi", $"b_lo", $"b_hi", 4L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 2L))) // only self-overlaps; 3 is empty
  }

  test("a mis-sized width fails loudly with an actionable message") {
    val giant = Seq((1L, 0L, 100000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, giant, $"x", $"lo", $"hi",
        bucketWidth = 1L, maxBucketsPerInterval = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("raise bucketWidth")), msgs(e).mkString("|"))
  }

  test("plan is a hash equi-join on the bucket, never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        $"x", $"lo", $"hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
