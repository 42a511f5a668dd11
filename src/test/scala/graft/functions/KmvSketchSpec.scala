package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(xs: Seq[Long], k: Int, parts: Int = 4): Array[Long] =
    xs.toDF("x").repartition(parts)
      .select(KmvSketch.draw($"x").as("d")).as[Long]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(KmvSketch(k).toColumn.name("s"))
      .collect()(0)._2

  test("below k the sketch IS the sorted distinct draw set, estimate exact") {
    val xs = Seq(5L, 17L, 5L, 99L, 17L, 3L)
    val s = sketchOf(xs, k = 8)
    val draws = xs.distinct.map(x => ((x % 999999937L) * 2654435761L) % KmvSketch.M).sorted
    assert(s.toSeq === draws)
    val est = Seq(s).toDF("s").select(KmvSketch.estimate($"s", 8)).as[Long].collect()(0)
    assert(est === 4L)
  }

  test("sketch is partitioning-invariant (mergeable partials)") {
    val xs = (1L to 5000L).map(x => x * 7919L)
    assert(sketchOf(xs, 16, parts = 1).toSeq === sketchOf(xs, 16, parts = 13).toSeq)
  }

  test("full sketch keeps exactly the k smallest distinct draws") {
    val xs = (1L to 1000L)
    val s = sketchOf(xs, 32)
    val want = xs.map(x => ((x % 999999937L) * 2654435761L) % KmvSketch.M)
      .distinct.sorted.take(32)
    assert(s.toSeq === want)
  }

  test("union of sketches equals the sketch of the union (composability)") {
    val k = 16
    val xs = (1L to 400L).map(_ * 31L)
    val ys = (200L to 600L).map(_ * 31L)
    val sa = sketchOf(xs, k); val sb = sketchOf(ys, k)
    val direct = sketchOf((xs ++ ys).distinct, k)
    val composed = Seq((sa, sb)).toDF("a", "b")
      .select(KmvSketch.unionSketch($"a", $"b", k)).as[Array[Long]].collect()(0)
    assert(composed.toSeq === direct.toSeq)
  }

  test("intersection estimate is exact below k, sane above") {
    val k = 64
    // below k: A = {1..30}, B = {21..50} -> true intersection 10
    val sa = sketchOf((1L to 30L), k); val sb = sketchOf((21L to 50L), k)
    val small = Seq((sa, sb)).toDF("a", "b")
      .select(KmvSketch.intersectionEstimate($"a", $"b", k)).as[Long].collect()(0)
    assert(small === 10L)
    // above k: 5000-element sets overlapping in 2500
    val xa = (1L to 5000L).map(_ * 7919L)
    val xb = (2501L to 7500L).map(_ * 7919L)
    val big = Seq((sketchOf(xa, k), sketchOf(xb, k))).toDF("a", "b")
      .select(KmvSketch.intersectionEstimate($"a", $"b", k)).as[Long].collect()(0)
    assert(math.abs(big - 2500L).toDouble / 2500 < 0.5, s"estimate $big vs 2500")
  }

  test("disjoint sets estimate zero intersection") {
    val k = 32
    val sa = sketchOf((1L to 1000L), k)
    val sb = sketchOf((100001L to 101000L), k)
    val est = Seq((sa, sb)).toDF("a", "b")
      .select(KmvSketch.intersectionEstimate($"a", $"b", k)).as[Long].collect()(0)
    assert(est === 0L)
  }

  test("estimate lands near the true cardinality at 10k distinct") {
    val n = 10000L
    val s = sketchOf((1L to n).map(_ * 104729L), 64)
    val est = Seq(s).toDF("s").select(KmvSketch.estimate($"s", 64)).as[Long].collect()(0)
    // k=64 → relative sd ~ 1/sqrt(62) ≈ 13%; allow 3 sigma
    assert(math.abs(est - n).toDouble / n < 0.4, s"estimate $est vs $n")
  }
}
