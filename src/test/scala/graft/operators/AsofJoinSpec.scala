package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def build = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 12:00:00"), 200.0),
    (2L, ts("2024-01-01 11:00:00"), 300.0))
    .toDF("user_id", "ts", "v")

  private def probe = Seq(
    (10L, 1L, ts("2024-01-01 09:00:00")), // before any build row
    (11L, 1L, ts("2024-01-01 10:00:00")), // exactly at a build row
    (12L, 1L, ts("2024-01-01 11:59:00")), // between the two
    (13L, 1L, ts("2024-01-01 23:00:00")), // after the last
    (14L, 2L, ts("2024-01-01 11:30:00")), // other key
    (15L, 3L, ts("2024-01-01 12:00:00"))) // key with no build rows
    .toDF("event_id", "user_id", "ts")

  private def run(strict: Boolean = false,
      tolerance: Option[org.apache.spark.sql.Column] = None) =
    AsofJoin.asofJoin(probe, build, Seq("user_id"), "ts", "ts", Seq("v"),
        strict = strict, tolerance = tolerance)
      .select($"event_id", $"v")
      .as[(Long, Option[Double])].collect().toMap

  test("non-strict picks the latest at-or-before build row per key") {
    assert(run() === Map(
      10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(200.0), 14L -> Some(300.0), 15L -> None))
  }

  test("strict excludes the equal-time build row") {
    assert(run(strict = true)(11L) === None)
    assert(run(strict = true)(12L) === Some(100.0))
  }

  test("tolerance nulls matches older than the window, keeps the row") {
    val r = run(tolerance = Some(expr("INTERVAL 2 HOURS")))
    assert(r(12L) === Some(100.0)) // 1h59m old, inside
    assert(r(13L) === None)        // 11h old, outside
    assert(r.size === 6)           // every probe row survives
  }

  test("forward picks the earliest at-or-after build row") {
    val r = AsofJoin.asofJoin(probe, build, Seq("user_id"), "ts", "ts", Seq("v"),
        direction = "forward")
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(r === Map(
      10L -> Some(100.0), 11L -> Some(100.0), 12L -> Some(200.0),
      13L -> None, 14L -> None, 15L -> None))
  }

  test("nearest picks the closer side; exact-distance ties resolve backward") {
    // probe 11:00 for user 1: backward 10:00 (1h), forward 12:00 (1h) — tie
    val p = Seq((20L, 1L, ts("2024-01-01 11:00:00")),
      (21L, 1L, ts("2024-01-01 11:30:00")),  // forward closer (30m vs 90m)
      (22L, 1L, ts("2024-01-01 09:00:00")))  // only forward exists
      .toDF("event_id", "user_id", "ts")
    val r = AsofJoin.asofJoin(p, build, Seq("user_id"), "ts", "ts", Seq("v"),
        direction = "nearest")
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(r === Map(20L -> Some(100.0), 21L -> Some(200.0), 22L -> Some(100.0)))
  }

  test("nearest honors tolerance on both sides") {
    val p = Seq((30L, 1L, ts("2024-01-01 20:00:00"))) // 8h past the last build
      .toDF("event_id", "user_id", "ts")
    val r = AsofJoin.asofJoin(p, build, Seq("user_id"), "ts", "ts", Seq("v"),
        direction = "nearest", tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select($"v").as[Option[Double]].collect()
    assert(r.toSeq === Seq(None))
  }

  test("nearest shuffles once: a single exchange feeds both sort orders") {
    val plan = AsofJoin.asofJoin(probe, build, Seq("user_id"), "ts", "ts", Seq("v"),
        direction = "nearest")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected one exchange:\n$plan")
  }

  test("bucketed as-of equals the plain form across widths and options") {
    // deterministic irregular timelines: builds sparse (cross-bucket
    // carries and probe-only buckets guaranteed at small widths)
    val b = (0 until 40).map { i =>
      (i.toLong % 3, new Timestamp(1700000000000L + i * 7 * 60000L), i * 1.0)
    }.toDF("user_id", "ts", "v")
    val p = (0 until 200).map { i =>
      (i.toLong % 5, new Timestamp(1700000000000L + i * 97 * 1000L), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"matched_ts", $"v")
        .as[(Long, Option[Timestamp], Option[Double])].collect()
        .sortBy(_._1).toSeq
    for {
      width <- Seq(60L * 1000000L, 3600L * 1000000L, 86400L * 1000000L)
      dir <- Seq("backward", "forward")
      strict <- Seq(false, true)
    } {
      val plain = canon(AsofJoin.asofJoin(p, b, Seq("user_id"), "ts", "ts",
        Seq("v"), strict = strict, direction = dir))
      val bucketed = canon(AsofJoin.asofJoinBucketed(p, b, Seq("user_id"),
        "ts", "ts", Seq("v"), bucketMicros = width, strict = strict,
        direction = dir))
      assert(bucketed === plain, s"width=$width dir=$dir strict=$strict")
    }
    // tolerance path too
    val tol = Some(expr("INTERVAL 10 MINUTES"))
    assert(canon(AsofJoin.asofJoinBucketed(p, b, Seq("user_id"), "ts", "ts",
        Seq("v"), bucketMicros = 3600L * 1000000L, tolerance = tol)) ===
      canon(AsofJoin.asofJoin(p, b, Seq("user_id"), "ts", "ts",
        Seq("v"), tolerance = tol)))
  }

  test("bucketed windows partition on (key, bucket) — no whole-key funnel") {
    val plan = AsofJoin.asofJoinBucketed(probe, build, Seq("user_id"),
        "ts", "ts", Seq("v"), bucketMicros = 3600L * 1000000L)
      .queryExecution.executedPlan.toString
    val mainWindows = plan.linesIterator.filter(l =>
      l.contains("Window [") && l.contains("__tag"))
    mainWindows.foreach(l =>
      assert(l.contains("__bkt"), s"carry window not bucket-partitioned: $l"))
  }

  test("null payload values do not reach back to older matches") {
    val b = Seq((1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 12:00:00"), Option.empty[Double]))
      .toDF("user_id", "ts", "v")
    val p = Seq((1L, 1L, ts("2024-01-01 13:00:00"))).toDF("event_id", "user_id", "ts")
    val out = AsofJoin.asofJoin(p, b, Seq("user_id"), "ts", "ts", Seq("v"))
      .select($"v", $"matched_ts").collect()(0)
    // matched row IS the 12:00 one (null v), not the 10:00 one
    assert(out.isNullAt(0) && out.getTimestamp(1) === ts("2024-01-01 12:00:00"))
  }

  test("empty build side: every probe row survives unmatched; empty probe: empty out") {
    val noBuild = build.filter($"user_id" < 0)
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsofJoin.asofJoin(probe, noBuild, Seq("user_id"), "ts", "ts",
        Seq("v"), direction = dir)
      assert(out.count() === 6 && out.filter($"v".isNotNull).count() === 0, dir)
    }
    val noProbe = AsofJoin.asofJoin(probe.filter($"event_id" < 0), build,
      Seq("user_id"), "ts", "ts", Seq("v"))
    assert(noProbe.count() === 0)
    val noBuildBucketed = AsofJoin.asofJoinBucketed(probe, noBuild,
      Seq("user_id"), "ts", "ts", Seq("v"), bucketMicros = 3600L * 1000000L)
    assert(noBuildBucketed.count() === 6 &&
      noBuildBucketed.filter($"v".isNotNull).count() === 0)
  }

  test("plan shuffles once on the key — no join node at all") {
    val plan = AsofJoin.asofJoin(probe, build, Seq("user_id"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
