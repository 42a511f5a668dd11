package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized (seeded, deterministic) equivalence of the distributed
  * as-of join against a direct in-memory reference over many
  * irregular timelines — the property net under the hand-picked spec
  * cases. Collision-free build times are generated per key (the
  * documented uniqueness contract); probe times intentionally collide
  * with build times to exercise the strict/non-strict boundary.
  */
class AsofJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Base = 1700000000000L
  private def ts(ms: Long) = new Timestamp(Base + ms)

  test("all directions/strictness match an in-memory reference on random timelines") {
    val rnd = new scala.util.Random(20260814L)
    // builds: per key, distinct minute offsets
    val builds = (0 until 6).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(60).map { m =>
        (k.toLong, m.toLong, m * 1.0 + k)
      }
    }
    val probes = (0 until 400).map { i =>
      // half the probes land exactly on a build minute
      val m = if (i % 2 == 0) rnd.nextInt(500) else builds(rnd.nextInt(builds.size))._2.toInt
      (i.toLong, rnd.nextInt(8).toLong, m.toLong) // keys 6,7 have no builds
    }
    val bdf = builds.map { case (k, m, v) => (k, ts(m * 60000L), v) }
      .toDF("k", "ts", "v")
    val pdf = probes.map { case (id, k, m) => (id, k, ts(m * 60000L)) }
      .toDF("event_id", "k", "ts")

    val byKey = builds.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    def reference(dir: String, strict: Boolean, tolMin: Option[Long]): Map[Long, Option[Double]] =
      probes.map { case (id, k, m) =>
        val tl = byKey.getOrElse(k, Nil)
        val back = tl.filter(b => if (strict) b._2 < m else b._2 <= m)
          .sortBy(_._2).lastOption
        val fwd = tl.filter(b => if (strict) b._2 > m else b._2 >= m)
          .sortBy(_._2).headOption
        def ok(b: (Long, Long, Double)) =
          tolMin.forall(t => math.abs(b._2 - m) <= t)
        val pick = dir match {
          case "backward" => back.filter(ok)
          case "forward"  => fwd.filter(ok)
          case "nearest" =>
            (back.filter(ok), fwd.filter(ok)) match {
              case (Some(b), Some(f)) =>
                if (math.abs(b._2 - m) <= math.abs(f._2 - m)) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
        }
        id -> pick.map(_._3)
      }.toMap

    for {
      dir <- Seq("backward", "forward", "nearest")
      strict <- Seq(false, true)
      tolMin <- Seq(None, Some(30L))
    } {
      val got = AsofJoin.asofJoin(pdf, bdf, Seq("k"), "ts", "ts", Seq("v"),
          strict = strict, direction = dir,
          tolerance = tolMin.map(t => expr(s"INTERVAL $t MINUTES")))
        .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
      assert(got === reference(dir, strict, tolMin),
        s"dir=$dir strict=$strict tol=$tolMin")
    }
    // bucketed form against the same reference (hot-key safety path)
    for (widthMin <- Seq(7L, 60L, 100000L)) {
      val got = AsofJoin.asofJoinBucketed(pdf, bdf, Seq("k"), "ts", "ts",
          Seq("v"), bucketMicros = widthMin * 60000000L)
        .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
      assert(got === reference("backward", strict = false, None), s"width=$widthMin")
    }
  }
}
