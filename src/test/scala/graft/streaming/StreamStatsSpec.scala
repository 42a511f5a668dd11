package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CmsSketch

class StreamStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("streamstats").toString

  test("streamed grid equals the batch grid over everything ingested") {
    implicit val sq = spark.sqlContext
    val dir = tmp(); val ckpt = tmp()
    val src = MemoryStream[Long]
    val q = StreamStats.start(src.toDF().toDF("x"), dir, ckpt, "x",
      depth = 4, width = 64)
    try {
      src.addData(1L to 200L: _*)
      q.processAllAvailable()
      src.addData(101L to 400L: _*)
      q.processAllAvailable()
      val streamed = StreamStats.readCms(spark, dir)
        .select($"__j", $"__pos", $"__cnt").as[(Long, Long, Long)]
        .collect().toSet
      val direct = CmsSketch.build(
          ((1L to 200L) ++ (101L to 400L)).toDF("x"), "x", 4, 64)
        .select($"__j", $"__pos", $"__cnt").as[(Long, Long, Long)]
        .collect().toSet
      assert(streamed === direct)
    } finally q.stop()
  }

  test("a replayed batch never double-counts (idempotent per-batch dirs)") {
    val dir = tmp()
    val sink = StreamStats.cmsSink(dir, "x", 4, 64) _
    sink((1L to 100L).toDF("x"), 0L)
    sink((50L to 80L).toDF("x"), 1L)
    val before = StreamStats.readCms(spark, dir)
      .agg(sum($"__cnt")).as[Long].collect()(0)
    sink((1L to 100L).toDF("x"), 0L) // crash-replay of batch 0
    val after = StreamStats.readCms(spark, dir)
      .agg(sum($"__cnt")).as[Long].collect()(0)
    assert(after === before)
  }

  test("estimates over the folded grid answer without any corpus scan") {
    val dir = tmp()
    StreamStats.cmsSink(dir, "x", 4, 2048)((1L to 300L).flatMap(v =>
      Seq.fill(if (v == 7L) 50 else 1)(v)).toDF("x"), 0L)
    val est = StreamStats.estimate(spark, dir, Seq(7L).toDF("x"), "x",
        depth = 4, width = 2048)
      .select($"cms_est").as[Long].collect()(0)
    assert(est >= 50L && est <= 55L)
  }
}
