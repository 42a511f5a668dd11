package graft.tools

import graft.exec.ScanMetrics

/** Single-query bench harness for iterating on one operator's plan
  * without paying a full [[graft.Bench]] sweep: times N repetitions of
  * one registered query with the SAME execution/measure path Bench
  * uses (exec + ScanStats + CacheBin drain between reps), printing
  * each rep so one-shot (cold) vs min-of-N are both visible.
  *
  * Usage: runMain graft.tools.QBench <queryName> [sfDir] [reps]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.GraftSession.build("graft-qbench")
    val q = graft.SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    val times = (1 to reps).map { i =>
      System.gc()
      val (rows, stats, sec) =
        try ScanMetrics.buildExecAndMeasure(spark)(q.build(spark, sfDir))
        finally graft.core.CacheBin.drain()
      println(f"[qbench] $name rep$i: $sec%.2f s ($rows rows, ${stats.bytesRead / 1e6}%.1f MB read)")
      sec
    }
    println(f"[qbench] $name one_shot=${times.head}%.2f min=${times.min}%.2f")
    spark.stop()
  }
}
