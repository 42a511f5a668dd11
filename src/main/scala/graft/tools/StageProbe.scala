package graft.tools

/** Scratch: min-of-2 timings for one bench query's BenchStages prefixes
  * on a quiet machine (the in-bench stage pass is one-shot and rides
  * whatever machine state the full sweep left behind).
  *
  * Usage: runMain graft.tools.StageProbe <queryName> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.build("graft-stageprobe")
    val stages = graft.BenchStages.stages.find(_._1 == name)
      .getOrElse(sys.error(s"no stages for $name"))._2
    stages.foreach { case (sname, build) =>
      def once(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        try build(spark, sfDir).queryExecution.toRdd.count()
        catch { case e: Throwable => System.err.println(s"$sname: $e") }
        finally graft.core.CacheBin.drain()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"[stageprobe] $name/$sname: $t%.2f s")
    }
    spark.stop()
  }
}
