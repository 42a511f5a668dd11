package graft.tools

/** Scratch: split q_reference_prompt_ex cost into build (transpile +
  * analyze) vs optimize/execute.
  */
object RefExProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("refex-probe")
    val q = graft.SparkEntry.allQueries.find(_.name == "q_reference_prompt_ex").get
    (1 to 3).foreach { rep =>
      System.gc()
      var t0 = System.nanoTime()
      val df = q.build(spark, "/root/testdata/sf0.1")
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val tOpt = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[refex] rep$rep build=$tBuild%.2f opt=$tOpt%.2f exec=$tExec%.2f")
      graft.core.CacheBin.drain()
    }
    spark.stop()
  }
}
