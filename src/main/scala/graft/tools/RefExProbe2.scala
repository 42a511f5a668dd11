package graft.tools

object RefExProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("refex-probe2")
    val q = graft.SparkEntry.allQueries.find(_.name == "q_reference_prompt_ex").get
    def run(label: String): Unit = (1 to 2).foreach { rep =>
      System.gc()
      val t0 = System.nanoTime()
      val df = q.build(spark, "/root/testdata/sf0.1")
      df.queryExecution.toRdd.count()
      println(f"[refex2] $label rep$rep total=${(System.nanoTime() - t0) / 1e9}%.2f")
      graft.core.CacheBin.drain()
    }
    run("aqe-on")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe-off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("aqe-on-again")
    spark.stop()
  }
}
