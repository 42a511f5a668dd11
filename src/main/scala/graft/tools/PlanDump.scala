package graft.tools

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan evidence `plans/<tag>/<query>_{before,after}.txt` that each
  * optimization round commits alongside its bench numbers.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>
  *   [sfDir]
  *
  * Writes `<outDir>/<name>_<suffix>.txt` per query. The plan is taken
  * from the query's OWN QueryExecution after a full execution (same
  * `toRdd.count()` action Bench uses), so AQE-final join strategies and
  * coalesced exchanges are the executed truth, not the initial plan:
  * the file carries the formatted initial plan first (PushedFilters /
  * ReadSchema detail lives there) and the executed AQE plan after it.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.build("graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.allQueries.find(_.name == name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(q) =>
          try {
            val df = q.build(spark, sfDir)
            val formatted = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            df.queryExecution.toRdd.count()
            val executed = df.queryExecution.executedPlan.toString
            val txt = s"== $name ($suffix, $sfDir) ==\n\n" + formatted +
              "\n\n== executed (AQE final) ==\n\n" + executed
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote $name")
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[plandump] $name failed: $e")
          } finally graft.core.CacheBin.drain()
      }
    }
    spark.stop()
  }
}
