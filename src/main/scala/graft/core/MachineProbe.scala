package graft.core

import org.apache.spark.sql.SparkSession

/** Shared ambient-contention telemetry for the measurement mains
  * (Bench, ScaleSweep) — ONE implementation so the two artifacts'
  * calibration numbers stay comparable by construction.
  */
object MachineProbe {

  /** Fixed, data-independent CPU-bound probe (1e9-row range agg, all
    * cores): contention inflates it by the same factor it inflates the
    * real queries, so total/probe is comparable across sessions where
    * a raw total is not. JIT-warm it once (untimed) before trusting
    * the first timed reading — a cold probe measures ~9× its warm
    * time, which reads as phantom start-of-run contention.
    */
  def calibrate(spark: SparkSession): Double = {
    System.gc()
    val t0 = System.nanoTime()
    spark.range(1000000000L).selectExpr("sum(id % 7)", "count(1)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** 1-minute /proc/loadavg (or -1 where unreadable). Note: any sample
    * taken after this JVM has run work includes the process's own
    * decaying contribution — only a before-any-work baseline is purely
    * external.
    */
  def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** PIDs of this process and its ancestors (via /proc/<pid>/stat ppid
    * chain). Under `run / fork := true` the chain is
    * bench-JVM → sbt-JVM → shell → … — every java process in it is
    * "us", not a sibling.
    */
  private def parentChain(): Set[String] = {
    def ppidOf(pid: String): Option[String] =
      try {
        val stat = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"/proc/$pid/stat"))
        // comm (field 2) may contain spaces/parens: fields resume after
        // the LAST ')' — state is next, ppid the one after
        val rest = stat.substring(stat.lastIndexOf(')') + 1).trim
        Some(rest.split("\\s+")(1))
      } catch { case _: Throwable => None }
    val self = java.nio.file.Files
      .readSymbolicLink(java.nio.file.Paths.get("/proc/self")).toString
    val chain = scala.collection.mutable.LinkedHashSet(self)
    var cur = self
    var guard = 0
    while (cur != "0" && cur != "1" && guard < 64) {
      ppidOf(cur) match {
        case Some(p) if !chain.contains(p) => chain += p; cur = p
        case _ => cur = "0"
      }
      guard += 1
    }
    chain.toSet
  }

  /** Count of java/sbt JVMs on the machine OUTSIDE this process's own
    * parent chain — the r16 committed bench read ~20% over two clean
    * same-code runs with every in-artifact probe flat, a constant
    * environment offset only visible by looking at the machine itself.
    */
  def siblingJvms(): Int =
    try {
      val chain = parentChain()
      val procDir = new java.io.File("/proc")
      procDir.listFiles((_, name) => name.forall(_.isDigit)) match {
        case null => -1
        case pids =>
          pids.count { d =>
            val pid = d.getName
            if (chain.contains(pid)) false
            else try {
              val comm = java.nio.file.Files.readString(
                java.nio.file.Paths.get(s"/proc/$pid/comm")).trim
              comm == "java" || comm.startsWith("sbt")
            } catch { case _: Throwable => false }
          }
      }
    } catch { case _: Throwable => -1 }

  /** /proc/meminfo MemAvailable in MiB (or -1 where unreadable): the
    * page-cache headroom channel — a low value explains a cold
    * cache_ratio without any code change.
    */
  def memAvailableMb(): Long =
    try {
      val m = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/meminfo"))
      "MemAvailable:\\s*(\\d+)\\s*kB".r.findFirstMatchIn(m)
        .map(_.group(1).toLong / 1024).getOrElse(-1L)
    } catch { case _: Throwable => -1L }
}
