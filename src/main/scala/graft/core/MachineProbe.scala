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
}
