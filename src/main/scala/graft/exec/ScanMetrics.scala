package graft.exec

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query scan accounting (reference: BigQuery
  * `total_bytes_processed` logging, `core/db_connect.py:117-119`).
  * Spark-native: read the file-scan SQL metrics off the executed plan —
  * `filesSize` (bytes of files read after partition pruning) and scan
  * output rows — AQE-aware.
  */
final case class ScanStats(bytesRead: Long, rowsScanned: Long, filesRead: Long)

object ScanMetrics {

  /** Walk the executed plan (descending into AQE final plans and
    * shuffle/broadcast query stages) and sum file-scan metrics.
    */
  def fromExecuted(qe: QueryExecution): ScanStats = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val nodes = walk(qe.executedPlan)
    val scans = nodes.filter(_.nodeName.toLowerCase.contains("scan"))
    def metricSum(key: String): Long =
      scans.flatMap(_.metrics.get(key).map(_.value)).sum
    ScanStats(
      bytesRead = metricSum("filesSize"),
      rowsScanned = scans.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum,
      filesRead = metricSum("numFiles"))
  }

  /** Execute a DataFrame through its OWN QueryExecution (df.count()
    * would plan a separate aggregate query, leaving df's plan metrics
    * untouched) and return (rowCount, scan stats).
    */
  def execAndMeasure(df: org.apache.spark.sql.DataFrame): (Long, ScanStats) = {
    val n = df.queryExecution.toRdd.count()
    (n, fromExecuted(df.queryExecution))
  }

  /** Build AND execute under a task-metrics listener, returning
    * (rowCount, stats) whose `bytesRead` is
    * `max(plan filesSize, actual task input bytes)`.
    *
    * The plan-walk alone undercounts queries whose BUILD runs eager
    * jobs (pipeline stage checkpoints, index writes, in-build
    * training): those scans never appear in the measured plan, so a
    * composed query could report ~0 bytes while reading the corpus
    * several times. Task input metrics see every job between build
    * start and action end; the max keeps the established filesSize
    * semantics for ordinary queries (actual parquet bytes run BELOW
    * filesSize under column pruning) while restoring honest accounting
    * for eager-build ones.
    */
  /** Returns (rowCount, stats, elapsedSec) where elapsed covers build
    * start → action end ONLY (the stabilization wait and plan walk are
    * measurement overhead and excluded, so callers can use it as the
    * query's timing).
    */
  def buildExecAndMeasure(spark: org.apache.spark.sql.SparkSession)(
      build: => org.apache.spark.sql.DataFrame): (Long, ScanStats, Double) = {
    val taskBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { taskBytes.addAndGet(m.inputMetrics.bytesRead); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val df = build
      val n = df.queryExecution.toRdd.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      // listener events post asynchronously: poll until the byte count
      // stabilizes (bounded) rather than reaching into the private bus
      var prev = -1L
      var tries = 0
      while (taskBytes.get() != prev && tries < 20) {
        prev = taskBytes.get()
        Thread.sleep(25)
        tries += 1
      }
      val planStats = fromExecuted(df.queryExecution)
      (n, planStats.copy(
        bytesRead = math.max(planStats.bytesRead, taskBytes.get())), elapsed)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** QueryExecutionListener flavor — register once, read the latest
    * per-action stats (the reference logs per query the same way).
    */
  final class Listener extends QueryExecutionListener {
    private val last = new AtomicReference[Option[(String, ScanStats)]](None)
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      last.set(Some(funcName -> fromExecuted(qe)))
    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    def lastStats: Option[(String, ScanStats)] = last.get()
  }
}
