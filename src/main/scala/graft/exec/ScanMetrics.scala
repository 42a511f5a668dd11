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
