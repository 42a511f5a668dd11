package graft.exec

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Outcome of executing one SQL statement. */
sealed trait ExecResult {
  def isSuccess: Boolean
  def errorMessage: Option[String]
}
final case class ExecOk(df: DataFrame, seconds: Double) extends ExecResult {
  val isSuccess = true
  val errorMessage: Option[String] = None
}
final case class ExecErr(error: String, seconds: Double) extends ExecResult {
  val isSuccess = false
  val errorMessage: Option[String] = Some(error)
}

/** The engine's single SQL execution backend.
  *
  * Replaces the reference's per-DBMS connector family
  * (`core/db_connect.py:14-147`: sqlite / Snowflake / BigQuery, each
  * returning `(result, error)` without throwing) with one Spark SQL door:
  * `run` never throws, captures wall time (the reference's `time_sql_execution`,
  * `core/db_connect.py:150-155`), and supports cancellation by job group
  * (the reference's 120 s statement timeouts, `core/db_connect.py:71,115`).
  *
  * Scale: the DataFrame returned is lazy — callers decide whether to
  * collect (small benchmark results) or keep it distributed (spill to
  * parquet, the analog of the reference's chunked CSV spill at
  * `core/db_connect.py:33-39`, minus the 500-row driver loop).
  */
class SqlBackend(spark: SparkSession, defaultTimeoutSec: Int = 120) {

  /** The full front door for generated SQL: introspection probes are
    * answered from the catalog, everything else is dialect-transpiled
    * then executed.
    */
  def runDialect(sql: String): ExecResult = {
    val t0 = System.nanoTime()
    Introspection.answer(spark, sql) match {
      case Some(df) => ExecOk(df, secondsSince(t0))
      case None => run(graft.dialect.Transpiler.transpile(sql))
    }
  }

  /** Parse+analyze+execute `sql`; analysis errors are values, not throws. */
  def run(sql: String): ExecResult = {
    val t0 = System.nanoTime()
    try {
      val df = spark.sql(sql)
      df.queryExecution.assertAnalyzed() // surface analysis errors eagerly
      ExecOk(df, secondsSince(t0))
    } catch {
      case NonFatal(e) => ExecErr(renderError(e), secondsSince(t0))
    }
  }

  /** Execute and materialize a small result (driver-side rows), with a
    * watchdog that cancels the job group on timeout — the Spark-native
    * version of the reference's `func_timeout`/statement-timeout pattern.
    */
  def runCollect(sql: String, timeoutSec: Int = defaultTimeoutSec): ExecResult =
    runCollectDf(() => spark.sql(sql), sql, timeoutSec)

  /** `runCollect` over a caller-built DataFrame — the door for dialect
    * front ends whose rewrite needs the analyzed plan (e.g.
    * `SqliteExec.sql`). The builder runs INSIDE the job group / timeout
    * scope, so analysis errors and runaway planning are governed too.
    */
  def runCollectDf(build: () => DataFrame, label: String,
      timeoutSec: Int = defaultTimeoutSec): ExecResult = {
    val t0 = System.nanoTime()
    val group = s"graft-sql-${java.util.UUID.randomUUID()}"
    try {
      // The job group is a thread-local: it must be set on the thread that
      // actually runs collect() (the Future body), not the calling thread —
      // pool threads don't inherit it, and a stale group on a reused pool
      // thread could cancel someone else's query.
      val fut = scala.concurrent.Future {
        spark.sparkContext.setJobGroup(group, label.take(200), interruptOnCancel = true)
        try {
          val df = build()
          df.collect() // force execution inside the job group
          df
        } finally {
          spark.sparkContext.clearJobGroup()
        }
      }(scala.concurrent.ExecutionContext.global)
      val df = scala.concurrent.Await.result(
        fut, scala.concurrent.duration.Duration(timeoutSec.toLong, "s"))
      // scan accounting (BigQuery total_bytes_processed analog,
      // core/db_connect.py:117-119) — logged per query
      val stats = ScanMetrics.fromExecuted(df.queryExecution)
      if (stats.bytesRead > 0)
        graft.util.GraftLog.info(
          f"query scanned ${stats.bytesRead / 1e9}%.4f GB (${stats.filesRead} files)")
      ExecOk(df, secondsSince(t0))
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        ExecErr(s"timeout after ${timeoutSec}s", secondsSince(t0))
      case NonFatal(e) => ExecErr(renderError(e), secondsSince(t0))
    }
  }

  /** Stringified execution for LLM feedback loops — the analog of the
    * reference's `execute_sql` (`core/db_connect.py:158-191`), including
    * its "No data found" convention for empty results.
    */
  def runToString(sql: String, maxRows: Int = 20): String =
    runDialect(sql) match {
      case ExecOk(df, _) =>
        val rows = df.limit(maxRows + 1).collect()
        if (rows.isEmpty) "No data found for the specified query."
        else if (rows.length == 1 && df.columns.length == 1)
          // 1×1 result → bare scalar (core/db_connect.py:130-131)
          Option(rows(0).get(0)).map(_.toString).getOrElse("NULL")
        else {
          val shown = rows.take(maxRows)
          val header = df.columns.mkString(", ")
          val body = shown.map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
            .mkString(", ")).mkString("\n")
          val more = if (rows.length > maxRows) s"\n... (${maxRows}+ rows)" else ""
          s"$header\n$body$more"
        }
      case ExecErr(err, _) => s"Execution error: $err"
    }

  private def secondsSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  private def renderError(e: Throwable): String = {
    val cls = e.getClass.getSimpleName
    val msg = Option(e.getMessage).getOrElse("").linesIterator.take(6).mkString(" ")
    s"$cls: $msg"
  }
}
