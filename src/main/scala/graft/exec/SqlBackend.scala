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

/** Capped driver-side result of a governed execution: the rows the
  * watchdog actually saw, plus the output column names.
  */
final case class ExecRows(rows: Seq[org.apache.spark.sql.Row],
    columns: Seq[String], seconds: Double)

object SqlBackend {
  /** Forcing-materialization cap — above the comparator's 100 000-row
    * ceiling, so governance never changes a comparison result.
    */
  val CollectCap: Int = 100000
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
  def runDialect(sql: String): ExecResult = runDialect(sql, "spark")

  /** [[runDialect]] with an explicit source dialect (sqlite /
    * snowflake / bigquery — the reference's executor surface,
    * `core/db_connect.py:49-136`): the matching transpiler arm runs
    * before `spark.sql`.
    */
  def runDialect(sql: String, dialect: String): ExecResult = {
    val t0 = System.nanoTime()
    Introspection.answer(spark, sql) match {
      case Some(df) => ExecOk(df, secondsSince(t0))
      case None => run(graft.dialect.Transpiler.forDialect(dialect)(sql))
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
    * The forcing materialization is CAPPED (`SqlBackend.CollectCap`
    * rows — above what any comparator consumes): an unbounded gold
    * query cannot OOM the driver just to prove it executes.
    */
  def runCollectDf(build: () => DataFrame, label: String,
      timeoutSec: Int = defaultTimeoutSec): ExecResult =
    governed(label, timeoutSec) { () =>
      val df = build()
      df.queryExecution.assertAnalyzed()
      val limited = df.limit(SqlBackend.CollectCap + 1)
      limited.collect() // force execution inside the job group, capped
      logScan(limited)
      df
    } match {
      case Right((df, secs)) => ExecOk(df, secs)
      case Left(err)         => err
    }

  /** Governed execution that RETURNS the capped collected rows — the
    * evaluator path: the timed/cancellable run is the ONLY run, so the
    * comparator judges exactly the rows the watchdog saw instead of
    * re-executing the query ungoverned (and paying it twice).
    */
  def runCollectRows(build: () => DataFrame, label: String,
      timeoutSec: Int = defaultTimeoutSec,
      maxRows: Int = SqlBackend.CollectCap): Either[ExecErr, ExecRows] =
    governed(label, timeoutSec) { () =>
      val df = build()
      df.queryExecution.assertAnalyzed()
      val limited = df.limit(maxRows + 1)
      val rows = limited.collect().toSeq
      logScan(limited)
      ExecRows(rows, df.columns.toSeq, 0.0)
    }.map { case (r, secs) => r.copy(seconds = secs) }

  /** Run `body` on a dedicated interruptible thread inside a job group:
    * a timeout cancels the group's ACTIVE jobs and interrupts the
    * thread, so planning phases and driver-side loops that would treat
    * a cancelled job as an error value cannot keep running (the
    * abandoned-Future version of this leaked exactly that way). The
    * job group is a thread-local: it must be set on the worker, not the
    * caller — and a dedicated thread cannot cancel anyone else's query.
    */
  private def governed[A](label: String, timeoutSec: Int)(
      body: () => A): Either[ExecErr, (A, Double)] = {
    val t0 = System.nanoTime()
    val group = s"graft-sql-${java.util.UUID.randomUUID()}"
    @volatile var outcome: Either[Throwable, A] = null
    val worker = new Thread(() => {
      spark.sparkContext.setJobGroup(group, label.take(200), interruptOnCancel = true)
      try outcome = Right(body())
      catch { case e: Throwable => outcome = Left(e) }
      finally spark.sparkContext.clearJobGroup()
    }, "graft-sql-worker")
    worker.setDaemon(true)
    worker.start()
    // Thread.join(0) waits FOREVER — a config with timeout 0 (or
    // negative) must mean "strictest governance", not "none": clamp to
    // a 1-second minimum before computing the join millis.
    val effTimeoutSec = math.max(1, timeoutSec)
    worker.join(effTimeoutSec * 1000L)
    if (worker.isAlive) {
      spark.sparkContext.cancelJobGroup(group)
      worker.interrupt()
      Left(ExecErr(s"timeout after ${effTimeoutSec}s", secondsSince(t0)))
    } else outcome match {
      case Right(a) => Right((a, secondsSince(t0)))
      case Left(e)  => Left(ExecErr(renderError(e), secondsSince(t0)))
      case null     => Left(ExecErr("execution thread died", secondsSince(t0)))
    }
  }

  // scan accounting (BigQuery total_bytes_processed analog,
  // core/db_connect.py:117-119) — logged per query
  private def logScan(df: DataFrame): Unit = {
    val stats = ScanMetrics.fromExecuted(df.queryExecution)
    if (stats.bytesRead > 0)
      graft.util.GraftLog.info(
        f"query scanned ${stats.bytesRead / 1e9}%.4f GB (${stats.filesRead} files)")
  }

  /** Stringified execution for LLM feedback loops — the analog of the
    * reference's `execute_sql` (`core/db_connect.py:158-191`), including
    * its "No data found" convention for empty results.
    */
  def runToString(sql: String, maxRows: Int = 20): String =
    // governed like every other executing door: LLM loops routinely
    // produce pathological SQL, and an ungoverned collect here would
    // wedge the generation pipeline past every timeout
    runCollectRows(() => Introspection.answer(spark, sql)
        .getOrElse(spark.sql(graft.dialect.Transpiler.transpile(sql))),
      sql, defaultTimeoutSec, maxRows) match {
      case Right(ExecRows(rows, columns, _)) =>
        if (rows.isEmpty) "No data found for the specified query."
        else if (rows.length == 1 && columns.length == 1)
          // 1×1 result → bare scalar (core/db_connect.py:130-131)
          Option(rows.head.get(0)).map(_.toString).getOrElse("NULL")
        else {
          val shown = rows.take(maxRows)
          val header = columns.mkString(", ")
          val body = shown.map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
            .mkString(", ")).mkString("\n")
          val more = if (rows.length > maxRows) s"\n... (${maxRows}+ rows)" else ""
          s"$header\n$body$more"
        }
      case Left(err) => s"Execution error: ${err.error}"
    }

  private def secondsSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  private def renderError(e: Throwable): String = {
    val cls = e.getClass.getSimpleName
    val msg = Option(e.getMessage).getOrElse("").linesIterator.take(6).mkString(" ")
    s"$cls: $msg"
  }
}
