package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Replaces the reference's per-backend connection handling
  * (Squrve `core/db_connect.py:14-147`) with a single Spark SQL backend.
  * Local-mode defaults are tuned for the test harness (local[32],
  * 32 shuffle partitions); on a real cluster the builder args are
  * overridden by spark-submit confs, so everything here is a default,
  * not a hard-coding.
  */
object GraftSession {

  /** Number of local cores / shuffle partitions for the harness. */
  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)

  def build(appName: String = "graft", cores: Int = defaultParallelism): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      // At 100 TB scale shuffle partitions come from AQE coalescing; the
      // static value only seeds the initial partition count.
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which the vectorized
      // reader rejects — read nanos as long session-wide (Tables.load
      // still sets it defensively for externally-built sessions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide generated plans (64-bit simhash vote matrix, the 513-term
      // classifier scoring expression) overflow the default 25-field
      // plan-string cap and emit a WARN per run; raise the cap so log
      // tails stay clean (the strings are only built when logged)
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // CacheBin.drain intentionally unpersists eagerly-localCheckpointed
    // frames once their query has fully consumed them (the block-leak
    // fix); Spark logs a WARN per released RDD ("was locally
    // checkpointed ... cannot be recomputed after unpersisting") purely
    // to flag that the RDD must not be reused — which drain guarantees.
    // Suppress exactly that MESSAGE (any RDD class), never a whole
    // logger: a class-level mute would also hide real warnings those
    // classes can emit.
    suppressBenignCheckpointReleaseWarn()
    spark
  }

  private lazy val suppressBenignCheckpointReleaseWarn: () => Unit = {
    import org.apache.logging.log4j.core.{Filter, LogEvent}
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val filter = new org.apache.logging.log4j.core.filter.AbstractFilter(
      Filter.Result.DENY, Filter.Result.NEUTRAL) {
      override def filter(event: LogEvent): Filter.Result = {
        val msg = event.getMessage.getFormattedMessage
        if (msg.contains("was locally checkpointed") &&
          msg.contains("cannot be recomputed after unpersisting"))
          Filter.Result.DENY
        else Filter.Result.NEUTRAL
      }
    }
    // attach to the ROOT LoggerConfig: un-configured loggers (every
    // Spark RDD class) route through it, and ITS filter chain is the
    // one consulted — a Configuration-level addFilter is not
    ctx.getConfiguration.getRootLogger.addFilter(filter)
    ctx.updateLoggers()
    () => ()
  }
}
