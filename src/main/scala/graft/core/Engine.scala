package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.actors.{LlmGenerator, OptimizeActors, ParseActors, PipelineActor, ZeroReducer}
import graft.catalog.{SchemaCodec, Tables}
import graft.evalx.{Evaluator, ExOutcome, ExSummary}
import graft.exec.SqlBackend
import graft.llm.LlmClient

/** The config-described run loop — the Spark-native mirror of the
  * reference's Router → Engine → execute() → evaluate() entry
  * (`startup_run/run.py:11-22`, `core/engine.py`): a `GraftConfig`
  * names the data source through the benchmark registry + identifier
  * grammar, and each knob feeds the stage that consumes it —
  * `sqlTimeoutSec` the backend, `parallelism` the actors' bounded LLM
  * fan-out and the evaluator pool, `debugTurns` the repair optimizer,
  * `evalTimeoutSec` per-item evaluation.
  *
  * `execute` runs the default reduce → parse → generate → optimize
  * chain (the reference's single-SQL path) over a questions frame;
  * pass a custom actor list via `execute(questions, actors)` for the
  * candidate-scaling path (`LlmScaler(llm, cfg.generateNum)` + a
  * selector). `evaluate` is eval_all over the answered frame,
  * returning per-item outcomes plus the one-row summary.
  */
final class Engine(spark: SparkSession, cfg: GraftConfig, llm: LlmClient,
    schemaTables: Seq[String] = Seq("region", "nation", "customer", "orders")) {

  /** Benchmark registry: the builtin map, extended by the config's
    * optional reference-shaped `sys_config.json`.
    */
  val registry: Map[String, GraftConfig.Benchmark] =
    if (cfg.sysConfigPath.nonEmpty) GraftConfig.loadBenchmarks(cfg.sysConfigPath)
    else GraftConfig.benchmarks

  /** Data root resolved from the registry: `data_id = "<benchmark>:<sub>"`. */
  val dbPath: String = {
    val (bench, sub, _) = cfg.dataIdentifier
    GraftConfig.resolveDbPath(bench, sub, registry).getOrElse(
      throw new IllegalArgumentException(
        s"unknown benchmark '$bench' (registered: ${registry.keys.mkString(", ")})"))
  }

  private lazy val backend = new SqlBackend(spark, cfg.sqlTimeoutSec)

  /** Schema-as-data harvested from the registered catalog tables. */
  lazy val schemaDf: DataFrame = {
    Tables.registerAll(spark, dbPath)
    SchemaCodec.toDF(spark, SchemaCodec.centralToParallel(
      SchemaCodec.fromRegisteredTables(spark, "tpch", schemaTables)))
  }

  /** The configured actor chain. ZeroReducer stands in when no reduce
    * turns are configured (reduceTurns == 0, the registry default);
    * the LLM-calling stages fan out at cfg.parallelism and the
    * optimizer repairs for cfg.debugTurns rounds.
    */
  def pipeline(): PipelineActor = PipelineActor(Seq(
    ZeroReducer(),
    ParseActors.dinsql(llm, schemaDf),
    LlmGenerator(llm, schemaDf, parallelism = cfg.parallelism),
    OptimizeActors.macsql(llm, backend, schemaDf,
      debugTurns = math.max(cfg.debugTurns, 1), parallelism = cfg.parallelism)))

  /** Run the pipeline over (instance_id, question, gold_sql) rows. */
  def execute(questions: DataFrame): DataFrame = pipeline().act(questions)

  /** Run a caller-supplied actor chain with the same configured data
    * root and schema — the override point for scaling/selection paths.
    */
  def execute(questions: DataFrame, actors: Seq[graft.actors.Actor]): DataFrame =
    graft.actors.PipelineActor(actors).act(questions)

  /** SQL dialect of the configured benchmark (registry `dbType`):
    * spider/bird-family sqlite benchmarks evaluate through the
    * sqlite-strict door (`SqliteExec`), everything else through plain
    * transpile + `spark.sql`.
    */
  def dialect: String = {
    val (bench, _, _) = cfg.dataIdentifier
    registry.get(bench).map(_.dbType).getOrElse("spark")
  }

  /** eval_all over the answered frame: per-item outcomes + summary. */
  def evaluate(answered: DataFrame): (Seq[ExOutcome], ExSummary) = {
    val items = answered.select("instance_id", "gold_sql", "pred_sql")
      .collect().map { r =>
        graft.evalx.ExItem(r.getString(0), Option(r.getString(1)), Option(r.getString(2)))
      }
    new Evaluator(spark, cfg.evalTimeoutSec, cfg.parallelism, dialect).evalAll(items.toSeq)
  }

  /** The eval_all summary as a one-row frame (`avg_ex, valid_num,
    * total_items`) — the shape the reference prints at the end of a run.
    */
  def summaryDf(summary: ExSummary): DataFrame = {
    import spark.implicits._
    Seq((summary.avg, summary.validNum.toLong, summary.totalItems.toLong))
      .toDF("avg_ex", "valid_num", "total_items")
  }
}
