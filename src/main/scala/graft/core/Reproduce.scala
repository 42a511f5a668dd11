package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.DatasetIO
import graft.evalx.{Evaluator, ExItem, PassAtN}
import graft.llm.LlmClient

/** The reproduction harness — the port of `reproduce/run.py` +
  * `reproduce/eval_utils.py:43-100`: a config file names a benchmark
  * run, the engine's generate pipeline is replicated `generate_num`
  * times over the same question set, each replica's answered dataset is
  * saved (`dataset_save_dir/task_<i>`), and the replicas aggregate to
  * pass@n — a question counts when at least one replica's gold
  * executes, and passes when at least one replica reaches EX = 1.
  *
  * Spark shape: each replica run is the same distributed actor pipeline
  * `Engine.execute` drives; the pass@n join happens on driver-sized
  * benchmark items (the row count is the number of QUESTIONS — each
  * one already fans out distributed jobs underneath).
  */
object Reproduce {

  /** Run `max(cfg.generateNum, 1)` generate replicas over `questions`
    * (`instance_id`, `question`, optional `gold_sql`), optionally saving
    * each replica's answered frame, then aggregate pass@n. Returns the
    * aggregate plus its one-row summary frame.
    */
  def run(spark: SparkSession, cfg: GraftConfig, llm: LlmClient,
      questions: DataFrame, saveDir: Option[String] = None): (PassAtN, DataFrame) = {
    val engine = new Engine(spark, cfg, llm)
    val n = math.max(cfg.generateNum, 1)
    val hasGold = questions.columns.contains("gold_sql")
    val order = questions.select("instance_id").collect().map(_.getString(0)).toSeq
    val gold: Map[String, Option[String]] =
      if (!hasGold) order.map(_ -> Option.empty[String]).toMap
      else questions.select("instance_id", "gold_sql").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap

    // replicas align by question index (`eval_utils.py:60-67` zips the
    // n saved datasets row-wise)
    val replicas: Seq[Seq[ExItem]] = (1 to n).map { i =>
      val answered = engine.execute(questions)
      saveDir.foreach { d =>
        DatasetIO.save(answered, s"${d.stripSuffix("/")}/task_$i.json")
      }
      val preds = answered.select("instance_id", "pred_sql").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      // replica results are materialized above: release any
      // operator-persisted frames before the next replica runs
      graft.core.CacheBin.drain()
      order.map(iid => ExItem(iid, gold(iid), preds.getOrElse(iid, None)))
    }

    // same dialect routing as Engine.evaluate — a sqlite benchmark must
    // score identically whether run via Engine, Reproduce, or serving
    val pass = new Evaluator(spark, cfg.evalTimeoutSec, cfg.parallelism, engine.dialect)
      .passAtN(replicas)
    import spark.implicits._
    val summary = Seq((pass.passRate, pass.passedQuestions.toLong,
      pass.validQuestions.toLong, pass.totalQuestions.toLong, n.toLong))
      .toDF("pass_rate", "passed_questions", "valid_questions",
        "total_questions", "n_replicas")
    (pass, summary)
  }

  /** Config-file entry (`reproduce/run.py:11-26`): the config names the
    * engine knobs (`GraftConfig` fields), the question set
    * (`questions_path`, any `DatasetIO.load` format with `instance_id`,
    * `question`, optional `gold_sql`) and, optionally,
    * `dataset_save_dir` for per-replica answered datasets.
    */
  def fromConfigFile(spark: SparkSession, configPath: String,
      llm: LlmClient): (PassAtN, DataFrame) = {
    val cfg = GraftConfig.fromJsonFile(configPath)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(configPath))
    val qPath = Option(root.get("questions_path")).filter(_.isTextual)
      .map(_.asText()).getOrElse(throw new IllegalArgumentException(
        s"reproduce config $configPath must set questions_path"))
    val saveDir = Option(root.get("dataset_save_dir")).filter(_.isTextual)
      .map(_.asText())
    run(spark, cfg, llm, DatasetIO.load(spark, qPath), saveDir)
  }
}
