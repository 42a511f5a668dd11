package graft.tools

import graft.core.{Engine, GraftConfig, GraftSession}
import graft.llm.MockLlm

/** End-to-end Text-to-SQL pipeline drive, configured entirely from a
  * `GraftConfig` (the reference's `startup_run/run.py` Router→Engine
  * shape): registry-resolved data root → reduce → parse links →
  * generate → optimize (execution-feedback repair) → eval_all summary.
  * Run:
  *   sbt "runMain graft.tools.PipelineDemo [dataId]"   (e.g. testdata:sf0.001)
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dataId = args.headOption.getOrElse("testdata:sf0.001")
    val spark = GraftSession.build("graft-pipeline-demo", 4)
    import spark.implicits._

    val cfg = GraftConfig.fromPairs(Map(
      "data_id" -> dataId,
      "eval_timeout_sec" -> "60",
      "parallelism" -> "2"))

    // deterministic mock LLM: a playbook keyed on question text
    val llm = MockLlm(playbook = Seq(
      "how many customers" -> "SELECT COUNT(*) AS n FROM customer",
      "names of all regions" -> "SELECT r_name FROM region ORDER BY r_name",
      "Schema_links" -> "Schema_links: [customer.c_custkey, region.r_name]"))

    val engine = new Engine(spark, cfg, llm)
    println(s"[demo] config $dataId -> data root ${engine.dbPath}")

    val questions = Seq(
      ("d1", "how many customers are there",
        "SELECT COUNT(*) AS n FROM customer"),
      ("d2", "names of all regions in alphabetical order",
        "SELECT r_name FROM region ORDER BY r_name"))
      .toDF("instance_id", "question", "gold_sql")

    val answered = engine.execute(questions)
    println("[demo] pipeline output:")
    answered.select("instance_id", "pred_sql").show(truncate = false)

    val (_, summary) = engine.evaluate(answered)
    println("[demo] eval_all summary:")
    engine.summaryDf(summary).show(truncate = false)
    spark.stop()
    if (summary.avg < 1.0) sys.exit(1)
  }
}
