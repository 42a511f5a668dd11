package graft.core

import graft.SparkSpec
import graft.llm.MockLlm

/** The full configured run loop from `GraftConfig` alone — mirror of
  * the reference's `startup_run/run.py` Router→Engine drive: config →
  * resolved data root → reduce/parse/generate/optimize → eval_all
  * summary row.
  */
class EngineSpec extends SparkSpec {

  private val llm = MockLlm(playbook = Seq(
    "how many customers" -> "SELECT COUNT(*) AS n FROM customer",
    "names of all regions" -> "SELECT r_name FROM region ORDER BY r_name",
    "Schema_links" -> "Schema_links: [customer.c_custkey, region.r_name]"))

  test("config identifier grammar resolves the benchmark registry root") {
    val cfg = GraftConfig.fromPairs(Map("data_id" -> "testdata:sf0.001"))
    assert(new Engine(spark, cfg, llm).dbPath == "/root/testdata/sf0.001")
  }

  test("a reference-shaped JSON config file loads via fromJsonFile") {
    val p = java.nio.file.Files.createTempFile("graft_cfg", ".json")
    java.nio.file.Files.writeString(p,
      """{"data_id": "testdata:sf0.001", "parallelism": 2,
        | "decay_rate": 0.7, "unknown_reference_key": {"nested": true}}""".stripMargin)
    val cfg = GraftConfig.fromJsonFile(p.toString)
    assert(cfg.dataId == "testdata:sf0.001")
    assert(cfg.parallelism == 2 && cfg.decayRate == 0.7)
    assert(cfg.generateNum == 3, "unset keys keep defaults")
    assert(new Engine(spark, cfg, llm).dbPath == "/root/testdata/sf0.001")
  }

  test("an unregistered benchmark fails loudly") {
    val cfg = GraftConfig.fromPairs(Map("data_id" -> "nosuch:dev"))
    val e = intercept[IllegalArgumentException](new Engine(spark, cfg, llm).dbPath)
    assert(e.getMessage.contains("nosuch"))
  }

  test("a reference-shaped sys_config.json extends the benchmark registry") {
    val p = java.nio.file.Files.createTempFile("graft_sys", ".json")
    java.nio.file.Files.writeString(p,
      """{"benchmark": [
        |  {"id": "mybench", "root_path": "/root/testdata", "db_type": "sqlite",
        |   "has_sub": true,
        |   "sub_data": [{"sub_id": "sf0.001", "has_label": true}]}
        |]}""".stripMargin)
    val cfg = GraftConfig.fromPairs(Map(
      "data_id" -> "mybench:sf0.001", "sys_config" -> p.toString))
    val engine = new Engine(spark, cfg, llm)
    assert(engine.dbPath == "/root/testdata/sf0.001")
    assert(engine.dialect == "sqlite", "dbType flows into the evaluation dialect")
    assert(engine.registry.contains("spider"), "builtin registry entries survive")
  }

  test("execute + evaluate run the configured pipeline to an eval_all summary") {
    import spark.implicits._
    val cfg = GraftConfig.fromPairs(Map(
      "data_id" -> "testdata:sf0.001",
      "eval_timeout_sec" -> "60",
      "parallelism" -> "2"))
    val engine = new Engine(spark, cfg, llm)

    val questions = Seq(
      ("d1", "how many customers are there",
        "SELECT COUNT(*) AS n FROM customer"),
      ("d2", "names of all regions in alphabetical order",
        "SELECT r_name FROM region ORDER BY r_name"))
      .toDF("instance_id", "question", "gold_sql")

    val answered = engine.execute(questions)
    assert(answered.columns.contains("pred_sql"))
    assert(answered.count() == 2)

    val (outcomes, summary) = engine.evaluate(answered)
    assert(outcomes.forall(_.score.contains(1)),
      s"expected every item EX=1, got $outcomes")
    assert(summary.avg == 1.0 && summary.validNum == 2 && summary.totalItems == 2)

    val row = engine.summaryDf(summary).head()
    assert(row.getDouble(0) == 1.0 && row.getLong(1) == 2L && row.getLong(2) == 2L)
  }
}
