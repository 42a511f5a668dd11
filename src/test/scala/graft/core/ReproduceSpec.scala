package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.llm.MockLlm

/** The reproduction harness from a config file alone: n generate-task
  * replicas over the configured question set, per-replica saved
  * datasets, pass@n aggregate row (`reproduce/run.py` +
  * `reproduce/eval_utils.py:43-100` mirror).
  */
class ReproduceSpec extends SparkSpec {

  private val llm = MockLlm(playbook = Seq(
    "how many customers" -> "SELECT COUNT(*) AS n FROM customer",
    // executes fine but returns the wrong rows: valid, never passes
    "names of all regions" -> "SELECT r_name FROM region WHERE r_name = 'NOPE'",
    "Schema_links" -> "Schema_links: [customer.c_custkey, region.r_name]"))

  test("fromConfigFile runs n replicas and aggregates pass@n") {
    val dir = Files.createTempDirectory("graft_repro")
    val qPath = dir.resolve("questions.json")
    Files.writeString(qPath,
      """[{"instance_id": "r1", "question": "how many customers are there",
        |  "gold_sql": "SELECT COUNT(*) AS n FROM customer"},
        | {"instance_id": "r2", "question": "names of all regions in order",
        |  "gold_sql": "SELECT r_name FROM region ORDER BY r_name"}]""".stripMargin)
    val cfgPath = dir.resolve("config.json")
    Files.writeString(cfgPath,
      s"""{"data_id": "testdata:sf0.001", "generate_num": 2,
         | "parallelism": 2, "eval_timeout_sec": 60,
         | "questions_path": "$qPath",
         | "dataset_save_dir": "$dir/replicas"}""".stripMargin)

    val (pass, summary) = Reproduce.fromConfigFile(spark, cfgPath.toString, llm)

    // r1 passes in every replica, r2 is valid (gold executes) but never
    // correct → pass@2 = 1/2
    assert(pass.totalQuestions == 2 && pass.validQuestions == 2)
    assert(pass.passedQuestions == 1 && pass.passRate == 0.5)

    val row = summary.head()
    assert(row.getDouble(0) == 0.5)
    assert(row.getLong(1) == 1L && row.getLong(2) == 2L && row.getLong(3) == 2L)
    assert(row.getLong(4) == 2L, "n_replicas from config generate_num")

    // per-replica answered datasets are saved like the reference's
    // dataset_save_dir/task_<i>
    Seq(1, 2).foreach { i =>
      assert(Files.exists(dir.resolve(s"replicas/task_$i.json")),
        s"replica $i dataset not saved")
    }
  }

  test("a config without questions_path fails loudly") {
    val p = Files.createTempFile("graft_repro_bad", ".json")
    Files.writeString(p, """{"data_id": "testdata:sf0.001"}""")
    val e = intercept[IllegalArgumentException](
      Reproduce.fromConfigFile(spark, p.toString, llm))
    assert(e.getMessage.contains("questions_path"))
  }
}
