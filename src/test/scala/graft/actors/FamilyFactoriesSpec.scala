package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.exec.SqlBackend
import graft.llm.MockLlm

/** RSL-SQL / LinkAlign generators and the adaptive optimizer actor. */
class FamilyFactoriesSpec extends SparkSpec {

  private lazy val backend = {
    Tables.registerAll(spark, sfDir)
    new SqlBackend(spark)
  }

  private lazy val schemaDf = {
    import spark.implicits._
    Seq(("region", "r_regionkey", "INTEGER"), ("region", "r_name", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
  }

  private def questions = {
    import spark.implicits._
    Seq(("f1", "list region names")).toDF("instance_id", "question")
  }

  test("RslSqlGenerator: binary exec selection keeps the agreeing candidate") {
    val llm = MockLlm(playbook = Seq(
      "Link the question" -> "Schema_links: [region.r_name]",
      "Preliminary SQL" -> "SELECT r_name FROM region",
      "condition keywords" -> "[names]",
      "Augmented SQL" -> "SELECT r_name FROM region ORDER BY r_name"))
    val out = RslSqlGenerator(llm, backend, schemaDf).act(questions)
    val sql = out.select("pred_sql").head().getString(0)
    // both execute; 2 singleton groups → fastest wins; either is executable
    assert(sql.startsWith("SELECT r_name FROM region"))
  }

  test("RslSqlGenerator: the packaged preliminary template body reaches the LLM verbatim") {
    val dir = new java.io.File(getClass.getResource("/templates").toURI)
    val t = graft.llm.PromptTemplates.loadFromDir(dir.getAbsolutePath)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val llm = new graft.llm.LlmClient {
      def complete(p: String): String = { seen += p
        if (p.contains("Link the question")) "Schema_links: [region.r_name]"
        else if (p.contains("[Preliminary SQL]")) "SELECT r_name FROM region"
        else if (p.contains("condition keywords")) "[names]"
        else if (p.contains("Augmented SQL")) "SELECT r_name FROM region ORDER BY r_name"
        else "0"
      }
    }
    val out = RslSqlGenerator(llm, backend, schemaDf, tpl = t).act(questions)
    assert(out.select("pred_sql").head().getString(0)
      .startsWith("SELECT r_name FROM region"))
    val prelim = seen.find(_.contains("[Preliminary SQL]")).get
    assert(prelim.contains("[Bidirectional schema links]\nregion.r_name"),
      "bidir links must land in the packaged body's section")
    assert(prelim.contains("[Question]\nlist region names"))
  }

  test("LinkAlignGenerator: link -> tiered generate -> debug") {
    val llm = MockLlm(playbook = Seq(
      "schema-linking agent" -> "Schema_links: [region.r_name]",
      "Classify the question" -> "EASY",
      "[EASY]" -> "SELECT r_name FROM missing_table",
      "Error history" -> "SELECT r_name FROM region"))
    val out = LinkAlignGenerator(llm, backend, schemaDf).act(questions)
    assert(out.select("pred_sql").head().getString(0) == "SELECT r_name FROM region")
  }

  test("AdaptiveOptimizer: healthy SQL untouched, schema failure repaired") {
    import spark.implicits._
    val llm = MockLlm(playbook = Seq(
      "Error history" -> "SELECT COUNT(*) AS n FROM region"))
    val opt = FamilyFactories.adaptiveOptimizer(llm, backend, schemaDf)
    val healthy = Seq(("a1", "q", "SELECT r_name FROM (SELECT r_name FROM region) t"))
      .toDF("instance_id", "question", "pred_sql")
    assert(opt.act(healthy).select("pred_sql").head().getString(0)
      .startsWith("SELECT r_name FROM (SELECT"))
    val broken = Seq(("a2", "q", "SELECT COUNT(*) FROM no_table"))
      .toDF("instance_id", "question", "pred_sql")
    assert(opt.act(broken).select("pred_sql").head().getString(0) ==
      "SELECT COUNT(*) AS n FROM region")
  }

  test("named scaler/optimizer factories carry family names") {
    val llm = MockLlm(default = "SELECT 1")
    assert(FamilyFactories.dinsqlScaler(llm, 2).name == "DINSQLScaler")
    assert(FamilyFactories.chessOptimizer(llm, backend, schemaDf).name == "CHESSOptimizer")
    assert(FamilyFactories.openSearchOptimizer(llm, backend, schemaDf).mode == "chain")
  }
}
