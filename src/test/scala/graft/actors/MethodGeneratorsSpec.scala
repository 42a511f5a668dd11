package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.exec.SqlBackend
import graft.llm.MockLlm

/** Composed named generators driving real execution with mock LLMs. */
class MethodGeneratorsSpec extends SparkSpec {

  private lazy val backend = {
    Tables.registerAll(spark, sfDir)
    new SqlBackend(spark)
  }

  private lazy val schemaDf = {
    import spark.implicits._
    Seq(("customer", "c_custkey", "INTEGER"), ("customer", "c_mktsegment", "TEXT"),
      ("region", "r_name", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
  }

  private def questions = {
    import spark.implicits._
    Seq(("m1", "how many customers")).toDF("instance_id", "question")
  }

  test("MacSqlGenerator: decompose + generate + repair to an executable SQL") {
    val llm = MockLlm(playbook = Seq(
      "relevant table.column links" -> "Schema_links: [customer.c_custkey]",
      "Decompose" -> "[count rows]",
      "Sub-questions" -> "SELECT COUNT(*) FROM wrong_table",
      "Error history" -> "SELECT COUNT(*) AS n FROM customer"))
    val out = MacSqlGenerator(llm, backend, schemaDf).act(questions)
    assert(out.select("pred_sql").head().getString(0) == "SELECT COUNT(*) AS n FROM customer")
  }

  test("ChessGenerator: entity links from a single scan feed candidate prompts") {
    val llm = new graft.llm.LlmClient {
      def complete(p: String): String =
        if (p.contains("entity keywords")) "[building]"
        else if (p.contains("short checks")) "[]" // fall back to majority vote
        else if (p.contains("Candidate")) {
          assert(p.contains("building ~ customer.c_mktsegment"), "entity context missing")
          "SELECT COUNT(*) AS n FROM customer"
        } else "0"
    }
    val entityTables = Map("customer" ->
      ((Tables.load(spark, sfDir, "customer"), Seq("c_mktsegment"))))
    val out = ChessGenerator(llm, backend, schemaDf, entityTables).act(questions)
    assert(out.select("pred_sql").head().getString(0) == "SELECT COUNT(*) AS n FROM customer")
  }

  test("ChessGenerator: the packaged candidate template body reaches the LLM verbatim") {
    val dir = new java.io.File(getClass.getResource("/templates").toURI)
    val t = graft.llm.PromptTemplates.loadFromDir(dir.getAbsolutePath)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val llm = new graft.llm.LlmClient {
      def complete(p: String): String = { seen += p
        if (p.contains("entity keywords")) "[building]"
        else if (p.contains("short checks")) "[]" // majority-vote fallback
        else if (p.contains("[Attempt")) "SELECT COUNT(*) AS n FROM customer"
        else "0"
      }
    }
    val entityTables = Map("customer" ->
      ((Tables.load(spark, sfDir, "customer"), Seq("c_mktsegment"))))
    val out = ChessGenerator(llm, backend, schemaDf, entityTables, tpl = t)
      .act(questions)
    assert(out.select("pred_sql").head().getString(0) ==
      "SELECT COUNT(*) AS n FROM customer")
    val cand = seen.find(_.contains("[Attempt")).get
    assert(cand.contains("[Attempt 0]"), "index var must substitute")
    assert(cand.contains("[Entity evidence]\nbuilding ~ customer.c_mktsegment"),
      "retrieved entities must land in the packaged body's section")
    assert(cand.contains("[Question]\nhow many customers"))
  }

  test("OpenSearchGenerator: profile context + majority vote over candidates") {
    val llm = MockLlm(playbook = Seq(
      "Candidate 0" -> "SELECT COUNT(*) AS n FROM customer",
      "Candidate 1" -> "SELECT COUNT(*) AS n FROM customer WHERE 1=1",
      "Candidate 2" -> "SELECT COUNT(*) + 1 AS n FROM customer"))
    val out = OpenSearchGenerator(llm, backend, schemaDf,
      profileOf = _ => "c_custkey: 150 distinct, 0 nulls").act(questions)
    // candidates 0 and 1 agree → majority group, first member wins
    assert(out.select("pred_sql").head().getString(0) == "SELECT COUNT(*) AS n FROM customer")
  }

  test("GeneratorRegistry wires the family into workflow specs") {
    GeneratorRegistry.registerAll(MockLlm(default = "SELECT 1 AS x"), backend, schemaDf)
    val wf = WorkflowAgent("generator: LlmGenerator; optimizer: MACSQLOptimizer")
    val out = wf.run(questions)
    assert(out.columns.contains("pred_sql"))
    assert(out.select("pred_sql").head().getString(0) == "SELECT 1 AS x")
  }
}
