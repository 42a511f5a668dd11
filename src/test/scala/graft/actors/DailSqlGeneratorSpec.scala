package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.LlmClient

/** DAIL-SQL mechanics: masking makes similar-intent questions rank
  * together regardless of the concrete schema words; skeletons land in
  * the prompt; the few-shot block carries the top-k exemplars.
  */
class DailSqlGeneratorSpec extends SparkSpec {

  private lazy val schemaDf = {
    import spark.implicits._
    Seq(("users", "name", "TEXT"), ("users", "age", "INTEGER"),
      ("orders", "total", "REAL"))
      .toDF("table_name", "column_name", "column_types")
  }

  test("few-shot ranking uses masked-question jaccard; skeletons in prompt") {
    import spark.implicits._
    val exemplars = Seq(
      ("show the name of every user", "SELECT name FROM users"),
      ("sum the total of all orders", "SELECT SUM(total) FROM orders"),
      ("completely unrelated cheese question", "SELECT 1"))
    val prompts = scala.collection.mutable.ArrayBuffer[String]()
    val llm = new LlmClient {
      def complete(p: String): String = { prompts += p; "SELECT name FROM users" }
    }
    val out = DailSqlGenerator(llm, schemaDf, exemplars, k = 2).act(
      Seq(("i1", "show the age of every user")).toDF("instance_id", "question"))
    assert(out.select("pred_sql").head().getString(0) == "SELECT name FROM users")
    val p = prompts.head
    // top-2 exemplars must include the masked-similar "show the name..." one
    assert(p.contains("show the name of every user"))
    assert(!p.contains("cheese")) // the unrelated exemplar is ranked out
    assert(p.contains("skeleton: select _ from _"))
  }
}
