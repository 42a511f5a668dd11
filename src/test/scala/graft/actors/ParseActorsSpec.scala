package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.MockLlm
import graft.text.SchemaRender

/** §2.6 parse actors: rendering, link normalization, CoT parse with a
  * mock LLM, bidirectional backward pass, slice-parallel parsing.
  */
class ParseActorsSpec extends SparkSpec {

  private lazy val schemaDf = {
    import spark.implicits._
    Seq(
      ("users", "id", "INTEGER", "user id", true, ""),
      ("users", "name", "TEXT", "user name", false, ""),
      ("orders", "uid", "INTEGER", "buyer", false, "[users(id)]"),
      ("orders", "total", "REAL", "order total", false, ""))
      .toDF("table_name", "column_name", "column_types",
        "column_descriptions", "primary_key", "foreign_key")
  }

  private lazy val questions = {
    import spark.implicits._
    Seq(("q1", "total per user name"), ("q2", "count orders"))
      .toDF("instance_id", "question")
  }

  test("parseSchemaFromDf renders tables, PKs and FKs") {
    val txt = SchemaRender.parseSchemaFromDf(schemaDf)
    assert(txt.contains("### Table = `users`"))
    assert(txt.contains("name(Type: TEXT, Description: user name)"))
    assert(txt.contains("### Primary Keys:\nusers(`id`)"))
    assert(txt.contains("### Foreign Keys:\norders(uid) references users(id)"))
  }

  test("link parse + normalize: types A/B/C") {
    val parsed = SchemaRender.parseSchemaLinkFromStr(
      "Schema_links: [users.name, `orders.total`, 'Europe', users.name]")
    assert(parsed == Seq("users.name", "orders.total", "Europe", "users.name"))
    val n = SchemaRender.normalizeLinks(parsed)
    assert(n.typeA == Seq("users.name", "orders.total"))
    assert(n.typeB == ((Seq("users", "orders"), Seq("users.name", "orders.total", "users.name"))))
    assert(n.typeC == Seq("users.name", "orders.total", "Europe"))
    assert(SchemaRender.formatLinks(parsed, "B").startsWith("Linked Tables: [users, orders]"))
  }

  test("CoT parser writes normalized schema_links per question") {
    val llm = MockLlm(playbook = Seq(
      "total per user name" -> "Schema_links: [users.name, orders.total]",
      "count orders" -> "Schema_links: [orders.uid]"))
    val out = ParseActors.dinsql(llm, schemaDf).act(questions)
    val byId = out.collect().map(r => r.getString(0) ->
      r.getSeq[String](out.columns.indexOf("schema_links"))).toMap
    assert(byId("q1") == Seq("users.name", "orders.total"))
    assert(byId("q2") == Seq("orders.uid"))
  }

  test("bidirectional parser unions LLM forward and SQL backward links") {
    import spark.implicits._
    val withPred = questions.withColumn("pred_sql",
      when(col("instance_id") === "q1",
        lit("SELECT users.name, total FROM orders JOIN users ON uid = users.id")))
    val llm = MockLlm(default = "Schema_links: [orders.total]")
    val out = ParseActors.rslsqlBiDir(llm, schemaDf).act(withPred)
    val q1 = out.filter(col("instance_id") === "q1").head()
      .getSeq[String](out.columns.indexOf("schema_links"))
    assert(q1.contains("orders.total")) // forward
    assert(q1.contains("users.name") && q1.contains("uid")) // backward from SQL
  }

  test("slice-parallel parse merges distinct links across schema slices") {
    val llm = new graft.llm.LlmClient {
      def complete(prompt: String): String = {
        // reply links only for columns present in this slice's rendering
        val links = Seq("users.name", "orders.total").filter(l =>
          prompt.contains(l.split("\\.")(1) + "("))
        s"Schema_links: [${links.mkString(", ")}]"
      }
    }
    val out = ParseActors.macsql(llm, schemaDf)
      .actSliced(questions, sliceSize = 2)
    val q1 = out.filter(col("instance_id") === "q1").head()
      .getSeq[String](out.columns.indexOf("schema_links"))
    assert(q1.toSet == Set("users.name", "orders.total")) // one from each slice
  }
}
