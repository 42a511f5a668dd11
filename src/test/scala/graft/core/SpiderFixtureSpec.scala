package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.llm.MockLlm
import graft.serve.ServingServer

/** The full integration seam over one Spider-shaped fixture: a
  * reference-shaped `sys_config.json` registers a sqlite-dialect
  * benchmark (`spiderlike`) over the sandbox parquet corpus, and the
  * SAME fixture drives config-file → Engine, config-file → Reproduce
  * (pass@n), and config-file → ServingServer (HTTP scoring) with
  * `MockLlm` standing in for generation.
  *
  * The fixture's first gold is `COUNT(*) / 2` — integer division, so
  * the pipeline's pred (`SELECT 2 AS half`) is CORRECT only when every
  * entry point evaluates through the sqlite-strict door (region has 5
  * rows: 5/2 = 2 in sqlite, 2.5 in Spark). A dialect regression at any
  * entry point fails these asserts.
  */
class SpiderFixtureSpec extends SparkSpec {

  private def resource(name: String): String =
    Paths.get(getClass.getClassLoader.getResource(s"spiderlike/$name").toURI)
      .toString

  private val llm = MockLlm(playbook = Seq(
    "regions per half" -> "SELECT 2 AS half",
    "names of all regions" -> "SELECT r_name AS name FROM region ORDER BY r_name",
    "Schema_links" -> "Schema_links: [region.r_name]"))

  private def writeConfig(extra: String = ""): String = {
    val dir = Files.createTempDirectory("graft_spiderlike")
    val cfg = dir.resolve("config.json")
    Files.writeString(cfg,
      s"""{"data_id": "spiderlike:sf0.001",
         | "sys_config": "${resource("sys_config.json")}",
         | "generate_num": 2, "parallelism": 2,
         | "questions_path": "${resource("questions.json")}"$extra}""".stripMargin)
    cfg.toString
  }

  test("sys_config registers the benchmark and Engine routes its dialect") {
    val cfg = GraftConfig.fromJsonFile(writeConfig())
    val engine = new Engine(spark, cfg, llm)
    assert(engine.registry.contains("spiderlike"))
    assert(engine.dbPath == "/root/testdata/sf0.001")
    assert(engine.dialect == "sqlite")
  }

  test("config file to pass@n: Reproduce scores the fixture with sqlite semantics") {
    val (pass, summary) = Reproduce.fromConfigFile(spark, writeConfig(), llm)
    // both questions pass in every replica — sl_0 ONLY because the
    // evaluator integer-divides like sqlite
    assert(pass.totalQuestions == 2 && pass.validQuestions == 2)
    assert(pass.passedQuestions == 2 && pass.passRate == 1.0)
    assert(summary.head().getLong(4) == 2L, "n_replicas from generate_num")
  }

  test("config file to HTTP: ServingServer scores the same fixture over the wire") {
    val cfg = GraftConfig.fromJsonFile(writeConfig())
    val engine = new Engine(spark, cfg, llm)
    // server-held dataset rows come from the same questions.json
    val mapper = new ObjectMapper()
    val qs = mapper.readTree(new java.io.File(resource("questions.json")))
    val dataset = {
      val b = Map.newBuilder[String, (String, Option[String])]
      qs.forEach(n => b += n.get("instance_id").asText() ->
        (n.get("question").asText(), Some(n.get("gold_sql").asText())))
      b.result()
    }
    val server = new ServingServer(spark, engine.pipeline(),
      taskTimeoutSec = 120, sqlTimeoutSec = 60,
      dataset = dataset, dialect = engine.dialect)
    val port = server.start()
    try {
      val http = HttpClient.newHttpClient()
      def post(path: String, body: String): (Int, String) = {
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      // /api/run resolves question+gold from the server dataset and
      // scores EX through the sqlite door
      val (s1, b1) = post("/api/run", """{"instance_id":"sl_0"}""")
      assert(s1 == 200, b1)
      assert(mapper.readTree(b1).get("execute_accuracy").asInt() == 1, b1)
      // /api/run_batch staged reward: correct answer clears 3.0
      val (s2, b2) = post("/api/run_batch", """{"sl_0":[{}],"sl_1":[{}]}""")
      assert(s2 == 200, b2)
      val scores = mapper.readTree(b2)
      assert(scores.get("sl_0").get(0).asDouble() > 3.0, b2)
      assert(scores.get("sl_1").get(0).asDouble() > 3.0, b2)
    } finally server.stop()
  }
}
