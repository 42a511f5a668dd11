package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.actors.LlmGenerator
import graft.catalog.Tables
import graft.llm.MockLlm

/** End-to-end serving: start the HTTP server, POST question records,
  * decode the JSON responses — the full reference `app/run.py` path
  * with `MockLlm` standing in for the generation model.
  */
class ServingServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private lazy val schemaDf = {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    Seq(("region", "r_regionkey", "INTEGER"), ("region", "r_name", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def withServer(pred: String)(f: Int => Unit): Unit = {
    val server = new ServingServer(spark,
      LlmGenerator(MockLlm(default = pred), schemaDf),
      taskTimeoutSec = 120, sqlTimeoutSec = 60)
    val port = server.start()
    try f(port) finally server.stop()
  }

  test("POST /api/run answers a question and scores EX against gold") {
    withServer("SELECT COUNT(*) AS n FROM region") { port =>
      val (status, body) = post(port, "/api/run",
        """{"instance_id":"s1","question":"how many regions",
          |"gold_sql":"SELECT COUNT(*) AS n FROM region"}""".stripMargin)
      assert(status == 200, body)
      val root = mapper.readTree(body)
      assert(root.get("pred_sql").asText() == "SELECT COUNT(*) AS n FROM region")
      assert(root.get("execute_accuracy").asInt() == 1)
      assert(root.get("duration_seconds").asDouble() > 0.0)
    }
  }

  test("POST /api/run without gold returns null accuracy; bad payload 400s") {
    withServer("SELECT 1 AS x") { port =>
      val (s1, b1) = post(port, "/api/run",
        """{"instance_id":"s2","question":"anything"}""")
      assert(s1 == 200 && mapper.readTree(b1).get("execute_accuracy").isNull)
      val (s2, _) = post(port, "/api/run", """{"question":"no id"}""")
      assert(s2 == 400)
      val (s3, _) = post(port, "/api/run", "not json at all")
      assert(s3 == 500 || s3 == 400)
    }
  }

  test("reference-shaped task_lis batch: pipelines built from the actor registry") {
    import graft.actors.GeneratorRegistry
    import graft.exec.SqlBackend
    // register a named generator whose pipeline the CLIENT selects
    GeneratorRegistry.registerAll(
      MockLlm(default = "SELECT COUNT(*) AS n FROM region"),
      new SqlBackend(spark), schemaDf)
    val server = new ServingServer(spark,
      LlmGenerator(MockLlm(default = "SELECT 0 AS wrong"), schemaDf), // default pipeline is WRONG
      taskTimeoutSec = 120, sqlTimeoutSec = 60,
      dataset = Map("v1" -> ("how many regions", Some("SELECT COUNT(*) AS n FROM region"))))
    val port = server.start()
    try {
      // the registry-built pipeline answers correctly (> 3.0); the
      // default pipeline entry ({} = no task_lis) is wrong (0.0);
      // an unknown actor name scores the failed-init -0.5
      val (status, body) = post(port, "/api/run_batch",
        """{"v1": [["LlmGenerator"], {}, ["NoSuchGenerator"]]}""")
      assert(status == 200, body)
      val scores = mapper.readTree(body).get("v1")
      assert(scores.get(0).asDouble() > 3.0, s"registry pipeline should win: $body")
      assert(scores.get(1).asDouble() == 0.0, s"default pipeline is wrong: $body")
      assert(scores.get(2).asDouble() == -0.5, s"unknown actor = failed init: $body")

      // /api/run with task_lis + dataset-resolved question/gold
      val (s2, b2) = post(port, "/api/run",
        """{"instance_id":"v1","task_lis":["LlmGenerator"]}""")
      assert(s2 == 200, b2)
      assert(mapper.readTree(b2).get("execute_accuracy").asInt() == 1)
    } finally server.stop()
  }

  test("POST /api/run_batch applies the staged reward per item") {
    // pred executes and matches gold → 0.5 + 1 + 1.5 + speed bonus (> 3.0);
    // pred executes but wrong result → 0.5 + 1 − 1.5 = 0.0;
    // gold broken → cannot evaluate → 0.5 − 1 = −0.5
    withServer("SELECT COUNT(*) AS n FROM region") { port =>
      val (status, body) = post(port, "/api/run_batch",
        """{"val_0":[
          |  {"question":"count regions","gold_sql":"SELECT COUNT(*) AS n FROM region"},
          |  {"question":"count regions","gold_sql":"SELECT COUNT(*) + 1 AS n FROM region"},
          |  {"question":"count regions","gold_sql":"SELECT broken FROM nowhere"}
          |]}""".stripMargin)
      assert(status == 200, body)
      val scores = mapper.readTree(body).get("val_0")
      assert(scores.size() == 3)
      assert(scores.get(0).asDouble() > 3.0 && scores.get(0).asDouble() <= 3.5)
      assert(scores.get(1).asDouble() == 0.0)
      assert(scores.get(2).asDouble() == -0.5)
    }
  }

  test("GET /healthz responds ok") {
    withServer("SELECT 1 AS x") { port =>
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/healthz")).GET().build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200 && resp.body().contains("ok"))
    }
  }

  test("duplicate task signatures in a batch execute once and share the score") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val inner = LlmGenerator(
      MockLlm(default = "SELECT COUNT(*) AS n FROM region"), schemaDf)
    val counting = new graft.actors.Actor {
      def name = "Counting"
      override def outputName: String = inner.outputName
      def act(ds: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        calls.incrementAndGet(); inner.act(ds)
      }
    }
    val server = new ServingServer(spark, counting,
      taskTimeoutSec = 120, sqlTimeoutSec = 60)
    val port = server.start()
    try {
      // the SAME signature under two DIFFERENT instance ids is still
      // one execution (the reference dedups on the signature, not the id)
      val (status, body) = post(port, "/api/run_batch",
        """{"d1":[
          |  {"question":"count regions","gold_sql":"SELECT COUNT(*) AS n FROM region"},
          |  {"question":"count regions","gold_sql":"SELECT COUNT(*) AS n FROM region"}
          |],
          |"d2":[
          |  {"question":"count regions","gold_sql":"SELECT COUNT(*) AS n FROM region"}
          |]}""".stripMargin)
      assert(status == 200, body)
      val root = mapper.readTree(body)
      val s1 = root.get("d1")
      assert(s1.size() == 2, body)
      assert(s1.get(0).asDouble() == s1.get(1).asDouble(), body)
      assert(s1.get(0).asDouble() > 3.0, body)
      assert(root.get("d2").get(0).asDouble() == s1.get(0).asDouble(), body)
      assert(calls.get() == 1, s"duplicate signature must run once, ran ${calls.get()}")
    } finally server.stop()
  }

  test("a hung pipeline times out, is interrupted, and the server stays live") {
    val interrupted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hanging = new graft.actors.Actor {
      def name = "Hanging"
      def act(ds: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        try Thread.sleep(60000L)
        catch { case _: InterruptedException => interrupted.set(true); throw new RuntimeException("interrupted") }
        ds
      }
    }
    val server = new ServingServer(spark, hanging,
      taskTimeoutSec = 2, sqlTimeoutSec = 5)
    val port = server.start()
    try {
      val t0 = System.nanoTime()
      val (status, body) = post(port, "/api/run",
        """{"instance_id":"h1","question":"hang"}""")
      val secs = (System.nanoTime() - t0) / 1e9
      assert(status == 500, body)
      assert(body.contains("timeout"), body)
      assert(secs < 30, s"timeout must fire near the cap, took $secs s")
      // the worker thread was interrupted, not abandoned
      Thread.sleep(300)
      assert(interrupted.get(), "hung worker must be interrupted")
      // and the server still answers (healthz never blocked; api free)
      val req = java.net.http.HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/healthz")).GET().build()
      assert(http.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 200)
    } finally server.stop()
  }

  test("the benchmark dialect threads into serving-time EX scoring") {
    // gold is sqlite integer division (7/2 = 3); the pred returns the
    // truncated value — EX agrees only through the sqlite-strict door
    def scoreWith(dialect: String): Int = {
      val server = new ServingServer(spark,
        LlmGenerator(MockLlm(default = "SELECT 3 AS q"), schemaDf),
        taskTimeoutSec = 120, sqlTimeoutSec = 60, dialect = dialect)
      val port = server.start()
      try {
        val (s, b) = post(port, "/api/run",
          """{"instance_id":"sq1","question":"half of seven",
            |"gold_sql":"SELECT 7 / 2 AS q"}""".stripMargin)
        assert(s == 200, b)
        mapper.readTree(b).get("execute_accuracy").asInt()
      } finally server.stop()
    }
    assert(scoreWith("sqlite") == 1, "sqlite semantics: 7/2 = 3 matches")
    assert(scoreWith("spark") == 0, "spark semantics: 7/2 = 3.5 differs")
  }

  test("one-question serving latency: warm fast path, measured envelope") {
    // the full /api/run path per request: HTTP decode -> actor
    // pipeline (mock LLM, so generation adds nothing) -> pred SQL
    // EXECUTES on Spark -> EX scoring runs gold AND pred again ->
    // JSON encode. The reference caps serving SQL eval at 150 s
    // (app/run.py:49-50) and the per-task wait at 1200 s — this pins
    // the measured warm latency orders of magnitude inside that
    // envelope and prints it for SCALE.md.
    withServer("SELECT COUNT(*) AS n FROM region") { port =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val (s, b) = post(port, "/api/run",
          """{"instance_id":"lat1","question":"how many regions",
            |"gold_sql":"SELECT COUNT(*) AS n FROM region"}""".stripMargin)
        assert(s == 200, b)
        assert(mapper.readTree(b).get("execute_accuracy").asInt() == 1)
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => once()) // warm: codegen + parquet footers
      val lats = (1 to 10).map(_ => once()).sorted
      val median = lats(lats.size / 2)
      val p95 = lats(math.min(lats.size - 1, (lats.size * 95) / 100))
      info(f"serving /api/run warm latency: median $median%.3f s, " +
        f"p95 $p95%.3f s over 10 requests (reference envelope: 150 s " +
        "SQL eval cap, 1200 s task cap)")
      assert(median < 10.0,
        f"warm one-question latency $median%.2f s is not a fast path")
    }
  }
}
