package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.actors.{Actor, Serving}
import graft.evalx.{Evaluator, ExItem}

/** Online serving entry point — the port of the reference's Flask app
  * (`app/run.py:47-82`, scoring `app/run.py:396-447` +
  * `app/evaluation_helper.py:187-229`): a long-lived Spark session
  * behind a tiny HTTP server answering one question record per request.
  *
  * Endpoints (JSON in/out, mirroring the reference's routes):
  *  - `POST /api/run`   {"instance_id", "question", "gold_sql"?}
  *    → {"duration_seconds", "pred_sql", "execute_accuracy"}  — run the
  *    actor pipeline for the single record under the task cap, then (if
  *    a gold label is present) score EX under the eval cap.
  *  - `POST /api/run_batch`  {"<instance_id>": [{"question", "gold_sql"?},…]}
  *    → {"<instance_id>": [score,…]}  — the reference's staged reward:
  *    task completes within TASK_MAX_WAIT (+0.5) or times out (−0.5,
  *    stop); pred SQL executes (+1) or not / gold unevaluable (−1,
  *    stop); result correct (+1.5) or wrong (−1.5); correct answers
  *    earn a speed bonus 0.5·(cap − eval_secs)/cap.
  *
  * Spark-native posture: the server is DRIVER-SIDE plumbing around the
  * same `Serving` single-record handler the specs exercise — each
  * request fans out distributed Spark jobs bounded by job-group
  * timeouts (`SqlBackend`), so a stuck query cancels cleanly instead of
  * wedging the session. `com.sun.net.httpserver` keeps the dependency
  * footprint at zero (JDK-only), per the build's no-new-deps rule.
  */
final class ServingServer(spark: SparkSession, pipeline: Actor,
    port: Int = 0,
    taskTimeoutSec: Int = 1200,   // TASK_MAX_WAIT_TIME, app/run.py:49
    sqlTimeoutSec: Int = 150) {   // SQL_MAX_WAIT_TIME,  app/run.py:50

  private val serving = new Serving(spark, pipeline, taskTimeoutSec, sqlTimeoutSec)
  private val evaluator = new Evaluator(spark, sqlTimeoutSec, parallelism = 2)
  private val mapper = new ObjectMapper()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/api/run", (ex: HttpExchange) => handle(ex, runOne))
  server.createContext("/api/run_batch", (ex: HttpExchange) => handle(ex, runBatch))
  // requests serialize through one worker: the reference notes its app
  // "works for single requests" — a shared SparkSession wants one
  // pipeline in flight, and job-group cancels keep each bounded
  server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor())

  def start(): Int = { server.start(); boundPort }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange,
      route: JsonNode => (Int, ObjectNode)): Unit = {
    val (status, body) =
      try {
        if (ex.getRequestMethod != "POST")
          (405, err("POST required"))
        else {
          val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val root = mapper.readTree(raw)
          if (root == null || !root.isObject) (400, err("JSON object body required"))
          else route(root)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          (500, err(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
      }
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(msg: String): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("error", msg)
    o
  }

  private def textOpt(node: JsonNode, field: String): Option[String] =
    Option(node.get(field)).filter(n => n.isTextual && n.asText().nonEmpty)
      .map(_.asText())

  /** `POST /api/run` — single record through the pipeline + optional EX
    * score (reference `run_complex_actor`, `app/run.py:199-228`).
    */
  private def runOne(root: JsonNode): (Int, ObjectNode) = {
    (textOpt(root, "instance_id"), textOpt(root, "question")) match {
      case (Some(iid), Some(q)) =>
        val t0 = System.nanoTime()
        serving.handle(iid, q, textOpt(root, "gold_sql")) match {
          case Left(e) => (500, err(e))
          case Right((pred, score)) =>
            val o = mapper.createObjectNode()
            o.put("duration_seconds", (System.nanoTime() - t0) / 1e9)
            o.put("pred_sql", pred)
            score match {
              case Some(s) => o.put("execute_accuracy", s)
              case None    => o.putNull("execute_accuracy")
            }
            (200, o)
        }
      case _ => (400, err("instance_id and question are required"))
    }
  }

  /** `POST /api/run_batch` — staged reward per item (reference
    * `run_batch`, `app/run.py:231-447`).
    */
  private def runBatch(root: JsonNode): (Int, ObjectNode) = {
    val o = mapper.createObjectNode()
    val fields = root.fields()
    while (fields.hasNext) {
      val e = fields.next()
      val iid = e.getKey
      if (!e.getValue.isArray)
        return (400, err(s"task list for `$iid` must be a list"))
      val arr = o.putArray(iid)
      e.getValue.forEach { item =>
        val score = (textOpt(item, "question") match {
          case None    => -0.5 // un-runnable item = failed task init
          case Some(q) => stagedScore(iid, q, textOpt(item, "gold_sql"))
        })
        arr.add(score)
      }
    }
    (200, o)
  }

  /** The reference's cumulative reward: ±0.5 task stage, ±1 execute
    * stage, ±1.5 correctness stage, +0.5·(cap−t)/cap speed bonus.
    */
  private def stagedScore(iid: String, question: String,
      gold: Option[String]): Double =
    serving.handle(iid, question, goldSql = None) match {
      case Left(_) => -0.5 // pipeline error/timeout: skip all later stages
      case Right((pred, _)) =>
        val afterTask = 0.5
        gold match {
          case None => afterTask // nothing to evaluate against
          case Some(g) =>
            val t0 = System.nanoTime()
            val out = evaluator.evalOne(ExItem(iid, Some(g), Some(pred)))
            val evalSecs = (System.nanoTime() - t0) / 1e9
            if (out.score.isEmpty || out.predError.isDefined)
              afterTask - 1.0 // gold unevaluable or pred not executable
            else if (out.score.contains(1))
              afterTask + 1.0 + 1.5 +
                0.5 * math.max(sqlTimeoutSec - evalSecs, 0.0) / sqlTimeoutSec
            else afterTask + 1.0 - 1.5
        }
    }
}
