package graft.serve

import org.apache.spark.sql.SparkSession

import graft.actors.GeneratorRegistry
import graft.core.{Engine, GraftConfig}
import graft.exec.SqlBackend
import graft.llm.{HttpLlmClient, LlmClient, LlmConfig, MockLlm}

/** Standalone serving launcher — the counterpart of running the
  * reference's `app/run.py`: build the session, resolve the config,
  * register the full actor roster, serve.
  *
  * Usage: `runMain graft.serve.ServingMain [configPath] [port]`
  *
  * The LLM binds from the environment (`SPARK_GRAFT_LLM_URL`,
  * `SPARK_GRAFT_LLM_MODEL`, `SPARK_GRAFT_LLM_KEY`) to the
  * OpenAI-compatible `HttpLlmClient`; with no URL set, the
  * deterministic `MockLlm` stands in so the server is drivable in any
  * environment (the same substitution every spec uses).
  */
object ServingMain {

  def llmFromEnv(): LlmClient =
    sys.env.get("SPARK_GRAFT_LLM_URL") match {
      case Some(url) => new HttpLlmClient(LlmConfig(
        baseUrl = url,
        model = sys.env.getOrElse("SPARK_GRAFT_LLM_MODEL", "default"),
        apiKey = sys.env.getOrElse("SPARK_GRAFT_LLM_KEY", "")))
      case None => MockLlm(default = "SELECT 1 AS x")
    }

  def main(args: Array[String]): Unit = {
    val cfg = args.headOption
      .map(GraftConfig.fromJsonFile)
      .getOrElse(GraftConfig(dataId = "testdata:sf0.001"))
    val port = args.lift(1).map(_.toInt).getOrElse(8765)

    val spark: SparkSession = graft.core.GraftSession.build("graft-serve")
    val llm = llmFromEnv()
    val engine = new Engine(spark, cfg, llm)
    // the roster makes every named actor available to task_lis payloads
    GeneratorRegistry.registerAll(
      llm, new SqlBackend(spark, cfg.sqlTimeoutSec), engine.schemaDf,
      generateNum = cfg.generateNum)

    val server = new ServingServer(spark,
      pipeline = engine.pipeline(),
      port = port,
      dialect = engine.dialect)
    val bound = server.start()
    // scalastyle:off println — operator-facing startup banner
    println(s"graft serving on http://127.0.0.1:$bound " +
      s"(data: ${engine.dbPath}, dialect: ${engine.dialect})")
    // scalastyle:on println
    Thread.currentThread().join() // serve until killed
  }
}
