package graft.tools

import org.apache.spark.sql.functions._

import graft.actors._
import graft.catalog.{SchemaCodec, Tables}
import graft.core.GraftSession
import graft.exec.SqlBackend
import graft.llm.MockLlm

/** End-to-end Text-to-SQL pipeline drive on the TPC-H test schema with
  * a deterministic mock LLM: harvest schema from the catalog → reduce →
  * parse links → generate → optimize (execution-feedback repair) →
  * select → EX-evaluate against gold SQL. Run:
  *   sbt "runMain graft.tools.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("graft-pipeline-demo", 4)
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    val backend = new SqlBackend(spark)

    // schema-as-data from the live catalog (central → parallel codec)
    val central = SchemaCodec.fromRegisteredTables(spark, "tpch",
      Seq("region", "nation", "customer", "orders"))
    val schemaDf = SchemaCodec.toDF(spark, SchemaCodec.centralToParallel(central))

    val questions = Seq(
      ("d1", "how many customers are there",
        "SELECT COUNT(*) AS n FROM customer"),
      ("d2", "names of all regions in alphabetical order",
        "SELECT r_name FROM region ORDER BY r_name"))
      .toDF("instance_id", "question", "gold_sql")

    // deterministic mock LLM: a playbook keyed on question text
    val llm = MockLlm(playbook = Seq(
      "how many customers" -> "SELECT COUNT(*) AS n FROM customer",
      "names of all regions" -> "SELECT r_name FROM region ORDER BY r_name",
      "Schema_links" -> "Schema_links: [customer.c_custkey, region.r_name]"))

    val pipeline = PipelineActor(Seq(
      ZeroReducer(),
      ParseActors.dinsql(llm, schemaDf),
      LlmGenerator(llm, schemaDf),
      OptimizeActors.macsql(llm, backend, schemaDf)))

    val answered = pipeline.act(questions)
    println("[demo] pipeline output:")
    answered.select("instance_id", "pred_sql").show(truncate = false)

    val scores = new graft.evalx.Evaluator(spark).evalDataFrame(
      answered.select(col("instance_id"), col("gold_sql"), col("pred_sql")))
    println("[demo] EX scores:")
    scores.show(truncate = false)
    val avgEx = scores.agg(avg(col("score"))).head().getDouble(0)
    println(s"[demo] average EX = $avgEx (expect 1.0)")
    spark.stop()
    if (avgEx < 1.0) sys.exit(1)
  }
}
