package graft.actors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exec.SqlBackend
import graft.llm.LlmClient
import graft.text.{SchemaRender, SqlText}

/** RSL-SQL (reference `RSLSQLGenerate.py:247-1019`): bidirectional
  * linking → preliminary SQL → information augmentation (keywords,
  * conditions) → BINARY selection between the preliminary and augmented
  * candidates using execution results → self-correction loop.
  */
final case class RslSqlGenerator(llm: LlmClient, backend: SqlBackend,
    schema: DataFrame,
    tpl: graft.llm.PromptTemplates = graft.llm.PromptTemplates.default)
    extends Actor {
  val name = "RSLSQLGenerator"
  override val outputName = "pred_sql"
  override val skill = "RSL-SQL: bidir links -> preliminary + augmented -> binary exec selection"

  def act(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val schemaText = SchemaRender.parseSchemaFromDf(schema)
    // forward+backward linking over the whole dataset first
    val linked = BiDirLinkParser(llm, schema).act(ds)
    val rows = linked.select(col("instance_id"), col("question"), col("schema_links")).collect()
    val out = rows.map { r =>
      val (q, links) = (r.getString(1), r.getSeq[String](2))
      val preliminary = SqlText.clean(llm.complete(
        tpl.render("rslsql.preliminary", "schema" -> schemaText,
          "links" -> links.mkString(", "), "question" -> q)))
      val keywords = SqlText.parseList(llm.complete(
        tpl.render("rslsql.keywords", "question" -> q)))
      val augmented = SqlText.clean(llm.complete(
        tpl.render("rslsql.augmented", "keywords" -> keywords.mkString(", "),
          "schema" -> schemaText, "question" -> q)))
      // binary selection by execution (largest-agreement degenerate to 2)
      val chosen = graft.operators.FastExecSelect
        .select(spark, Seq(preliminary, augmented))
        .map(_.sql).getOrElse(preliminary)
      // self-correction with execution feedback
      (r.getString(0), SqlDebug.debugByFeedback(backend, llm, q, schemaText, chosen)._2)
    }
    ds.drop(outputName).join(out.toSeq.toDF("instance_id", outputName), "instance_id")
  }
}

/** LinkAlign generator (reference `LinkAlignGenerate.py:22-389`):
  * LinkAlign reduction + linking, DIN-SQL-style tiered generation,
  * optional execution-feedback debug pass.
  */
final case class LinkAlignGenerator(llm: LlmClient, backend: SqlBackend,
    schema: DataFrame, debug: Boolean = true) extends Actor {
  val name = "LinkAlignGenerator"
  override val outputName = "pred_sql"
  override val skill = "LinkAlign: reduce+link -> DIN-tiered generate -> exec debug"

  def act(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val linked = ParseActors.linkAlign(llm, schema).act(ds)
    val schemaText = SchemaRender.parseSchemaFromDf(schema)
    val rows = linked.select(col("instance_id"), col("question"), col("schema_links")).collect()
    val out = rows.map { r =>
      val (q, links) = (r.getString(1), r.getSeq[String](2))
      val draft = DinSqlMethod.generate(llm, schemaText, q, links)
      val fin =
        if (debug) SqlDebug.debugByFeedback(backend, llm, q, schemaText, draft)._2
        else draft
      (r.getString(0), fin)
    }
    ds.drop(outputName).join(out.toSeq.toDF("instance_id", outputName), "instance_id")
  }
}

/** Adaptive optimizer as an Actor (wraps `AdaptiveOptimize`): decompose
  * into meta-SQLs, execute for feedback, triage the first failure and
  * dispatch syntax/schema repair (feedback loop) vs logic repair
  * (one-shot rewrite with the meta-SQL evidence).
  */
final case class AdaptiveOptimizer(llm: LlmClient, backend: SqlBackend,
    schema: DataFrame) extends Actor {
  val name = "AdaptiveOptimizer"
  override val outputName = "pred_sql"
  override val skill = "adaptive: meta-SQL feedback -> triaged repair"

  def act(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val schemaText = SchemaRender.parseSchemaFromDf(schema)
    val rows = ds.select(col("instance_id"), col("question"), col("pred_sql")).collect()
    val out = rows.map { r =>
      val (q, sql) = (r.getString(1), r.getString(2))
      val fb = AdaptiveOptimize.feedback(backend, sql)
      val firstErr = fb.collectFirst { case (m, Left(e)) => (m, e) }
      val repaired = firstErr match {
        case None => sql // every meta-SQL executes — leave it alone
        case Some((_, err)) if AdaptiveOptimize.classify(err) != "logic" =>
          SqlDebug.debugByFeedback(backend, llm, q, schemaText, sql)._2
        case Some((meta, err)) =>
          SqlText.clean(llm.complete(
            s"A sub-query misbehaves logically.\nFailing part: $meta\n" +
              s"Evidence: $err\nFull SQL: $sql\nQuestion: $q\nFixed SQL:"))
      }
      (r.getString(0), repaired)
    }
    ds.drop(outputName).join(out.toSeq.toDF("instance_id", outputName), "instance_id")
  }
}

/** Thin named factories completing the reference's scaler/optimizer
  * rosters (shape differences live in prompts/temperature schedules —
  * driver-side; the data mechanics are shared).
  */
object FamilyFactories {
  // scalers (`core/actor/scaler`)
  def dinsqlScaler(llm: LlmClient, n: Int) = LlmScaler(llm, n, "DINSQLScaler")
  def chessScaler(llm: LlmClient, n: Int) = LlmScaler(llm, n, "ChessScaler")
  def macsqlScaler(llm: LlmClient, n: Int) = LlmScaler(llm, n, "MACSQLScaler")
  def rslsqlScaler(llm: LlmClient, n: Int) = LlmScaler(llm, n, "RSLSQLScaler")
  def openSearchScaler(llm: LlmClient, n: Int) = LlmScaler(llm, n, "OpenSearchSQLScaler")

  // optimizers (`core/actor/optimizer`)
  def chessOptimizer(llm: LlmClient, b: SqlBackend, s: DataFrame) =
    RepairOptimizer(llm, b, s, "feedback", "CHESSOptimizer")
  def openSearchOptimizer(llm: LlmClient, b: SqlBackend, s: DataFrame) =
    RepairOptimizer(llm, b, s, "chain", "OpenSearchSQLOptimizer")
  def rslsqlOptimizer(llm: LlmClient, b: SqlBackend, s: DataFrame) =
    RepairOptimizer(llm, b, s, "feedback", "RSLSQLOptimizer")
  def adaptiveOptimizer(llm: LlmClient, b: SqlBackend, s: DataFrame) =
    AdaptiveOptimizer(llm, b, s)
}
