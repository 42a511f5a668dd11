package graft.actors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exec.SqlBackend
import graft.llm.LlmClient
import graft.text.{SchemaRender, SqlText}

/** Method-specific data-touching mechanics of the reference generator
  * family — the pieces that read schemas and execute probes (the
  * surrounding prompt chains stay behind `LlmClient`).
  */

/** MAC-SQL Selector pruning (reference `MACSQLGenerate.py:478-494`):
  * prune when the schema is "large" — more than 3 tables AND (average
  * columns per table > 6 OR total columns > 30); pruning keeps only
  * schema-linked tables' columns.
  */
object MacSqlPrune {

  def needsPrune(schema: DataFrame): Boolean = {
    val stats = schema.agg(
      countDistinct(col("table_name")).as("tables"),
      count(lit(1)).as("cols")).head()
    val (tables, cols) = (stats.getLong(0), stats.getLong(1))
    tables > 3 && (cols.toDouble / math.max(tables, 1) > 6 || cols > 30)
  }

  /** Keep only columns of tables mentioned in the links. */
  def prune(schema: DataFrame, links: Seq[String]): DataFrame = {
    val tables = SchemaRender.normalizeLinks(links).typeB._1.map(_.toLowerCase)
    if (tables.isEmpty) schema
    else schema.filter(lower(col("table_name")).isin(tables: _*))
  }
}

/** DIN-SQL difficulty tiering (reference `DINSQLGenerate.py:20-713`):
  * classify EASY / NON-NESTED / NESTED, then generate with the
  * tier-matched prompt; classification is an LLM call (mockable), the
  * tier names and flow are the reference's. Prompt WORDING routes
  * through [[graft.llm.PromptTemplates]] — dropping the reference's
  * exact tiered few-shot bodies into a template directory reproduces
  * its prompts verbatim with zero code change.
  */
object DinSqlMethod {

  val Tiers = Seq("EASY", "NON-NESTED", "NESTED")

  def classify(llm: LlmClient, question: String, links: Seq[String],
      tpl: graft.llm.PromptTemplates = graft.llm.PromptTemplates.default): String = {
    val raw = llm.complete(tpl.render("dinsql.classify",
      "question" -> question, "links" -> links.mkString(", "))).trim.toUpperCase
    Tiers.find(raw.contains).getOrElse("NESTED") // conservative default
  }

  def generate(llm: LlmClient, schemaText: String, question: String,
      links: Seq[String],
      tpl: graft.llm.PromptTemplates = graft.llm.PromptTemplates.default): String = {
    val tier = classify(llm, question, links, tpl)
    val style = tier match {
      case "EASY" => "a single simple SELECT"
      case "NON-NESTED" => "one SELECT with joins, no subqueries"
      case _ => "a query that may use subqueries (intermediate representation first)"
    }
    SqlText.clean(llm.complete(tpl.render("dinsql.generate",
      "tier" -> tier, "style" -> style, "schema" -> schemaText,
      "links" -> links.mkString(", "), "question" -> question)))
  }
}

/** ReFoRCE column exploration (reference `ReFoRCEGenerate.py:100-250`):
  * the LLM writes up to `maxProbes` cheap probe SQLs (DISTINCT / LIMIT
  * style), the ENGINE executes them, and the truncated results feed the
  * refined generation prompt. Probes run through the real backend.
  */
object ReForce {

  def explore(llm: LlmClient, backend: SqlBackend, schemaText: String,
      question: String, maxProbes: Int = 10,
      tpl: graft.llm.PromptTemplates = graft.llm.PromptTemplates.default): Seq[(String, String)] = {
    val probes = SqlText.parseList(llm.complete(tpl.render("reforce.probes",
      "maxProbes" -> maxProbes.toString, "schema" -> schemaText,
      "question" -> question)))
      .take(maxProbes)
    probes.map(p => p -> backend.runToString(p, maxRows = 20))
  }

  def generate(llm: LlmClient, backend: SqlBackend, schemaText: String,
      question: String,
      tpl: graft.llm.PromptTemplates = graft.llm.PromptTemplates.default): String = {
    val probeReport = explore(llm, backend, schemaText, question, tpl = tpl)
      .map { case (p, r) => s"-- $p\n$r" }.mkString("\n")
    SqlText.clean(llm.complete(tpl.render("reforce.final",
      "schema" -> schemaText, "probes" -> probeReport,
      "question" -> question)))
  }
}

/** Recursive decomposition (reference `RecursiveDecompose.py:27-717`):
  * stage 0 drafts one SQL per selected table (schema groupBy table);
  * stage n combines prior SQLs, optionally executing intermediates for
  * feedback, until one final query remains.
  */
object RecursiveMethod {

  /** Stage 0 (`RecursiveDecompose.py:204-320`): one candidate SQL per
    * linked table, prompted with only that table's columns.
    */
  def stage0(llm: LlmClient, schema: DataFrame, question: String,
      tables: Seq[String]): Map[String, String] =
    tables.map { t =>
      val sub = schema.filter(col("table_name") === t)
      t -> SqlText.clean(llm.complete(
        s"Using ONLY this table, write a SQL fragment for the question.\n" +
          s"${SchemaRender.parseSchemaFromDf(sub)}\nQuestion: $question\nSQL:"))
    }.toMap

  /** Stage n (`RecursiveDecompose.py:394-511`): combine prior SQLs into
    * one query; each round may execute the combination for feedback
    * (`_execute_sql` 157-203) and retry once on error.
    */
  def stageN(llm: LlmClient, backend: SqlBackend, question: String,
      parts: Map[String, String], maxRounds: Int = 3): String = {
    var current = llm.complete(
      s"Combine these per-table SQLs into ONE query (joins/nesting).\n" +
        parts.map { case (t, s) => s"-- $t: $s" }.mkString("\n") +
        s"\nQuestion: $question\nSQL:")
    var round = 0
    while (round < maxRounds) {
      val cleaned = SqlText.clean(current)
      backend.runDialect(cleaned) match {
        case graft.exec.ExecOk(_, _) => return cleaned
        case graft.exec.ExecErr(err, _) =>
          current = llm.complete(
            s"The combined SQL failed: $err\nSQL: $cleaned\n" +
              s"Question: $question\nFixed SQL:")
      }
      round += 1
    }
    SqlText.clean(current)
  }
}

/** LinkAlign chunked response filtering (reference
  * `LinkAlignReduce.py:169-220`): the retained schema is sliced into
  * ≤ chunkSize-column chunks; per chunk the LLM lists IRRELEVANT
  * table.column pairs, which become the flagged set for the reducer's
  * anti-filter.
  */
object ResponseFilter {

  def flaggedPairs(llm: LlmClient, schema: DataFrame, question: String,
      chunkSize: Int = 300): DataFrame = {
    val spark = schema.sparkSession
    import spark.implicits._
    val sliced = graft.operators.RowOps.withSliceId(schema, "column_name", chunkSize)
    val sliceIds = sliced.select("slice_id").distinct().collect().map(_.getLong(0)).sorted
    val flagged = sliceIds.flatMap { sid =>
      val chunk = sliced.filter(col("slice_id") === sid).drop("slice_id")
      val reply = llm.complete(
        s"List schema entries IRRELEVANT to the question as [table.column, ...].\n" +
          s"${SchemaRender.parseSchemaFromDf(chunk)}\nQuestion: $question\n[...]")
      SchemaRender.normalizeLinks(SqlText.parseList(reply)).typeA
        .map { tc => val Array(t, c) = tc.split("\\.", 2); (t, c) }
    }
    flagged.toSeq.toDF("table_name", "column_name").distinct()
  }
}
