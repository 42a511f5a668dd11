package graft.actors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.LlmClient
import graft.text.{SchemaRender, SqlText}

/** Schema-linking parse actors (§2.6, reference
  * the core/actor/parser family): each renders the schema DataFrame + the
  * question into a method-specific prompt, asks the LLM for
  * `Schema_links: [...]`, and writes a normalized `schema_links` array
  * column. The LLM is always driver-side (per question row — question
  * counts, not data volume); everything data-touching (schema prep,
  * value probes, link joins) is Spark.
  */
final case class CoTLinkParser(
    llm: LlmClient,
    schema: DataFrame,
    template: String, // {schema} and {question} holes
    override val name: String,
    contextFor: String => String = _ => "") extends Actor {

  override val outputName = "schema_links"
  override val skill = s"$name: CoT schema linking over the rendered schema"

  def act(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val schemaText = SchemaRender.parseSchemaFromDf(schema)
    val rows = ds.select(col("instance_id"), col("question")).collect()
    val links = rows.map { r =>
      val q = r.getString(1)
      val prompt = template
        .replace("{schema}", schemaText)
        .replace("{question}", q)
        .replace("{context}", contextFor(q))
      val parsed = SchemaRender.parseSchemaLinkFromStr(llm.complete(prompt))
      (r.getString(0), SchemaRender.normalizeLinks(parsed).typeC)
    }
    ds.drop(outputName).join(
      links.toSeq.toDF("instance_id", outputName), "instance_id")
  }

  /** `parallel_slice_parse` (`core/actor/parser/BaseParse.py:160-217`):
    * slice an oversized schema into ≤ sliceSize-column chunks, parse the
    * question against each slice, merge links distinct.
    */
  def actSliced(ds: DataFrame, sliceSize: Int = 500,
      orderCol: String = "column_name"): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val sliced = graft.operators.RowOps.withSliceId(schema, orderCol, sliceSize)
    val sliceIds = sliced.select("slice_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val perSlice = sliceIds.map { sid =>
      copy(schema = sliced.filter(col("slice_id") === sid).drop("slice_id"))
        .act(ds)
        .select(col("instance_id"), col(outputName))
    }
    val merged = perSlice.reduceLeft(_ union _)
      .groupBy(col("instance_id"))
      .agg(array_distinct(flatten(collect_list(col(outputName)))).as(outputName))
    ds.drop(outputName).join(merged, "instance_id")
  }
}

/** Bidirectional linking (reference `RSLSQLBiDirParse.py:13-500`):
  * LLM forward pass over the schema, plus a backward pass extracting
  * schema identifiers from a candidate SQL column (`pred_sql`) by
  * tokenizing and intersecting with the schema vocabulary.
  */
final case class BiDirLinkParser(llm: LlmClient, schema: DataFrame) extends Actor {
  val name = "RSLSQLBiDirParser"
  override val outputName = "schema_links"
  override val skill = "bidirectional linking: LLM forward + SQL-derived backward"

  def act(ds: DataFrame): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val schemaText = SchemaRender.parseSchemaFromDf(schema)
    val vocab = schema.select("table_name", "column_name").collect()
      .flatMap(r => Seq(r.getString(0).toLowerCase,
        s"${r.getString(0)}.${r.getString(1)}".toLowerCase,
        r.getString(1).toLowerCase)).toSet
    val hasPred = ds.columns.contains("pred_sql")
    val cols = if (hasPred) Seq("instance_id", "question", "pred_sql")
      else Seq("instance_id", "question")
    val rows = ds.select(cols.map(col): _*).collect()
    val links = rows.map { r =>
      val forward = SchemaRender.parseSchemaLinkFromStr(llm.complete(
        s"Link the question to the schema.\n{schema}\nQuestion: ${r.getString(1)}\n"
          .replace("{schema}", schemaText) + "Schema_links: [...]"))
      val backward =
        if (hasPred && r.getString(2) != null)
          SqlText.tokenize(r.getString(2).toLowerCase).filter(vocab.contains)
        else Nil
      (r.getString(0), SchemaRender.normalizeLinks(forward ++ backward).typeC)
    }
    ds.drop(outputName).join(
      links.toSeq.toDF("instance_id", outputName), "instance_id")
  }
}

/** Factory wiring the six reference parser methods to their prompt
  * shapes. Each cites its reference actor; templates are condensed
  * originals (the LLM behavior lives behind `LlmClient`).
  */
object ParseActors {

  /** DIN-SQL CoT (`DINSQLCoTParse.py:17-146`). */
  def dinsql(llm: LlmClient, schema: DataFrame): CoTLinkParser =
    CoTLinkParser(llm, schema,
      "Find the schema links for generating SQL for the question.\n" +
        "{schema}\nQ: {question}\nA: Let's think step by step.\nSchema_links: [...]",
      "DINSQLCoTParser")

  /** LinkAlign generate-selector chain (`LinkAlignParse.py:19-149`). */
  def linkAlign(llm: LlmClient, schema: DataFrame): CoTLinkParser =
    CoTLinkParser(llm, schema,
      "As a schema-linking agent, select every table.column the query " +
        "needs.\n{schema}\nQuery: {question}\nSchema_links: [...]",
      "LinkAlignParser")

  /** MAC-SQL selector-style extraction (`MACSQLCoTParse.py:14-171`). */
  def macsql(llm: LlmClient, schema: DataFrame): CoTLinkParser =
    CoTLinkParser(llm, schema,
      "Select the relevant tables and columns for the question.\n" +
        "{schema}\nQuestion: {question}\nSchema_links: [...]",
      "MACSQLCoTParser")

  /** OpenSearch-SQL CoT with DB value probes
    * (`OpenSearchCoTParse.py:17-505`): probe results are injected as
    * {context} by the caller-supplied prober.
    */
  def openSearch(llm: LlmClient, schema: DataFrame,
      prober: String => String): CoTLinkParser =
    CoTLinkParser(llm, schema,
      "Schema:\n{schema}\nDB value probes:\n{context}\n" +
        "Question: {question}\nSchema_links: [...]",
      "OpenSearchCoTParser", contextFor = prober)

  /** CHESS select-schema with entity context
    * (`CHESSSelectorParse.py:17-314`): entity retrieval (LIKE-scan
    * analog) supplies {context}.
    */
  def chess(llm: LlmClient, schema: DataFrame,
      entityContext: String => String): CoTLinkParser =
    CoTLinkParser(llm, schema,
      "Schema:\n{schema}\nEntity context:\n{context}\n" +
        "Question: {question}\nSchema_links: [...]",
      "CHESSSelectorParser", contextFor = entityContext)

  /** RSL-SQL bidirectional (`RSLSQLBiDirParse.py:13-500`). */
  def rslsqlBiDir(llm: LlmClient, schema: DataFrame): BiDirLinkParser =
    BiDirLinkParser(llm, schema)

  /** Register all with the pool for workflow specs. */
  def registerAll(llm: LlmClient, schema: DataFrame): Unit = {
    ActorPool.register("DINSQLCoTParser", () => dinsql(llm, schema))
    ActorPool.register("LinkAlignParser", () => linkAlign(llm, schema))
    ActorPool.register("MACSQLCoTParser", () => macsql(llm, schema))
    ActorPool.register("RSLSQLBiDirParser", () => rslsqlBiDir(llm, schema))
  }
}
