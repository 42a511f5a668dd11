package graft.text

import org.apache.spark.sql.DataFrame

/** Schema-as-data rendering + schema-link normalization (reference
  * `parse_schema_from_df`, `core/utils.py:92-149`;
  * `parse_schema_link_from_str`, `core/utils.py:217-222`;
  * `normalize_schema_links`/`format_schema_links`,
  * `core/actor/parser/parse_utils.py:39-130`).
  *
  * The schema DataFrame is the working format (one row per column —
  * SURVEY §1.2): rendering collects it driver-side (schemas are
  * catalog-sized), everything upstream of the render stays distributed.
  */
object SchemaRender {

  private def trunc(s: String, n: Int = 150): String =
    if (s != null && s.length > n) s.take(n) else s

  /** Render a (table_name, column_name, column_types[, column_descriptions,
    * primary_key, foreign_key]) DataFrame into the reference's prompt
    * block: `### Table = ...` lines + Primary/Foreign Keys sections.
    */
  def parseSchemaFromDf(df: DataFrame): String = {
    val cols = df.columns.toSet
    def opt(r: org.apache.spark.sql.Row, name: String): Option[String] =
      if (cols.contains(name)) Option(r.getAs[Any](name)).map(_.toString).filter(_.nonEmpty)
      else None

    val rows = df.collect()
    val byTable = rows.groupBy(_.getAs[String]("table_name")).toSeq.sortBy(_._1)

    val tableLines = scala.collection.mutable.ArrayBuffer[String]()
    val pkLines = scala.collection.mutable.ArrayBuffer[String]()
    val fkLines = scala.collection.mutable.ArrayBuffer[String]()

    byTable.foreach { case (table, group) =>
      val colInfos = group.map { r =>
        val name = r.getAs[String]("column_name")
        val info = scala.collection.mutable.ArrayBuffer[String]()
        opt(r, "column_types").foreach(t => info += s"Type: ${trunc(t)}")
        opt(r, "column_descriptions").foreach(d => info += s"Description: ${trunc(d)}")
        s"$name(${info.mkString(", ")})"
      }
      tableLines += s"### Table = `$table`, columns = [${colInfos.mkString(", ")}]"

      val pks = group.filter(r => cols.contains("primary_key") &&
          Option(r.getAs[Any]("primary_key")).contains(true))
        .map(r => s"`${r.getAs[String]("column_name")}`")
      if (pks.nonEmpty) pkLines += s"$table(${pks.mkString(", ")})"

      group.foreach { r =>
        opt(r, "foreign_key").foreach { fk =>
          "\\[(.*?)\\]".r.findAllMatchIn(fk).foreach { m =>
            fkLines += s"$table(${r.getAs[String]("column_name")}) references ${m.group(1)}"
          }
        }
      }
    }

    var result = tableLines.mkString("\n\n") + "\n"
    if (pkLines.nonEmpty) result += "\n### Primary Keys:\n" + pkLines.mkString(", ") + "\n"
    if (fkLines.nonEmpty) result += "\n### Foreign Keys:\n" + fkLines.mkString(", ") + "\n"
    result
  }

  /** Extract the `Schema_links: [...]` list from an LLM reply
    * (`parse_schema_link_from_str`).
    */
  def parseSchemaLinkFromStr(s: String): Seq[String] =
    // quote-aware splitting (a value link like 'New York, NY' must not
    // split on its comma) — one parser, not a naive duplicate
    SqlText.parseList(s).map(_.replaceAll("[`\"']", "")).filter(_.nonEmpty)

  private def cleanRef(ref: String): String = ref.trim.replaceAll("[`\"']", "")
  private def isColumnRef(ref: String): Boolean = {
    val parts = ref.split("\\.", -1)
    parts.length == 2 && parts.forall(_.nonEmpty)
  }

  /** Normalized link shapes (`normalize_schema_links` output types). */
  final case class NormalizedLinks(columns: Seq[String], values: Seq[String]) {
    /** Type A: deduped table.column list. */
    def typeA: Seq[String] = columns.distinct
    /** Type B: tables + columns. */
    def typeB: (Seq[String], Seq[String]) =
      (columns.map(_.split("\\.")(0)).distinct, columns)
    /** Type C: columns ++ literal values. */
    def typeC: Seq[String] = (columns ++ values).distinct
  }

  def normalizeLinks(links: Seq[String]): NormalizedLinks = {
    val (cols, vals) = links.map(cleanRef).partition(isColumnRef)
    NormalizedLinks(cols, vals)
  }

  /** `format_schema_links`: render normalized links for prompts. */
  def formatLinks(links: Seq[String], outputType: String = "A"): String =
    outputType match {
      case "B" =>
        val (tables, columns) = normalizeLinks(links).typeB
        s"Linked Tables: ${tables.mkString("[", ", ", "]")}\n\n" +
          s"Linked Columns: ${columns.mkString("[", ", ", "]")}"
      case "C" => normalizeLinks(links).typeC.mkString("\n")
      case _ => normalizeLinks(links).typeA.mkString("\n")
    }
}
