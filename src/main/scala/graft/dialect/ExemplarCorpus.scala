package graft.dialect

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Harvester for the reference's exemplar reasoning corpus — the 287
  * Spider2-class examples shipped at
  * `files/reasoning_examples/system/{snowflake,big_query,sqlite}`
  * (188 / 55 / 44 files; reference `core/data_manage.py:1253-1257`
  * loads them per-question as few-shot context). Every file is one
  * block: `# [Question]:`, `# [Schema links]:`, `# [Analysis]:`
  * (multi-line CoT), and a FINAL single-line `# [Sql]:` carrying a
  * real dialect statement (deep CTE chains, LATERAL FLATTEN,
  * 3-part DB.SCHEMA.TABLE paths, `_TABLE_SUFFIX` wildcards).
  *
  * This is the hardest real SQL the reference ships; the harvest
  * feeds (a) the all-corpus transpile+parse gate
  * ([[graft.dialect.ExemplarCorpusSpec]] in test scope), (b) the
  * executed-subset EX row `q_reference_exemplar_ex`, and (c) the
  * few-shot store integration over real exemplar text.
  */
object ExemplarCorpus {

  /** Read-only reference corpus root (sandbox layout). */
  val DefaultRoot = "/root/reference/files/reasoning_examples/system"

  /** Reference arm dir name → Transpiler dialect name. */
  val Arms: Seq[(String, String)] =
    Seq("snowflake" -> "snowflake", "big_query" -> "bigquery",
      "sqlite" -> "sqlite")

  final case class Exemplar(
      arm: String,       // transpiler dialect name
      file: String,      // e.g. "snowflake/example_10.txt"
      question: String,
      schemaLinks: String,
      analysis: String,  // CoT lines between [Analysis] and [Sql]
      sql: String)       // the verbatim # [Sql]: statement

  private val QMark = "# [Question]:"
  private val LMark = "# [Schema links]:"
  private val AMark = "# [Analysis]:"
  private val SMark = "# [Sql]:"

  /** Parse one exemplar file (the whole corpus follows the one-block
    * layout; verified over all 287 files — the SQL is always the
    * final line).
    */
  def parseFile(arm: String, rel: String, text: String): Exemplar = {
    val lines = text.linesIterator.toVector
    def tail(mark: String): String =
      lines.find(_.startsWith(mark))
        .map(_.stripPrefix(mark).trim).getOrElse("")
    val aStart = lines.indexWhere(_.startsWith(AMark))
    val sStart = lines.indexWhere(_.startsWith(SMark))
    val analysis =
      if (aStart < 0 || sStart < 0) ""
      else (lines(aStart).stripPrefix(AMark).trim +:
        lines.slice(aStart + 1, sStart)).mkString("\n")
    Exemplar(arm, rel, tail(QMark), tail(LMark), analysis, tail(SMark))
  }

  /** Load every exemplar under `root`, sorted by (arm, file) for
    * deterministic ordering.
    */
  def load(root: String = DefaultRoot): Seq[Exemplar] = {
    Arms.flatMap { case (dir, dialect) =>
      val d = Paths.get(root, dir)
      if (!Files.isDirectory(d)) Seq.empty[Exemplar]
      else
        Files.list(d).iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".txt"))
          .sortBy(_.getFileName.toString)
          .map { p: Path =>
            parseFile(dialect, s"$dir/${p.getFileName}",
              new String(Files.readAllBytes(p), "UTF-8"))
          }
    }
  }

  /** Transpile one exemplar through its arm. */
  def transpiled(e: Exemplar): String = Transpiler.forDialect(e.arm)(e.sql)
}
