package graft.llm

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Named prompt templates with `${var}` substitution — the fidelity
  * seam between the engine's data-touching actor mechanics and a
  * reference method's exact prompt bodies.
  *
  * The built-in defaults are concise paraphrases of each method's
  * prompt intent (the engine does not ship third-party prompt text);
  * loading a template directory at runtime swaps in exact bodies —
  * e.g. DIN-SQL's tiered few-shot prompts (reference
  * `core/actor/generator/DINSQLGenerate.py:20-567`) dropped into
  * `dinsql.classify.txt` / `dinsql.generate.txt` — WITHOUT code
  * changes. Verbatim prompt parity is thereby a data deployment, not
  * a fork: the actor mechanics (tier flow, probe execution, repair
  * loops) are engine code, the words are swappable data.
  *
  * Placeholders use `${name}` and are replaced literally (no
  * recursion, no escaping — prompt bodies regularly contain `$` and
  * braces, so only the exact `${name}` token is touched). Unknown
  * placeholders are left in place: a template is free to ignore
  * variables, but a typo'd variable NAME in code surfaces as the
  * literal token in the prompt rather than a silent empty string.
  */
final class PromptTemplates(val templates: Map[String, String]) {

  /** Render `key` with the given variables; unknown key throws (a
    * missing template is a wiring bug, not a prompt-quality issue).
    */
  def render(key: String, vars: (String, String)*): String = {
    val t = templates.getOrElse(key,
      throw new NoSuchElementException(
        s"no prompt template '$key' (known: ${templates.keys.toSeq.sorted.mkString(", ")})"))
    vars.foldLeft(t) { case (acc, (k, v)) => acc.replace("${" + k + "}", v) }
  }

  /** A copy with `over` replacing same-keyed templates. */
  def withOverrides(over: Map[String, String]): PromptTemplates =
    new PromptTemplates(templates ++ over)
}

object PromptTemplates {

  /** Paraphrased defaults, one per LLM touchpoint of the method
    * actors. Keys are `<method>.<step>`; each documents the variables
    * it receives.
    */
  val Defaults: Map[String, String] = Map(
    // DIN-SQL difficulty tiering (vars: question, links)
    "dinsql.classify" ->
      ("Classify the question as EASY, NON-NESTED, or NESTED.\n" +
        "Question: ${question}\nSchema links: ${links}\nLabel:"),
    // (vars: tier, style, schema, links, question)
    "dinsql.generate" ->
      ("[${tier}] Write ${style}.\nSchema:\n${schema}\n" +
        "Links: ${links}\nQuestion: ${question}\nSQL:"),
    // ReFoRCE probe authoring (vars: maxProbes, schema, question)
    "reforce.probes" ->
      ("List up to ${maxProbes} probe SQLs (use DISTINCT and LIMIT 20) to " +
        "inspect relevant columns.\nSchema:\n${schema}\nQuestion: ${question}\n[...]"),
    // ReFoRCE refined generation (vars: schema, probes, question)
    "reforce.final" ->
      ("Schema:\n${schema}\nProbe results:\n${probes}\n" +
        "Question: ${question}\nFinal SQL:"))

  /** The engine-wide default registry (paraphrased bodies). */
  val default = new PromptTemplates(Defaults)

  /** Defaults overridden by every `<key>.txt` file under `dir` (the
    * key is the filename minus `.txt`, dots preserved — so the
    * reference's exact DIN-SQL prompt body lands as
    * `dinsql.generate.txt`). Non-`.txt` entries are ignored;
    * subdirectories are not walked.
    */
  def loadFromDir(dir: String): PromptTemplates = {
    val p: Path = Paths.get(dir)
    require(Files.isDirectory(p), s"not a template directory: $dir")
    val stream = Files.list(p) // must close: holds a directory handle
    val loaded =
      try stream.iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".txt"))
        .map { f =>
          val key = f.getFileName.toString.stripSuffix(".txt")
          key -> new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
        }
        .toMap
      finally stream.close()
    default.withOverrides(loaded)
  }
}
