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
        "Question: ${question}\nFinal SQL:"),
    // MAC-SQL Selector link pass (vars: question)
    "macsql.links" ->
      "List relevant table.column links for: ${question}\nSchema_links: [...]",
    // MAC-SQL Decomposer (vars: question)
    "macsql.decompose" ->
      "Decompose into sub-questions as a list.\nQuestion: ${question}\n[...]",
    // MAC-SQL Refiner draft (vars: schema, subs, question)
    "macsql.refine" ->
      ("Schema:\n${schema}\nSub-questions: ${subs}\n" +
        "Question: ${question}\nSQL:"),
    // CHESS keyword extraction (vars: question)
    "chess.keywords" ->
      "Extract the key entity keywords as a list.\nQuestion: ${question}\n[...]",
    // CHESS candidate generation (vars: index, schema, entities, question)
    "chess.candidate" ->
      ("Candidate ${index}.\nSchema:\n${schema}\nEntities:\n${entities}\n" +
        "Question: ${question}\nSQL:"),
    // RSL-SQL preliminary SQL (vars: schema, links, question)
    "rslsql.preliminary" ->
      ("Preliminary SQL.\nSchema:\n${schema}\nLinks: ${links}\n" +
        "Question: ${question}\nSQL:"),
    // RSL-SQL condition-keyword extraction (vars: question)
    "rslsql.keywords" ->
      "Extract condition keywords as a list.\nQuestion: ${question}\n[...]",
    // RSL-SQL augmented SQL (vars: keywords, schema, question)
    "rslsql.augmented" ->
      ("Augmented SQL using keywords ${keywords}.\n" +
        "Schema:\n${schema}\nQuestion: ${question}\nSQL:"))

  /** The engine-wide default registry (paraphrased bodies). */
  val default = new PromptTemplates(Defaults)

  private val VarToken = """\$\{([A-Za-z0-9_]+)\}""".r

  /** The `${var}` names a template body references. */
  private[llm] def varsOf(template: String): Set[String] =
    VarToken.findAllMatchIn(template).map(_.group(1)).toSet

  /** Per-key variables the render call sites supply — enumerable from
    * the Defaults because each paraphrase body references EXACTLY the
    * variables its call site passes (that is the Defaults' documented
    * contract; a new render call site must extend its default body in
    * step). This is the lint's ground truth.
    */
  val SuppliedVars: Map[String, Set[String]] =
    Defaults.map { case (k, body) => k -> varsOf(body) }

  /** Validate a deployed template set against the render contract —
    * catches the two silent deployment failures at LOAD time instead
    * of per-key at render time: (1) a typo'd KEY (the file would be
    * ignored and the paraphrase default silently used); (2) a typo'd
    * or unsupported `${var}` (it would surface as a literal token in
    * every rendered prompt). A template is free to USE FEWER variables
    * than its call site supplies — exact reference bodies often ignore
    * some — but never one the call site does not supply.
    */
  def lint(loaded: Map[String, String]): Unit = {
    val unknownKeys = loaded.keySet -- Defaults.keySet
    require(unknownKeys.isEmpty,
      s"unknown template key(s) ${unknownKeys.toSeq.sorted.mkString(", ")}: " +
        s"no render call site supplies them (known: ${Defaults.keys.toSeq.sorted.mkString(", ")})")
    loaded.foreach { case (key, body) =>
      val extra = varsOf(body) -- SuppliedVars(key)
      require(extra.isEmpty,
        s"template '$key' references variable(s) " +
          extra.toSeq.sorted.map(v => "${" + v + "}").mkString(", ") +
          s" its call site never supplies (supplied: " +
          SuppliedVars(key).toSeq.sorted.mkString(", ") + ")")
    }
  }

  /** Defaults overridden by every `<key>.txt` file under `dir` (the
    * key is the filename minus `.txt`, dots preserved — so the
    * reference's exact DIN-SQL prompt body lands as
    * `dinsql.generate.txt`). Non-`.txt` entries are ignored;
    * subdirectories are not walked. The loaded set is [[lint]]ed —
    * an unknown key or an unsupplied `${var}` fails loudly HERE, not
    * silently at render time.
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
    lint(loaded)
    default.withOverrides(loaded)
  }
}
