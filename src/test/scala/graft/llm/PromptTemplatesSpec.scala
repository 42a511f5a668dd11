package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.actors.DinSqlMethod

class PromptTemplatesSpec extends AnyFunSuite {

  test("defaults render with literal ${var} substitution") {
    val p = PromptTemplates.default.render("dinsql.classify",
      "question" -> "how many?", "links" -> "t.a, t.b")
    assert(p.contains("Question: how many?"))
    assert(p.contains("Schema links: t.a, t.b"))
    assert(!p.contains("${"))
  }

  test("unknown key throws; unknown placeholder survives literally") {
    intercept[NoSuchElementException](
      PromptTemplates.default.render("no.such.key"))
    val t = new PromptTemplates(Map("k" -> "a ${x} b ${typo}"))
    assert(t.render("k", "x" -> "1") === "a 1 b ${typo}")
  }

  test("substitution is literal, not regex (prompt bodies contain $ and braces)") {
    val t = new PromptTemplates(Map("k" -> "cost $5 {json} ${v}"))
    assert(t.render("k", "v" -> "x$\\1{") === "cost $5 {json} x$\\1{")
  }

  test("loadFromDir overrides by filename and keeps other defaults") {
    val dir = Files.createTempDirectory("graft_tpl")
    Files.writeString(dir.resolve("dinsql.classify.txt"),
      "EXACT BODY: ${question} // ${links}")
    Files.writeString(dir.resolve("notes.md"), "ignored")
    val t = PromptTemplates.loadFromDir(dir.toString)
    assert(t.render("dinsql.classify", "question" -> "q", "links" -> "l")
      === "EXACT BODY: q // l")
    // untouched keys still render the defaults
    assert(t.render("reforce.final", "schema" -> "s", "probes" -> "p",
      "question" -> "q").contains("Final SQL:"))
  }

  test("lint: a typo'd template KEY fails loudly at load, not silently at render") {
    val dir = Files.createTempDirectory("graft_tpl_badkey")
    Files.writeString(dir.resolve("dinsql.clasify.txt"), // typo'd key
      "EXACT BODY: ${question}")
    val e = intercept[IllegalArgumentException](
      PromptTemplates.loadFromDir(dir.toString))
    assert(e.getMessage.contains("dinsql.clasify"))
    assert(e.getMessage.contains("no render call site"))
  }

  test("lint: an unsupplied ${var} fails loudly at load; unused supplied vars are fine") {
    val dir = Files.createTempDirectory("graft_tpl_badvar")
    Files.writeString(dir.resolve("dinsql.generate.txt"),
      "SQL for ${question} with ${schema_links}") // call site supplies `links`
    val e = intercept[IllegalArgumentException](
      PromptTemplates.loadFromDir(dir.toString))
    assert(e.getMessage.contains("${schema_links}"))
    assert(e.getMessage.contains("dinsql.generate"))
    // using FEWER vars than supplied is legitimate (exact bodies often
    // ignore some) — and literal non-identifier ${…} text is not a var
    val ok = Files.createTempDirectory("graft_tpl_ok")
    Files.writeString(ok.resolve("dinsql.generate.txt"),
      "Only the question matters: ${question} (JSON example: ${\"k\": 1})")
    val t = PromptTemplates.loadFromDir(ok.toString)
    assert(t.render("dinsql.generate", "question" -> "q", "tier" -> "",
      "style" -> "", "schema" -> "", "links" -> "")
      .contains("Only the question matters: q"))
  }

  test("SuppliedVars enumerates each call site's contract from the defaults") {
    assert(PromptTemplates.SuppliedVars("dinsql.classify")
      === Set("question", "links"))
    assert(PromptTemplates.SuppliedVars("reforce.probes")
      === Set("maxProbes", "schema", "question"))
  }

  test("packaged reference-parity template files load, lint clean, and drive the actors") {
    // the fidelity seam end-to-end: exact-body deployment is a data
    // directory (here: test resources), zero code change
    val dir = new java.io.File(getClass.getResource("/templates").toURI)
    val t = PromptTemplates.loadFromDir(dir.getAbsolutePath)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val llm = new LlmClient {
      def complete(prompt: String): String = { seen += prompt; "NESTED" }
    }
    val tier = DinSqlMethod.classify(llm, "count the rows", Seq("t.c"), t)
    assert(tier === "NESTED")
    assert(seen.head.contains("Q: \"count the rows\""))
    assert(seen.head.contains("schema_links: [t.c]"))
    assert(seen.head.contains("Let's think step by step"), "tiered few-shot body must arrive verbatim")
    val refine = t.render("macsql.refine",
      "schema" -> "S", "subs" -> "a; b", "question" -> "q")
    assert(refine.contains("[Sub-questions]\na; b"))
    assert(refine.contains("[Question]\nq"))
    // untouched keys still fall back to paraphrase defaults
    assert(t.render("reforce.final", "schema" -> "s", "probes" -> "p",
      "question" -> "q").contains("Final SQL:"))
  }

  test("an overridden template reaches the actor's LLM call verbatim") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val llm = new LlmClient {
      def complete(prompt: String): String = { seen += prompt; "EASY" }
    }
    val tpl = PromptTemplates.default.withOverrides(Map(
      "dinsql.classify" -> "REFERENCE TIERING PROMPT\nQ=${question}\nL=${links}\n"))
    val tier = DinSqlMethod.classify(llm, "count rows", Seq("t.c"), tpl)
    assert(tier === "EASY")
    assert(seen.head === "REFERENCE TIERING PROMPT\nQ=count rows\nL=t.c\n")
  }
}
