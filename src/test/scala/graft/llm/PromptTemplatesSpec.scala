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
