package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.MockLlm
import graft.util.Hashes

/** Driver-side text utilities: clean/normalize/skeleton/jaccard,
  * n-gram linking + shift + mask, parse helpers, hash helpers.
  */
class SqlTextSpec extends AnyFunSuite {

  test("sql_clean strips fences and newlines") {
    assert(SqlText.clean("```sql\nSELECT 1\n```") == "SELECT 1")
  }

  test("jaccard over token sets") {
    assert(SqlText.jaccard("a b c", "b c d") == 0.5)
    assert(SqlText.jaccard("", "") == 0.0)
  }

  test("normalize: lowercase outside quotes, quotes, semicolon, asc, aliases") {
    assert(SqlText.normalize("SELECT Name FROM T;") == "select name from t")
    assert(SqlText.normalize("""SELECT "x" FROM t""") == "select 'x' from t")
    assert(SqlText.normalize("SELECT 'KeepCase' FROM t") == "select 'KeepCase' from t")
    assert(SqlText.normalize("SELECT a FROM t ORDER BY a") == "select a from t order by a asc")
    assert(SqlText.normalize("SELECT t1.a FROM tbl AS t1") == "select tbl.a from tbl")
    assert(SqlText.normalize("SELECT t1.a FROM tbl t1") == "select tbl.a from tbl")
  }

  test("skeleton masks identifiers, literals, numbers and collapses") {
    val sk = SqlText.skeleton(
      "SELECT name FROM users WHERE age > 18 AND city = 'Oslo'",
      tables = Set("users"), columns = Set("name", "age", "city"))
    assert(sk == "select _ from _ where _")
    val sk2 = SqlText.skeleton(
      "SELECT a.name FROM users AS a JOIN orders AS b ON a.id = b.uid ORDER BY total",
      tables = Set("users", "orders"), columns = Set("name", "id", "uid", "total"))
    assert(sk2.startsWith("select _ from _"))
    assert(sk2.endsWith("order by _ asc") || sk2.endsWith("order by _ _"))
  }

  test("parseList and parseJsonish tolerate LLM noise") {
    assert(SqlText.parseList("""Here: ["a.b", 'c.d', e] done""") == Seq("a.b", "c.d", "e"))
    assert(SqlText.parseJsonish("""{"table": "users", 'col': 'name'}""") ==
      Map("table" -> "users", "col" -> "name"))
  }

  test("n-gram linking: exact beats partial, stopwords skipped") {
    import SchemaLinking._
    val q = "show customer name for each order".split(" ").toSeq
    val ms = computeSchemaLinking(q, columns = Seq("customer name", "order_id"), tables = Seq("order"))
    // "customer name" 2-gram exact-matches column 0
    assert(ms.exists(m => m.flag == ColExact && m.targetId == 0 && (m.qId == 1 || m.qId == 2)))
    // "order" exact-matches table 0
    assert(ms.exists(m => m.flag == TabExact && m.targetId == 0 && m.qId == 5))
    // "order" partial-matches column order_id
    assert(ms.exists(m => m.flag == ColPartial && m.targetId == 1 && m.qId == 5))
  }

  test("matchShift: scarce tokens claim first, overlaps reuse, exacts win fresh claims") {
    import SchemaLinking._
    val out = matchShift(Seq(
      Match(0, 0, ColExact), Match(0, 1, ColPartial), // q0 overlaps q1's claim
      Match(1, 1, ColPartial),                        // q1: scarce → claims (partial,1) first
      Match(2, 2, ColExact), Match(2, 3, ColPartial))) // q2: no overlap → exact wins
    assert(out.contains(Match(1, 1, ColPartial)))
    // q0's overlap with q1's claim is REUSED (reference semantics), exact not claimed
    assert(out.contains(Match(0, 1, ColPartial)) && !out.contains(Match(0, 0, ColExact)))
    // q2 claims fresh: exact only, partial dropped
    assert(out.contains(Match(2, 2, ColExact)) && !out.contains(Match(2, 3, ColPartial)))
  }

  test("maskQuestion applies schema and value tags") {
    val masked = SchemaLinking.maskQuestion(
      Seq("show", "name", "for", "2023"), schemaIds = Set(1), valueIds = Set(3))
    assert(masked == "show <mask> for ")
  }

  test("few-shot helpers: rewrite fallback, debate pick, mode dispatch") {
    import graft.retrieve.FewShot
    assert(FewShot.rewriteQuery(MockLlm(), "q", Nil) == "q")
    assert(FewShot.debatePick(MockLlm(default = "1"), "q", Seq("a", "b")) == "b")
    assert(FewShot.debatePick(MockLlm(default = "zzz"), "q", Seq("a", "b")) == "a")
    assert(FewShot.modeSelector("agent", "p", "a") == "a")
    assert(FewShot.modeSelector("pipeline", "p", "a") == "p")
  }

  test("hash helpers are deterministic and in range") {
    val ids = (0L to 1000L).map(Hashes.throwHashId)
    assert(ids.forall(i => i >= 100 && i <= 999))
    assert(Hashes.throwHashId(42) == Hashes.throwHashId(42))
    assert(Hashes.timestampHashKey(nowSec = 1700000000L, salt = 7) == 7)
    assert(Hashes.timestampHashKey(nowSec = 1700123456L, salt = 99) == 12345699L)
  }
}
