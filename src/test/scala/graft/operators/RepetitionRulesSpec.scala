package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the within-document repetition filters
  * plus determinism and gate behavior.
  */
class RepetitionRulesSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def reportOf(texts: Seq[String]): Map[Long, Map[String, Long]] = {
    val df = RepetitionRules.report(docsDf(texts), "doc_id", "text")
    val cols = RepetitionRules.Thresholds.map(_._1)
    df.collect().map { r =>
      r.getLong(0) -> cols.map(c => c -> r.getAs[Long](c)).toMap
    }.toMap
  }

  test("duplicate line fractions match hand computation") {
    // 4 lines, "a b" twice: dup lines 2/4 = 0.5; chars: "a b"(3)*2 dup
    // over 3*2 + 5 + 7 = 18 total -> 6/18
    val t = "a b\nc d e\na b\nf g h i"
    val got = reportOf(Seq(t))(0L)
    assert(got("dup_line_frac_micro") === 500000L)
    assert(got("dup_line_char_frac_micro") === 6L * 1000000L / 18L)
  }

  test("top 2-gram char fraction picks the most frequent n-gram, ties lexicographic") {
    // tokens: x y x y z -> 2-grams: "x y"(2), "y x"(1), "y z"(1)
    // chars: 2*3 + 3 + 3 = 12; top = "x y": 6/12 = 0.5
    val got = reportOf(Seq("x y x y z"))(0L)
    assert(got("top2gram_char_frac_micro") === 500000L)
  }

  test("a heavily self-repeating document fails; normal prose passes") {
    val spam = ("buy cheap now " * 40).trim
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "rests under a tree while evening settles quietly around the field"
    val rep = RepetitionRules.report(docsDf(Seq(spam, prose)), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("repetition_pass")).toMap
    assert(!rep(0L), "repeated spam must fail the repetition gate")
    assert(rep(1L), "normal prose must pass")
    val gated = RepetitionRules.gate(docsDf(Seq(spam, prose)), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated === Set(1L))
  }

  test("short documents pass via the word floor; empty docs report zeros") {
    val got = reportOf(Seq("", "one", "two words"))
    // unit-less docs report all-zero fractions
    assert(got(0L).values.forall(_ == 0L), got(0L).toString)
    assert(got(1L)("top2gram_char_frac_micro") === 0L)
    // a 2-word doc's single 2-gram covers 100% of its 2-gram mass —
    // degenerate, which is exactly why the pass rule floors on words
    assert(got(2L)("top2gram_char_frac_micro") === 1000000L)
    val passes = RepetitionRules.report(
      docsDf(Seq("", "one", "two words")), "doc_id", "text")
      .collect().map(_.getAs[Boolean]("repetition_pass"))
    assert(passes.forall(identity))
  }

  test("codegen kernel == the relational definition on the real corpus") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val kernel = rows(RepetitionRules.report(docs, "doc_id", "text"))
    graft.core.CacheBin.drain()
    val relational = rows(RepetitionRules.reportRelational(docs, "doc_id", "text"))
    assert(kernel === relational)
  }

  test("kernel == relational on crafted edge texts") {
    val texts = Seq(
      "", " \n \n ", "a", "a a a a a a", "x\nx\nx\n  x  \ny",
      "line one\nline one\nline two\n\n\nline one",
      ("spam " * 60).trim, "tabs\there\ttabs\there",
      "Ünïcode wörds Ünïcode wörds mixed CASE Mixed case",
      // astral code points (surrogate pairs) — the exact class where
      // a charAt-based hash would diverge from split('')/ascii
      "math 𝕏 symbols 𝕏 twice 😀 emoji",
      "𝕏𝕐 𝕏𝕐 repeated astral words")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val df = docsDf(texts)
    val kernel = rows(RepetitionRules.report(df, "doc_id", "text"))
    graft.core.CacheBin.drain()
    val relational = rows(RepetitionRules.reportRelational(df, "doc_id", "text"))
    assert(kernel === relational)
  }

  test("the kernel report plans with no exchange (scan-only)") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val plan = RepetitionRules.report(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition report shuffles:\n$plan")
  }

  test("gate is join-free and shuffle-free (a scan filter) and matches report's pass column") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val gated = RepetitionRules.gate(docs, "doc_id", "text")
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"repetition gate joins:\n$plan")
    assert(!plan.contains("Exchange"), s"repetition gate shuffles:\n$plan")
    // the single-call RepetitionPass predicate == report's pass column
    val viaReport = RepetitionRules.report(docs, "doc_id", "text")
      .filter(col("repetition_pass")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(gated.select("doc_id").collect().map(_.getLong(0)).toSet === viaReport)
    // and the predicate appears ONCE in the plan — no per-field kernel
    // re-evaluation from alias substitution
    assert(plan.sliding("repetition_pass".length).count(
      _ == "repetition_pass") <= 2, // condition + possible reuse line
      s"kernel duplicated in the gate plan:\n$plan")
  }

  test("RepetitionPass honors minWords exactly like report") {
    val texts = Seq(("spam " * 60).trim, ("spam " * 9).trim, "plain text here",
      "", "a", "Ünïcode wörds Ünïcode wörds", "𝕏𝕐 𝕏𝕐 repeated astral words")
    for (minWords <- Seq(0, 5, 50)) {
      val df = docsDf(texts)
      val viaGate = RepetitionRules.gate(df, "doc_id", "text", minWords)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaReport = RepetitionRules.report(df, "doc_id", "text", minWords)
        .filter(col("repetition_pass")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(viaGate === viaReport, s"minWords=$minWords")
    }
  }

  test("deterministic under repartitioning") {
    val texts = Seq("a b a b c\nd e\nd e", "x y z " * 10, "plain text here")
    def run(parts: Int) =
      try RepetitionRules.report(docsDf(texts).repartition(parts),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      finally graft.core.CacheBin.drain()
    assert(run(1) === run(7))
  }
}
