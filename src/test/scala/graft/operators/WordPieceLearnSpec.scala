package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece learner invariants: the likelihood objective (not raw
  * frequency) picks merges, the ## alphabet and merged-token rule
  * hold, encode reassembles words, and everything is deterministic.
  */
class WordPieceLearnSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("likelihood beats frequency: a rare-but-exclusive pair merges first") {
    // (a, ##b) has pair count 100 but 'a' also occurs alone 100 times:
    // score = 100 / (200 * 100) = 0.005. (x, ##y) occurs only twice but
    // exclusively: score = 2 / (2 * 2) = 0.5 — WordPiece merges (x, ##y)
    // first where BPE would take (a, ##b).
    val text = (Seq.fill(100)("ab") ++ Seq.fill(100)("a") ++
      Seq.fill(2)("xy")).mkString(" ")
    val res = WordPieceLearn.learn(docsDf(Seq(text)), "text", numMerges = 1)
    assert(res.merges.head.left === "x")
    assert(res.merges.head.right === "##y")
    assert(res.merges.head.merged === "xy")
    assert(res.merges.head.pairCount === 2L)
  }

  test("continuation alphabet: non-initial units carry ##, merges shed the right marker") {
    val res = WordPieceLearn.learn(
      graft.catalog.Tables.load(spark, sfDir, "documents"), "text", 3)
    assert(res.merges.size === 3)
    res.merges.foreach { m =>
      assert(m.right.startsWith("##"), s"right of $m must be a continuation")
      assert(m.merged === m.left + m.right.stripPrefix("##"))
    }
  }

  test("encode reassembles each word exactly once ## markers are stripped") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = WordPieceLearn.learn(docs, "text", 3)
    val bad = docs.select(
      regexp_replace(
        concat_ws("", WordPieceLearn.encodeExpr(col("text"), res.merges)),
        "##", "").as("enc"),
      concat_ws("", graft.functions.TextAnalysis.tokens(col("text"))).as("raw"))
      .filter(col("enc") =!= col("raw"))
    assert(bad.count() === 0)
  }

  test("token counts: initial and continuation units are distinct vocabulary entries") {
    val res = WordPieceLearn.learn(docsDf(Seq("aa aa ba")), "text", 0)
    val vocab = WordPieceLearn.vocabulary(res.wordFreq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aa" -> a ##a (x2), "ba" -> b ##a: initial 'a' count 2, ##a count 3
    assert(vocab("a") === 2L)
    assert(vocab("##a") === 3L)
    assert(vocab("b") === 1L)
  }

  test("MaxMatch inference: greedy longest match, whole-word UNK, scan-only plan") {
    val vocab = Seq("un", "##aff", "##able", "##ably", "aff", "a", "##a", "##b", "b", "##le")
    val df = docsDf(Seq("unaffable ab zzz ba"))
    val out = df.select(
      WordPieceLearn.maxMatchExpr(col("text"), vocab).as("t"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("un", "##aff", "##able", "a", "##b", "[UNK]", "b", "##a"))
    val plan = df.select(WordPieceLearn.maxMatchExpr(col("text"), vocab))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }

  test("deterministic under repartitioning") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    def run(parts: Int) =
      try WordPieceLearn.learn(docs.repartition(parts), "text", 3).merges
      finally graft.core.CacheBin.drain()
    assert(run(2) === run(7))
  }
}
