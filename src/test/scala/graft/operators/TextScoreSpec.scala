package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-statistics scoring semantics: in-distribution text scores
  * high, out-of-distribution low; empty docs are zeros; decisions are
  * partitioning-invariant.
  */
class TextScoreSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    // 8 fluent docs sharing bigram structure + 1 scrambled outlier
    val fluent = (0 until 8).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    val scrambled = Seq((100L, "zxq wvu tsr qpo nml kji hgf edc"))
    val empty = Seq((200L, ""))
    (fluent ++ scrambled ++ empty).toDF("doc_id", "text")
  }

  test("bigram LM scores in-distribution text above scrambled text") {
    val out = TextScore.bigramLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // fluent docs share every bigram 8 ways: high conditional prob
    val fluentAvg = out(0L)._3
    val scrambledAvg = out(100L)._3
    assert(fluentAvg > scrambledAvg,
      s"fluent $fluentAvg should beat scrambled $scrambledAvg")
    assert(out(200L) == ((0L, 0L, 0.0)), "empty doc must be zeros")
    // all log-probs are negative (probabilities < 1)
    assert(fluentAvg < 0.0 && scrambledAvg < 0.0)
  }

  test("bigram LM score is invariant under repartitioning") {
    // drain between runs: each run persists its bigram tables, and the
    // second identical subtree would otherwise just warn-and-reuse
    def run(parts: Int) =
      try TextScore.bigramLogProb(corpus.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      finally graft.core.CacheBin.drain()
    assert(run(1) == run(5))
  }

  test("hot-bigram split does not change scores") {
    def run(hot: Int) =
      try TextScore.bigramLogProb(corpus, "doc_id", "text", hotBigrams = hot)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      finally graft.core.CacheBin.drain()
    // hot = 0 routes everything through the cold shuffle join
    assert(run(0) == run(2048))
  }
}
