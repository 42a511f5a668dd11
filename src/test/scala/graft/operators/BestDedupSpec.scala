package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keep-best cluster dedup semantics: the argmax member survives, the
  * whole transitive cluster contributes exactly one survivor, ties are
  * deterministic, and singletons pass through.
  */
class BestDedupSpec extends SparkSpec {
  import spark.implicits._

  // docs 1-3 are copies forming one cluster; doc 3 scores highest, so
  // keep-best must pick 3 where keep-min-id would pick 1. doc 9 is a
  // singleton. (Copies, not near-copies: mid-similarity pairs can
  // deterministically miss the 16-hash/4-band LSH — the oracle query
  // covers the near-dup geometry on real data.)
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 6L),
      (2L, "alpha beta gamma delta epsilon zeta", 7L),
      (3L, "alpha beta gamma delta epsilon zeta", 9L),
      (9L, "totally unrelated content lives over here", 5L)
    ).toDF("doc_id", "text", "score")
  }

  test("the best-scoring member of a transitive cluster survives; singletons pass") {
    val out = BestDedup.dedupKeepBest(corpus, "doc_id", "text", "score",
      threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(3L, 9L))
  }

  test("score ties break to the smaller id") {
    import spark.implicits._
    val tied = Seq(
      (5L, "one two three four five six seven", 7L),
      (6L, "one two three four five six seven", 7L)
    ).toDF("doc_id", "text", "score")
    val out = BestDedup.dedupKeepBest(tied, "doc_id", "text", "score",
      threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(5L))
  }

  test("decisions are invariant under repartitioning") {
    def run(parts: Int) = BestDedup.dedupKeepBest(
      corpus.repartition(parts), "doc_id", "text", "score", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(run(1) === run(5))
  }
}
