package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // one eval doc; 4-grams so the short fixtures shingle
  private val evalDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  // 20: near-verbatim copy of the eval doc (high overlap)
  // 21: shares exactly one 4-gram ("the quick brown fox") in a longer doc
  // 22: no overlap at all
  private val train = Seq(
    (20L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
    (21L, "an essay that quotes the quick brown fox once among many many other unrelated words about engines"),
    (22L, "completely unrelated text about distributed query planning and shuffle exchanges"))
    .toDF("doc_id", "text")

  test("overlapReport fractions: copy high, single-quote low, clean zero") {
    val r = Decontaminate.overlapReport(train, evalDocs, "doc_id", "text", n = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(20L) > 0.5, s"copy should be mostly contaminated: $r")
    assert(r(21L) > 0.0 && r(21L) < 0.2, s"one shared idiom is a sliver: $r")
    assert(r(22L) === 0.0, s"clean doc: $r")
  }

  test("report counts are exact: n_contaminated <= n_ngrams, fraction = ratio") {
    val rows = Decontaminate.overlapReport(train, evalDocs, "doc_id", "text", n = 4)
      .collect()
    rows.foreach { x =>
      val (t, c, f) = (x.getLong(1), x.getLong(2), x.getDouble(3))
      assert(c <= t)
      assert(f === c.toDouble / t.toDouble)
    }
  }

  test("threshold keeps the single-quote doc the any-hit rule kills") {
    val anyHit = Decontaminate.decontaminate(train, evalDocs, "doc_id", "text", n = 4)
      .select($"doc_id").as[Long].collect().toSet
    val graded = Decontaminate.decontaminateByFraction(
        train, evalDocs, "doc_id", "text", n = 4, maxOverlap = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(anyHit === Set(22L)) // any-hit kills both 20 and 21
    assert(graded === Set(21L, 22L)) // graded keeps the incidental quote
  }

  test("docs too short to shingle are kept by the threshold rule") {
    val tiny = Seq((30L, "two words")).toDF("doc_id", "text")
    val kept = Decontaminate.decontaminateByFraction(
        tiny, evalDocs, "doc_id", "text", n = 4, maxOverlap = 0.1)
      .count()
    assert(kept === 1L)
  }

  test("report is partitioning-invariant") {
    val big = (0 until 100).map(i =>
      (i.toLong, s"doc $i quotes the quick brown fox jumps over padding ${i % 5} filler"))
      .toDF("doc_id", "text")
    def run(parts: Int) = Decontaminate.overlapReport(
        big.repartition(parts), evalDocs, "doc_id", "text", n = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(run(1) === run(13))
  }

  test("eval side broadcasts; per-doc counts ship one row per doc") {
    val plan = Decontaminate.overlapReport(train, evalDocs, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // map-side partial aggregation before the id-keyed exchange
    assert(plan.contains("HashAggregate"), plan)
  }

  test("semanticDecontaminate survives zero-norm vectors on either side") {
    // r15 advice: an all-zero eval vector made the cosine NaN for EVERY
    // corpus row, and NaN >= threshold is TRUE under Spark's NaN
    // ordering — one degenerate eval row silently dropped the corpus;
    // a zero-norm corpus row was likewise always dropped
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // matches eval direction -> dropped
      (2L, Array(0.0f, 1.0f)),   // orthogonal -> kept
      (3L, Array(0.0f, 0.0f)))   // zero-norm corpus row -> kept (cos := 0)
      .toDF("doc_id", "vec")
    val evalSet = Seq(
      Tuple1(Array(0.0f, 0.0f)), // degenerate eval row: must be ignored
      Tuple1(Array(2.0f, 0.0f)))
      .toDF("embedding")
    val kept = Decontaminate.semanticDecontaminate(
      corpus, evalSet, "doc_id", "vec", threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L), s"kept: $kept")
    // all-degenerate eval set: nothing can match, corpus unchanged
    val keptAll = Decontaminate.semanticDecontaminate(
      corpus, Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding"),
      "doc_id", "vec", threshold = 0.9)
      .count()
    assert(keptAll === 3L, "a zero-norm-only eval set must drop nothing")
  }

  test("maxOverlap = 0 is rejected (that is the any-hit rule's job)") {
    intercept[IllegalArgumentException] {
      Decontaminate.decontaminateByFraction(
        train, evalDocs, "doc_id", "text", n = 4, maxOverlap = 0.0)
    }
  }
}
