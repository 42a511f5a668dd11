package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boilerplate-strip semantics: shared windows go, unique content
  * stays, thresholds hold, and decisions are partitioning-invariant.
  */
class BoilerplateSpec extends SparkSpec {

  private val chrome = "all rights reserved click here to subscribe"

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, s"alpha beta gamma $chrome"),
      (2L, s"$chrome delta epsilon zeta"),
      (3L, s"eta theta $chrome iota kappa"),
      // below minDocFreq: this 5-gram appears in only two docs
      (4L, "rare shared window of five tokens exactly here"),
      (5L, "rare shared window of five tokens but different tail"),
      (6L, "entirely unique content with no repeats at all")
    ).toDF("doc_id", "text")
  }

  test("windows shared by >= minDocFreq docs are stripped; unique text survives") {
    val out = Boilerplate.strip(corpus, "doc_id", "text",
      windowTokens = 5, minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // the 7-token chrome run shares three 5-windows across docs 1-3 —
    // all seven chrome tokens are covered in each
    Seq(1L, 2L, 3L).foreach { id =>
      val (removed, clean) = out(id)
      assert(removed == 7L, s"doc $id removed $removed")
      chrome.split(" ").foreach(w =>
        assert(!clean.split(" ").contains(w), s"doc $id kept chrome token $w"))
    }
    assert(out(1L)._2 == "alpha beta gamma")
    assert(out(2L)._2 == "delta epsilon zeta")
    assert(out(3L)._2 == "eta theta iota kappa")
    // two-document repetition is below the threshold: untouched
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id)._1 == 0L, s"doc $id should be untouched")
    }
    assert(out(6L)._2 == "entirely unique content with no repeats at all")
  }

  test("strip decisions are invariant under repartitioning") {
    def run(parts: Int) = Boilerplate.strip(corpus.repartition(parts),
      "doc_id", "text", windowTokens = 5, minDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(run(1) == run(5))
  }

  test("documents shorter than the window pass through unchanged") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "one two"), (3L, "one two"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Boilerplate.strip(tiny, "doc_id", "text", 5, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 0L, "one two")))
    assert(out(4L) == ((0L, 0L, "")))
  }

  test("dedupSpans keeps the globally first occurrence and strips later ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon tail one"),
      (2L, "prefix alpha beta gamma delta epsilon"),
      (3L, "entirely unrelated words live here fine")
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupSpans(docs, "doc_id", "text",
      windowTokens = 5, minCount = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // the shared 5-gram's first occurrence is doc 1 pos 0 — doc 1 intact
    assert(out(1L) == ((0L, "alpha beta gamma delta epsilon tail one")))
    // doc 2's occurrence (pos 1..5) is stripped; its unique prefix survives
    assert(out(2L) == ((5L, "prefix")))
    assert(out(3L)._1 == 0L)
  }

  test("dedupSpans strips within-document repeats too") {
    import spark.implicits._
    val docs = Seq((1L, "x y z w v x y z w v")).toDF("doc_id", "text")
    val out = Boilerplate.dedupSpans(docs, "doc_id", "text", 5, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).head
    // the window repeats at pos 0 and pos 5: pos 0 is kept, pos 5..9 stripped
    assert(out == ((10L, 5L, "x y z w v")))
  }

  test("dedupSpans decisions are invariant under repartitioning") {
    def run(parts: Int) = Boilerplate.dedupSpans(corpus.repartition(parts),
      "doc_id", "text", windowTokens = 5, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(run(1) == run(5))
  }
}
