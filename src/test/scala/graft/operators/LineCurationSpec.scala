package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the C4 line rules and corpus-level line
  * dedup: terminal-punct/word-floor/block-phrase keep logic, the
  * document gate, blank-line neutrality, and exact removal of lines
  * shared across >= minDocFreq documents.
  */
class LineCurationSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "a good long sentence here okay.\nshort one.\nno terminal punct line\nenable javascript to view this page."),
      (1L, "another proper sentence stands here!\n\nis this a question now sir?\nok."),
      (2L, "{ code block }\nlorem ipsum dolor sit amet.\nclosing proper line right here."),
      (3L, "this site uses cookies for tracking purposes.\nplease accept our full privacy policy terms.\nfirst real sentence with enough words.\nsecond real sentence with enough words.\nthird real sentence with enough words.")
    ).toDF("doc_id", "text")
  }

  test("filterLines keeps terminal-punct lines with >= minWords and no block phrase") {
    val out = LineCuration.filterLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc0: 4 lines; kept only the 6-word opener — "short one." fails
    // the C4 minWords=5 floor, bare line fails punct, javascript blocked
    assert(out(0L) === ((4L, 1L, "a good long sentence here okay.")))
    // doc1: blank + "ok." fail the word floor; 5-word sentence and
    // 6-word question survive
    assert(out(1L) === ((4L, 2L,
      "another proper sentence stands here!\nis this a question now sir?")))
    // doc2: line-level rules don't see doc-level blocks — lorem line has
    // punct + 5 words, "{ code block }" fails punct
    assert(out(2L)._2 === 2L)
    // doc3: the C4 policy phrases block the cookie and privacy lines;
    // the three 6-word sentences survive
    assert(out(3L) === ((5L, 3L,
      "first real sentence with enough words.\n" +
        "second real sentence with enough words.\n" +
        "third real sentence with enough words.")))
  }

  test("c4Clean drops blocked docs and docs under the kept-line floor") {
    val out = LineCuration.c4Clean(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc0: 1 kept < 3 -> dropped; doc1: 2 kept < 3 -> dropped;
    // doc2: contains both "lorem ipsum" and "{" -> dropped;
    // doc3: 3 kept, no doc block -> the only survivor
    assert(out === Set(3L))
  }

  test("stripDuplicateLines removes lines in >= minDocFreq distinct docs, keeps blanks") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "unique alpha\nsubscribe now\n\nbody text zero"),
      (1L, "subscribe now\nbody text one"),
      (2L, "body text two\nsubscribe now\nsubscribe now"),
      (3L, "all original lines\nnothing shared here")
    ).toDF("doc_id", "text")
    val out = LineCuration.stripDuplicateLines(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) === ((4L, 1L, "unique alpha\n\nbody text zero")))
    assert(out(1L) === ((2L, 1L, "body text one")))
    // BOTH in-doc copies of the shared line go (flag is corpus-level)
    assert(out(2L) === ((3L, 2L, "body text two")))
    assert(out(3L) === ((2L, 0L, "all original lines\nnothing shared here")))
  }

  test("stripDuplicateLines is deterministic under repartitioning") {
    import spark.implicits._
    val corpus = (0L until 60L).map { i =>
      val shared = if (i % 2 == 0) "\ncommon footer line" else ""
      (i, s"unique body $i content\nsecond line $i$shared")
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      LineCuration.stripDuplicateLines(corpus.repartition(parts),
        "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    assert(run(2) === run(7))
  }

  test("stripDuplicateParagraphs: blank-line units, same contract") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "unique intro zero\n\nshared quoted passage here\n\nclosing zero"),
      (1L, "opening one\n\nshared quoted passage here"),
      (2L, "all original paragraphs\n\nnothing shared at all")
    ).toDF("doc_id", "text")
    val out = LineCuration.stripDuplicateParagraphs(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the shared paragraph goes from BOTH docs; single-newline content
    // inside a paragraph is untouched (units are blank-line separated)
    assert(out(0L) === ((3L, 1L, "unique intro zero\n\nclosing zero")))
    assert(out(1L) === ((2L, 1L, "opening one")))
    assert(out(2L) === ((2L, 0L,
      "all original paragraphs\n\nnothing shared at all")))
  }

  test("stripDuplicateLines: a line repeated only within one doc survives") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "echo echo line\necho echo line"),
      (1L, "different content")
    ).toDF("doc_id", "text")
    val out = LineCuration.stripDuplicateLines(corpus, "doc_id", "text")
      .filter(col("doc_id") === 0L).collect().head
    assert(out.getLong(2) === 0L)
    assert(out.getString(3) === "echo echo line\necho echo line")
  }
}
