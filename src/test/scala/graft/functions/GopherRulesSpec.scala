package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GopherRules._

/** Hand-computed fixtures for the Gopher rule gates, pinning the two
  * published-semantics details the round-9 advice flagged: symbol
  * ratios are thresholded PER SYMBOL (hash and ellipsis separately,
  * not summed), and every ratio rule passes AT its threshold (`<=` /
  * `>=`, not strict) — a doc exactly on the boundary is kept.
  */
class GopherRulesSpec extends SparkSpec {

  // relaxed length/stopword floors so each fixture isolates one rule
  private val t = GopherThresholds(minWords = 1, minStopwordHits = 0)

  private def reportOf(texts: (Int, String)*): Map[Int, Row] = {
    import spark.implicits._
    val cols = report(col("text"), t).map { case (n, c) => c.as(n) }
    texts.toSeq.toDF("id", "text")
      .select(col("id") +: cols: _*)
      .collect()
      .map(r => r.getInt(0) -> r)
      .toMap
  }

  test("counts: words, chars, symbols, lines, alpha, stopwords — hand-computed") {
    val r = reportOf(
      (1, "The cat sat with the dog...\n- first\nwait..."))(1)
    // tokens (lowered, whitespace-split): the cat sat with the dog...
    //   - first wait...   => 9
    assert(r.getAs[Long]("n_words") == 9L)
    // non-space chars: "Thecatsatwiththedog...-firstwait..." = 35
    assert(r.getAs[Long]("n_nonspace_chars") == 35L)
    assert(r.getAs[Long]("n_hash_symbols") == 0L)
    // two literal "..." occurrences
    assert(r.getAs[Long]("n_ellipsis_symbols") == 2L)
    assert(r.getAs[Long]("n_lines") == 3L)
    // "- first" is the only bullet line
    assert(r.getAs[Long]("n_bullet_lines") == 1L)
    // lines ending in "...": line 1 and line 3
    assert(r.getAs[Long]("n_ellipsis_lines") == 2L)
    // tokens containing a letter: every token except the bare "-"
    // bullet marker => 8 of 9
    assert(r.getAs[Long]("n_alpha_words") == 8L)
    // distinct stopwords present: the, with => 2
    assert(r.getAs[Long]("n_stopword_hits") == 2L)
  }

  test("symbol ratio is per symbol: 0.1 hash + 0.1 ellipsis passes (sum 0.2 would not)") {
    // 10 tokens, one '#' and one '...' => each ratio exactly 1/10
    val r = reportOf(
      (1, "a1 b2 c3 d4 e5 f6 g7 h8 # ..."))(1)
    assert(r.getAs[Long]("n_words") == 10L)
    assert(r.getAs[Long]("n_hash_symbols") == 1L)
    assert(r.getAs[Long]("n_ellipsis_symbols") == 1L)
    assert(r.getAs[Boolean]("ok_symbol_ratio"),
      "per-symbol 0.1+0.1 must pass — combined-sum semantics rejected it")
  }

  test("ratio rules pass AT the threshold (boundary docs are kept)") {
    val rows = reportOf(
      // 10 words, exactly one '#': hash ratio exactly 0.1 => pass
      (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 #"),
      // 10 lines, 9 bullets: bullet fraction exactly 9/10 => pass
      (2, (1 to 9).map(i => s"- b$i").mkString("\n") + "\nend"),
      // 10 lines, 3 ending in "...": ellipsis-line fraction exactly 3/10
      (3, (1 to 3).map(i => s"l$i...").mkString("\n") + "\n" +
        (4 to 10).map(i => s"l$i").mkString("\n")),
      // 5 words, 4 with a letter: alpha fraction exactly 4/5 => pass
      (4, "cat dog bird fish 42"),
      // 5 words, 3 with a letter: 3/5 < 4/5 => fail
      (5, "cat dog bird 41 42"))
    assert(rows(1).getAs[Boolean]("ok_symbol_ratio"), "hash ratio == 0.1 must pass")
    assert(rows(2).getAs[Long]("n_bullet_lines") == 9L)
    assert(rows(2).getAs[Boolean]("ok_bullet_lines"), "bullet fraction == 0.9 must pass")
    assert(rows(3).getAs[Long]("n_ellipsis_lines") == 3L)
    assert(rows(3).getAs[Boolean]("ok_ellipsis_lines"), "ellipsis fraction == 0.3 must pass")
    assert(rows(4).getAs[Boolean]("ok_alpha_words"), "alpha fraction == 0.8 must pass")
    assert(!rows(5).getAs[Boolean]("ok_alpha_words"), "alpha fraction 0.6 must fail")
  }

  test("word count, mean word length, stopwords, and the conjunction") {
    val strict = GopherThresholds() // published defaults
    import spark.implicits._
    val cols = report(col("text"), strict).map { case (n, c) => c.as(n) }
    val rows = Seq(
      // 60 words incl. 2 distinct stopwords (the, and), mean len in
      // [3,10]: passes all
      (1, ("the quick brown fox jumps over lazy dogs and times " * 6).trim),
      // 10 words: below minWords=50
      (2, "the cat with dog runs fast over green hills today"),
      // mean word length 2 (<3): fails mean-word-len
      (3, ("ab cd " * 30).trim))
      .toDF("id", "text")
      .select(col("id") +: cols: _*)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rows(1).getAs[Long]("n_words") == 60L)
    assert(rows(1).getAs[Boolean]("ok_word_count"))
    assert(rows(1).getAs[Boolean]("ok_mean_word_len"))
    assert(rows(1).getAs[Boolean]("ok_stopwords"))
    assert(rows(1).getAs[Boolean]("gopher_pass"))
    assert(!rows(2).getAs[Boolean]("ok_word_count"))
    assert(!rows(2).getAs[Boolean]("gopher_pass"))
    assert(rows(3).getAs[Long]("n_words") == 60L)
    assert(!rows(3).getAs[Boolean]("ok_mean_word_len"))
    assert(!rows(3).getAs[Boolean]("gopher_pass"))
  }
}
