package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, appendix A —
  * the rule family RefinedWeb/Dolma/FineWeb reuse): word-count bounds,
  * mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis line
  * fractions, alphabetic-word fraction, required-stopword hits.
  *
  * Every rule is evaluated with INTEGER cross-multiplication (e.g.
  * `symbols/words < 0.1` as `10*symbols < words`), so pass/fail flags
  * are exact on any engine and any partitioning — no double ratio ever
  * crosses an engine boundary. All counts are compositions of codegen'd
  * built-ins (no UDFs): at 100 TB each rule is a per-row scalar inside
  * the scan's whole-stage codegen, and a corpus filter over the rules
  * is a pushed-down predicate — zero shuffles.
  *
  * The thresholds are the published defaults, overridable per corpus
  * via [[GopherThresholds]].
  */
object GopherRules {

  /** Published defaults (Gopher appendix A.1). `minWords`/`maxWords`
    * bound document length in whitespace words; ratios are expressed as
    * exact rational thresholds (numerator, denominator).
    */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Int = 3,
      maxMeanWordLen: Int = 10,
      // EACH symbol's occurrences / words <= 1/10 (hash and ellipsis
      // ratios are thresholded separately, as published — a combined
      // sum would reject 0.08 + 0.08, which the published rule passes)
      symbolRatioNum: Int = 1, symbolRatioDen: Int = 10,
      // bullet lines / lines <= 9/10
      bulletFracNum: Int = 9, bulletFracDen: Int = 10,
      // ellipsis-ending lines / lines <= 3/10
      ellipsisFracNum: Int = 3, ellipsisFracDen: Int = 10,
      // words with an alphabetic char / words >= 4/5
      alphaFracNum: Int = 4, alphaFracDen: Int = 5,
      minStopwordHits: Int = 2)

  /** Gopher's required-stopword list (distinct PRESENCE is counted, not
    * occurrences: a document mentioning "the" twice has one hit).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Hash/ellipsis symbols whose density marks boilerplate. Counted as
    * occurrences via length shrinkage under literal removal — exact and
    * engine-portable ("..." occurrences count leftmost-first, the same
    * greedy scan both engines' replace-all performs).
    */
  private def occurrences(text: Column, literal: String): Column =
    (length(text) - length(call_function("replace", text, lit(literal), lit("")))) /
      lit(literal.length)

  def wordCount(text: Column): Column = TextAnalysis.tokenCount(text).cast("long")

  /** Non-space characters — the mean-word-length numerator. */
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("long")

  def hashCount(text: Column): Column = occurrences(text, "#").cast("long")

  def ellipsisCount(text: Column): Column = occurrences(text, "...").cast("long")

  private def lines(text: Column): Column = split(text, "\n")

  def lineCount(text: Column): Column = size(lines(text)).cast("long")

  /** Lines whose first non-space character is a bullet marker. */
  def bulletLineCount(text: Column): Column =
    size(filter(lines(text), l => ltrim(l).rlike("^[-*•]"))).cast("long")

  /** Lines ending in "..." or the one-char ellipsis, trailing spaces
    * ignored. */
  def ellipsisLineCount(text: Column): Column =
    size(filter(lines(text),
      l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")

  /** Words containing at least one ASCII letter. */
  def alphaWordCount(text: Column): Column =
    size(filter(TextAnalysis.tokens(text), t => t.rlike("[a-z]"))).cast("long")

  /** Distinct Gopher stopwords present in the token set. */
  def stopwordHits(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    GopherStopwords.map(w => when(array_contains(toks, w), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** All rule flags from the pre-computed counts — integer arithmetic
    * only. Callers that materialize the counts once (the report query)
    * reuse them here instead of rescanning the text.
    *
    * Boundary semantics match the published rules: a document is
    * dropped only when a ratio EXCEEDS its threshold (pass at
    * equality), and kept only when the alpha fraction REACHES its —
    * hence `<=` on the max-ratio rules and `>=` on the min-fraction
    * rule. Hash and ellipsis symbol ratios are thresholded per symbol,
    * not summed.
    */
  def flagsFromCounts(words: Column, chars: Column, hashes: Column,
      ellipsisSyms: Column, nLines: Column, bullets: Column,
      ellipsisLines: Column, alphaWords: Column, stopHits: Column,
      t: GopherThresholds): Seq[(String, Column)] = Seq(
    "ok_word_count" ->
      (words >= t.minWords && words <= t.maxWords),
    "ok_mean_word_len" ->
      (chars >= lit(t.minMeanWordLen) * words && chars <= lit(t.maxMeanWordLen) * words),
    "ok_symbol_ratio" ->
      (hashes * t.symbolRatioDen <= words * t.symbolRatioNum &&
        ellipsisSyms * t.symbolRatioDen <= words * t.symbolRatioNum),
    "ok_bullet_lines" ->
      (bullets * t.bulletFracDen <= nLines * t.bulletFracNum),
    "ok_ellipsis_lines" ->
      (ellipsisLines * t.ellipsisFracDen <= nLines * t.ellipsisFracNum),
    "ok_alpha_words" ->
      (alphaWords * t.alphaFracDen >= words * t.alphaFracNum),
    "ok_stopwords" ->
      (stopHits >= t.minStopwordHits))

  /** Per-document rule report: raw counts, each rule's pass flag, and
    * the conjunction (`gopher_pass`). One scan, all scalars codegen'd.
    */
  def report(text: Column, t: GopherThresholds = GopherThresholds()): Seq[(String, Column)] = {
    val counts = Seq(
      "n_words" -> wordCount(text),
      "n_nonspace_chars" -> nonSpaceChars(text),
      "n_hash_symbols" -> hashCount(text),
      "n_ellipsis_symbols" -> ellipsisCount(text),
      "n_lines" -> lineCount(text),
      "n_bullet_lines" -> bulletLineCount(text),
      "n_ellipsis_lines" -> ellipsisLineCount(text),
      "n_alpha_words" -> alphaWordCount(text),
      "n_stopword_hits" -> stopwordHits(text))
    val byName = counts.toMap
    val flags = flagsFromCounts(
      byName("n_words"), byName("n_nonspace_chars"), byName("n_hash_symbols"),
      byName("n_ellipsis_symbols"), byName("n_lines"), byName("n_bullet_lines"),
      byName("n_ellipsis_lines"), byName("n_alpha_words"),
      byName("n_stopword_hits"), t)
    counts ++ flags :+ ("gopher_pass" -> flags.map(_._2).reduce(_ && _))
  }
}
