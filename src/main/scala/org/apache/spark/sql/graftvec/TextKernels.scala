package org.apache.spark.sql.graftvec

/** The ONE tokenization used by the text kernels (BpeEncode,
  * SpanCorrupt): lowercase + \s+ split, mirroring
  * `TextAnalysis.tokens` = `filter(split(lower(text), "\\s+"), …)`.
  *
  * Locale contract: the kernels lowercase with Locale.ROOT —
  * environment-independent by construction. Spark's `lower()` slow
  * path delegates to `String.toLowerCase()` under the JVM DEFAULT
  * locale, so on an exotic default locale (Turkish dotless-i) the HOF
  * forms diverge not just from these kernels but from DuckDB's
  * `lower()` too — there is no locale-sensitive choice that keeps all
  * three equal. The kernels pick the deterministic one; the
  * equivalence specs pin kernel == HOF on locale-stable text, which is
  * also the precondition of every DuckDB oracle.
  */
object TextKernels {

  /** Exactly Java-regex \s — NOT Character.isWhitespace, whose Unicode
    * extras would split differently from `split(text, "\\s+")`.
    */
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Apply `f` to each lowercased \s+-token of `text`, in order. */
  def forEachToken(text: String)(f: String => Unit): Unit = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var start = 0
    val len = lower.length
    while (start < len) {
      while (start < len && isWs(lower.charAt(start))) start += 1
      var end = start
      while (end < len && !isWs(lower.charAt(end))) end += 1
      if (end > start) f(lower.substring(start, end))
      start = end
    }
  }
}
