package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd within-document repetition statistics — every Gopher
  * repetition fraction computed in ONE pass over the row, because all
  * of a document's units (lines, n-grams) live inside that row: the
  * relational explode + two-shuffle form in
  * `graft.operators.RepetitionRules.reportRelational` defines the
  * semantics (and the DuckDB oracle), this kernel runs the hot path
  * with ZERO shuffles — the 100 TB shape, and the form a streaming
  * ingest gate can use as a stateless scan filter.
  *
  * Value-identical to the relational definition (pinned by
  * RepetitionRulesSpec): same per-token code-point polynomial hash
  * (TextAnalysis.fingerprint), same base-1000003 n-gram combination,
  * same space-aware lengths, same max-length-per-hash-group and
  * (count desc, hash asc) top tie-break, same integer micro division.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(
    StructField("n_words", LongType, nullable = false) +:
      RepetitionStatsExpr.FracNames.map(n =>
        StructField(n, LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.RepetitionStatsExpr.compute($a.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The repetition GATE as one boolean expression: compute the stats
  * struct ONCE and apply the Gopher thresholds inside the same kernel
  * call. This is the form a `filter` should use — referencing the
  * stats struct's fields from a filter predicate invites Catalyst's
  * predicate pushdown to substitute the alias and re-evaluate the
  * kernel once per referenced field (8× per row on the hot scan);
  * here the predicate is a single call by construction.
  */
case class RepetitionPass(child: Expression, minWords: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_pass"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.pass(input.asInstanceOf[UTF8String].toString, minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.RepetitionStatsExpr.pass($a.toString(), $minWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {

  val FracNames: Seq[String] = Seq(
    "dup_line_frac_micro", "dup_line_char_frac_micro",
    "top2gram_char_frac_micro", "top3gram_char_frac_micro",
    "top4gram_char_frac_micro", "dup5gram_char_frac_micro",
    "dup10gram_char_frac_micro")

  /** Gopher's published cut lines in micro units, aligned 1:1 with
    * [[FracNames]] — a document PASSES when every fraction is AT OR
    * BELOW its threshold (`graft.operators.RepetitionRules.Thresholds`
    * re-exports these pairs as the public contract).
    */
  val ThresholdsMicro: Array[Long] =
    Array(300000L, 200000L, 200000L, 180000L, 160000L, 150000L, 100000L)

  private val P = 1000000007L
  private val B = 1000003L
  private val Ns = Array(2, 3, 4, 5, 10)

  /** Code-point polynomial hash — TextAnalysis.fingerprint's rule
    * (split("")/ascii iterates code points on both engines).
    */
  private def polyHash(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** (dupNumUnits?, stats) per unit kind from (hash, len) pairs:
    * units, chars (= Σ cnt·maxLen per hash group), dup units/chars
    * (groups with cnt > 1), top group's cnt·maxLen (count desc, hash
    * asc). Sorts by hash — one allocation, one pass.
    */
  private final class KindStats {
    var units = 0L; var chars = 0L
    var dupUnits = 0L; var dupChars = 0L
    var topCnt = 0L; var topHash = 0L; var topChars = 0L
  }

  private def statsOf(hashes: Array[Long], lens: Array[Long], n: Int): KindStats = {
    val st = new KindStats
    if (n == 0) return st
    val idx = Array.range(0, n).sortBy(hashes(_))
    var i = 0
    while (i < n) {
      val h = hashes(idx(i))
      var j = i
      var maxLen = 0L
      while (j < n && hashes(idx(j)) == h) {
        if (lens(idx(j)) > maxLen) maxLen = lens(idx(j))
        j += 1
      }
      val cnt = (j - i).toLong
      st.units += cnt
      st.chars += cnt * maxLen
      if (cnt > 1) { st.dupUnits += cnt; st.dupChars += cnt * maxLen }
      if (cnt > st.topCnt || (cnt == st.topCnt && (st.topCnt == 0L || h < st.topHash))) {
        st.topCnt = cnt; st.topHash = h; st.topChars = cnt * maxLen
      }
      i = j
    }
    st
  }

  private def micro(num: Long, den: Long): Long =
    if (den > 0) num * 1000000L / den else 0L

  def compute(text: String): InternalRow = {
    // ---- lines: raw text split on \n, space-trimmed, non-empty ----
    val lineH = new java.util.ArrayList[Long]()
    val lineL = new java.util.ArrayList[Long]()
    var ls = 0
    val tl = text.length
    var cursor = 0
    while (cursor <= tl) {
      val nl = text.indexOf('\n', cursor)
      val end = if (nl < 0) tl else nl
      // Spark's trim(): strip ' ' (0x20) only, both ends
      var a = cursor; var b = end
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        lineH.add(polyHash(text, a, b))
        // CODE POINT count — Spark's length() and DuckDB's length()
        // both count code points, not UTF-16 units (astral chars!)
        lineL.add(text.codePointCount(a, b).toLong)
      }
      if (nl < 0) cursor = tl + 1 else cursor = nl + 1
    }
    ls = lineH.size()
    val lh = new Array[Long](ls); val ll = new Array[Long](ls)
    var li = 0
    while (li < ls) { lh(li) = lineH.get(li); ll(li) = lineL.get(li); li += 1 }
    val lineStats = statsOf(lh, ll, ls)

    // ---- tokens: lowercased \s+ split; per-token hash + length ----
    val tokH = new java.util.ArrayList[Long]()
    val tokL = new java.util.ArrayList[Long]()
    TextKernels.forEachToken(text) { tok =>
      tokH.add(polyHash(tok, 0, tok.length))
      tokL.add(tok.codePointCount(0, tok.length).toLong) // code points
    }
    val nTok = tokH.size()
    val th = new Array[Long](nTok); val tlen = new Array[Long](nTok)
    var ti = 0
    while (ti < nTok) { th(ti) = tokH.get(ti); tlen(ti) = tokL.get(ti); ti += 1 }

    // per-kind n-gram stats: combined hash fold + prefix-sum lengths
    val kindStats = Ns.map { n =>
      val m = math.max(nTok - n + 1, 0)
      val gh = new Array[Long](m); val gl = new Array[Long](m)
      var s = 0
      while (s < m) {
        var h = th(s)
        var len = tlen(s)
        var j = 1
        while (j < n) {
          h = (h * B + th(s + j)) % P
          len += tlen(s + j)
          j += 1
        }
        gh(s) = h
        gl(s) = len + (n - 1)
        s += 1
      }
      statsOf(gh, gl, m)
    }

    val Array(g2, g3, g4, g5, g10) = kindStats
    InternalRow(
      nTok.toLong,
      micro(lineStats.dupUnits, lineStats.units),
      micro(lineStats.dupChars, lineStats.chars),
      micro(g2.topChars, g2.chars),
      micro(g3.topChars, g3.chars),
      micro(g4.topChars, g4.chars),
      micro(g5.dupChars, g5.chars),
      micro(g10.dupChars, g10.chars))
  }

  /** One kernel call, boolean out — the gate predicate for [[RepetitionPass]].
    * Short documents (n_words < minWords) pass unconditionally: the
    * thresholds are degenerate there (see RepetitionRules.report).
    */
  def pass(text: String, minWords: Int): Boolean = {
    val row = compute(text)
    if (row.getLong(0) < minWords) true
    else {
      var i = 0
      while (i < ThresholdsMicro.length) {
        if (row.getLong(i + 1) > ThresholdsMicro(i)) return false
        i += 1
      }
      true
    }
  }

  def statsCol(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))

  def passCol(text: Column, minWords: Int): Column =
    ExpressionUtils.column(
      RepetitionPass(ExpressionUtils.expression(text), minWords))
}
