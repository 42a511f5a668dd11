package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd unigram-LM (SentencePiece-class, Kudo 2018) Viterbi
  * segmenter: lowercase, whitespace-split, then per word the
  * highest-probability segmentation under the piece table — probability
  * of a segmentation is the PRODUCT of piece probabilities
  * `cnt(piece) / total`, maximized by textbook O(L · maxPieceLen)
  * dynamic programming over code-point positions.
  *
  * Determinism contract (the DuckDB oracle replays this exactly):
  * scores are IEEE doubles built from the same integers with the same
  * operations in the same order on both engines — `cnt/total` is one
  * division, each DP candidate is one multiplication, comparisons are
  * exact — and ties break to the SMALLEST split point (the longest
  * final piece). Code-point indexing throughout (`substr` in DuckDB
  * counts code points, so must we).
  *
  * The piece table rides as ONE reference object (the
  * [[BpeEncode]] pattern): plan size is independent of the vocabulary,
  * the segmenter drops into any scan/stream/filter with zero joins and
  * zero shuffles — at 100 TB encoding is a free scan expression, and
  * the EM learner's E-step runs this same kernel over the compact
  * word-frequency table.
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"

  @transient private lazy val model: UnigramExpr.Model =
    UnigramExpr.buildModel(pieces)

  override protected def nullSafeEval(input: Any): Any =
    UnigramExpr.segment(input.asInstanceOf[UTF8String].toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      "org.apache.spark.sql.graftvec.UnigramExpr.Model")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.UnigramExpr.segment($a.toString(), $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramExpr {

  /** Piece table + derived constants, shared across rows. */
  final class Model(val counts: java.util.HashMap[String, java.lang.Long],
      val total: Long, val maxLen: Int) extends Serializable

  def buildModel(pieces: Seq[(String, Long)]): Model = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    var total = 0L
    var maxLen = 1
    pieces.foreach { case (p, c) =>
      m.put(p, c)
      total += c
      val l = p.codePointCount(0, p.length)
      if (l > maxLen) maxLen = l
    }
    new Model(m, total, maxLen)
  }

  /** Viterbi-segment one word (already a single token). Returns the
    * piece strings in order. Unknown single characters (impossible when
    * the vocabulary was learned from this corpus — every char is
    * seeded) fall back to a count-1 piece so encode never throws on
    * novel text.
    */
  private def segmentWord(word: String, m: Model,
      out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point index -> UTF-16 offset (L+1 entries)
    val offs = new java.util.ArrayList[Integer](word.length + 1)
    var o = 0
    offs.add(0)
    while (o < word.length) {
      o += Character.charCount(word.codePointAt(o))
      offs.add(o)
    }
    val L = offs.size() - 1
    if (L == 0) return
    val best = new Array[Double](L + 1)
    val back = new Array[Int](L + 1)
    best(0) = 1.0
    var j = 1
    while (j <= L) {
      var bs = -1.0
      var bi = -1
      var i = math.max(0, j - m.maxLen)
      while (i < j) {
        val piece = word.substring(offs.get(i), offs.get(j))
        val cnt = m.counts.get(piece)
        if (cnt != null) {
          // one division + one multiplication, the oracle's exact ops
          val s = best(i) * (cnt.longValue().toDouble / m.total.toDouble)
          if (s > bs) { bs = s; bi = i } // strict: ties keep smallest i
        }
        i += 1
      }
      if (bi < 0) { // unknown char fallback (never hit on the training corpus)
        bi = j - 1
        bs = best(j - 1) * (1.0 / m.total.toDouble)
      }
      best(j) = bs
      back(j) = bi
      j += 1
    }
    // backtrack; pieces come out reversed, emit via an index stack
    val cuts = new java.util.ArrayList[Integer]()
    var p = L
    while (p > 0) { cuts.add(p); p = back(p) }
    var c = cuts.size() - 1
    var start = 0
    while (c >= 0) {
      val end = cuts.get(c)
      out.add(UTF8String.fromString(
        word.substring(offs.get(start), offs.get(end))))
      start = end
      c -= 1
    }
  }

  def segment(text: String, m: Model): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    TextKernels.forEachToken(text) { word => segmentWord(word, m, out) }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
  }

  def segmentCol(text: Column, pieces: Seq[(String, Long)]): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(text), pieces))
}
