package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd WordPiece greedy MaxMatch encoder — BERT's INFERENCE
  * tokenization (distinct from training-state merge replay): per word,
  * repeatedly take the LONGEST vocabulary piece at the cursor
  * (word-initial form first, `##`-continuation form after), and map
  * the whole word to the UNK token when no piece matches at some
  * cursor (the BERT convention — no partial emission). Vocabulary
  * rides as one reference object; code-point indexing throughout (the
  * DuckDB oracle's `substr` counts code points).
  */
case class WordPieceMaxMatch(child: Expression, vocab: Seq[String],
    unk: String) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_maxmatch"

  @transient private lazy val model: WordPieceExpr.Model =
    WordPieceExpr.buildModel(vocab, unk)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceExpr.encode(input.asInstanceOf[UTF8String].toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model,
      "org.apache.spark.sql.graftvec.WordPieceExpr.Model")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.WordPieceExpr.encode($a.toString(), $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceExpr {

  final class Model(val vocab: java.util.HashSet[String], val unk: String,
      val maxLen: Int) extends Serializable

  def buildModel(vocab: Seq[String], unk: String): Model = {
    val set = new java.util.HashSet[String](vocab.size * 2)
    var maxLen = 1
    vocab.foreach { t =>
      set.add(t)
      val content = if (t.startsWith("##")) t.substring(2) else t
      val l = content.codePointCount(0, content.length)
      if (l > maxLen) maxLen = l
    }
    new Model(set, unk, maxLen)
  }

  private def encodeWord(word: String, m: Model,
      out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point index -> UTF-16 offset
    val offs = new java.util.ArrayList[Integer](word.length + 1)
    var o = 0
    offs.add(0)
    while (o < word.length) {
      o += Character.charCount(word.codePointAt(o))
      offs.add(o)
    }
    val L = offs.size() - 1
    if (L == 0) return
    val pieces = new java.util.ArrayList[UTF8String]()
    var pos = 0
    var failed = false
    while (pos < L && !failed) {
      var k = math.min(m.maxLen, L - pos)
      var matched: String = null
      while (k >= 1 && matched == null) {
        val sub = word.substring(offs.get(pos), offs.get(pos + k))
        val cand = if (pos == 0) sub else "##" + sub
        if (m.vocab.contains(cand)) matched = cand
        k -= 1
      }
      if (matched == null) failed = true
      else {
        pieces.add(UTF8String.fromString(matched))
        pos += (if (matched.startsWith("##"))
          matched.codePointCount(2, matched.length)
        else matched.codePointCount(0, matched.length))
      }
    }
    if (failed) out.add(UTF8String.fromString(m.unk))
    else {
      var i = 0
      while (i < pieces.size()) { out.add(pieces.get(i)); i += 1 }
    }
  }

  def encode(text: String, m: Model): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    TextKernels.forEachToken(text) { word => encodeWord(word, m, out) }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
  }

  def maxMatchCol(text: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    ExpressionUtils.column(
      WordPieceMaxMatch(ExpressionUtils.expression(text), vocab, unk))
}
