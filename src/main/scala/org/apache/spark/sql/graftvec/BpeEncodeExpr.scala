package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE encoder: lowercase, whitespace-split, then per word
  * apply the merge table IN RANK ORDER with greedy leftmost
  * non-overlapping passes — exactly the wrapped-token `replace()`
  * chain semantics of `BpeLearn.encodeExpr` (pinned by
  * BpeEquivalenceSpec), with the merge table as ONE reference object
  * instead of m nested replace expressions. That makes plan size (and
  * codegen cost) independent of the merge count — the production path
  * for real vocabularies, where m is in the tens of thousands.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: Array[Array[String]] =
    merges.map(p => Array(p._1, p._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encode(input.asInstanceOf[UTF8String].toString, table, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.BpeEncodeExpr.encode($a.toString(), $ref, $byteLevel);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeExpr {

  /** One greedy leftmost non-overlapping merge pass (the `replace()`
    * semantics: a merged pair's right element cannot start another
    * merge in the same pass).
    */
  private def applyMerge(toks: java.util.ArrayList[String],
      l: String, r: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](toks.size())
    var i = 0
    val n = toks.size()
    while (i < n) {
      if (i + 1 < n && toks.get(i) == l && toks.get(i + 1) == r) {
        out.add(l + r); i += 2
      } else { out.add(toks.get(i)); i += 1 }
    }
    out
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  def encode(text: String, merges: Array[Array[String]],
      byteLevel: Boolean): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    // tokenization + locale contract: see TextKernels
    TextKernels.forEachToken(text) { word =>
      var toks = new java.util.ArrayList[String](word.length + 1)
      if (byteLevel) {
        // byte alphabet: 2-hex-digit uppercase byte tokens + the "_"
        // end-of-word marker — mirrors BpeLearn.wrapBytes
        val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var k = 0
        while (k < bytes.length) {
          val b = bytes(k) & 0xff
          toks.add(new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf))))
          k += 1
        }
        toks.add("_")
      } else {
        // CODE POINTS, not UTF-16 units: the replace-chain definition
        // wraps with regexp_replace(word, "(.)", …) and Java-regex "."
        // matches a code point, so a charAt walk would shatter astral
        // chars into lone surrogates and diverge from chain + oracle
        var k = 0
        while (k < word.length) {
          val cp = word.codePointAt(k)
          toks.add(new String(Character.toChars(cp)))
          k += Character.charCount(cp)
        }
      }
      var mi = 0
      while (mi < merges.length) {
        toks = applyMerge(toks, merges(mi)(0), merges(mi)(1))
        mi += 1
      }
      var j = 0
      while (j < toks.size()) {
        out.add(UTF8String.fromString(toks.get(j))); j += 1
      }
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
  }

  def encodeCol(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    ExpressionUtils.column(
      BpeEncode(ExpressionUtils.expression(text), merges, byteLevel))
}
