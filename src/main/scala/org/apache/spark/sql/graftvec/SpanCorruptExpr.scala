package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** T5-style span corruption (Raffel et al. 2020) for denoising-
  * objective dataset prep: deterministically selected token spans are
  * replaced by `<extra_id_k>` sentinels in the INPUT, and emitted after
  * their sentinel in the TARGET. Span starts and lengths come from an
  * integer hash of (doc_id, token index) — no RNG, so the corruption
  * is identical on every engine, partitioning, and retry, and a DuckDB
  * oracle replays it exactly (the per-token skip-counter fold).
  *
  * Per-element rule, identical in eval and in the oracle's
  * list_reduce: with m = ((doc_id·131 + i)·2654435761) mod (1e9+7)
  * and draw(i) = ((m xor (m >> 15))·2654435761) mod (1e9+7) — the
  * xor-shift round matters: a single multiplicative hash is locally an
  * arithmetic progression mod `startEvery`, which left whole documents
  * with zero spans and gave others a span every third token — a token
  * at index i (0-based, over lowercased \s+ tokens) starts a span iff
  * `draw % startEvery == 0` and fewer than `maxExtra` sentinels were
  * used; the span covers `1 + (draw / startEvery) % maxSpan` tokens
  * (bounded by the doc).
  */
case class SpanCorrupt(left: Expression, right: Expression,
    startEvery: Int, maxSpan: Int, maxExtra: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(startEvery > 0 && maxSpan > 0 && maxExtra >= 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("input", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("target", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_corrupt"

  override protected def nullSafeEval(text: Any, docId: Any): Any =
    SpanCorruptExpr.corrupt(text.asInstanceOf[UTF8String].toString,
      docId.asInstanceOf[Long], startEvery, maxSpan, maxExtra)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"""${ev.value} = org.apache.spark.sql.graftvec.SpanCorruptExpr.corrupt(
         |  $t.toString(), $d, $startEvery, $maxSpan, $maxExtra);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptExpr {

  val P = 1000000007L

  def corrupt(text: String, docId: Long, startEvery: Int, maxSpan: Int,
      maxExtra: Int): InternalRow = {
    val inp = new java.util.ArrayList[UTF8String]()
    val tgt = new java.util.ArrayList[UTF8String]()
    var idx = 0L
    var skip = 0
    var k = 0
    // tokenization + locale contract: see TextKernels
    TextKernels.forEachToken(text) { word =>
      val tok = UTF8String.fromString(word)
      if (skip > 0) { tgt.add(tok); skip -= 1 }
      else {
        // docId reduced mod P BEFORE the multiply: a raw docId*131
        // wraps silently on the JVM but raises an overflow error in
        // DuckDB for |doc_id| > ~7e16, so the kernel and oracle would
        // diverge (wrong vs error). (docId%P)*131 + idx stays < 2^37.
        val m = ((docId % P) * 131 + idx) % P * 2654435761L % P
        val draw = (m ^ (m >> 15)) * 2654435761L % P
        if (k < maxExtra && draw % startEvery == 0) {
          val spanLen = 1 + ((draw / startEvery) % maxSpan).toInt
          val sentinel = UTF8String.fromString(s"<extra_id_$k>")
          inp.add(sentinel); tgt.add(sentinel); tgt.add(tok)
          skip = spanLen - 1
          k += 1
        } else inp.add(tok)
      }
      idx += 1
    }
    InternalRow(
      new GenericArrayData(inp.toArray[AnyRef](new Array[AnyRef](inp.size()))),
      new GenericArrayData(tgt.toArray[AnyRef](new Array[AnyRef](tgt.size()))))
  }

  def corruptCol(text: Column, docId: Column, startEvery: Int = 13,
      maxSpan: Int = 3, maxExtra: Int = 100): Column =
    ExpressionUtils.column(SpanCorrupt(
      ExpressionUtils.expression(text), ExpressionUtils.expression(docId),
      startEvery, maxSpan, maxExtra))
}
