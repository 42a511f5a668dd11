package org.apache.spark.sql.graftvec

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization — the first fix-the-bytes pass of a
  * web-corpus curation pipeline (mojibake-adjacent combining sequences,
  * compatibility ligatures/width forms) that must run before any
  * hash-keyed dedup: two byte-distinct spellings of the same NFC string
  * otherwise land in different fingerprint groups and silently survive
  * exact dedup.
  *
  * Scale shape: a per-row scalar inside whole-stage codegen — zero
  * shuffle, cost = the scan. The `isNormalized` fast path returns the
  * input UTF8String untouched (no copy) for the overwhelmingly common
  * already-normalized case; only genuinely denormalized rows pay the
  * normalize + re-encode.
  *
  * NFC matches DuckDB's `nfc_normalize` (the oracle); NFKC/NFD/NFKD are
  * spec-covered (DuckDB ships no compatibility-form function).
  */
case class NormalizeString(child: Expression, formName: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(formName),
    s"unknown normalization form: $formName")

  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"normalize_$formName".toLowerCase

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $a.toString();
         |if (java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.$formName)) {
         |  ${ev.value} = $a;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s,
         |      java.text.Normalizer.Form.$formName));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpr {
  def normalize(text: Column, form: String): Column =
    ExpressionUtils.column(NormalizeString(ExpressionUtils.expression(text), form))

  /** Canonical composition — byte-stable keys for hash-keyed dedup. */
  def nfc(text: Column): Column = normalize(text, "NFC")

  /** Compatibility composition — folds ligatures/width/superscripts too. */
  def nfkc(text: Column): Column = normalize(text, "NFKC")
}
