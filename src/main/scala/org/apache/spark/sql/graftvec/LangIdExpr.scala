package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact, serializable language-ID model: per-language char-gram
  * profiles held as flat primitive arrays (one concatenated gram blob +
  * offset/weight/target arrays), NOT as per-gram expression literals.
  * Built once on the driver from `LangIdTrain` profiles and shipped to
  * executors as ONE codegen reference object — task-binary cost is the
  * raw model payload (#langs x topK grams, ~120 KB at fastText-class
  * 176 x 200), independent of plan/codegen size. The literal-chain
  * form it replaces inlined #langs x topK `replace()` scans into the
  * plan (1.45 MiB task binaries at a TOY 6 x 20 model — unusable at
  * real model dimension).
  *
  * Scoring semantics are pinned BIT-IDENTICAL to the literal chain
  * (LangIdKernelSpec, the BpeEquivalenceSpec discipline):
  *   occ(gram, text) = code-point shrinkage of lower(text) under
  *     non-overlapping left-to-right removal of gram, double-divided by
  *     gram's UTF-16 length and truncated to long (the literal form's
  *     `(length(lt) - length(replace(lt, gram, ''))) / len` arithmetic,
  *     including its astral-gram truncation corner);
  *   score(lang) = sum(occ * weight) with Java long wrap;
  *   predict = lexicographically FIRST language holding the max score;
  *   NULL text => NULL (null-intolerant), mirroring the fixed literal
  *     seed.
  *
  * One pass over the text per distinct gram LENGTH (one for real
  * models — training uses a single n): each window position probes a
  * hash map of grams, and per-gram cursors enforce the left-to-right
  * non-overlapping `replace()` contract. Work is O(text x #lengths +
  * matches), not O(text x #langs x topK).
  */
final class LangIdModel private (
    val langs: Array[String],       // ASC — prediction tie order
    gramBlob: String,               // all distinct grams concatenated
    gramOffsets: Array[Int],        // G+1 offsets into gramBlob (UTF-16)
    gramCps: Array[Int],            // code points per gram
    entryGram: Array[Int],          // per model entry: distinct-gram idx
    entryLang: Array[Int],          // per model entry: lang idx
    entryWeight: Array[Long])       // per model entry: trained weight
    extends Serializable {

  private def gramLen(g: Int): Int = gramOffsets(g + 1) - gramOffsets(g)
  private def gramStr(g: Int): String =
    gramBlob.substring(gramOffsets(g), gramOffsets(g + 1))

  /** distinct gram lengths (UTF-16), with a gram->idx map per length */
  @transient private lazy val buckets: Array[(Int, java.util.HashMap[String, Integer])] = {
    val byLen = new java.util.TreeMap[Int, java.util.HashMap[String, Integer]]()
    var g = 0
    while (g < gramOffsets.length - 1) {
      val m = byLen.computeIfAbsent(gramLen(g),
        _ => new java.util.HashMap[String, Integer]())
      m.put(gramStr(g), Integer.valueOf(g))
      g += 1
    }
    import scala.jdk.CollectionConverters._
    byLen.entrySet().asScala.map(e => (e.getKey.intValue, e.getValue)).toArray
  }

  /** per-row scratch (counts + non-overlap cursors), reused across rows
    * on the same executor thread; only touched slots are reset
    */
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Int], Array[Int], Array[Int])] {
      override def initialValue(): (Array[Int], Array[Int], Array[Int]) = {
        val g = gramOffsets.length - 1
        (new Array[Int](g), new Array[Int](g), new Array[Int](g))
      }
    }

  /** scores per language (index-aligned with [[langs]]) over the
    * ALREADY-LOWERED text
    */
  def scores(lower: String): Array[Long] = {
    val (counts, next, touched) = scratch.get()
    var nTouched = 0
    var b = 0
    while (b < buckets.length) {
      val len = buckets(b)._1
      val map = buckets(b)._2
      val end = lower.length - len
      var i = 0
      while (i <= end) {
        val hit = map.get(lower.substring(i, i + len))
        if (hit != null) {
          val g = hit.intValue
          if (counts(g) == 0) { touched(nTouched) = g; nTouched += 1 }
          // replace() contract: matches consume left-to-right, a match
          // cannot start inside a previous match of the SAME gram
          if (i >= next(g)) { counts(g) += 1; next(g) = i + len }
        }
        i += 1
      }
      b += 1
    }
    val sc = new Array[Long](langs.length)
    var e = 0
    while (e < entryGram.length) {
      val g = entryGram(e)
      if (counts(g) > 0) {
        // literal-form arithmetic: code-point shrinkage / UTF-16 gram
        // length as a DOUBLE division truncated to long (exact division
        // for BMP grams; truncation preserved for the astral corner)
        val occ = ((counts(g).toLong * gramCps(g)).toDouble / gramLen(g)).toLong
        sc(entryLang(e)) += occ * entryWeight(e)
      }
      e += 1
    }
    // reset only the touched slots — scratch stays zeroed between rows
    var t = 0
    while (t < nTouched) { counts(touched(t)) = 0; next(touched(t)) = 0; t += 1 }
    sc
  }

  /** lexicographically first language holding the max score (langs are
    * ASC and only a STRICTLY greater score advances the argmax)
    */
  def predict(lower: String): String = {
    val sc = scores(lower)
    var best = 0
    var i = 1
    while (i < sc.length) { if (sc(i) > sc(best)) best = i; i += 1 }
    langs(best)
  }
}

object LangIdModel {

  /** Build from (lang, grams=(gram, weight)*) profiles — the
    * `LangIdTrain.Profile` shape, languages deduplicated by last-wins
    * like a Map would, order normalized to ASC.
    */
  def apply(profiles: Seq[(String, Seq[(String, Long)])]): LangIdModel = {
    require(profiles.nonEmpty, "empty language-ID model")
    val byLang = profiles.toMap.toSeq.sortBy(_._1)
    val langs = byLang.map(_._1).toArray
    val distinct = scala.collection.mutable.LinkedHashMap[String, Int]()
    val eg = Array.newBuilder[Int]
    val el = Array.newBuilder[Int]
    val ew = Array.newBuilder[Long]
    byLang.zipWithIndex.foreach { case ((_, grams), li) =>
      grams.foreach { case (g, w) =>
        val gi = distinct.getOrElseUpdate(g, distinct.size)
        eg += gi; el += li; ew += w
      }
    }
    val gramStrs = distinct.keys.toArray
    val offsets = new Array[Int](gramStrs.length + 1)
    var i = 0
    while (i < gramStrs.length) {
      offsets(i + 1) = offsets(i) + gramStrs(i).length
      i += 1
    }
    new LangIdModel(langs, gramStrs.mkString, offsets,
      gramStrs.map(s => s.codePointCount(0, s.length)),
      eg.result(), el.result(), ew.result())
  }
}

/** Codegen'd argmax language prediction over a [[LangIdModel]]. */
case class LangIdPredict(child: Expression, model: LangIdModel)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id_predict"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      model.predict(input.asInstanceOf[UTF8String].toLowerCase.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdModel", model,
      classOf[LangIdModel].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = UTF8String.fromString($ref.predict($a.toLowerCase().toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {
  def predictCol(text: Column, model: LangIdModel): Column =
    ExpressionUtils.column(
      LangIdPredict(ExpressionUtils.expression(text), model))

  // test-visible plan introspection (ExpressionUtils is private[sql])
  def nodeCount(c: Column): Int =
    ExpressionUtils.expression(c).collect { case e => e }.size
  def modelOf(c: Column): Option[LangIdModel] =
    ExpressionUtils.expression(c) match {
      case LangIdPredict(_, m) => Some(m)
      case _ => None
    }
}
