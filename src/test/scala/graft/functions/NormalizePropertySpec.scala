package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.{NormalizeExpr, TextHashExpr}

import graft.SparkSpec

/** Seeded-random property tests for the byte-repair and string-hash
  * kernels over a hostile alphabet (combining marks, precomposed
  * accents, ligatures, fullwidth forms, CJK, astral plane, control
  * chars, whitespace runs): the codegen'd expressions must agree with
  * direct driver-side references on arbitrary inputs, not just the
  * hand-picked spec fixtures. 200 random strings per property,
  * deterministic seed.
  */
class NormalizePropertySpec extends SparkSpec {

  // combining acute/diaeresis, precomposed accents, ligature, fullwidth,
  // CJK, astral, control, tab/space — the shapes that break naive
  // char-at-a-time code
  private val Pool: Array[String] =
    Array("a", "e", "\u0301", "\u0308", "\u00e9", "\u00fc", "\ufb01",
      "\uff21", "中", "𝕏", "😀", "\u0007", "\t", " ", "7", ".")

  private def randomTexts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(24)
      (0 until len).map(_ => Pool(rnd.nextInt(Pool.length))).mkString
    }.distinct
  }

  private def viaSpark(texts: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Map[Long, String] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), f(col("t")).as("o"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("NFC/NFKC kernels == java.text.Normalizer on random hostile strings") {
    val texts = randomTexts(seed = 11L, n = 200)
    val nfc = viaSpark(texts, NormalizeExpr.nfc)
    val nfkc = viaSpark(texts, NormalizeExpr.nfkc)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(nfc(i.toLong) === Normalizer.normalize(t, Normalizer.Form.NFC),
        s"NFC drift on ${t.map(_.toInt.toHexString).mkString(",")}")
      assert(nfkc(i.toLong) === Normalizer.normalize(t, Normalizer.Form.NFKC),
        s"NFKC drift on ${t.map(_.toInt.toHexString).mkString(",")}")
    }
  }

  test("NFC is idempotent in-plan on random hostile strings") {
    val texts = randomTexts(seed = 23L, n = 200)
    val once = viaSpark(texts, NormalizeExpr.nfc)
    val twice = viaSpark(texts, c => NormalizeExpr.nfc(NormalizeExpr.nfc(c)))
    assert(once === twice)
  }

  test("fixText == driver-side reference on random hostile strings") {
    val texts = randomTexts(seed = 37L, n = 200)
    def ref(t: String): String =
      Normalizer.normalize(t, Normalizer.Form.NFC)
        .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
        .replaceAll("[ \\t]+", " ")
    val got = viaSpark(texts, TextAnalysis.fixText)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t),
        s"fixText drift on ${t.map(_.toInt.toHexString).mkString(",")}")
    }
  }

  test("StringPolyHash kernel == code-point reference on random hostile strings") {
    import spark.implicits._
    val texts = randomTexts(seed = 41L, n = 200)
    def ref(s: String): Long = {
      var acc = 0L
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        acc = (acc * 31 + cp) % 1000000007L
        k += Character.charCount(cp)
      }
      acc
    }
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), TextHashExpr.stringPolyHash(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t))
    }
  }
}
