package graft.functions

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.NormalizeExpr

import graft.SparkSpec

/** The codegen'd Unicode normalizer: NFC composes combining sequences,
  * NFKC additionally folds compatibility forms, both are idempotent,
  * already-normalized text passes through unchanged, and nulls stay
  * null. All non-ASCII is spelled in \u escapes — a decomposed literal
  * in source would silently compose under editor/VCS normalization and
  * void the test. Checked over a DataFrame (codegen path); the
  * interpreted eval shares the same Normalizer call.
  */
class NormalizeExprSpec extends SparkSpec {

  private val Decomposed = "cafe\u0301"   // e + COMBINING ACUTE ACCENT
  private val Composed = "caf\u00e9"      // precomposed e-acute
  private val Ligature = "\ufb01le"        // fi-ligature + "le"
  private val Fullwidth = "\uff21"        // FULLWIDTH LATIN A

  private def one(s: String, f: Column => Column): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(f(col("t")).as("n")).collect().head.getString(0)
  }

  test("NFC composes combining sequences; leaves compatibility forms alone") {
    assert(one(Decomposed, NormalizeExpr.nfc) === Composed)
    assert(one(s"$Ligature $Fullwidth", NormalizeExpr.nfc) ===
      s"$Ligature $Fullwidth")
  }

  test("NFKC folds ligatures and width forms too") {
    assert(one(s"$Ligature $Fullwidth $Decomposed", NormalizeExpr.nfkc) ===
      s"file A $Composed")
  }

  test("idempotent; identity on normalized ASCII") {
    val ascii = "plain ascii text."
    assert(one(ascii, NormalizeExpr.nfc) === ascii)
    assert(one(Decomposed, c => NormalizeExpr.nfc(NormalizeExpr.nfc(c))) ===
      Composed)
  }

  test("null stays null; length drops by exactly the composed pairs") {
    import spark.implicits._
    val out = Seq((1, Decomposed + Decomposed), (2, null))
      .toDF("id", "t")
      .select(col("id"), NormalizeExpr.nfc(col("t")).as("n"),
        length(NormalizeExpr.nfc(col("t"))).as("len"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getString(1) === Composed + Composed)
    assert(out(1).getInt(2) === (Composed + Composed).length)
    assert(out(2).isNullAt(1))
  }

  test("fixText composes NFC + control strip + space collapse") {
    assert(one(s"ab\u0007cd\t\t  x $Decomposed", TextAnalysis.fixText) ===
      s"abcd x $Composed")
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      NormalizeExpr.normalize(lit("x"), "NFX")
    }
  }
}
