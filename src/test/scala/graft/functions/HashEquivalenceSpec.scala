package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextHashExpr

import graft.SparkSpec

/** The codegen'd hash expressions must be VALUE-IDENTICAL to their
  * composable HOF definitions — the HOF forms define the semantics (and
  * the DuckDB oracles), the codegen forms run the hot paths; this spec
  * pins them together.
  */
class HashEquivalenceSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"),
      (3L, ""),
      (4L, "punctuation, too! and 123 numbers"),
      (5L, "a b c d e f g h i j k l m n o p"),
      // astral code points: polyHash iterates split("")/ascii = code
      // points, so the kernel must not hash surrogate halves
      (6L, "math 𝕏 symbols 𝕏 emoji 😀 words here"))
      .toDF("id", "text")
  }

  test("StringPolyHash == the split-per-char aggregate HOF definition") {
    import spark.implicits._
    // the shared docs plus the degenerate cases the kernel must match
    val edge = Seq((7L, ""), (8L, "x"), (9L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val both = docs.unionByName(edge).select(col("id"),
      TextAnalysis.polyHash(col("text")).as("fast"),
      TextAnalysis.polyHashHof(col("text")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null drift at id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2), s"hash drift at id ${r.getLong(0)}")
    }
  }

  test("ShingleHashes == polyHash over concat_ws-joined shingles") {
    val hof = docs.select(col("id"),
      transform(TextAnalysis.shingles(col("text"), 3),
        s => TextAnalysis.polyHashHof(s)).as("h"))
    val fast = docs.select(col("id"),
      TextHashExpr.shingleHashes(TextAnalysis.tokens(col("text")), 3).as("h"))
    val a = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("CharEntropySum == the aggregate struct-fold HOF definition") {
    import spark.implicits._
    // incl. supplementary-plane text: the kernel must count CODE POINTS
    // (split("")/length() semantics), not UTF-16 units — two identical
    // astral emoji are one run of 2, not two runs of surrogate halves
    val withAstral = docs.unionByName(
      Seq((6L, "😀😀 mixed 😀 text"))
        .toDF("id", "text"))
    val a = withAstral.select(col("id"),
      TextAnalysis.charEntropySum(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = withAstral.select(col("id"),
      TextAnalysis.charEntropySumHof(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("MinHashSignature == array_min over affine transforms") {
    val coeffs = graft.operators.TextDedup.minhashCoeffs(8)
    val hashes = docs.select(col("id"),
      TextHashExpr.shingleHashes(TextAnalysis.tokens(col("text")), 2).as("hs"))
      .filter(size(col("hs")) > 0)
    val hof = hashes.select(col("id"),
      array(coeffs.map { case (aa, bb) =>
        array_min(transform(col("hs"), x => (lit(aa) * x + lit(bb)) % lit(TextAnalysis.FingerprintMod)))
      }: _*).as("sig"))
    val fast = hashes.select(col("id"),
      TextHashExpr.minhashSignature(col("hs"), coeffs).as("sig"))
    val a = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("FloatDotProduct == zip_with/aggregate fold") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.5f, -1.25f, 3.5f), Seq(2.0f, 0.25f, -0.125f)),
      (2L, Seq(1e-8f, 1e8f, -1e-8f), Seq(1e8f, 1e-8f, 1e8f)))
      .toDF("id", "a", "b")
    val hof = vecs.select(col("id"), VectorOps.dot(col("a"), col("b")).as("d")).collect()
    val fast = vecs.select(col("id"), FloatVec.dotF(col("a"), col("b")).as("d")).collect()
    hof.zip(fast).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(y.getDouble(1)), "bit-level mismatch")
    }
  }
}
