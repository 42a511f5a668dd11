package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the character-entropy gate. */
class CharEntropySpec extends SparkSpec {

  private def one(text: String): (Long, Boolean, Boolean) = {
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(
        TextAnalysis.charEntropySum(col("text")).as("s"),
        TextAnalysis.charEntropyGate(col("text"), 1000).as("g1"),
        TextAnalysis.charEntropyGate(col("text"), 2000).as("g2"))
      .head()
    (r.getLong(0), r.getBoolean(1), r.getBoolean(2))
  }

  test("uniform single char has zero entropy and fails every gate") {
    // "aaaa": one distinct char, cnt 4 → S = 4·floor(1e6·ln 4) = 5545176;
    // H = ln 4 − S/4e6 = 0
    val (s, g1, _) = one("aaaa")
    assert(s === 4L * math.floor(1e6 * math.log(4)).toLong)
    assert(!g1)
  }

  test("all-distinct chars carry maximal entropy ln L") {
    // "abcd": four singleton counts, iln(1) = 0 → S = 0; H = ln 4 ≈ 1.386
    val (s, g1, g2) = one("abcd")
    assert(s === 0L)
    assert(g1)      // 1.386 ≥ 1.0
    assert(!g2)     // 1.386 < 2.0
  }

  test("empty text is gated out, not crashed") {
    val (s, g1, _) = one("")
    assert(s === 0L && !g1)
  }

  test("mixed counts match the by-hand histogram sum") {
    // "aab c": counts a=2, b=1, ' '=1, c=1 → S = 2·iln(2) = 2·693147
    val (s, _, _) = one("aab c")
    assert(s === 2L * math.floor(1e6 * math.log(2)).toLong)
  }
}
