package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.operators.BpeLearn

/** The codegen'd BPE encoder must be VALUE-IDENTICAL to the wrapped-
  * token replace-chain definition (which the DuckDB oracles mirror) —
  * same merge order, same greedy leftmost non-overlapping pass, same
  * lowercase + \s+ split.
  */
class BpeEquivalenceSpec extends SparkSpec {

  test("BpeEncode == the replace-chain encodeExpr on the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = BpeLearn.learn(docs, "text", 8).merges
    val chain = docs.select(col("doc_id"),
      BpeLearn.encodeExpr(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = docs.select(col("doc_id"),
      BpeLearn.encodeExprFast(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === chain)
  }

  test("BpeEncode handles whitespace runs, tabs, empty text, cascades") {
    import spark.implicits._
    val merges = Seq(BpeLearn.Merge(0, "a", "a", 1L), BpeLearn.Merge(1, "aa", "b", 1L))
    val df = Seq("", "   ", "aaa\taab", "AAB aaaa", "x\n\ny").toDF("text")
    val chain = df.select(BpeLearn.encodeExpr(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0))
    val fast = df.select(BpeLearn.encodeExprFast(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(fast.toSeq === chain.toSeq)
    // sanity of the semantics themselves: aaaa → [aa, aa]; aab → [aab]
    assert(fast(3) === Seq("aab", "aa", "aa"))
  }

  test("char-mode kernel treats astral chars as one unit, like the chain") {
    import spark.implicits._
    // regexp_replace(word, "(.)", …) matches a CODE POINT per unit, so
    // the kernel must not shatter surrogate pairs into lone halves
    val df = Seq("𝕏y 𝕏y xx", "😀a 😀a").toDF("text")
    val merges = BpeLearn.learn(df, "text", 4).merges
    val chain = df.select(BpeLearn.encodeExpr(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    val fast = df.select(BpeLearn.encodeExprFast(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(fast === chain)
    assert(chain.head.contains("𝕏y"), "astral-led merge must survive intact")
  }

  test("byte-level BpeEncode == the byte-mode replace chain on the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = BpeLearn.learn(docs, "text", 8, byteLevel = true).merges
    val chain = docs.select(col("doc_id"),
      BpeLearn.encodeExpr(col("text"), merges, byteLevel = true).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = docs.select(col("doc_id"),
      BpeLearn.encodeExprFast(col("text"), merges, byteLevel = true).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === chain)
    // marker present: every word contributes exactly one "_"-suffixed unit
    assert(chain.values.exists(_.nonEmpty))
  }

  test("byte-level kernel hex-encodes multi-byte characters like the chain") {
    import spark.implicits._
    // incl. astral code points (4-byte UTF-8, surrogate pairs in the JVM)
    val df = Seq("héllo wörld", "né né né", "math 𝕏 emoji 😀 𝕏 again").toDF("text")
    val merges = BpeLearn.learn(df, "text", 4, byteLevel = true).merges
    val chain = df.select(BpeLearn.encodeExpr(col("text"), merges,
      byteLevel = true).as("t")).collect().map(_.getSeq[String](0))
    val fast = df.select(BpeLearn.encodeExprFast(col("text"), merges,
      byteLevel = true).as("t")).collect().map(_.getSeq[String](0))
    assert(fast.toSeq === chain.toSeq)
  }

  test("plan stays constant-size at a merge count the chain cannot carry") {
    import spark.implicits._
    // 500 synthetic merges: the replace chain would nest 500 deep; the
    // kernel carries them as one reference object
    val merges = (0 until 500).map(i => BpeLearn.Merge(i, s"x$i", s"y$i", 1L))
    val df = Seq("plain text stays intact").toDF("text")
    val got = df.select(BpeLearn.encodeExprFast(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    assert(got === "plain text stays intact".replace(" ", "").map(_.toString))
  }
}
