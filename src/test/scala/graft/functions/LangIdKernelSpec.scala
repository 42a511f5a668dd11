package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.operators.LangIdTrain
import org.apache.spark.sql.graftvec.{LangIdExpr, LangIdModel, LangIdPredict}

/** The broadcast-model language-ID kernel must be VALUE-IDENTICAL to
  * the literal replace-chain definition (which the DuckDB oracle
  * mirrors), and its plan/task-binary footprint must stay flat in
  * model dimension — the whole point of replacing the literal chain,
  * whose 1.45 MiB task binaries at a toy model made fastText-class
  * (~176 langs x 200 grams) models unusable.
  */
class LangIdKernelSpec extends SparkSpec {

  test("kernel == literal chain on the trained corpus model") {
    val docs = Tables.load(spark, sfDir, "documents")
    val profiles = LangIdTrain.profilesOf(
      LangIdTrain.train(docs, "text", "lang", n = 3, topK = 20))
    val lit = docs.select(col("doc_id"),
      LangIdTrain.predictExprLiteral(col("text"), profiles).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fast = docs.select(col("doc_id"),
      LangIdTrain.predictExpr(col("text"), profiles).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast === lit)
  }

  test("NULL text predicts NULL in BOTH forms; ties go to the first language") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "zz"), (4L, "abcabc xq"),
      (5L, "ABCABC"), (6L, "𝕏yz𝕏yz astral")).toDF("id", "text")
    // hand-built model with a deliberate tie: 'zz' matches NO profile
    // gram, so every language scores 0 and the lexicographically FIRST
    // language must win (the r15 advice fix: the old seed picked LAST)
    val profiles = Seq(
      LangIdTrain.Profile("de", Seq(("xq", 5L))),
      LangIdTrain.Profile("en", Seq(("abc", 3L), ("the", 7L))),
      LangIdTrain.Profile("fr", Seq(("bca", 3L))))
    for (form <- Seq(
        LangIdTrain.predictExpr(col("text"), profiles),
        LangIdTrain.predictExprLiteral(col("text"), profiles))) {
      val got = df.select(col("id"), form.as("p"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got(1L) === None, "NULL text must predict NULL")
      assert(got(2L) === Some("de"), "all-zero scores -> first language")
      assert(got(3L) === Some("de"))
      // abcabc: en scores occ(abc)=2*3=6... weight math: en=2*3=6,
      // fr=occ(bca)=1*3=3, de=occ(xq)=1*5=5 -> en
      assert(got(4L) === Some("en"))
      assert(got(5L) === Some("en"), "scoring is over lower(text)")
    }
    // both forms agree on every row, astral text included
    val a = df.select(LangIdTrain.predictExpr(col("text"), profiles)).collect()
    val b = df.select(LangIdTrain.predictExprLiteral(col("text"), profiles)).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("non-overlapping occurrence counting matches replace() shrinkage") {
    import spark.implicits._
    // 'aaaa' with gram 'aa': replace-shrinkage counts 2, a naive
    // sliding count would say 3 — the cursor logic must match replace
    val df = Seq("aaaa", "aaa", "abababa").toDF("text")
    val profiles = Seq(
      LangIdTrain.Profile("x", Seq(("aa", 1L))),
      LangIdTrain.Profile("y", Seq(("aba", 1L))))
    val a = df.select(LangIdTrain.predictExpr(col("text"), profiles)).collect()
    val b = df.select(LangIdTrain.predictExprLiteral(col("text"), profiles)).collect()
    assert(a.toSeq === b.toSeq)
    // direct kernel check of the counts themselves
    val m = LangIdModel(profiles.map(p => (p.lang, p.grams)))
    assert(m.scores("aaaa").toSeq === Seq(2L, 0L))   // x=2 non-overlapping
    assert(m.scores("abababa").toSeq === Seq(0L, 2L)) // aba at 0 and 4, not 2
  }

  test("plan and serialized-expression size stay flat at a 100x200 model") {
    import spark.implicits._
    // synthetic fastText-class model: 100 languages x 200 trigrams
    val profiles = (0 until 100).map { l =>
      LangIdTrain.Profile(f"lang$l%03d",
        (0 until 200).map(g => (f"$l%02d$g%03d".take(3) + f"$g%03d".takeRight(2),
          (200 - g).toLong)))
    }
    val expr = LangIdTrain.predictExpr(col("text"), profiles)
    // expression-tree size: a handful of nodes, not #langs x topK
    val nodes = LangIdExpr.nodeCount(expr)
    assert(nodes <= 5, s"kernel plan must stay tiny, got $nodes nodes")
    // serialized footprint (what rides in the task binary): the model
    // payload only — pinned well under the literal chain's 1.45 MiB at
    // a model 160x SMALLER than this one
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(LangIdExpr.modelOf(expr).get)
    oos.close()
    assert(bos.size() < 600 * 1024,
      s"100x200 model must serialize compactly, got ${bos.size()} bytes")
    // and it executes: 20k grams, whole-stage codegen, one pass
    val df = Seq("000000100001", "9919999199", "no match at all").toDF("text")
    val got = df.select(expr.as("p")).collect().map(_.getString(0))
    assert(got.length === 3 && got.forall(_.startsWith("lang")))
  }

  test("kernel streams (stateless scan gate, no aggregation state)") {
    import spark.implicits._
    val profiles = Seq(
      LangIdTrain.Profile("en", Seq(("the", 3L))),
      LangIdTrain.Profile("fr", Seq(("les", 3L))))
    implicit val sq = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    input.addData("the quick the", "les choses les")
    val q = input.toDF().select(col("value").as("text"))
      .withColumn("lang", LangIdTrain.predictExpr(col("text"), profiles))
      .writeStream.format("memory").queryName("langid_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT lang FROM langid_stream ORDER BY lang")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("en", "fr"))
  }
}
