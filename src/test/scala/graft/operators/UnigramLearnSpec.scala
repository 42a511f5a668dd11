package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM learner/segmenter invariants: coverage (pieces
  * reassemble each word exactly), the tie-break contract, M-step
  * drop/smoothing rules, prune bounds, and determinism — plus a
  * driver-side reference Viterbi the kernel must match on every
  * corpus word.
  */
class UnigramLearnSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("pieces reassemble every word exactly (coverage invariant)") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = UnigramLearn.learn(docs, "text")
    // single chars of the corpus are all in the vocabulary
    assert(res.vocab.nonEmpty)
    val joined = docs.select(
      concat_ws("", UnigramLearn.encodeExpr(col("text"), res.vocab)).as("enc"),
      concat_ws("",
        graft.functions.TextAnalysis.tokens(col("text"))).as("raw"))
      .filter(col("enc") =!= col("raw"))
    assert(joined.count() === 0, "segmentation must cover each word exactly")
  }

  test("kernel matches a driver-side reference Viterbi on every corpus word") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = UnigramLearn.learn(docs, "text")
    val vocab = res.vocab.toMap
    val total = res.vocab.map(_._2).sum
    val maxLen = res.vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    def ref(word: String): Seq[String] = {
      val offs = Iterator.iterate(0)(o => o + Character.charCount(word.codePointAt(o)))
        .takeWhile(_ < word.length).toArray :+ word.length
      val L = offs.length - 1
      val best = Array.fill(L + 1)(-1.0); best(0) = 1.0
      val back = new Array[Int](L + 1)
      for (j <- 1 to L) {
        var bs = -1.0; var bi = -1
        for (i <- math.max(0, j - maxLen) until j) {
          vocab.get(word.substring(offs(i), offs(j))).foreach { c =>
            val s = best(i) * (c.toDouble / total.toDouble)
            if (s > bs) { bs = s; bi = i }
          }
        }
        best(j) = bs; back(j) = bi
      }
      var p = L; var cuts = List.empty[Int]
      while (p > 0) { cuts = p :: cuts; p = back(p) }
      (0 :: cuts).sliding(2).map { case List(a, b) =>
        word.substring(offs(a), offs(b)) }.toSeq
    }
    val words = UnigramLearn.wordFreq(docs, "text")
      .select("word").collect().map(_.getString(0))
    val viaKernel = docsDf(words.toSeq)
      .select(col("text"),
        UnigramLearn.encodeExpr(col("text"), res.vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(viaKernel(w) === ref(w).toList, s"word '$w'")
    }
  }

  test("tie-break prefers the longest final piece (smallest split point)") {
    // vocab {a: 4, aa: 4}, total 8 -> p(a) = p(aa) = 0.5 exactly.
    // "aaa": best[2] = p(aa) = 0.5 (one piece beats two);
    // best[3] candidates: i=1 last piece "aa" -> best[1]*0.5 = 0.25,
    //                     i=2 last piece "a"  -> best[2]*0.5 = 0.25
    // — an EXACT IEEE tie; the rule keeps the smallest split point
    // (longest final piece), so the segmentation is (a)(aa), never
    // (aa)(a).
    val vocab = Seq("a" -> 4L, "aa" -> 4L)
    val out = docsDf(Seq("aaa"))
      .select(UnigramLearn.encodeExpr(col("text"), vocab).as("p"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("a", "aa"))
  }

  test("M-step drops unused multi pieces, keeps and smooths singles; prune caps multis") {
    val docs = docsDf(Seq("abc abc abc xyz"))
    val res = UnigramLearn.learn(docs, "text", maxPieceLen = 3,
      minCount = 1L, seedMultiCap = 50, emIters = 2, keepMulti = 2)
    val singles = res.vocab.filter(_._1.length == 1).map(_._1).toSet
    assert(singles === Set("a", "b", "c", "x", "y", "z"))
    val multis = res.vocab.filter(_._1.length > 1)
    assert(multis.size <= 2)
    // "abc" dominates: it must survive the prune with count 3
    assert(multis.exists { case (p, c) => p == "abc" && c == 3L })
    // every single char is present even when Viterbi never uses it alone
    assert(res.vocab.filter(_._1.length == 1).forall(_._2 >= 1L))
  }

  test("deterministic under repartitioning") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    def run(parts: Int) =
      try UnigramLearn.learn(docs.repartition(parts), "text").vocab
      finally graft.core.CacheBin.drain()
    assert(run(2) === run(7))
  }

  test("the encoder plans as a scan expression: no join, no exchange") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = UnigramLearn.learn(docs, "text")
    val plan = docs
      .select(col("doc_id"),
        UnigramLearn.encodeExpr(col("text"), res.vocab).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"unigram encode must be join/shuffle-free:\n$plan")
  }
}
