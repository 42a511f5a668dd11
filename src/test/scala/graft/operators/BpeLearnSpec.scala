package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE learner vs an in-memory reference implementation of Sennrich
  * et al. 2016 (word-frequency dict, greedy leftmost non-overlapping
  * pair application), plus hand-computed fixtures and edge cases.
  */
class BpeLearnSpec extends SparkSpec {

  // ---- in-memory reference ------------------------------------------------

  private def refApply(toks: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Seq[String], m: Int)
      : (List[(String, String, Long)], Map[List[String], Long]) = {
    var wf: Map[List[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.size.toLong
      }
    var merges = List.empty[(String, String, Long)]
    var k = 0
    var done = false
    while (k < m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- wf; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges = merges :+ (l, r, c)
        wf = wf.groupMapReduce { case (toks, _) => refApply(toks, l, r) }(_._2)(_ + _)
        k += 1
      }
    }
    (merges, wf)
  }

  private def refEncode(text: String, merges: Seq[(String, String, Long)]): List[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toList.flatMap { w =>
      merges.foldLeft(w.toList.map(_.toString)) { case (t, (l, r, _)) => refApply(t, l, r) }
    }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  // ---- fixtures -----------------------------------------------------------

  test("hand-computed merges on the classic low/lower corpus") {
    // words: low x3, lower x2 → pairs: (l,o) 5, (o,w) 5, (w,e) 2, (e,r) 2
    // round 0 tie (l,o)=(o,w)=5 → lexicographic picks (l,o)
    // round 1: (lo,w) 5 wins; round 2: (low,e) 2 vs (e,r) 2 → (e,r)
    val df = docsDf(Seq("low low lower", "low lower"))
    val res = BpeLearn.learn(df, "text", 3)
    assert(res.merges.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("l", "o", 5L), ("lo", "w", 5L), ("e", "r", 2L)))
  }

  test("cascading merge: aaaa becomes [aa, aa] not [aa, a, a]") {
    val df = docsDf(Seq("aaaa aaa"))
    val res = BpeLearn.learn(df, "text", 1)
    assert(res.merges.head.left === "a" && res.merges.head.right === "a")
    // aaaa: (a,a) appears 3x overlapping but greedy pass merges 2;
    // aaa merges 1 leaving a tail "a"
    val enc = df.select(BpeLearn.encodeExpr(col("text"), res.merges).as("t"))
      .head().getSeq[String](0)
    assert(enc === Seq("aa", "aa", "aa", "a"))
  }

  test("single-char words learn nothing and stop early") {
    val df = docsDf(Seq("a b c a b"))
    val res = BpeLearn.learn(df, "text", 5)
    assert(res.merges.isEmpty)
    val enc = df.select(BpeLearn.encodeExpr(col("text"), Nil).as("t"))
      .head().getSeq[String](0)
    assert(enc === Seq("a", "b", "c", "a", "b"))
  }

  test("matches the reference on seeded random corpora, 8 merges deep") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val words = Seq.fill(120)(
        (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val texts = words.grouped(10).map(_.mkString(" ")).toSeq
      val (refMerges, refWf) = refLearn(words, 8)
      val df = docsDf(texts)
      val res = BpeLearn.learn(df, "text", 8)
      assert(res.merges.map(m => (m.left, m.right, m.pairCount)) === refMerges,
        s"trial $trial merges")
      // final word-frequency state agrees (keyed by token list)
      val gotWf = res.wordFreq
        .select(split(trim(col("toks")), "  ").as("t"), col("freq"))
        .collect().map(r => r.getSeq[String](0).toList -> r.getLong(1)).toMap
      assert(gotWf === refWf, s"trial $trial word-freq state")
      // per-document encode agrees
      val got = df.select(col("doc_id"), BpeLearn.encodeExpr(col("text"), res.merges).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      for ((t, i) <- texts.zipWithIndex)
        assert(got(i.toLong) === refEncode(t, refMerges), s"trial $trial doc $i")
    }
  }

  test("deterministic under repartitioning") {
    val texts = Seq("abc bca cab abc", "bca bca abc ccc", "aaa bbb ccc abc")
    val df = docsDf(texts)
    val a = BpeLearn.learn(df, "text", 6).merges
    val b = BpeLearn.learn(df.repartition(7), "text", 6).merges
    assert(a === b)
  }

  // ---- byte-level mode ----------------------------------------------------

  /** Byte-mode reference: word -> hex byte tokens + "_" marker. */
  private def refBytes(w: String): List[String] =
    w.getBytes("UTF-8").toList.map(b => f"${b & 0xff}%02X") :+ "_"

  private def refLearnBytes(words: Seq[String], m: Int)
      : List[(String, String, Long)] = {
    var wf: Map[List[String], Long] =
      words.groupBy(identity).map { case (w, ws) => refBytes(w) -> ws.size.toLong }
    var merges = List.empty[(String, String, Long)]
    var k = 0
    var done = false
    while (k < m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- wf; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l2, r2), c2) => (-c2, l2, r2) }
        merges = merges :+ (l, r, c)
        wf = wf.groupMapReduce { case (toks, _) => refApply(toks, l, r) }(_._2)(_ + _)
        k += 1
      }
    }
    merges
  }

  test("byte mode matches the byte-alphabet reference, marker included") {
    val texts = Seq("low low lower", "low lower newest", "newest widest")
    val df = docsDf(texts)
    val words = texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val refMerges = refLearnBytes(words, 6)
    val res = BpeLearn.learn(df, "text", 6, byteLevel = true)
    assert(res.merges.map(m => (m.left, m.right, m.pairCount)) === refMerges)
    // encode round-trips: stripping the marker and decoding hex
    // reconstructs the original byte stream of every word
    val enc = df.select(BpeLearn.encodeExpr(col("text"), res.merges,
      byteLevel = true).as("t")).collect().map(_.getSeq[String](0))
    for ((t, toks) <- texts.zip(enc)) {
      val hexStream = toks.mkString.replace("_", "")
      val bytes = hexStream.grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") ===
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString)
    }
  }

  test("byte mode learns multi-byte characters from their bytes") {
    // "héllo" repeated: the é bytes (C3 A9) are the most frequent
    // adjacent pair tied with others; the merge table must stay inside
    // byte-token space and encode must keep the marker per word
    val df = docsDf(Seq("héé héé héé hé"))
    val res = BpeLearn.learn(df, "text", 2, byteLevel = true)
    assert(res.merges.nonEmpty)
    assert(res.merges.forall(m =>
      (m.left + m.right).replace("_", "").forall("0123456789ABCDEF".contains(_))))
    val enc = df.select(BpeLearn.encodeExpr(col("text"), res.merges,
      byteLevel = true).as("t")).head().getSeq[String](0)
    assert(enc.count(_.endsWith("_")) === 4, "one end-of-word unit per word")
  }

  test("byte mode is deterministic under repartitioning") {
    val df = docsDf(Seq("abc bca cab abc", "bca bca abc ccc"))
    val a = BpeLearn.learn(df, "text", 5, byteLevel = true).merges
    val b = BpeLearn.learn(df.repartition(7), "text", 5, byteLevel = true).merges
    assert(a === b)
  }

  test("vocabulary counts match the reference final state") {
    val words = Seq("abab", "abab", "abba", "ab", "ba")
    val df = docsDf(Seq(words.mkString(" ")))
    val (refMerges, refWf) = refLearn(words, 4)
    val res = BpeLearn.learn(df, "text", 4)
    assert(res.merges.map(m => (m.left, m.right, m.pairCount)) === refMerges)
    val refVocab = refWf.toSeq
      .flatMap { case (toks, f) => toks.map(_ -> f) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val got = BpeLearn.vocabulary(res.wordFreq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refVocab)
  }
}
