package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random property tests for the tokenizer kernels over a
  * hostile alphabet (ASCII, Latin-1, CJK, astral plane): coverage
  * (pieces reassemble the input), greedy/Viterbi contracts, and
  * termination — 200 random words per property, deterministic seed.
  */
class TokenizerPropertySpec extends SparkSpec {

  private val Pool: Array[String] =
    Array("a", "b", "c", "d", "e", "ü", "ß", "щ", "中", "文",
      "𝕏", "𝕐", "😀", "7", "-")

  private def randomWords(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (0 until len).map(_ => Pool(rnd.nextInt(Pool.length))).mkString
    }.distinct
  }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("unigram: segmentation covers every random word exactly; kernel == reference") {
    val words = randomWords(seed = 7L, n = 200)
    // vocab: every single char of the pool + random multi-char pieces
    val rnd = new scala.util.Random(13L)
    val chars = words.flatMap(w =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
      .distinct.map(_ -> (1L + rnd.nextInt(50)))
    val multis = words.filter(_.length > 1).take(60).map { w =>
      val cps = w.codePoints().toArray
      val k = 2 + rnd.nextInt(math.max(cps.length - 1, 1))
      new String(cps.take(k), 0, math.min(k, cps.length)) -> (1L + rnd.nextInt(50))
    }.distinct
    val vocab = (chars ++ multis).distinctBy(_._1).sortBy(_._1)
    val total = vocab.map(_._2).sum
    val maxLen = vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    val vmap = vocab.toMap
    def ref(word: String): Seq[String] = {
      val offs = Iterator.iterate(0)(o => o + Character.charCount(word.codePointAt(o)))
        .takeWhile(_ < word.length).toArray :+ word.length
      val L = offs.length - 1
      val best = Array.fill(L + 1)(-1.0); best(0) = 1.0
      val back = new Array[Int](L + 1)
      for (j <- 1 to L) {
        var bs = -1.0; var bi = -1
        for (i <- math.max(0, j - maxLen) until j) {
          vmap.get(word.substring(offs(i), offs(j))).foreach { c =>
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
    val got = docsDf(words)
      .select(col("text"), UnigramLearn.encodeExpr(col("text"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(got(w).mkString === w, s"coverage broken for '$w'")
      assert(got(w) === ref(w).toList, s"kernel != reference for '$w'")
    }
  }

  test("wordpiece maxmatch: greedy-longest contract and reassembly on random vocab") {
    val words = randomWords(seed = 21L, n = 200)
    val rnd = new scala.util.Random(5L)
    // vocab: SOME single chars (not all — UNK paths must exercise) +
    // random initial and continuation pieces
    val charsAll = words.flatMap(w =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))).distinct
    val chars = charsAll.filter(_ => rnd.nextDouble() < 0.8)
    val multis = words.filter(_.length > 1).take(80).flatMap { w =>
      val cps = w.codePoints().toArray
      val st = rnd.nextInt(cps.length)
      val k = 1 + rnd.nextInt(math.max(cps.length - st, 1))
      val sub = new String(cps.slice(st, st + k), 0, math.min(k, cps.length - st))
      Seq(if (st == 0) sub else "##" + sub)
    }.distinct
    val vocab = (chars ++ chars.map("##" + _) ++ multis).distinct
    val vset = vocab.toSet
    val maxLen = vocab.map { t =>
      val c = if (t.startsWith("##")) t.substring(2) else t
      c.codePointCount(0, c.length)
    }.max
    def ref(word: String): Seq[String] = {
      val offs = Iterator.iterate(0)(o => o + Character.charCount(word.codePointAt(o)))
        .takeWhile(_ < word.length).toArray :+ word.length
      val L = offs.length - 1
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos < L) {
        var k = math.min(maxLen, L - pos)
        var hit: String = null
        while (k >= 1 && hit == null) {
          val sub = word.substring(offs(pos), offs(pos + k))
          val cand = if (pos == 0) sub else "##" + sub
          if (vset(cand)) hit = cand
          k -= 1
        }
        if (hit == null) return Seq("[UNK]")
        out += hit
        pos += (if (hit.startsWith("##"))
          hit.codePointCount(2, hit.length) else hit.codePointCount(0, hit.length))
      }
      out.toSeq
    }
    val got = docsDf(words)
      .select(col("text"),
        WordPieceLearn.maxMatchExpr(col("text"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    var unks = 0
    words.foreach { w =>
      val expect = ref(w).toList
      assert(got(w) === expect, s"maxmatch mismatch for '$w'")
      if (expect == List("[UNK]")) unks += 1
      else assert(expect.map(_.stripPrefix("##")).mkString === w,
        s"reassembly broken for '$w'")
    }
    assert(unks > 0, "the random vocab must exercise the UNK path")
  }

  test("bpe encode kernel == literal replace chain on random words (both alphabets)") {
    val words = randomWords(seed = 42L, n = 120)
    val df = docsDf(words)
    val res = BpeLearn.learn(df, "text", numMerges = 5)
    val resB = BpeLearn.learn(df, "text", numMerges = 5, byteLevel = true)
    for ((r, bl) <- Seq((res, false), (resB, true))) {
      val a = df.select(col("doc_id"),
        BpeLearn.encodeExpr(col("text"), r.merges, bl).as("t"))
        .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
      val b = df.select(col("doc_id"),
        BpeLearn.encodeExprFast(col("text"), r.merges, bl).as("t"))
        .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
      assert(a === b, s"byteLevel=$bl")
    }
  }
}
