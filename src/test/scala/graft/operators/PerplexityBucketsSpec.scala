package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit contracts for the CCNet bucketizer (previously covered only by
  * the sf0.01 oracle query): every document lands in exactly one
  * bucket, the cut points are token-mass fractions with the straddling
  * document falling into the LATER bucket, zero-evidence documents go
  * to the tail, and a null language must not drop rows (the r12
  * running-total null-group bug surfaced here as silently vanishing
  * documents).
  */
class PerplexityBucketsSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // driver-side oracle of the labeling rule, fed by the operator's own
  // scores: sort (avg_logprob desc, id) per language, accumulate
  // n_bigrams, label by the cumulative-inclusive fraction
  private def expectBuckets(
      got: Seq[(Long, String, Long, Double)], headFrac: Double,
      midFrac: Double): Map[Long, String] =
    got.groupBy(_._2).flatMap { case (_, docs) =>
      val scored = docs.filter(_._3 > 0)
      val total = scored.map(_._3).sum.toDouble
      var cum = 0L
      val ranked = scored.sortBy(t => (-t._4, t._1)).map { t =>
        cum += t._3
        val frac = cum / total
        t._1 -> (if (frac <= headFrac) "head"
                 else if (frac <= headFrac + midFrac) "middle"
                 else "tail")
      }
      ranked ++ docs.filter(_._3 == 0).map(_._1 -> "tail")
    }

  test("buckets split token mass per language; straddler goes later; zero-evidence goes tail") {
    // varied lengths so documents straddle the 1/3 cut points; one
    // single-token doc (no bigram evidence) per language
    val texts = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val words = (0 to (i % 7) + 1).map(j => s"w${(i * 3 + j) % 11}")
      (i.toLong, words.mkString(" "), lang)
    } ++ Seq((100L, "solo", "en"), (101L, "alone", "fr"))
    val out = PerplexityBuckets.bucketize(mkDocs(texts), "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    assert(out.length == texts.length) // exactly one row per doc
    assert(out.filter(t => t._1 >= 100L).forall(_._5 == "tail"))
    val expect = expectBuckets(out.map(t => (t._1, t._2, t._3, t._4)).toSeq,
      1.0 / 3, 1.0 / 3)
    out.foreach { t => assert(t._5 == expect(t._1), s"doc ${t._1}") }
    // all three buckets are populated for both languages at this shape
    Seq("en", "fr").foreach { l =>
      assert(out.filter(_._2 == l).map(_._5).distinct.sorted.toSeq ==
        Seq("head", "middle", "tail"))
    }
  }

  test("null language is its own group, never dropped") {
    val texts = (0 until 12).map { i =>
      val lang: String = if (i < 8) "en" else null
      (i.toLong, (0 to i % 5 + 1).map(j => s"t${(i + j) % 7}").mkString(" "), lang)
    }
    val out = PerplexityBuckets.bucketize(mkDocs(texts), "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(4)))
    assert(out.length == 12)
    val nulls = out.filter(_._2.isEmpty)
    assert(nulls.length == 4)
    // null-lang docs are ranked against each other only
    assert(nulls.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
  }

  test("filterByBucket keeps exactly the requested buckets") {
    val texts = (0 until 30).map { i =>
      (i.toLong, (0 to i % 6 + 1).map(j => s"k${(i * 5 + j) % 13}").mkString(" "), "en")
    }
    val docs = mkDocs(texts)
    val buckets = PerplexityBuckets.bucketize(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    val kept = PerplexityBuckets.filterByBucket(docs, "doc_id", "text", "lang",
        keep = Seq("head", "middle"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == buckets.filter(kv => kv._2 != "tail").keySet)
  }
}
