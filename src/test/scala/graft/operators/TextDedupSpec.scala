package graft.operators

import graft.SparkSpec

/** Dedup mechanics on a hand-built corpus: exact Jaccard ground truth,
  * MinHash candidate recall, SimHash pigeonhole exactness, and
  * partitioning invariance of all signatures.
  */
class TextDedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "every single morning while seven silent owls watch from tall pines and " +
      "a cold wind carries dry leaves across the narrow wooden bridge toward town"
    val nearDup = base.replace("old", "new") // 1-token edit → high Jaccard
    val exactDup = base
    val unrelated1 = "completely different words compose this sentence about spark engines and catalyst optimizers working hard"
    val unrelated2 = "yet another text that shares absolutely nothing with the first group of documents in this corpus"
    Seq(
      (0L, base), (1L, nearDup), (2L, exactDup),
      (3L, unrelated1), (4L, unrelated2))
      .toDF("doc_id", "text").repartition(3)
  }

  test("jaccardPairsExact finds planted dup pairs and nothing else") {
    val pairs = TextDedup.jaccardPairsExact(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val exact = pairs.find(p => (p._1, p._2) == ((0L, 2L))).get
    assert(exact._3 == 1.0)
  }

  test("minhashNearDupPairs recovers the same pairs via banded candidates") {
    val pairs = TextDedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("minhashDedupAgainst drops incoming near-dups of the corpus only") {
    import org.apache.spark.sql.functions.col
    // corpus = docs 0,3; incoming = 1 (near-dup of 0), 2 (exact dup of 0),
    // 4 (unrelated) → survivors = {4}
    val corpus = docs.filter(col("doc_id").isin(0L, 3L))
    val incoming = docs.filter(col("doc_id").isin(1L, 2L, 4L))
    val kept = TextDedup.minhashDedupAgainst(incoming, corpus,
      "doc_id", "text", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"expected only the unrelated doc to survive, got $kept")
    // incoming docs never compare against each other: two mutual
    // near-dups both survive when the corpus has no match
    val siblings = docs.filter(col("doc_id").isin(1L, 2L))
    val kept2 = TextDedup.minhashDedupAgainst(siblings,
      docs.filter(col("doc_id") === 4L), "doc_id", "text", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L))
  }

  test("simhash exact dup has identical signature; near dup within Hamming 3") {
    val sig = TextDedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(1L)) <= 3)
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(3L)) > 3)
    val pairs = TextDedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("signatures invariant under repartitioning") {
    def sigs(parts: Int) =
      TextDedup.simhash(docs.repartition(parts), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1) == sigs(8))
    def minhash(parts: Int) =
      TextDedup.minhashCandidatePairs(docs.repartition(parts), "doc_id", "text",
        n = 3, h = 16, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash(1) == minhash(8))
  }

  test("containment dedup drops the quoted sub-document, keeps the host; twins keep the smaller id") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val corpus = Seq(
      // doc 1 quotes doc 2's full text inside a longer document: the
      // symmetric Jaccard is low (5 shared of 12+3 shingles) but doc 2
      // is 100% contained in doc 1 — exactly the case this op exists for
      (1L, s"intro words before the quote $quote and plenty of trailing content here"),
      (2L, quote),
      // exact twins: same shingle count, so the smaller id survives
      (5L, "one two three four five six seven"),
      (6L, "one two three four five six seven"),
      (9L, "completely unrelated text lives here peacefully")
    ).toDF("doc_id", "text")
    val out = TextDedup.containmentDropContained(
      corpus, "doc_id", "text", threshold = 0.9)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 5L, 9L))
    // sanity: symmetric Jaccard at the same threshold would NOT drop doc 2
    val jac = TextDedup.jaccardPairsExact(corpus, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containment df-cap drops boilerplate shingles from pairing") {
    import spark.implicits._
    val chrome = "all rights reserved by this site" // in EVERY doc
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon $chrome"),
      (2L, s"unique content one lives here $chrome"),
      (3L, s"unique content two sits there $chrome"),
      (4L, s"unique content three rests yonder $chrome")
    ).toDF("doc_id", "text")
    // uncapped: chrome shingles alone put every doc ~50% contained in
    // every other — at 0.4 everything but one doc drops
    val uncapped = TextDedup.containmentDropContained(
      corpus, "doc_id", "text", threshold = 0.4)
      .count()
    // capped at df<=2 the chrome (df=4) is ignored: no containment left
    val capped = TextDedup.containmentDropContained(
      corpus, "doc_id", "text", threshold = 0.4, maxDocFreq = Some(2L))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(1L, 2L, 3L, 4L))
    assert(uncapped < 4L)
  }

  test("containment decisions are invariant under repartitioning") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "intro alpha beta gamma delta epsilon outro trailing content"),
      (2L, "alpha beta gamma delta epsilon"),
      (9L, "completely unrelated text lives here peacefully")
    ).toDF("doc_id", "text")
    def run(parts: Int) = TextDedup.containmentDropContained(
      corpus.repartition(parts), "doc_id", "text", threshold = 0.9)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(run(1) === run(6))
  }

  test("simhash banding keeps exact recall at maxHamming values the ceil split degenerated") {
    import spark.implicits._
    // maxHamming = 6 → 7 bands: the old uniform-ceil split put band 6
    // entirely past bit 29 (constant value 0 for every doc — an
    // all-pairs bucket). The balanced split must cover real bits in
    // every band AND keep pigeonhole-exact recall: banded pairs ==
    // brute-force Hamming pairs.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappas"),
      (3L, "one two three four five six seven eight nine ten eleven"),
      (4L, "one two three four five six seven eight nine ten twelve"),
      (5L, "completely different content about weather patterns today")
    ).toDF("doc_id", "text")
    val maxH = 6
    val banded = TextDedup.simhashNearDupPairs(docs, "doc_id", "text", maxH)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = TextDedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxH
    } yield (a, b)).toSet
    assert(banded === brute, "banded pair set diverged from brute-force Hamming")
  }

  test("bandsFor widens banding as the threshold drops; minhash default uses it") {
    import spark.implicits._
    assert(TextDedup.bandsFor(0.7) === 4)
    assert(TextDedup.bandsFor(0.5) === 8)
    assert(TextDedup.bandsFor(0.2) === 16)
    // moderately-similar planted pair (jaccard ~0.5): the threshold-
    // tuned default banding must surface it; the old fixed bands=4
    // (S-curve center ~0.71) is exactly the config that missed pairs
    // like this
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog far from any water source"),
      (3L, "unrelated document about compiler construction and register allocation")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.minhashNearDupPairs(corpus, "doc_id", "text",
      threshold = 0.4)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"threshold-tuned banding missed the pair: $pairs")
  }
}
