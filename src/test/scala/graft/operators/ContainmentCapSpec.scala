package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves [[TextDedup.DefaultContainmentDocFreqCap]] actually BINDS
  * and does what it promises on a heavy-hitter corpus (the sf0.1
  * sweep cannot show this: max organic 3-gram df there is 25, so the
  * default-cap curve IS the uncapped curve).
  *
  * Corpus: one boilerplate shingle shared by 10,500 documents —
  * past the 10,000 default cap, the way a template header behaves at
  * corpus scale — plus a genuine containment pair and a pair whose
  * verdict DEPENDS on the capped denominator.
  */
class ContainmentCapSpec extends SparkSpec {

  private val HotDocs = 10500L
  private lazy val docs = {
    import spark.implicits._
    val boiler = spark.range(1L, HotDocs + 1L)
      .select(col("id").as("doc_id"), lit("alpha beta gamma").as("text"))
    val structured = Seq(
      (20001L, "one two three four five"),
      (20002L, "one two three four five six seven"),
      (20003L, "eight nine ten eleven"),
      // mixes the hot shingle with a unique tail: capped denominator 3,
      // uncapped denominator 4
      (20004L, "alpha beta gamma unique tail words"),
      (20005L, "beta gamma unique tail words plus more"))
      .toDF("doc_id", "text")
    boiler.unionByName(structured)
  }

  private def pairRows(maxDocFreq: Option[Long]): Long = {
    val s = TextDedup.explodedShingleTable(docs, "doc_id", "text", 3, maxDocFreq)
    s.as("a").join(s.as("b"),
      col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id")).count()
  }

  test("the default cap binds: pair join stays tiny while the uncapped form explodes") {
    // the boilerplate shingle's document frequency exceeds the cap
    val hotDf = TextDedup
      .explodedShingleTable(docs, "doc_id", "text", 3, maxDocFreq = None)
      .groupBy(col("__h")).count().agg(max(col("count"))).head().getLong(0)
    assert(hotDf > TextDedup.DefaultContainmentDocFreqCap,
      s"fixture does not bind the cap: max df $hotDf")
    // uncapped: the hot shingle alone forms df*(df-1)/2 pair rows
    val quadratic = HotDocs * (HotDocs - 1) / 2
    val uncapped = pairRows(maxDocFreq = None)
    assert(uncapped >= quadratic,
      s"uncapped pair join should carry the quadratic hot block: $uncapped")
    // capped (the DEFAULT): only the organic shared shingles remain —
    // 3 rows for the 20001/20002 containment pair, 3 for 20004/20005
    val capped = pairRows(Some(TextDedup.DefaultContainmentDocFreqCap))
    assert(capped == 6L, s"capped pair join rows: $capped (want 6)")
    // and the documented worst-case bound holds with room: every
    // surviving shingle has df <= cap
    val survivingMaxDf = TextDedup
      .explodedShingleTable(docs, "doc_id", "text", 3,
        Some(TextDedup.DefaultContainmentDocFreqCap))
      .groupBy(col("__h")).count().agg(max(col("count"))).head().getLong(0)
    assert(survivingMaxDf <= TextDedup.DefaultContainmentDocFreqCap)
  }

  test("capped verdicts: boilerplate certifies nothing; denominators recompute over the capped space") {
    val survivors = TextDedup
      .containmentDropContained(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every boilerplate doc survives: a shingle past the cap is
    // corpus chrome and certifies no pairwise containment
    assert((1L to HotDocs).forall(survivors.contains),
      "boilerplate docs must all survive under the cap")
    // the genuine containment pair still resolves: 20001 is fully
    // contained in 20002
    assert(!survivors.contains(20001L) && survivors.contains(20002L))
    assert(survivors.contains(20003L))
    // 20004's denominator is the CAPPED shingle count (3, not 4): its
    // three non-hot shingles are all inside 20005 → containment 1.0 →
    // dropped. Uncapped it reads 3/4 = 0.75 < 0.8 and survives —
    // the denominator recomputation the scaladoc promises.
    assert(!survivors.contains(20004L) && survivors.contains(20005L))
    val uncappedSurvivors = TextDedup
      .containmentDropContained(docs, "doc_id", "text", threshold = 0.8,
        maxDocFreq = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uncappedSurvivors.contains(20004L),
      "uncapped 20004 containment is 0.75 and must survive")
    // uncapped, EVERY boilerplate doc is annihilated: each one's whole
    // shingle set {hot} is contained in 20004 (i/na = 1/1), on top of
    // the pairwise twin collapse — the cap is what keeps template-only
    // pages from being "contained" in any page sharing their chrome
    assert(uncappedSurvivors.intersect((1L to HotDocs).toSet).isEmpty,
      "uncapped boilerplate docs are all contained in 20004")
  }
}
