package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The candidate-bounded verify read (round 16): screening a small
  * delta against a big materialized dedup index must push the
  * candidate ids into the corpus SHINGLE scan — with the index's
  * id-sorted row groups, parquet min/max stats then skip everything
  * outside the candidates' id ranges, so the verify read is
  * candidate-bounded instead of corpus-bounded. Results must be
  * identical to the direct (index-free) screen.
  */
class DedupIndexPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pushdown_$tag").toString

  private def corpusDocs = (0L until 60L).map { i =>
    (i, s"corpus document number $i discussing topic ${i % 7} in long " +
      s"enough prose to shingle with several distinct tokens $i end")
  }.toDF("doc_id", "text")

  test("verify scan carries a pushed id predicate; screen equals the direct form") {
    val idx = freshDir("idx") + "/index"
    TextDedup.writeDedupIndex(corpusDocs, "doc_id", "text", idx, bands = 8)
    graft.core.CacheBin.drain()
    // incoming: one near-dup of corpus doc 3 (one-word edit), one unique
    val incoming = Seq(
      (100L, "corpus document number 3 discussing topic 3 in long enough " +
        "prose to shingle with several distinct tokens 3 finale"),
      (101L, "entirely unrelated fresh essay about tidal estuaries and " +
        "migratory bird populations across seasons"))
      .toDF("doc_id", "text")
    val screened = TextDedup.dedupAgainstIndex(
      spark, idx, incoming, "doc_id", "text", threshold = 0.5)
    val survivors = screened.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(101L), s"survivors: $survivors")
    // the executed plan's shingle scan must carry a pushed doc_id
    // predicate (In below the parquet in-threshold, a min/max range
    // above it — either proves the filter reached the scan)
    val plan = screened.queryExecution.executedPlan.toString
    val shingleScan = plan.linesIterator
      .filter(_.contains("shingles")).mkString("\n")
    graft.core.CacheBin.drain()
    assert(shingleScan.nonEmpty, s"no shingle scan in plan:\n$plan")
    assert(plan.contains("PushedFilters: [In(doc_id") ||
      plan.contains("PushedFilters: [GreaterThanOrEqual(doc_id"),
      s"candidate ids not pushed into the verify scan:\n$plan")
    // ...and the candidate-side twin: incoming band VALUES pushed into
    // the (value-sorted) band scan
    assert(plan.contains("PushedFilters: [In(val") ||
      plan.contains("PushedFilters: [GreaterThanOrEqual(val"),
      s"probe values not pushed into the band scan:\n$plan")
    // equality with the direct (index-free) one-sided screen
    val direct = TextDedup.minhashDedupAgainst(
      incoming, corpusDocs, "doc_id", "text", threshold = 0.5,
      n = 3, h = 16, bands = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.core.CacheBin.drain()
    assert(direct === survivors,
      s"index screen diverged from direct screen: $direct vs $survivors")
  }

  test("no candidates: screen admits everything and stays cheap") {
    val idx = freshDir("nocand") + "/index"
    TextDedup.writeDedupIndex(corpusDocs, "doc_id", "text", idx, bands = 8)
    graft.core.CacheBin.drain()
    val incoming = Seq(
      (200L, "quarterly glacier mass balance reports compiled by volunteer " +
        "observers across alpine monitoring stations"))
      .toDF("doc_id", "text")
    val out = TextDedup.dedupAgainstIndex(
      spark, idx, incoming, "doc_id", "text", threshold = 0.5)
    assert(out.count() === 1L)
    graft.core.CacheBin.drain()
  }
}
