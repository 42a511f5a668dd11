package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for suffix-window span extension: long
  * duplicated spans strip (keep-first), short incidental repeats
  * survive the island floor, within-document repeats count, and the
  * pipeline is deterministic and pairwise-free.
  */
class SpanDedupSpec extends SparkSpec {

  private val longRun = (1 to 12).map(i => s"w$i").mkString(" ")
  private val phrase = "p1 p2 p3 p4 p5"
  private val rRun = (1 to 10).map(i => s"r$i").mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, s"alpha beta $longRun gamma $phrase"),
      (1L, s"delta $longRun epsilon zeta"),
      (2L, s"eta theta $phrase iota"),
      (3L, s"$rRun $rRun"),
      (4L, "plain unique text with no repeats at all")
    ).toDF("doc_id", "text")
  }

  private def run() =
    SpanDedup.removeLongDupSpans(corpus, "doc_id", "text",
      windowTokens = 5, minCount = 2, minSpanTokens = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap

  test("a >= floor duplicated span strips from the later doc only; keep-first survives") {
    val out = run()
    // doc0 holds the first occurrence of everything it shares: untouched
    assert(out(0L)._2 === 0L)
    assert(out(0L)._4 === s"alpha beta $longRun gamma $phrase")
    // doc1's 12-token copy is one maximal island >= 8: stripped
    assert(out(1L) === ((15L, 12L, 1L, "delta epsilon zeta")))
  }

  test("a short shared phrase is below the island floor and survives") {
    val out = run()
    assert(out(2L) === ((8L, 0L, 0L, s"eta theta $phrase iota")))
  }

  test("within-document repetition counts: second copy of a long run strips") {
    val out = run()
    assert(out(3L) === ((20L, 10L, 1L, rRun)))
  }

  test("documents with no duplicated windows pass through verbatim") {
    val out = run()
    assert(out(4L)._2 === 0L)
    assert(out(4L)._4 === "plain unique text with no repeats at all")
  }

  test("a 50k-token doc with 40% duplication costs the same order as an unduplicated one") {
    import spark.implicits._
    // the r12 rebuild was O(tokens × removed) per document via a
    // per-token array_contains: 50k tokens with 20k removed ≈ 10⁹
    // comparisons in ONE task. The interval-complement rebuild is
    // O(tokens + spans); this pins the pathological case to the same
    // order of magnitude as the clean one.
    val a = (0 until 20000).map(i => s"a$i").mkString(" ")
    val b = (0 until 10000).map(i => s"b$i").mkString(" ")
    val dup = Seq((0L, s"$a $b $a")).toDF("doc_id", "text")
    val uniq = Seq((0L, (0 until 50000).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    def timed(df: org.apache.spark.sql.DataFrame): (Double, Map[Long, (Long, Long, Long, String)]) = {
      val t0 = System.nanoTime()
      val rows =
        try SpanDedup.removeLongDupSpans(df, "doc_id", "text", 5, 2, 8)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
        finally graft.core.CacheBin.drain()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (tWarm, _) = timed(uniq) // codegen/JIT warmup, untimed
    val (tUniq, uniqOut) = timed(uniq)
    val (tDup, dupOut) = timed(dup)
    assert(uniqOut(0L)._2 == 0L)
    assert(dupOut(0L) == ((50000L, 20000L, 1L, s"$a $b")))
    // same order of magnitude: generous 10x + fixed slack absorbs
    // scheduler noise while still failing the quadratic path (minutes)
    assert(tDup <= tUniq * 10 + 10.0,
      s"span dedup straggler: dup=$tDup s vs uniq=$tUniq s (warm=$tWarm)")
  }

  test("deterministic under repartitioning; no pairwise join in the plan") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    def once(parts: Int) =
      try SpanDedup.removeLongDupSpans(docs.repartition(parts),
        "doc_id", "text", 5, 2, 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      finally graft.core.CacheBin.drain()
    assert(once(2) === once(9))
    val plan = SpanDedup.removeLongDupSpans(docs, "doc_id", "text", 5, 2, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
