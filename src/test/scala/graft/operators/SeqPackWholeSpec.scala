package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Whole-document (harmonic-class) packing invariants: no splits by
  * construction, per-class fill bound, loud overflow, determinism.
  */
class SeqPackWholeSpec extends SparkSpec {

  private val Budget = 128L

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    .filter(col("n_tokens") > 0 && col("n_tokens") <= Budget)

  test("every bin respects the budget and holds at most pack_class docs of one class") {
    val out = SeqPack.packWholeDocs(docs, "doc_id", "n_tokens", Budget)
      .select("doc_id", "n_tokens", "pack_class", "bin_id", "bin_fill")
      .collect()
    assert(out.nonEmpty)
    val byBin = out.groupBy(_.getLong(3))
    byBin.foreach { case (bin, rows) =>
      val classes = rows.map(_.getLong(2)).distinct
      assert(classes.length === 1, s"bin $bin mixes classes $classes")
      assert(rows.length <= classes.head, s"bin $bin overfull by count")
      val fill = rows.map(_.getLong(1)).sum
      assert(fill <= Budget, s"bin $bin fill $fill > budget")
      assert(rows.forall(_.getLong(4) == fill), s"bin $bin bin_fill wrong")
    }
  }

  test("full bins meet the harmonic fill bound k/(k+1)") {
    // one materialization serves bins AND counts (a second
    // packWholeDocs call would re-persist the identical plan)
    val rows = SeqPack.packWholeDocs(docs, "doc_id", "n_tokens", Budget)
      .select("pack_class", "bin_id", "bin_fill").collect()
    val counts = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    // a FULL bin (one holding exactly k docs) of class k has every
    // weight > budget/(k+1), so fill > budget*k/(k+1)
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct
      .foreach { case (k, bin, fill) =>
        if (counts(bin) == k)
          assert(fill * (k + 1) > Budget * k,
            s"full bin $bin of class $k fill $fill below harmonic bound")
      }
  }

  test("every document lands in exactly one bin (no splits possible)") {
    val out = SeqPack.packWholeDocs(docs, "doc_id", "n_tokens", Budget)
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
    assert(out.count() === docs.count())
  }

  test("an over-budget document fails loudly instead of truncating") {
    import spark.implicits._
    val bad = Seq((1L, 50L), (2L, Budget + 1)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception](
      SeqPack.packWholeDocs(bad, "doc_id", "n_tokens", Budget).collect())
    assert(e.getMessage.contains("weight out of") ||
      e.getCause != null && e.getCause.getMessage.contains("weight out of"))
  }

  test("a 2^20 long-context budget packs (key width derives from the budget)") {
    import spark.implicits._
    val budget = 1L << 20 // 1,048,576 — a realistic modern context length
    // weights spanning classes: k = budget div w from 1 (whole-budget
    // docs) to budget (weight-1 docs)
    val docs20 = Seq(
      (1L, budget), (2L, budget), (3L, budget / 2), (4L, budget / 2),
      (5L, budget / 2), (6L, 1L), (7L, 1L), (8L, 300000L), (9L, 300000L),
      (10L, 999999L)).toDF("doc_id", "n_tokens")
    val out = SeqPack.packWholeDocs(docs20, "doc_id", "n_tokens", budget)
      .select("doc_id", "n_tokens", "pack_class", "bin_id", "bin_fill")
      .collect()
    assert(out.length === 10)
    out.groupBy(_.getLong(3)).foreach { case (bin, rows) =>
      assert(rows.map(_.getLong(1)).sum <= budget, s"bin $bin over budget")
      assert(rows.map(_.getLong(2)).distinct.length === 1)
      assert(rows.length <= rows.head.getLong(2))
    }
    // whole-budget docs are class 1: one per bin
    val class1Bins = out.filter(_.getLong(1) == budget).map(_.getLong(3))
    assert(class1Bins.distinct.length === class1Bins.length)
  }

  test("deterministic under repartitioning") {
    def run(parts: Int) =
      try SeqPack.packWholeDocs(docs.repartition(parts), "doc_id",
        "n_tokens", Budget)
        .select("doc_id", "bin_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.core.CacheBin.drain()
    assert(run(2) === run(9))
  }
}
