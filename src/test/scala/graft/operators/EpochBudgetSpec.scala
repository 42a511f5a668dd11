package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochBudgetSpec extends SparkSpec {

  private val P = 1000000007L
  private def ord(id: Long): Long = (id % P) * 2654435761L % P

  private def fixture = {
    import spark.implicits._
    // srcA: 3 docs of 10 tokens (corpus 30); srcB: 2 docs of 20 (corpus 40)
    Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (4L, "b", 20L), (5L, "b", 20L))
      .toDF("doc_id", "src", "n_tok")
  }

  test("plan: full epochs by integer division, remainder, epoch cap") {
    val p = EpochBudget.plan(fixture, "src", "n_tok",
      defaultBudget = 75L, overrides = Map("b" -> 1000L), maxEpochs = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: 75 div 30 = 2 full epochs, remainder 15
    assert(p("a") === ((30L, 75L, 2L, 15L)))
    // b: 1000 div 40 = 25 → capped at 3, remainder forced to 0
    assert(p("b") === ((40L, 1000L, 3L, 0L)))
  }

  test("epoched corpus: full repeats + hash-order partial prefix") {
    val ep = EpochBudget.epochedCorpus(fixture, "src", "n_tok",
      defaultBudget = 75L, overrides = Map("b" -> 1000L), maxEpochs = 3)
      .select(col("doc_id"), col("src"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // srcB: every doc exactly 3 epochs, no partial
    assert(ep.filter(_._2 == "b").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
      .toMap === Map(4L -> Seq(0L, 1L, 2L), 5L -> Seq(0L, 1L, 2L)))
    // srcA: 2 full epochs each + partial (remainder 15 admits ONE 10-token
    // doc — the smallest hash draw among ids 1..3)
    val aFirst = Seq(1L, 2L, 3L).minBy(ord)
    val aEpochs = ep.filter(_._2 == "a").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(aEpochs(aFirst) === Seq(0L, 1L, 2L))
    Seq(1L, 2L, 3L).filterNot(_ == aFirst).foreach { id =>
      assert(aEpochs(id) === Seq(0L, 1L))
    }
  }

  test("zero full epochs still emits the partial epoch") {
    val ep = EpochBudget.epochedCorpus(fixture, "src", "n_tok",
      defaultBudget = 15L, overrides = Map.empty, maxEpochs = 3)
      .select(col("doc_id"), col("src"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // a: 15 div 30 = 0 full, remainder 15 → one 10-token doc at epoch 0
    assert(ep.count(_._2 == "a") === 1)
    assert(ep.filter(_._2 == "a").head._3 === 0L)
    // b: 15 div 40 = 0 full, remainder 15 < 20 → nothing admitted
    assert(ep.count(_._2 == "b") === 0)
  }

  test("deterministic under repartitioning") {
    val a = EpochBudget.epochedCorpus(fixture, "src", "n_tok", 75L,
      Map("b" -> 1000L), 3).select(col("doc_id"), col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = EpochBudget.epochedCorpus(fixture.repartition(5), "src", "n_tok",
      75L, Map("b" -> 1000L), 3).select(col("doc_id"), col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }
}
