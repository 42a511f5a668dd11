package graft.operators

import graft.SparkSpec

class QuantileGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = ((1 to 20).map(i => ("a", i * 10L)) ++
    Seq(("b", 1L), ("b", 2L), ("b", 1000L))).toDF("source", "n")

  test("bounds are real group elements at the ANSI cume_dist rule") {
    // group a: n = 10..200; p05 over 20 rows -> ceil(20*.05)=1st value (10),
    // p95 -> ceil(20*.95)=19th value (190); 200 is trimmed, 10 kept
    val kept = QuantileGate.gate(docs, Seq("source"), "n", 0.05, 0.95)
      .filter($"source" === "a").select($"n").as[Long].collect().sorted
    assert(kept.head === 10L && kept.last === 190L && kept.length === 19)
  }

  test("tiny group: p05/p95 of 3 rows keeps the middle per the disc rule") {
    // ceil(3*.05)=1st (1), ceil(3*.95)=3rd (1000) -> everything kept
    val kept = QuantileGate.gate(docs, Seq("source"), "n", 0.05, 0.95)
      .filter($"source" === "b").count()
    assert(kept === 3)
  }

  test("degenerate [0.5, 0.5] keeps exactly the median element rows") {
    val kept = QuantileGate.gate(docs, Seq("source"), "n", 0.5, 0.5)
      .filter($"source" === "a").select($"n").as[Long].collect().toSeq
    assert(kept === Seq(100L)) // ceil(20*0.5)=10th value
  }

  test("bounds join is broadcast") {
    val plan = QuantileGate.gate(docs, Seq("source"), "n", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
