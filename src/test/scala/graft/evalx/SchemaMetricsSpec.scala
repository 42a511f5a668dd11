package graft.evalx

import graft.SparkSpec

/** Distributed schema metrics must agree with the driver-side definitions
  * on the degenerate shapes: empty pred (present) → precision 0.0, null
  * pred → undefined, empty gold → undefined — and rows must never vanish.
  */
class SchemaMetricsSpec extends SparkSpec {

  private def run(rows: Seq[(String, Seq[String], Seq[String])]) = {
    import spark.implicits._
    SchemaMetrics.evalDataset(
      rows.toDF("instance_id", "gold_schemas", "pred_schemas"))
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
  }

  test("normal case: substring containment hit rule") {
    val m = run(Seq(
      ("a", Seq("orders.o_orderkey", "customer.c_name"), Seq("o_orderkey", "nope"))))
    // recall: 1 of 2 gold entries contains some pred; precision: 1 of 2 preds
    assert(m("a") == ((Some(0.5), Some(0.5))))
  }

  test("empty pred array present → precision 0.0, recall 0.0") {
    val m = run(Seq(("a", Seq("t.c1", "t.c2"), Seq())))
    assert(m("a") == ((Some(0.0), Some(0.0))))
  }

  test("null pred → both undefined; empty gold → both undefined") {
    val m = run(Seq(
      ("p_null", Seq("t.c"), null),
      ("g_empty", Seq(), Seq("t.c"))))
    assert(m("p_null") == ((None, None)))
    assert(m("g_empty") == ((None, None)))
    assert(m.size == 2) // rows never vanish
  }

  test("driver-side scalar metrics agree") {
    assert(SchemaMetrics.recall(Seq("t.a", "t.b"), Set("t.a")) == Some(0.5))
    assert(SchemaMetrics.precision(Seq("t.a"), Set.empty[String]) == Some(0.0))
    assert(SchemaMetrics.precision(Seq(), Set("x")) == None)
    assert(SchemaMetrics.recall(Seq("t.a"), null) == None)
  }
}
