package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** The LinkAlign db_size schedule at realistic width: every breakpoint
  * of the top-k / rounds auto-schedules
  * (`core/actor/reducer/LinkAlignReduce.py:94-117`), and a wide-arm
  * run proving the scheduled rounds are ACTUALLY taken — every round
  * present in the output, each within its k budget, no column
  * retrieved twice (the seen-key exclusion), plus the small-DB bypass.
  */
class LinkAlignScheduleSpec extends SparkSpec {

  test("topKFor/turnsFor hit the reference breakpoints exactly") {
    // (dbSize, topK, turns) at and just past each breakpoint
    val expect = Seq(
      (80, 40, 2), (200, 40, 2), (201, 50, 3),
      (350, 50, 3), (351, 50, 6),
      (400, 50, 6), (401, 60, 6),
      (1000, 60, 6), (1001, 70, 8),
      (2500, 70, 8), (2501, 80, 10), (100000, 80, 10))
    expect.foreach { case (n, k, t) =>
      assert(LinkAlignReduce.topKFor(n) === k, s"topKFor($n)")
      assert(LinkAlignReduce.turnsFor(n) === t, s"turnsFor($n)")
    }
  }

  /** 1200 distinct-named columns from rotations of the 500 base
    * embeddings (rotation = pure reindexing, no FP drift). Distinct
    * (table, column) per col_id so the dedup stage cannot mask which
    * rounds ran.
    */
  private def wideSchema = {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 500).select(col("vec_id"), col("embedding"))
    (0 until 3).map { c =>
      val rot =
        if (c == 0) col("embedding")
        else concat(
          expr(s"slice(embedding, ${c + 1}, size(embedding) - $c)"),
          expr(s"slice(embedding, 1, $c)"))
      emb.select((col("vec_id") + lit(500L * c)).as("col_id"), rot.as("embedding"))
    }.reduce(_ unionByName _)
      .filter(col("col_id") < 1200)
      .withColumn("table_name", concat(lit("t"), col("col_id").cast("string")))
      .withColumn("column_name", concat(lit("c"), col("col_id").cast("string")))
  }

  test("the 1200-wide arm takes all 8 scheduled rounds of 70") {
    val out = LinkAlignReduce.reduce(wideSchema, Seq.fill(64)(1.0),
      dbSize = 1200, initRetainRate = 1.0, decayRate = 1.0)
      .select("col_id", "turn_n").collect()
    val byTurn = out.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    // schedule for 1001..2500: top-k 70, 8 rounds — every round present
    // and exactly filled (1200 >> 8*70, so no round starves)
    assert(byTurn.keySet === (0 until 8).toSet,
      s"rounds taken: ${byTurn.keySet.toSeq.sorted}")
    assert(byTurn.values.forall(_ == 70), s"per-round counts: $byTurn")
    // seen-key exclusion: no column retrieved in two rounds
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("small databases bypass reduction untouched") {
    val sch = wideSchema.filter(col("col_id") < 60)
    val out = LinkAlignReduce.reduce(sch, Seq.fill(64)(1.0), dbSize = 60)
    assert(out.count() === 60)
    assert(out.select("turn_n").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
  }
}
