package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-behavior contracts for the RowOps rewrites: slice ids must be
  * globally-ordered without a single-partition window, and retain-decay
  * must be invariant under repartitioning (task layout must not change
  * which rows survive).
  */
class RowOpsSpec extends SparkSpec {

  test("withSliceId assigns contiguous global slices without a global window") {
    import spark.implicits._
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("id", col("id").cast("long"))
      .repartition(7) // scrambled input layout
    val sliced = RowOps.withSliceId(df, "id", 100)
    val rows = sliced.select("id", "slice_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // every id lands in floor(rank/100) where rank = id (ids are unique 0..999)
    assert(rows.forall { case (id, s) => s == id / 100 })
    assert(sliced.groupBy("slice_id").count().collect().forall(_.getLong(1) == 100))
  }

  test("withSliceId plan has no single-partition window") {
    import spark.implicits._
    val df = spark.range(0, 100).toDF("id")
    val plan = RowOps.withSliceId(df, "id", 10).queryExecution.executedPlan.toString
    // Window partitions by __pid — never an empty partition spec
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition(id"))
  }

  test("retainDecay survivors are invariant under repartitioning") {
    import spark.implicits._
    val base = spark.range(0, 2000).toDF("key")
      .withColumn("round", pmod(col("key"), lit(5)).cast("int"))
    def survivors(parts: Int): Set[Long] =
      RowOps.retainDecay(base.repartition(parts), "round", 0.8, 0.5, Seq("key"))
        .select("key").collect().map(_.getLong(0)).toSet
    val s1 = survivors(1)
    assert(s1 == survivors(13) && s1 == survivors(32))
    assert(s1.nonEmpty && s1.size < 2000)
  }

  test("tokenBudgetSample: admission matches the spec and is layout-invariant") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"src${i % 3}", (i % 7 + 1).toInt))
      .toDF("doc_id", "source", "n_tok")
    def run(parts: Int): Set[Long] =
      RowOps.tokenBudgetSample(df.repartition(parts), "source", "n_tok",
        defaultBudget = 100L, overrides = Map("src0" -> 40L), idCol = "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run(3)
    assert(got == run(17) && got == run(1), "kept set must be partitioning-invariant")
    // driver-side reference: per source in hash order, running total over
    // ALL rows (dropped docs still consume budget), keep while cum<=budget
    val ord = (id: Long) => ((id % 1000000007L) * 2654435761L) % 1000000007L
    val expect = (0L until 500L).groupBy(i => s"src${i % 3}").flatMap { case (src, ids) =>
      val budget = if (src == "src0") 40L else 100L
      var cum = 0L
      ids.toSeq.sortBy(i => (ord(i), i)).flatMap { i =>
        cum += (i % 7 + 1)
        if (cum <= budget) Some(i) else None
      }
    }.toSet
    assert(got == expect, s"admission diverged from spec: got ${got.size}, want ${expect.size}")
    // edge paths of the two-pass rewrite: empty input; null token weights
    assert(RowOps.tokenBudgetSample(
      df.filter(col("doc_id") < 0), "source", "n_tok", 10L).count() == 0)
    val withNull = df.withColumn("n_tok",
      when(pmod(col("doc_id"), lit(11)) === 0, lit(null)).otherwise(col("n_tok")))
    assert(RowOps.tokenBudgetSample(withNull, "source", "n_tok", 100L).count() > 0)
  }

  test("retainDecay keeps ~initRate*decay^round per round") {
    import spark.implicits._
    val base = spark.range(0, 10000).toDF("key")
      .withColumn("round", pmod(col("key"), lit(3)).cast("int"))
    val kept = RowOps.retainDecay(base, "round", 0.9, 0.5, Seq("key"))
      .groupBy("round").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    // ~3333 rows per round; expected fractions 0.9, 0.45, 0.225 (±15%)
    val expected = Map(0 -> 0.9, 1 -> 0.45, 2 -> 0.225)
    expected.foreach { case (r, f) =>
      val got = kept.getOrElse(r, 0L).toDouble / 3333.0
      assert(math.abs(got - f) < 0.15 * f + 0.02, s"round $r: got $got want ~$f")
    }
  }
}
