package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the per-group running total (the scale-shape
  * primitive under PerplexityBuckets): partitioning invariance, groups
  * spanning partition boundaries, descending order keys, and the
  * null-group case (a null key must form its own group, not silently
  * vanish through the string-keyed offset join).
  */
class SeqPackGroupedSpec extends SparkSpec {

  test("withRunningTotalBy is a per-group exclusive prefix sum, repartition-invariant") {
    import spark.implicits._
    // 4 groups x 200 rows: big enough that every group spans several
    // range partitions at 32 shuffle partitions
    val df = spark.range(0, 800).toDF("id")
      .withColumn("g", concat(lit("grp"), pmod(col("id"), lit(4))))
      .withColumn("w", pmod(col("id") * 13, lit(17)) + 1)
    def totals(parts: Int): Seq[(Long, Long)] =
      SeqPack.withRunningTotalBy(df.repartition(parts), "g",
          Seq(col("id")), "w", out = "cum")
        .select("id", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val got = totals(7)
    assert(got == totals(1) && got == totals(32))
    // driver-side oracle: fold per group in id order
    val rows = df.select("id", "g", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = rows.groupBy(_._2).values.flatMap { grp =>
      val sorted = grp.sortBy(_._1)
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3))
    }.toSeq.sortBy(_._1)
    assert(got == expect)
  }

  test("withRunningTotalBy honors descending order keys") {
    import spark.implicits._
    val df = spark.range(0, 300).toDF("id")
      .withColumn("g", concat(lit("g"), pmod(col("id"), lit(3))))
      .withColumn("score", (col("id") * 37 % 1000).cast("double"))
      .withColumn("w", lit(2L))
    val got = SeqPack.withRunningTotalBy(df, "g",
        Seq(col("score").desc, col("id")), "w", out = "cum")
      .select("id", "g", "score", "cum").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // within each group, cum must increase by w along (score desc, id)
    got.groupBy(_._2).values.foreach { grp =>
      val ordered = grp.sortBy(t => (-t._3, t._1))
      assert(ordered.map(_._4).toSeq ==
        ordered.indices.map(_ * 2L).toSeq)
    }
  }

  test("null group keys form their own group instead of vanishing") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("en"), 10L), (2L, Option("en"), 20L),
      (3L, None, 5L), (4L, None, 7L), (5L, None, 9L),
      (6L, Option("fr"), 3L)
    ).toDF("id", "lang", "w")
    val got = SeqPack.withRunningTotalBy(df, "lang", Seq(col("id")), "w",
        out = "cum")
      .select("id", "lang", "cum").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
      .sortBy(_._1)
    // every input row survives (the r12 bug: null-group rows dropped)
    assert(got.length == 6)
    // null rows carry a correct within-group exclusive prefix sum
    assert(got.filter(_._2.isEmpty).map(_._3).toSeq == Seq(0L, 5L, 12L))
    // the original column still reads back as null, not the sentinel
    assert(got.count(_._2.isEmpty) == 3)
    assert(got.filter(_._2.contains("en")).map(_._3).toSeq == Seq(0L, 10L))
  }
}
