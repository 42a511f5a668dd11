package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the packing primitive: the running total must be a
  * true exclusive prefix sum regardless of input layout, and bins must
  * respect the budget arithmetic.
  */
class SeqPackSpec extends SparkSpec {

  test("withRunningTotal is an exclusive prefix sum, repartition-invariant") {
    import spark.implicits._
    val df = spark.range(0, 500).toDF("id")
      .withColumn("w", pmod(col("id") * 7, lit(13)) + 1)
    def totals(parts: Int): Seq[(Long, Long)] =
      SeqPack.withRunningTotal(df.repartition(parts), "id", "w", "cum")
        .select("id", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val got = totals(11)
    assert(got == totals(1) && got == totals(32))
    // check against a driver-side fold
    val ws = df.select("id", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val expect = ws.scanLeft(0L)(_ + _).init
    assert(got.map(_._2).toSeq == expect.toSeq)
  }

  test("packByBudget bins are monotone and offsets stay under budget") {
    import spark.implicits._
    val df = spark.range(0, 300).toDF("id").withColumn("w", lit(90L))
    val packed = SeqPack.packByBudget(df, "id", "w", budget = 512L)
      .select("id", "bin_id", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(packed.map(_._2).toSeq == packed.map(_._2).sorted.toSeq)
    assert(packed.forall(_._3 < 512L))
    assert(packed.forall(_._3 >= 0L))
    // 90-token docs: bin changes every ceil(512/90)≈6 docs on average
    assert(packed.map(_._2).distinct.length >= 300 * 90 / 512)
  }
}
