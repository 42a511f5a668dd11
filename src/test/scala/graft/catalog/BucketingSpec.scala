package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located join: both sides bucketed on the join key →
  * the join plan has no shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("equi-join between same-bucketed tables runs shuffle-free") {
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", Seq("l_orderkey"), 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      // the join itself must not reshuffle either bucketed side
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join reshuffled:\n$joinSection")
      // correctness unchanged
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
