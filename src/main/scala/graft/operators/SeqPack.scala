package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget bins in a deterministic global order — the
  * concat-then-chunk packing step that turns a curated corpus into
  * training sequences.
  *
  * Built on a scale-safe global running total (the same two-pass
  * partition-offset technique as `RowOps.withSliceId`): range-partition
  * on the order key, collect per-partition totals (#partitions rows on
  * the driver — the only driver data), broadcast the offsets, then each
  * partition computes its local prefix sums independently. No
  * single-partition window anywhere; both shuffles are full-width.
  */
object SeqPack {

  /** `out` = exclusive running total of `weightCol` in `orderCol` order
    * (total of all STRICTLY EARLIER rows; first row gets 0).
    * Deterministic up to ties in `orderCol` — use a unique key.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, weightCol: String,
      out: String = "tokens_before"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: the offsets job and the output job must see the SAME
    // range bounds — RangePartitioner's reservoir sampling is seeded by
    // RDD id, so re-executing the exchange in a second job can shift
    // boundary rows into a different partition than the one their
    // offset was computed for
    val ranged = graft.core.CacheBin.track(df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // a null weight would NPE the totals collect (or worse, silently
    // null the affected rows' running totals and bin ids downstream):
    // fail fast inside the same job, no extra validation pass
    val checkedWeight = when(col(weightCol).isNull,
      raise_error(concat(lit(s"null $weightCol in running-total input at "),
        col(orderCol).cast("string")))).otherwise(col(weightCol))
    val totals = ranged
      .groupBy(col("__pid")).agg(sum(checkedWeight.cast("long")).as("__t"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2))
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), "__pid")
      .withColumn(out,
        col("__off") + sum(col(weightCol).cast("long")).over(w) - col(weightCol).cast("long"))
      .drop("__pid", "__off")
  }

  /** Pack rows into `budget`-token bins: bin = floor(tokens_before /
    * budget) — the concat-then-chunk assignment (a document belongs to
    * the bin where its first token lands). Emits the bin id and the
    * document's token offset within its bin.
    */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long): DataFrame =
    withRunningTotal(df, orderCol, weightCol)
      .withColumn("bin_id",
        floor(col("tokens_before").cast("double") / budget.toDouble).cast("long"))
      .withColumn("bin_offset", col("tokens_before") - col("bin_id") * budget)
}
