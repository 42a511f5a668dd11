package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the 100 TB fact-to-fact join path: write
  * both sides bucketed (and sorted) by the join keys, and equi-joins
  * between them need NO shuffle at read time — each task sort-merges
  * bucket i against bucket i. This is the pre-partitioning story for
  * joins too big to broadcast and too hot to reshuffle per query.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Bucket count should
    * divide evenly into cluster cores at the target scale.
    *
    * The in-memory catalog dies with the session but the warehouse
    * directory does not, so Overwrite alone hits LOCATION_ALREADY_EXISTS
    * on the next session — drop the table AND clear any stale location.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val stale = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(stale)) fs.delete(stale, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** True when a physical plan string contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
