package org.apache.spark.sql.graftvec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows` — needed to rebuild a
  * DataFrame after a logical-plan-level rewrite (the sqlite
  * integer-division transform in `graft.dialect.SqliteExec`). Lives
  * under `org.apache.spark.sql` for access, like the native expression
  * extensions in this package.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
