package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a planner extension needs: turning a
  * hand-built `LogicalPlan` into a `DataFrame`. Spark exposes hooks for
  * injecting strategies and rules (`SparkSessionExtensions`,
  * `experimental.extraStrategies`) but no public constructor FROM a
  * logical plan, so — like every OSS Spark extension that adds an
  * operator — this lives in a subpackage of `org.apache.spark.sql` to
  * reach `Dataset.ofRows`. Nothing else from the private surface is used.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
