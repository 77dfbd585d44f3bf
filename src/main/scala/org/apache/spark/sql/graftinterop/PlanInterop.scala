package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}

/** `Dataset.ofRows` / the analyzed plan are `private[sql]` in Spark 4;
  * this shim exposes just enough to wrap a custom `LogicalPlan` node
  * around an existing DataFrame (see graft.plans.GroupedTopKNode).
  */
object PlanInterop {
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
