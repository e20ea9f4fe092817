package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal `private[sql]` bridge: construct a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is private[sql]; extension libraries
  * conventionally reach it from an `org.apache.spark.sql` subpackage).
  * Nothing else from the internal API is exposed.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
