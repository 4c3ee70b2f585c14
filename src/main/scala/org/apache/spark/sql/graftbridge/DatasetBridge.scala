package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge.
  *
  * `classic.Dataset.ofRows` is `private[sql]` in Spark 4; this one-file
  * subpackage re-exports exactly that conversion for
  * `graft.analytics.Graphs.flatCheckpoint`, which rewraps a
  * localCheckpoint'd LogicalRDD WITHOUT its origin statistics (the
  * preserved `sizeInBytes` otherwise compounds multiplicatively through
  * join estimation across checkpoint generations — see flatCheckpoint's
  * scaladoc for the measured blowup). Same technique and rationale as
  * [[ColumnBridge]].
  */
object DatasetBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
}
