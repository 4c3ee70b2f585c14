package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Hive-style partitioned parquet sink + partition pruning on read-back:
  * a filter on the partition column must prune directories at planning
  * time (partitionFilters on the scan), not read-and-discard. */
class PartitionedWriteSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper {

  test("partitioned write prunes partitions on read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$dir/events_by_type")

    val back = spark.read.parquet(s"$dir/events_by_type")
      .where(col("event_type") === "click")
    val scans = collectWithSubqueries(back.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "event_type filter must be a partition filter, not a data filter")
    // and no residual data filter remains for the partition column
    assert(!scan.dataFilters.exists(_.references.exists(
      _.name == "event_type")))

    // values survive the round trip
    val expected = events.where(col("event_type") === "click").count()
    assert(back.count() === expected && expected > 0)
  }
}
