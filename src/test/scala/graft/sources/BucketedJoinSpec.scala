package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketing: the pre-shuffle that makes repeated big-big joins free.
  * Both sides written bucketed by the join key → the join plans with NO
  * ShuffleExchange (co-located partitions), which at 100 TB is the
  * difference between one shuffle at write time and one per query. */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.queries.Tables(spark, "/root/testdata/sf0.001", "orders")
      val lineitem = graft.queries.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      // external tables at explicit paths (warehouse dir is a static conf)
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/orders_bkt")
        .saveAsTable("orders_bkt")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/lineitem_bkt")
        .saveAsTable("lineitem_bkt")

      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))

      val exec = joined.queryExecution.executedPlan
      val joinShuffles = collectWithSubqueries(exec) {
        case e: ShuffleExchangeExec => e
      }
      // exactly ONE exchange (the final groupBy); the join itself is
      // shuffle-free because both scans expose the bucket partitioning
      assert(joinShuffles.size === 1,
        s"expected only the aggregation exchange, got:\n$exec")

      // and the result matches the unbucketed join
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      val a = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val b = plain.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(a === b)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
