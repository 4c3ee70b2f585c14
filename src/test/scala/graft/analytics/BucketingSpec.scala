package graft.analytics

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The point of storage bucketing is the PLAN: a join of two tables
  * bucketed on their join keys with equal bucket counts must run with
  * ZERO shuffle exchanges — and, of course, the same rows as the plain
  * join. Broadcast is disabled for the plan assertion so the sort-merge
  * path (the one a fact⋈fact join takes at scale) is what's pinned. */
class BucketingSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper {

  private def tmp(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_buckspec_")
    d.toFile.deleteOnExit()
    d
  }

  private def writePair(): Unit = {
    import spark.implicits._
    val base = tmp()
    val left = (1L to 500L).map(k => (k, s"s${k % 7}")).toDF("k", "tag")
    val right = (1L to 2000L).map(i => (i % 600 + 1, i * 1.5))
      .toDF("k2", "v")
    Bucketing.writeBucketed(left, "bspec_left",
      base.resolve("l").toString, "k", 4)
    Bucketing.writeBucketed(right, "bspec_right",
      base.resolve("r").toString, "k2", 4)
  }

  test("bucketed join: zero exchanges, bucketed scans, same rows") {
    writePair()
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bspec_left",
          "bspec_right", "k", "k2")
        .groupBy(col("tag")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
      val got = joined.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap

      val p = joined.queryExecution.executedPlan
      val scans = collectWithSubqueries(p) {
        case s: FileSourceScanExec => s
      }
      assert(scans.size == 2)
      assert(scans.forall(_.bucketedScan),
        s"expected both scans bucketed:\n$p")
      // the aggregation reuses the bucket partitioning too: the ONLY
      // exchange allowed is the one feeding the final groupBy on `tag`
      val shuffles = collectWithSubqueries(p) {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.size == 1,
        s"join must not shuffle; only the tag rollup may:\n$p")

      // row parity with the plain (non-bucketed) join
      import spark.implicits._
      val left = (1L to 500L).map(k => (k, s"s${k % 7}")).toDF("k", "tag")
      val right = (1L to 2000L).map(i => (i % 600 + 1, i * 1.5))
        .toDF("k2", "v")
      val want = left.join(right, col("k") === col("k2"))
        .groupBy(col("tag")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, (n, sv)) =>
        assert(n == want(k)._1)
        assert(math.abs(sv - want(k)._2) < 1e-6)
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("rewrite replaces the catalog entry and the data") {
    import spark.implicits._
    val base = tmp()
    Bucketing.writeBucketed((1L to 10L).toDF("k"), "bspec_rw",
      base.resolve("a").toString, "k", 2)
    Bucketing.writeBucketed((1L to 3L).toDF("k"), "bspec_rw",
      base.resolve("b").toString, "k", 2)
    assert(spark.table("bspec_rw").count() == 3)
  }
}
