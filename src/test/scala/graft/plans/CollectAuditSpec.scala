package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unit gate for [[CollectAudit]]'s mechanism: the deliberately-
  * UNBOUNDED fixture (a corpus-sized collect) must flag, the bounded
  * shapes (k-sized aggregate, top-k limit) must report their true
  * small counts, and scalar actions (count) must not appear at all.
  * The registry-wide sweep lives in CollectBoundSpec. */
class CollectAuditSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("a corpus-sized collect is seen at its full row count — the " +
      "unbounded fixture the gate exists to catch") {
    val corpus = spark.range(50000).select(col("id"),
      (col("id") % 7).as("k"))
    val (_, events) = CollectAudit.watching(spark) {
      // the defect shape: driver-side iteration over a corpus-sized
      // result (what a non-distributed operator looks like)
      corpus.collect()
    }
    val rows = events.map(_.rows)
    assert(rows.exists(_ >= 50000L),
      s"the corpus-sized collect must be visible at full volume: $events")
  }

  test("bounded shapes report their true small counts: k-sized " +
      "aggregates and top-k limits") {
    val corpus = spark.range(50000).select(col("id"),
      (col("id") % 7).as("k"))
    val (_, events) = CollectAudit.watching(spark) {
      corpus.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
      corpus.orderBy(col("id").desc).limit(12).collect()
    }
    assert(events.size === 2, s"expected exactly two events: $events")
    assert(events.forall(e => e.rows >= 0L && e.rows <= 12L),
      s"bounded collects must report bounded counts: $events")
  }

  test("a metric-less Union root reports the SUM of its branches, not " +
      "the first branch (the r17 advisor's under-count)") {
    val a = spark.range(3000).toDF("id")
    val b = spark.range(2500).toDF("id")
    val (_, events) = CollectAudit.watching(spark) {
      a.unionAll(b).collect()
    }
    assert(events.nonEmpty &&
      events.exists(e => e.rows === 5500L || e.rows === -1L),
      s"a union delivering 5500 rows must not be credited as one " +
        s"branch: $events")
    assert(!events.exists(e => e.rows > 0 && e.rows < 5500L),
      s"under-counted union delivery: $events")
  }

  test("scalar actions (count) do not register as collects") {
    val corpus = spark.range(10000).toDF("id")
    val (_, events) = CollectAudit.watching(spark) {
      corpus.count()
    }
    assert(events.isEmpty, s"count must not flag: $events")
  }
}
