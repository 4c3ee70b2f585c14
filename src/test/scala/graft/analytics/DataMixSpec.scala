package graft.analytics

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Packing.takeByBudgetPerGroup: the grouped distributed prefix sum —
  * exactness against a per-group sequential reference, the
  * begins-before-the-cut take contract, and the scale shape (no
  * single-task funnel even when one group dominates the input). */
class DataMixSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper {

  test("per-group take equals the sequential reference; groups span " +
      "partitions; no SinglePartition exchange") {
    import spark.implicits._
    // group a: 12 rows of weight 3 (budget 10 -> starts 0,3,6,9 kept);
    // group b: one huge row first (kept, runs past the cut), rest start
    // past the budget; group c: all fits
    val rows =
      (0 until 12).map(i => ("a", i.toLong, 3L)) ++
        Seq(("b", 100L, 40L), ("b", 101L, 1L)) ++
        Seq(("c", 200L, 2L), ("c", 201L, 2L))
    val df = rows.toDF("g", "id", "w")
    val out = Packing.takeByBudgetPerGroup(df, groupCol = "g",
      orderCol = "id", weightCol = "w", budget = 10L, numPartitions = 5)
    val got = out.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("tok_start")).toMap
    assert(got === Map(
      0L -> 0L, 1L -> 3L, 2L -> 6L, 3L -> 9L, // a: 4 of 12 begin < 10
      100L -> 0L, // b: the huge first row begins at 0, overruns — kept
      200L -> 0L, 201L -> 2L)) // c: everything fits
    val singles = collectWithSubqueries(out.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singles.isEmpty,
      s"single-partition exchange in mixing plan:\n" +
        s"${out.queryExecution.executedPlan}")
  }

  test("result is invariant to the partition count") {
    import spark.implicits._
    val df = (0L until 300L)
      .map(i => (s"s${i % 4}", i, (i % 9) + 1)).toDF("g", "id", "w")
    def run(p: Int) = Packing
      .takeByBudgetPerGroup(df, "g", "id", "w", budget = 50L,
        numPartitions = p)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("tok_start"))
      .toMap
    assert(run(1) === run(4))
    assert(run(4) === run(16))
  }

  test("invalid weights fail loudly") {
    import spark.implicits._
    val neg = Seq(("a", 1L, 5L), ("a", 2L, -3L)).toDF("g", "id", "w")
    val e = intercept[Exception] {
      Packing.takeByBudgetPerGroup(neg, "g", "id", "w", budget = 10L)
        .collect()
    }
    assert(e.getMessage.contains("takeByBudgetPerGroup") ||
      Option(e.getCause).exists(
        _.getMessage.contains("takeByBudgetPerGroup")))
  }

  test("a NULL group fails loudly rather than silently vanishing") {
    import spark.implicits._
    // NULL != NULL at the offsets equi-join would drop the row with no
    // error — the guard must reject it before the window instead
    val df = Seq((Some("a"), 1L, 5L), (None, 2L, 5L))
      .toDF("g", "id", "w")
    val e = intercept[Exception] {
      Packing.takeByBudgetPerGroup(df, "g", "id", "w", budget = 10L)
        .collect()
    }
    assert(e.getMessage.contains("must be non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("must be non-null")))
  }
}
