package graft.analytics

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Packing.packByBudget: exactness of the distributed prefix sum against
  * a driver-side reference, the greedy-packing contract, and the scale
  * property that motivates it — no single-task global window anywhere. */
class PackingSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper {

  test("packByBudget equals a sequential reference and never plans a " +
      "SinglePartition exchange") {
    import spark.implicits._
    // weights chosen so shards straddle: budget 10, docs of varying size
    val weights = Seq(3L, 9L, 2L, 2L, 5L, 1L, 14L, 1L, 4L, 6L)
    val df = weights.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val out = Packing
      .packByBudget(df, orderCol = "id", weightCol = "w", budget = 10L,
        numPartitions = 4)
    val got = out.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("shard_id")).toMap
    // sequential reference: shard = floor(exclusive-prefix-sum / budget)
    val expected = weights.scanLeft(0L)(_ + _).init.map(_ / 10L)
    weights.indices.foreach { i =>
      assert(got(i.toLong) === expected(i), s"doc $i")
    }
    // shard ids are monotone in doc order (contiguous shards)
    val inOrder = out.orderBy(col("id")).collect()
      .map(_.getAs[Long]("shard_id"))
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a <= b })
    // the scale contract: no stage funnels the table onto one task
    val singles = collectWithSubqueries(out.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singles.isEmpty,
      s"single-partition exchange in packing plan:\n" +
        s"${out.queryExecution.executedPlan}")
  }

  test("tied order keys still pack sequentially (ROWS frame, not RANGE)") {
    import spark.implicits._
    // three tied rows of weight 6 under budget 10 must yield starts
    // 0/6/12 → shards 0,0,1 under ANY tie order (weights are symmetric).
    // The default RANGE frame hands each tied row the sum of ALL peers
    // (start 12,12,12 → shards 1,1,1) — the regression this pins.
    val df = Seq((1L, 6L), (1L, 6L), (1L, 6L)).toDF("id", "w")
    val shards = Packing
      .packByBudget(df, "id", "w", budget = 10L, numPartitions = 2)
      .collect().map(_.getAs[Long]("shard_id")).sorted
    assert(shards.toSeq === Seq(0L, 0L, 1L))
  }

  test("null and negative weights fail loudly (weightedPriority contract)") {
    import spark.implicits._
    val neg = Seq((1L, 5L), (2L, -3L)).toDF("id", "w")
    val eNeg = intercept[Exception] {
      Packing.packByBudget(neg, "id", "w", budget = 10L).collect()
    }
    assert(eNeg.getMessage.contains("packByBudget") ||
      Option(eNeg.getCause).exists(_.getMessage.contains("packByBudget")))
    val withNull = Seq((1L, Some(5L)), (2L, None))
      .toDF("id", "w")
    val eNull = intercept[Exception] {
      Packing.packByBudget(withNull, "id", "w", budget = 10L).collect()
    }
    assert(eNull.getMessage.contains("packByBudget") ||
      Option(eNull.getCause).exists(_.getMessage.contains("packByBudget")))
  }

  test("packing is invariant to the partition count") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i % 7) + 1)).toDF("id", "w")
    def run(p: Int) = Packing
      .packByBudget(df, "id", "w", budget = 25L, numPartitions = p)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("shard_id"))
      .toMap
    assert(run(1) === run(3))
    assert(run(3) === run(16))
  }
}
