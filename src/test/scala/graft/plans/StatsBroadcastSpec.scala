package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The point of StatsBroadcastRule is the A/B PLAN FLIP: the same join
  * that sort-merges without statistics must broadcast its filtered side
  * once TableStats carries the ANALYZE output — and produce identical
  * rows either way. The shared test session predates extension
  * injection, so the rule rides `spark.experimental.extraOptimizations`
  * here (the same optimizer extension point; Verify/Bench/DevRunner get
  * it through GraftExtensions.injectOptimizerRule). The native broadcast
  * threshold is pinned to 1 KB so Spark itself never flips the join —
  * every BroadcastHashJoin in these tests is the rule's doing. */
class StatsBroadcastSpec extends AnyFunSuite with SparkTestBase
    with AdaptiveSparkPlanHelper with BeforeAndAfterAll {

  private val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_statsbc_")
    d.toFile.deleteOnExit()
    d
  }
  private def factsPath = dir.resolve("facts.parquet").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    // deterministic: 40k rows, grp has NDV 100, v spreads over [0, 100)
    (0L until 40000L)
      .map(i => (i, i % 100, (i * 37 % 1000) / 10.0))
      .toDF("id", "grp", "v")
      .write.mode("overwrite").parquet(factsPath)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ StatsBroadcastRule(spark)
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[StatsBroadcastRule])
    TableStats.clear()
    super.afterAll()
  }

  private def facts: DataFrame = spark.read.parquet(factsPath)

  private def analyzeFacts(): Unit =
    TableStats.analyze(facts, factsPath, Seq("grp", "v"))

  private def joinKinds(df: DataFrame): (Int, Int) = {
    df.collect() // force execution so AQE finalizes the plan
    val p = df.queryExecution.executedPlan
    (collectWithSubqueries(p) { case b: BroadcastHashJoinExec => b }.size,
      collectWithSubqueries(p) { case s: SortMergeJoinExec => s }.size)
  }

  private def withPinnedConfs(body: => Unit): Unit = {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.conf.unset("spark.graft.statsBroadcastJoin.threshold")
      spark.conf.unset("spark.graft.statsBroadcastJoin.enabled")
      TableStats.clear()
    }
  }

  private def selectiveJoin: DataFrame = {
    val hot = facts.where(col("grp") === 7)
      .select(col("id").as("hid"), col("v").as("hv"))
    // sum rounded: SMJ and BHJ accumulate the doubles in different orders
    facts.join(hot, col("id") === col("hid"))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"),
        round(sum(col("hv")), 6).as("sv"))
  }

  test("equality filter: stats flip the join SMJ -> BHJ, rows identical") {
    withPinnedConfs {
      TableStats.clear()
      val (bhj0, smj0) = joinKinds(selectiveJoin)
      assert(bhj0 == 0 && smj0 == 1,
        s"without stats the join must sort-merge (bhj=$bhj0 smj=$smj0)")
      val before = selectiveJoin.collect().map(_.toSeq).toSet

      analyzeFacts()
      val (bhj1, smj1) = joinKinds(selectiveJoin)
      assert(bhj1 == 1 && smj1 == 0,
        s"with stats the filtered side must broadcast (bhj=$bhj1 smj=$smj1)")
      val after = selectiveJoin.collect().map(_.toSeq).toSet
      assert(after == before, "the rewritten plan must be lossless")
    }
  }

  test("octile ranges gate the hint: dense filter stays SMJ, sparse flips") {
    withPinnedConfs {
      analyzeFacts()
      // rule threshold 64 KB: the full table (40k rows) estimates past it,
      // a ~2% tail (v >= 98) estimates far under it
      spark.conf.set("spark.graft.statsBroadcastJoin.threshold", "65536")
      def join(filter: org.apache.spark.sql.Column): DataFrame = {
        val side = facts.where(filter)
          .select(col("id").as("hid"), col("v").as("hv"))
        facts.join(side, col("id") === col("hid"))
          .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      }
      val (bhjDense, smjDense) = joinKinds(join(col("v") >= 0.0))
      assert(bhjDense == 0 && smjDense == 1,
        "a non-selective range must not be hinted at a 64 KB threshold")
      val (bhjSparse, smjSparse) = joinKinds(join(col("v") >= 98.0))
      assert(bhjSparse == 1 && smjSparse == 0,
        "the histogram must price the sparse tail under the threshold")
    }
  }

  test("join-type safety: a left-outer join never broadcasts its left side") {
    withPinnedConfs {
      analyzeFacts()
      // 64 KB rule threshold: the small LEFT side qualifies by size, the
      // full right side does not — so the only possible hint is the left
      // one the join type must forbid
      spark.conf.set("spark.graft.statsBroadcastJoin.threshold", "65536")
      val small = facts.where(col("grp") === 3)
        .select(col("id").as("hid"))
      val joined = small.join(facts, col("hid") === col("id"), "left_outer")
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      val (bhj, smj) = joinKinds(joined)
      assert(bhj == 0 && smj == 1,
        s"left side of a left-outer join must not broadcast (bhj=$bhj)")
    }
  }

  test("kill switch: spark.graft.statsBroadcastJoin.enabled=false") {
    withPinnedConfs {
      analyzeFacts()
      spark.conf.set("spark.graft.statsBroadcastJoin.enabled", "false")
      val (bhj, smj) = joinKinds(selectiveJoin)
      assert(bhj == 0 && smj == 1)
    }
  }

  test("histFraction interpolates the equi-depth octiles") {
    val rule = StatsBroadcastRule(spark)
    val bounds = Array(0.0, 1, 2, 3, 4, 5, 6, 7, 8.0)
    assert(rule.histFraction(bounds, -1.0) == 0.0)
    assert(rule.histFraction(bounds, 9.0) == 1.0)
    assert(math.abs(rule.histFraction(bounds, 4.0) - 0.5) < 1e-12)
    assert(math.abs(rule.histFraction(bounds, 4.5) - 0.5625) < 1e-12)
    // degenerate (constant) bucket boundaries must not divide by zero
    val flat = Array(0.0, 0, 0, 0, 4, 5, 6, 7, 8.0)
    val f = rule.histFraction(flat, 0.0)
    assert(f >= 0.0 && f <= 1.0)
  }
}
