package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RecurrenceSpec extends AnyFunSuite with SparkTestBase {

  /** Driver-side sequential fold — the definition. */
  private def foldEwma(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((acc, x) => alpha * x + (1.0 - alpha) * acc)

  private def randomKeyed(seed: Int, nKeys: Int, maxLen: Int)
      : Map[Long, Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    (0L until nKeys).map { k =>
      k -> Seq.fill(1 + rnd.nextInt(maxLen))(rnd.nextDouble() * 100 - 50)
    }.toMap
  }

  private def runEwma(data: Map[Long, Seq[Double]], alpha: Double,
      block: Int): Map[(Long, Int), Double] = {
    import spark.implicits._
    val rows = data.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, i) => (k, i, x) }
    }
    val df = rows.toDF("k", "i", "x").repartition(7)
    Recurrence.ewma(df, Seq("k"), Seq(col("i").asc), "x", alpha, block)
      .select(col("k"), col("i"), col("ewma")).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
  }

  test("equals the sequential fold on every row (keys spanning blocks)") {
    val data = randomKeyed(seed = 1, nKeys = 25, maxLen = 200)
    val got = runEwma(data, alpha = 0.2, block = 32)
    data.foreach { case (k, xs) =>
      val want = foldEwma(xs, 0.2)
      xs.indices.foreach { i =>
        assert(math.abs(got((k, i)) - want(i)) < 1e-9,
          s"key $k row $i: got ${got((k, i))}, want ${want(i)}")
      }
    }
  }

  test("block size is an implementation detail: 1, 7, 16, 32 agree") {
    // α=0.3: block ≤ 39 passes the 1e6 rescale guard (0.7^-38 ≈ 7.7e5)
    val data = randomKeyed(seed = 2, nKeys = 8, maxLen = 120)
    val runs = Seq(1, 7, 16, 32).map(b => runEwma(data, 0.3, b))
    val base = runs.head
    runs.tail.foreach { r =>
      base.foreach { case (kk, v) =>
        assert(math.abs(r(kk) - v) < 1e-9, s"row $kk across block sizes")
      }
    }
  }

  test("single-row keys: ewma is the value itself") {
    val data = Map(1L -> Seq(42.0), 2L -> Seq(-3.5))
    val got = runEwma(data, 0.5, 16)
    assert(got((1L, 0)) === 42.0)
    assert(got((2L, 0)) === -3.5)
  }

  test("ewmaBucketed equals plain ewma for any bucket width, gaps included") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // sparse, gappy timestamps: plenty of empty buckets at small widths
    val rows = (0L until 6L).flatMap { k =>
      (0 until 80).map { i =>
        (k, i * 37L + (k * 13) % 29, i, rnd.nextDouble() * 10 - 5)
      }
    }
    val df = rows.toDF("k", "ts", "i", "x").repartition(5)
    val plain = Recurrence
      .ewma(df, Seq("k"), Seq(col("ts").asc, col("i").asc), "x", 0.25)
      .select(col("k"), col("i"), col("ewma")).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    Seq(1L, 17L, 256L, 1000000L).foreach { w =>
      val bucketed = Recurrence
        .ewmaBucketed(df, Seq("k"), "ts",
          Seq(col("ts").asc, col("i").asc), "x", 0.25, bucket = w)
        .select(col("k"), col("i"), col("ewma")).collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
      assert(bucketed.size === plain.size)
      plain.foreach { case (kk, v) =>
        assert(math.abs(bucketed(kk) - v) < 1e-9,
          s"row $kk at bucket width $w")
      }
    }
  }

  test("precision guard rejects a block too deep for the decay rate") {
    import spark.implicits._
    val df = Seq((1L, 0, 1.0)).toDF("k", "i", "x")
    val err = intercept[IllegalArgumentException] {
      Recurrence.ewma(df, Seq("k"), Seq(col("i").asc), "x",
        alpha = 0.9, block = 32)
    }
    assert(err.getMessage.contains("precision guard"))
  }

  test("guard enforces the documented bound: α=0.5/block=32 rejected " +
      "(rescale 2^31 would admit ~1e-4 error), α=0.5/block=16 accurate") {
    import spark.implicits._
    val df = Seq((1L, 0, 1.0)).toDF("k", "i", "x")
    val err = intercept[IllegalArgumentException] {
      Recurrence.ewma(df, Seq("k"), Seq(col("i").asc), "x",
        alpha = 0.5, block = 32)
    }
    assert(err.getMessage.contains("precision guard"))

    // block=16: rescale 2^15 ≈ 3.3e4 passes the 1e6 guard, and the
    // result must meet the scaladoc's ~1e-10-of-value-scale bound
    // (values here are |x| ≤ 50, so 1e-10 absolute is the claim tested).
    val data = randomKeyed(seed = 5, nKeys = 10, maxLen = 150)
    val got = runEwma(data, alpha = 0.5, block = 16)
    data.foreach { case (k, xs) =>
      val want = foldEwma(xs, 0.5)
      xs.indices.foreach { i =>
        assert(math.abs(got((k, i)) - want(i)) < 1e-10,
          s"key $k row $i: got ${got((k, i))}, want ${want(i)}")
      }
    }
  }

  test("plan: no cartesian product; spine join keyed on (key, block)") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (i % 5L, i, i * 0.25))
    val df = rows.toDF("k", "i", "x")
    val out = Recurrence.ewma(df, Seq("k"), Seq(col("i").asc), "x", 0.2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(out.count() === 500)
  }
}
