package graft.gen

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GeneratorSpec extends AnyFunSuite with SparkTestBase {

  test("samples respect truncation bounds and are deterministic per seed") {
    val df = Generator.sample(spark, 2000, partitions = 4, seed = 7).cache()
    val viol = df.where((0 until 6).map(i =>
      col(s"a$i") < -0.1 || col(s"a$i") > 0.1).reduce(_ || _)).count()
    assert(viol === 0)
    assert(df.count() === 2000)
    val again = Generator.sample(spark, 2000, partitions = 4, seed = 7)
    val h1 = df.agg(sum(col("a0")), sum(col("a3"))).head()
    val h2 = again.agg(sum(col("a0")), sum(col("a3"))).head()
    assert(h1.getDouble(0) === h2.getDouble(0))
    assert(h1.getDouble(1) === h2.getDouble(1))
    df.unpersist()
  }

  test("population statistics close to the reference stats.csv thresholds") {
    // Reference stats (dataGeneration/stats.csv): means ~1e-4, q10 ~ -0.0799
    // (near-uniform within the ±0.1 box since sd >> box width).
    val df = Generator.sample(spark, 20000, partitions = 8, seed = 42).cache()
    val thr = PopulationStats.thresholds(df).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(thr.size === 42)
    for (a <- 0 until 6) {
      assert(math.abs(thr(("mean", a))) < 0.005, s"mean asset $a = ${thr(("mean", a))}")
      assert(math.abs(thr(("10th quantile", a)) - (-0.0799)) < 0.005,
        s"q10 asset $a = ${thr(("10th quantile", a))}")
      // tail mean of a near-uniform(-0.1,0.1): mean of lowest decile ≈ -0.09
      assert(math.abs(thr(("mean of 10% smallest", a)) - (-0.09)) < 0.005)
      assert(thr(("security measure 1", a)) < thr(("mean", a)))
      assert(thr(("security measure 2", a)) > 0) // gmd is a positive spread
    }
    // portfolio series is a weighted combination → tighter spread
    assert(thr(("security measure 2", 6)) < thr(("security measure 2", 0)))
    df.unpersist()
  }

  test("PopulationStats on a tiny hand-computed table") {
    import spark.implicits._
    // single asset values 1..10 in a0, zeros elsewhere
    val df = (1 to 10).map(v =>
      (v.toDouble, 0.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("a0", "a1", "a2", "a3", "a4", "a5")
    val thr = PopulationStats.thresholds(df).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(thr(("mean", 0)) === 5.5)
    assert(thr(("median", 0)) === 5.5)
    assert(math.abs(thr(("10th quantile", 0)) - 1.9) < 1e-12)
    assert(thr(("mean of 10% smallest", 0)) === 1.0)
    assert(math.abs(thr(("security measure 1", 0)) - (5.5 - 1.25)) < 1e-12)
    // unbiased gmd of 1..10: 2*165/(10*9) = 11/3
    assert(math.abs(thr(("security measure 2", 0)) - 11.0 / 3) < 1e-12)
  }
}
