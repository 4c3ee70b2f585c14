package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Weighted-priority sampling contract: deterministic, and inclusion
  * tracks weight (the A-ES guarantee). */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  test("weightedPriority is a pure function of (id, salt, weight)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i <= 50) 10.0 else 0.1))
      .toDF("id", "w")
    val a = Sampling.weightedPriority(df, "id", "w", k = 60)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedPriority(df, "id", "w", k = 60)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("heavy weights dominate the sample; a new salt reshuffles") {
    import spark.implicits._
    // 50 rows at weight 10 vs 450 at weight 0.1: a heavy row's priority
    // u^(1/10) crowds out u^(1/0.1) almost surely
    val df = (1L to 500L).map(i => (i, if (i <= 50) 10.0 else 0.1))
      .toDF("id", "w")
    val picked = Sampling.weightedPriority(df, "id", "w", k = 60)
      .collect().map(_.getLong(0)).toSet
    val heavy = picked.count(_ <= 50L)
    assert(heavy >= 45, s"only $heavy of 50 heavy rows sampled")
    val other = Sampling.weightedPriority(df, "id", "w", k = 60, salt = "s2")
      .collect().map(_.getLong(0)).toSet
    assert(picked !== other) // independent draw under a different salt
  }

  test("temperatureWeights: alpha=1 proportional, alpha=0 uniform, " +
      "alpha=0.3 lifts the low-resource group; allocations sum ~1e6") {
    import spark.implicits._
    val df = Seq(("a", 900L), ("a", 100L), ("b", 100L), ("c", 10L))
      .toDF("src", "sz")
    def w(alpha: Double) = Sampling.temperatureWeights(df, "src", "sz", alpha)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val prop = w(1.0)
    assert(prop("a")._1 === 1000L)
    assert(math.abs(prop("a")._2 - 1000.0 / 1110) < 1e-5)
    val unif = w(0.0)
    assert(unif.values.forall(v => math.abs(v._2 - 1.0 / 3) < 1e-5))
    val t = w(0.3)
    // temperature compresses the ratio: a/c size ratio 100x -> weight
    // ratio 100^0.3 ~ 3.98x
    assert(math.abs(t("a")._2 / t("c")._2 - math.pow(100, 0.3)) < 1e-3)
    assert(math.abs(t.values.map(_._3).sum - 1000000L) <= 3,
      "ppm allocations must sum to ~1e6")
  }
}
