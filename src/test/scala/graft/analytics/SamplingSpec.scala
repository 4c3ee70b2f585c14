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
}
