package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QuantileGateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4),
    ("a", 5L, 0.5), ("a", 6L, 0.6), ("a", 7L, 0.7), ("a", 8L, 0.8),
    ("b", 9L, 0.9), ("b", 10L, 0.05)
  ).toDF("source", "id", "score")

  test("drops exactly floor(frac*n) lowest rows per group (no ties)") {
    val kept = Sampling.perGroupQuantileGate(docs, "source", "score", 0.25)
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    // group a: n=8, thr = 3rd smallest = 0.3 → drops ids 1,2
    // group b: n=2, thr = 1st smallest (floor(0.5)+1=1) → drops none
    assert(ids === Set(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
    val thrs = kept.select("source", "thr").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(thrs === Map("a" -> 0.3, "b" -> 0.05))
  }

  test("score ties AT the threshold all survive") {
    val tied = Seq(("g", 1L, 0.5), ("g", 2L, 0.5), ("g", 3L, 0.5),
      ("g", 4L, 0.9)).toDF("source", "id", "score")
    // n=4, k=floor(1)+1=2 → thr = 0.5; every 0.5 row survives
    val kept = Sampling.perGroupQuantileGate(tied, "source", "score", 0.25)
    assert(kept.count() === 4)
  }

  test("frac=0 keeps everything (thr = group minimum)") {
    val kept = Sampling.perGroupQuantileGate(docs, "source", "score", 0.0)
    assert(kept.count() === docs.count())
  }

  test("the threshold is always an element of the group's multiset") {
    val kept = Sampling.perGroupQuantileGate(docs, "source", "score", 0.6)
    val scores = docs.select("score").collect().map(_.getDouble(0)).toSet
    kept.select("thr").distinct().collect()
      .foreach(r => assert(scores.contains(r.getDouble(0))))
  }

  test("NULL score fails loudly instead of vanishing") {
    val withNull = Seq(("a", Some(0.5)), ("a", None))
      .toDF("source", "score")
    val e = intercept[Exception] {
      Sampling.perGroupQuantileGate(withNull, "source", "score", 0.25)
        .collect()
    }
    assert(e.getMessage.contains("perGroupQuantileGate"))
  }

  test("frac outside [0,1) is rejected") {
    intercept[IllegalArgumentException] {
      Sampling.perGroupQuantileGate(docs, "source", "score", 1.0)
    }
  }
}
