package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphsSpec extends AnyFunSuite with SparkTestBase {

  private def ranksOf(edges: Seq[(String, String, Double)], iters: Int,
      damping: Double = 0.85): Map[String, Double] = {
    import spark.implicits._
    Graphs.pageRank(edges.toDF("src", "dst", "w"), iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric 2-cycle stays uniform at any damping") {
    val r = ranksOf(Seq(("a", "b", 1.0), ("b", "a", 1.0)), iters = 5)
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("rank mass is conserved with dangling nodes") {
    // c is dangling (no out-edges): its mass must redistribute, not leak
    val r = ranksOf(Seq(("a", "b", 1.0), ("b", "c", 1.0)), iters = 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass leaked: $r")
    assert(r("c") > r("a"), "sink of the chain must outrank its head")
  }

  test("one iteration matches the closed form") {
    // star: a -> b, a -> c with weights 3 and 1; b, c dangling.
    // r0 = 1/3 each; dangling mass = r(b)+r(c) = 2/3.
    // r1(b) = 0.15/3 + 0.85*(0.75*1/3 + (2/3)/3)
    val r = ranksOf(Seq(("a", "b", 3.0), ("a", "c", 1.0)), iters = 1)
    val tele = 0.15 / 3
    val dang = (2.0 / 3) / 3
    assert(math.abs(r("a") - (tele + 0.85 * dang)) < 1e-12)
    assert(math.abs(r("b") - (tele + 0.85 * (0.75 / 3 + dang))) < 1e-12)
    assert(math.abs(r("c") - (tele + 0.85 * (0.25 / 3 + dang))) < 1e-12)
  }

  test("weights steer rank: heavier in-edge wins") {
    val r = ranksOf(
      Seq(("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0),
        ("c", "a", 1.0)), iters = 6)
    assert(r("b") > r("c"))
  }
}
