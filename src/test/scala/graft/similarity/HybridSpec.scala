package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HybridSpec extends AnyFunSuite with SparkTestBase {

  private def fuse(lists: Seq[Seq[(Long, Int)]], k0: Int = 60)
      : Map[Long, (Double, Long)] = {
    import spark.implicits._
    Hybrid.rrf(lists.map(_.toDF("doc_id", "rank")), k0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
  }

  test("rrf sums 1/(k0+rank) across lists, rounded to 6") {
    val m = fuse(Seq(Seq(1L -> 1, 2L -> 2), Seq(2L -> 1, 3L -> 2)))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(m(1L) == ((r6(1.0 / 61), 1L)))
    assert(m(2L) == ((r6(1.0 / 62 + 1.0 / 61), 2L)))
    assert(m(3L) == ((r6(1.0 / 62), 1L)))
  }

  test("a doc missing from one list contributes nothing from it") {
    val m = fuse(Seq(Seq(5L -> 3), Seq.empty))
    assert(m.keySet == Set(5L) && m(5L)._2 == 1L)
  }

  test("k0 shifts every denominator") {
    val m = fuse(Seq(Seq(9L -> 1)), k0 = 10)
    assert(m(9L)._1 == math.round(1e6 / 11.0) / 1e6)
  }

  test("rejects an empty list set and a non-positive k0") {
    import spark.implicits._
    intercept[IllegalArgumentException] { Hybrid.rrf(Seq.empty) }
    intercept[IllegalArgumentException] {
      Hybrid.rrf(Seq(Seq((1L, 1)).toDF("doc_id", "rank")), k0 = 0)
    }
  }
}
