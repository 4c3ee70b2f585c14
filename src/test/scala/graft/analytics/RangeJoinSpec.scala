package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  test("matches exactly the containing intervals, once each") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 29L), (4L, 30L), (5L, 31L))
      .toDF("pid", "p")
    val ivs = Seq((100L, 10L, 30L), (200L, 28L, 99L)).toDF("iid", "lo", "hi")
    // bucket width 7 deliberately misaligned with every bound
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 7)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 100L), (3L, 100L), (4L, 100L), (3L, 200L),
      (4L, 200L), (5L, 200L)))
  }

  test("bucket width does not change the result, only the plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "p")
    val ivs = Seq.tabulate(30) { i =>
      val lo = rnd.nextInt(900).toLong
      (i.toLong, lo, lo + rnd.nextInt(120).toLong)
    }.toDF("iid", "lo", "hi")
    def run(w: Long) =
      RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", w)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(1000) // one bucket: effectively the naive join
    assert(run(7) == base && run(64) == base && run(1) == base)
  }

  test("keys scope the containment test") {
    import spark.implicits._
    val points = Seq((1L, 50L, "a"), (2L, 50L, "b")).toDF("pid", "p", "k")
    val ivs = Seq((9L, 0L, 100L, "a")).toDF("iid", "lo", "hi", "k")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 10L,
        keyCols = Seq("k"))
      .select(col("pid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("an inverted interval fails loudly; a column collision is rejected") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val bad = Seq((1L, 30L, 10L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, bad, "p", "lo", "hi", 7).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points,
        Seq((1L, 1L, 2L)).toDF("pid", "lo", "hi"), "p", "lo", "hi", 7)
    }
  }
}
