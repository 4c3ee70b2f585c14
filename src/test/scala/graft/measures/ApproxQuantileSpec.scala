package graft.measures

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Registry

/** q70's contract (no DuckDB oracle — sketch internals differ across
  * engines, like q43's HLL): every approximate quantile lands between the
  * EXACT quantiles at p ± 1% rank tolerance — far looser than the
  * sketch's configured 1/10000 rank error, so this bounds correctness
  * without over-fitting the sketch implementation. */
class ApproxQuantileSpec extends AnyFunSuite with SparkTestBase {

  private def check(dir: String): Unit = {
    val approx = Registry.byName("q70_approx_quantiles").run(spark, dir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ps = Seq(0.5, 0.9, 0.99)
    val bounds = graft.queries.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(ps.flatMap(p =>
          Seq(lit(math.max(0.0, p - 0.01)), lit(math.min(1.0, p + 0.01))))
          .toIndexedSeq: _*)).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet === bounds.keySet)
    for ((flag, vals) <- approx; (v, i) <- vals.zipWithIndex) {
      val (lo, hi) = (bounds(flag)(2 * i), bounds(flag)(2 * i + 1))
      assert(v >= lo && v <= hi,
        s"$dir $flag p=${ps(i)}: approx $v outside exact rank band [$lo, $hi]")
    }
  }

  test("approx quantiles within 1% rank of exact at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("approx quantiles within 1% rank of exact at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
