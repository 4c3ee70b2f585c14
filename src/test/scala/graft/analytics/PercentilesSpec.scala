package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Percentiles.profile must reproduce Spark's built-in exact aggregates
  * BIT-FOR-BIT — it replaces percentile()/count_distinct in registered,
  * hash-gated queries (q51, q183, TableStats/q190), so "close" is not
  * good enough: the interpolation `(higher−pos)·lk + (pos−lower)·hk`
  * must be the identical double arithmetic. Inputs deliberately mix
  * heavy ties (NDV 3), high NDV, singleton groups, and positions that
  * land exactly on / between order statistics. (NaN and −0.0 are
  * excluded: group-by normalization vs the aggregate's raw-key map
  * already disagree on those upstream of this module, and no registered
  * data contains them.) */
class PercentilesSpec extends AnyFunSuite with SparkTestBase {

  private val ps = Seq(0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875,
    0.9, 0.99, 1.0)

  private def check(rows: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val expected = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), countDistinct(col("v")).as("ndv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        percentile(col("v"), array(ps.map(lit): _*)).as("pcts"))
      .collect()
      .map(r => r.getString(0) -> (
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getSeq[Double](4 + 1)))
      .toMap
    val got = Percentiles.profile(df, "g", "v", ps).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val g = r.getString(0)
      val (n, ndv, mn, mx, pcts) = expected(g)
      assert(r.getLong(1) == n, s"n mismatch for $g")
      assert(r.getLong(2) == ndv, s"ndv mismatch for $g")
      assert(r.getDouble(3) == mn, s"min mismatch for $g")
      assert(r.getDouble(4) == mx, s"max mismatch for $g")
      ps.indices.foreach { i =>
        val gv = r.getDouble(5 + i)
        // exact double equality — bit-identical, not approximate
        assert(gv == pcts(i),
          s"pct ${ps(i)} mismatch for $g: got $gv want ${pcts(i)}")
      }
    }
  }

  test("tie-heavy, high-NDV, singleton and two-value groups match " +
      "the built-in bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val ties = (1 to 997).map(_ =>
      ("ties", Seq(1.5, 2.25, -3.0)(rnd.nextInt(3))))
    val high = (1 to 1003).map(_ => ("high", rnd.nextDouble() * 1e6 - 5e5))
    val longish = (1 to 500).map(_ => ("long", rnd.nextInt(100).toDouble))
    val single = Seq(("one", 7.125))
    val pair = Seq(("two", 1.0), ("two", 2.0))
    val negs = (1 to 64).map(i => ("negs", -i * 0.1))
    check(ties ++ high ++ longish ++ single ++ pair ++ negs)
  }

  test("null values are excluded exactly as the built-in excludes them") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("g", 1.0), ("g", null), ("g", 3.0), ("g", null), ("g", 2.0))
      .toDF("g", "v")
    val exp = df.agg(percentile(col("v"), array(lit(0.5))).as("p"))
      .head().getSeq[Double](0).head
    val got = Percentiles.profile(df, "g", "v", Seq(0.5)).head()
    assert(got.getLong(1) == 3L) // __n counts non-null only
    assert(got.getDouble(5) == exp)
  }

  test("TableStats.analyze melt path yields the original aggregate's " +
      "stats on the StatsBroadcastSpec-shaped table") {
    import spark.implicits._
    val facts = (0L until 4000L)
      .map(i => (i, i % 100, (i * 37 % 1000) / 10.0))
      .toDF("id", "grp", "v")
    val qs = "array(0.0d,0.125d,0.25d,0.375d,0.5d,0.625d,0.75d,0.875d,1.0d)"
    val exp = facts.agg(count(lit(1)).as("n"),
        count_distinct(col("grp")).as("ndv_g"),
        expr(s"percentile(grp, $qs)").as("h_g"),
        count_distinct(col("v")).as("ndv_v"),
        expr(s"percentile(v, $qs)").as("h_v"))
      .head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_pct_")
    tmp.toFile.deleteOnExit()
    val p = tmp.resolve("facts.parquet").toString
    facts.write.mode("overwrite").parquet(p)
    val stats = graft.plans.TableStats.analyze(
      spark.read.parquet(p), p, Seq("grp", "v"))
    try {
      assert(stats.rows == exp.getAs[Long]("n"))
      assert(stats.cols("grp").ndv == exp.getAs[Long]("ndv_g"))
      assert(stats.cols("v").ndv == exp.getAs[Long]("ndv_v"))
      assert(stats.cols("grp").bounds.toSeq ==
        exp.getSeq[Double](exp.fieldIndex("h_g")).toSeq)
      assert(stats.cols("v").bounds.toSeq ==
        exp.getSeq[Double](exp.fieldIndex("h_v")).toSeq)
    } finally graft.plans.TableStats.clear()
  }
}
