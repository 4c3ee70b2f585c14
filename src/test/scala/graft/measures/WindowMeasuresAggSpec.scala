package graft.measures

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WindowMeasuresAggSpec extends AnyFunSuite with SparkTestBase {

  test("groupBy: one-pass aggregator equals the reference mirror") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = (0 until 60).map(i => (i / 30, rnd.nextDouble() * 10 - 5))
    val df = data.toDF("k", "v")
    val got = df.groupBy(col("k"))
      .agg(WindowMeasuresAgg.column(col("v"), n = 30).as("ms"))
      .select(col("k"), col("ms.*")).collect()
      .map(r => r.getInt(0) -> r).toMap
    for (k <- 0 to 1) {
      val xs = data.filter(_._1 == k).map(_._2).toArray
      val exp = MeasuresRef.all(xs).toMap
      val r = got(k)
      assert(math.abs(r.getDouble(1) - exp(Measures.Mean)) < 1e-9)
      assert(math.abs(r.getDouble(2) - exp(Measures.Median)) < 1e-9)
      assert(math.abs(r.getDouble(6) - exp(Measures.Sm2)) < 1e-9)
    }
  }

  test("window frame: aggregator over rowsBetween matches expression path") {
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    val data = (0 until 40).map(i => (1L, i.toLong, rnd.nextDouble()))
    val df = data.toDF("key", "seq", "v")
    val w = Window.partitionBy(col("key")).orderBy(col("seq"))
      .rowsBetween(-29, 0)
    val wo = Window.partitionBy(col("key")).orderBy(col("seq"))
    val got = df
      .withColumn("ms", WindowMeasuresAgg.column(col("v"), n = 30).over(w))
      .withColumn("rn", row_number().over(wo))
      .where(col("rn") >= 30)
      .select(col("seq"), col("ms.mean"), col("ms.sm2"))
      .collect()
    assert(got.length === 11)
    val vs = data.map(_._3).toArray
    got.foreach { r =>
      val s = r.getLong(0).toInt
      val exp = MeasuresRef.all(vs.slice(s - 29, s + 1)).toMap
      assert(math.abs(r.getDouble(1) - exp(Measures.Mean)) < 1e-9, s"seq $s mean")
      assert(math.abs(r.getDouble(2) - exp(Measures.Sm2)) < 1e-9, s"seq $s sm2")
    }
  }
}
