package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.AsofJoin

class StreamingAsofSpec extends AnyFunSuite with SparkTestBase {

  test("broadcast-index attach equals AsofJoin.asof on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val left = Seq.tabulate(400)(i => (i.toLong,
      rnd.nextInt(8).toLong, rnd.nextInt(2000).toLong)).toDF("id", "user", "ts")
    val right = Seq.tabulate(120)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(2000).toLong, i / 7.0))
      .toDF("user", "ts", "v")
      .groupBy("user", "ts").agg(max("v").as("v"))
    def toMap(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any](c))).toMap
    val expected = toMap(
      AsofJoin.asof(left, right, Seq("user"), "ts", Seq("v")), "asof_v")
    val got = toMap(
      StreamingAsof.attach(left, right, "user", "ts", "v", "served_v"),
      "served_v")
    assert(got == expected)
  }

  test("unseen keys and too-early rows get NULL; bound is loud") {
    import spark.implicits._
    val left = Seq((1L, 9L, 100L), (2L, 1L, 0L)).toDF("id", "user", "ts")
    val right = Seq((1L, 5L, 1.5)).toDF("user", "ts", "v")
    val got = StreamingAsof.attach(left, right, "user", "ts", "v", "sv")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("sv"))).toMap
    assert(got == Map(1L -> None, 2L -> None))
    intercept[IllegalArgumentException] {
      StreamingAsof.attach(left, right, "user", "ts", "v", "sv",
        maxIndexRows = 0)
    }
  }
}
