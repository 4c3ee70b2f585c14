package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  private def join(left: Seq[(Long, Long, String)],
      right: Seq[(Long, Long, Double)]): Map[Long, Option[Double]] = {
    import spark.implicits._
    AsofJoin.asof(
        left.toDF("id", "ts", "tag").withColumn("user", lit(1L)),
        right.toDF("user", "ts", "v").select(col("user"), col("ts"),
          col("v")),
        keyCols = Seq("user"), tsCol = "ts", valueCols = Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("asof_v")).map(_.asInstanceOf[Double]))
      .toMap
  }

  test("each left row sees the latest right value at or before its ts") {
    val got = join(
      left = Seq((1L, 5L, "a"), (2L, 10L, "b"), (3L, 14L, "c"),
        (4L, 15L, "d"), (5L, 99L, "e")),
      right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0)))
    assert(got == Map(
      1L -> None,         // before any right row: honest NULL
      2L -> Some(1.0),    // equal ts: the right row at 10 is visible
      3L -> Some(1.0),
      4L -> Some(2.0),
      5L -> Some(2.0)))
  }

  test("keys do not leak values across groups") {
    import spark.implicits._
    val left = Seq((1L, 7L, 20L), (2L, 9L, 20L), (3L, 7L, 30L))
      .toDF("id", "ts", "user")
    val right = Seq((20L, 7L, 0.5), (30L, 8L, 9.9)).toDF("user", "ts", "v")
    val got = AsofJoin.asof(left, right, Seq("user"), "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("asof_v"))).toMap
    assert(got == Map(1L -> Some(0.5), 2L -> Some(0.5), 3L -> None))
  }

  test("multiple value columns fill independently") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("id", "ts", "user")
    val right = Seq((5L, 3L, 1.0, "x"), (5L, 9L, 2.0, "y"))
      .toDF("user", "ts", "v", "s")
    val row = AsofJoin.asof(left, right, Seq("user"), "ts", Seq("v", "s"))
      .collect().head
    assert(row.getAs[Double]("asof_v") == 2.0 &&
      row.getAs[String]("asof_s") == "y")
  }

  test("rejects an asof_ output-name collision and a missing value col") {
    import spark.implicits._
    val left = Seq((1L, 1L, 1L, 0.0)).toDF("id", "ts", "user", "asof_v")
    val right = Seq((1L, 1L, 1.0)).toDF("user", "ts", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, Seq("user"), "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left.drop("asof_v"), right, Seq("user"), "ts",
        Seq("nope"))
    }
  }

  test("bucketed variant equals the plain form on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = Seq.tabulate(300)(i => (i.toLong,
      rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toDF("id", "user", "ts")
    val right = Seq.tabulate(80)(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i / 10.0))
      .toDF("user", "ts", "v")
      // enforce the unique-(key, ts) contract the operator documents
      .groupBy("user", "ts").agg(max("v").as("v"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("asof_v"))).toMap
    val plain = toMap(AsofJoin.asof(left, right, Seq("user"), "ts",
      Seq("v")))
    for (w <- Seq(1L, 7L, 64L, 100000L)) {
      val bucketed = toMap(AsofJoin.asofBucketed(left, right, Seq("user"),
        "ts", Seq("v"), bucket = w))
      assert(bucketed == plain, s"bucket width $w diverged")
    }
  }

  test("bucketed variant carries across empty buckets") {
    import spark.implicits._
    // right value at ts=1, left rows many buckets later with nothing in
    // between: the spine carry must bridge the gap
    val left = Seq((1L, 1000000L, 5L), (2L, 999L, 5L)).toDF("id", "ts", "user")
    val right = Seq((5L, 1L, 42.0)).toDF("user", "ts", "v")
    val got = AsofJoin.asofBucketed(left, right, Seq("user"), "ts",
        Seq("v"), bucket = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("asof_v")).toMap
    assert(got == Map(1L -> 42.0, 2L -> 42.0))
  }

  test("plans as ONE exchange + one window pass (no join operator)") {
    import spark.implicits._
    val left = spark.range(100).select(col("id"),
      (col("id") % 7).as("user"), (col("id") * 3).as("ts"))
    val right = spark.range(20).select((col("id") % 7).as("user"),
      (col("id") * 11).as("ts"), col("id").cast("double").as("v"))
    val plan = AsofJoin.asof(left, right, Seq("user"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
    assert("Window".r.findAllIn(plan).size == 1,
      s"expected one window pass for both value columns:\n$plan")
  }
}
