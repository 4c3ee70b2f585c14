package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.AsOf

class AsOfSpec extends AnyFunSuite with SparkTestBase {

  test("asofJoin == brute force, including ties and missing matches") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
    val right = (1 to 200).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, rnd.nextDouble()))
    val lDf = left.toDF("k", "t")
    val rDf = right.toDF("k", "t", "v")
      .withColumn("rv", org.apache.spark.sql.functions.col("v"))
      .select($"k", $"t", $"rv")
      // dedupe (k, t) on the right: as-of at equal timestamps must be
      // deterministic, so keep the max rv per (k, t)
      .groupBy("k", "t").max("rv").withColumnRenamed("max(rv)", "rv")

    val got = AsOf.asofJoin(lDf, rDf, keyCol = "k", seqCol = "t",
      valueCols = Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))

    val rightRows = rDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def expected(k: Long, t: Long): Option[Double] = {
      val c = rightRows.filter(r => r._1 == k && r._2 <= t)
      if (c.isEmpty) None else Some(c.maxBy(_._2)._3)
    }
    assert(got.length === left.length)
    got.foreach { case (k, t, v) => assert(v === expected(k, t), s"k=$k t=$t") }
    // both outcomes actually occur in the data
    assert(got.exists(_._3.isEmpty) && got.exists(_._3.nonEmpty))
  }

  test("all value columns come from the SAME latest right row; its NULLs propagate") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rSchema = StructType(Seq(
      StructField("k", LongType), StructField("t", LongType),
      StructField("a", DoubleType), StructField("b", StringType)))
    // latest right row at t=20 has a=NULL, b="new"; an older row at t=10
    // has a=1.0, b="old". A per-column carry would wrongly back-fill
    // a=1.0 from t=10 while taking b="new" from t=20.
    val rDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, 1.0, "old"),
        Row(1L, 20L, null, "new"),
        Row(2L, 10L, null, null))), rSchema)
    import spark.implicits._
    val lDf = Seq((1L, 25L), (1L, 15L), (2L, 15L), (3L, 15L))
      .toDF("k", "t")

    val got = AsOf.asofJoin(lDf, rDf, keyCol = "k", seqCol = "t",
      valueCols = Seq("a", "b"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         if (r.isNullAt(3)) None else Some(r.getString(3)))))
      .toMap

    assert(got((1L, 25L)) === ((None, Some("new"))),
      "matched row's NULL must propagate, not back-fill from an older row")
    assert(got((1L, 15L)) === ((Some(1.0), Some("old"))))
    assert(got((2L, 15L)) === ((None, None)),
      "an all-NULL matched row still matches (distinct from no-match)")
    assert(got((3L, 15L)) === ((None, None)))
  }
}
