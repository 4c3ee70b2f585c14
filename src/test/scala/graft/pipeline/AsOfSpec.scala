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
}
